#!/usr/bin/env python
"""Aggregate committed results/ artifacts into one markdown summary.

Reads only committed JSON/JSONL artifacts (never runs the model), so every
number it prints is reproducible from git alone — the artifact-backed
reporting discipline of STATUS.md (VERDICT r2 weak #1) made mechanical.

Usage:
    python scripts/round_summary.py [--results results] [--out RESULTS/SUMMARY.md]
"""

import argparse
import glob
import json
import os


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _load_jsonl(path):
    rows = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        continue
    except OSError:
        return []
    return rows


def section_bench(lines, results):
    lines.append("## Headline bench (samples/s, 10D gaussian_linear, 1 chip)\n")
    rows = []
    for path in sorted(glob.glob(os.path.join(results, "bench_*.json"))):
        d = _load(path)
        if d and "value" in d:
            rows.append((os.path.basename(path), d["value"], d.get("vs_baseline")))
    for p in sorted(glob.glob("BENCH_r*.json")):
        d = _load(p)
        if d and "value" in d:
            rows.append((p, d["value"], d.get("vs_baseline")))
    if not rows:
        lines.append("_no bench artifacts found_\n")
        return
    lines.append("| artifact | samples/s | vs reference |")
    lines.append("|---|---|---|")
    for name, v, vs in rows:
        lines.append(f"| {name} | {v:,.1f} | {vs:,.0f}x |")
    lines.append("")


def section_gate(lines, results):
    lines.append("## Checkpoint gate\n")
    log = os.path.join(results, "select_checkpoint.log")
    try:
        with open(log) as f:
            body = f.read().strip()
    except OSError:
        lines.append("_no select_checkpoint.log_\n")
        return
    lines.append("```")
    lines.extend(body.splitlines()[-8:])
    lines.append("```")
    default = _read_default()
    if default:
        lines.append(f"\n`checkpoints/DEFAULT` -> **{default}**\n")


def _read_default():
    try:
        with open(os.path.join("checkpoints", "DEFAULT")) as f:
            return f.read().strip()
    except OSError:
        return None


def section_bundle(lines, results):
    d = _load(os.path.join(results, "tpu_eval.json"))
    if not d:
        return
    lines.append("## Canonical bundle (results/tpu_eval.json)\n")
    lines.append(
        f"checkpoint `{d.get('checkpoint')}` (step {d.get('checkpoint_step')})\n"
    )
    for key, metric in (("two_moons", "c2st_vs_exact"), ("slcp", "c2st_vs_mcmc")):
        cells = d.get(key) or []
        if cells:
            best = min(cells, key=lambda r: r.get(metric, 1.0))
            lines.append(
                f"- **{key}** best C2ST {best.get(metric):.4f} "
                f"({ {k: v for k, v in best.items() if k != metric} })"
            )
    q = d.get("quality_vs_context") or []
    if q:
        lines.append("- gaussian_linear C2ST by context: " + ", ".join(
            f"{r.get('context', r.get('context_size'))}→{r.get('c2st'):.3f}"
            for r in q
        ))
    lines.append("")


def section_grid(lines, results):
    summaries = sorted(glob.glob(os.path.join(results, "*.summary.json")))
    if not summaries:
        return
    lines.append("## Reference-protocol eval grid (C2ST vs num_cal)\n")
    lines.append("| task | " + " | ".join(["10", "50", "200", "1000"]) + " |")
    lines.append("|---|---|---|---|---|")
    for path in summaries:
        d = _load(path)
        if not d:
            continue
        task = os.path.basename(path).replace(".summary.json", "")
        # Schema: {"<num_cal>": {"c2st": {"mean": ..., "std": ...}, ...}, ...}
        cells = []
        for nc in ("10", "50", "200", "1000"):
            cell = d.get(nc) or {}
            c = (cell.get("c2st") or {}).get("mean")
            cells.append(f"{c:.3f}" if c is not None else "—")
        lines.append(f"| {task} | " + " | ".join(cells) + " |")
    lines.append("")


def section_jsonl_curve(lines, results, fname, title, xkey, ykey):
    rows = _load_jsonl(os.path.join(results, fname))
    if not rows:
        return
    lines.append(f"## {title}\n")
    pts = [(r.get(xkey), r.get(ykey)) for r in rows
           if r.get(xkey) is not None and r.get(ykey) is not None]
    if pts:
        lines.append(", ".join(f"{x}→{y:.3f}" for x, y in pts))
        lines.append("")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results")
    ap.add_argument("--grid", default=None,
                    help="directory holding the CURRENT eval grid "
                    "(*.summary.json) and per-round jsonl curves, when the "
                    "round wrote them to a fresh subdir (e.g. "
                    "results/round5) while bench/gate artifacts stay in "
                    "--results. Default: newest results/round*/ containing "
                    "summaries, else --results itself.")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    grid = args.grid
    if grid is None:
        cands = [d for d in sorted(glob.glob(os.path.join(args.results, "round*")))
                 if glob.glob(os.path.join(d, "*.summary.json"))]
        grid = cands[-1] if cands else args.results

    lines = ["# Results summary (generated by scripts/round_summary.py)\n"]
    section_bench(lines, args.results)
    section_gate(lines, args.results)
    section_bundle(lines, args.results)
    if grid != args.results:
        lines.append(f"_grid directory: `{grid}`_\n")
    section_grid(lines, grid)
    for d in dict.fromkeys([grid, args.results]):
        section_jsonl_curve(
            lines, d, "length_generalization.jsonl",
            f"Length generalization (C2ST vs context rows) [{d}]",
            "context_size", "c2st",
        )
        section_jsonl_curve(
            lines, d, "tsnpe_efficiency_goodtasks.jsonl",
            f"TSNPE simulation efficiency, data-responsive tasks "
            f"(C2ST vs rounds) [{d}]", "rounds", "c2st",
        )
        section_jsonl_curve(
            lines, d, "tsnpe_efficiency.jsonl",
            f"TSNPE simulation efficiency (C2ST vs rounds) [{d}]",
            "rounds", "c2st",
        )
    body = "\n".join(lines) + "\n"
    out = args.out or os.path.join(args.results, "SUMMARY.md")
    with open(out, "w") as f:
        f.write(body)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
