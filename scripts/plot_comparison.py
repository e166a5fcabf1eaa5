#!/usr/bin/env python
"""Compare this framework's measured numbers against the reference's own
published benchmarks (scripts/plot_comparison.py analog — the reference
overlays NPE-PFN grids with external-baseline metrics JSONs; those cluster
artifacts are uncommitted there, so here the baseline side is the
reference's committed notebook measurements, cited inline).

Reads results/tpu_eval.json (TPU bundle) and any results/*.summary.json
grids; writes results/plots/comparison.png + a markdown table.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Reference's own measured numbers (committed in its repo):
# - Strategy A: 10 posterior samples in 8.11 s -> 1.23 samples/s
#   (notebooks/sampling_comparison.ipynb saved output; BASELINE.md)
# - batched-vs-loop speedups 3.2-7.0x (docs/sample_batched_implementation.md)
# - strategy A-vs-B speedup 9.11x (notebooks/sampling_comparison.ipynb)
REF = {
    "samples_per_s": 1.233,
    "batched_speedup_range": (3.2, 7.0),
    "strategy_ab_speedup": 9.11,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="results")
    p.add_argument("--out", default="results/plots")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    tpu_path = os.path.join(args.results, "tpu_eval.json")
    if not os.path.exists(tpu_path):
        print(f"no {tpu_path}; run scripts/tpu_eval_bundle.py first")
        return
    with open(tpu_path) as f:
        tpu = json.load(f)

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.4))

    # 1. sampling throughput (log scale; the gap is ~4 orders of magnitude)
    ours = tpu.get("headline", {}).get("samples_per_s")
    ax = axes[0]
    if ours:
        ax.bar(["reference\n(CPU)", "this repo\n(1 TPU chip)"],
               [REF["samples_per_s"], ours], color=["#999999", "#1f77b4"])
        ax.set_yscale("log")
        ax.set_ylabel("posterior samples / s")
        ax.set_title(f"throughput ({ours / REF['samples_per_s']:.0f}x)")

    # 2. batched-vs-loop speedup
    ax = axes[1]
    cells = tpu.get("batched_vs_loop", [])
    if cells:
        ms = [c["num_obs"] for c in cells]
        sp = [c["speedup"] for c in cells]
        ax.plot(ms, sp, marker="o", label="this repo")
        ax.axhspan(*REF["batched_speedup_range"], color="#999999", alpha=0.3,
                   label="reference range")
        ax.set_xlabel("num observations")
        ax.set_ylabel("batched / loop speedup")
        ax.legend(fontsize=8)
        ax.set_title("batched sampling")

    # 3. C2ST per task (ours vs the 0.5 ideal; reference gate is parity)
    ax = axes[2]
    labels, vals = [], []
    for rec in tpu.get("quality_vs_context", [])[:1]:
        labels.append("gauss-lin")
        vals.append(rec["c2st"])
    for rec in tpu.get("two_moons", []):
        if rec.get("n_sims") == 10_000:
            labels.append(f"two-moons\n({rec.get('target_transform', 'zscore')[:5]})")
            vals.append(rec["c2st_vs_exact"])
    for rec in tpu.get("slcp", []):
        labels.append(f"slcp\n({rec.get('target_transform', 'zscore')[:5]})")
        vals.append(rec["c2st_vs_mcmc"])
    if vals:
        ax.bar(range(len(vals)), vals, color="#1f77b4")
        ax.set_xticks(range(len(vals)))
        ax.set_xticklabels(labels, fontsize=7)
        ax.axhline(0.5, color="gray", ls="--", lw=1, label="exact (0.5)")
        ax.set_ylim(0.45, 1.0)
        ax.set_ylabel("C2ST vs ground truth")
        ax.set_title("posterior quality")
        ax.legend(fontsize=8)

    fig.tight_layout()
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "comparison.png")
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")

    # Markdown summary table across any committed grids.
    rows = ["| benchmark | reference | this repo |", "|---|---|---|"]
    if ours:
        rows.append(f"| posterior samples/s | {REF['samples_per_s']:.2f} (CPU) "
                    f"| {ours:.0f} (1 chip) |")
    if cells:
        rows.append("| batched-vs-loop speedup | "
                    f"{REF['batched_speedup_range'][0]}-"
                    f"{REF['batched_speedup_range'][1]}x | "
                    f"{min(c['speedup'] for c in cells)}-"
                    f"{max(c['speedup'] for c in cells)}x |")
    sab = tpu.get("strategyA_vs_B", {}).get("speedup")
    if sab:
        rows.append(f"| strategy A-vs-B speedup | {REF['strategy_ab_speedup']}x "
                    f"| {sab}x |")
    for path in sorted(glob.glob(os.path.join(args.results, "*.summary.json"))):
        task = os.path.basename(path).replace(".summary.json", "")
        with open(path) as f:
            summary = json.load(f)
        best = min(
            (v["c2st"]["mean"] for v in summary.values() if "c2st" in v),
            default=None,
        )
        if best is not None:
            rows.append(f"| {task} best C2ST (grid) | parity gate | {best:.3f} |")
    table = "\n".join(rows)
    with open(os.path.join(args.out, "comparison.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
