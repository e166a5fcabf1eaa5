#!/usr/bin/env python
"""Plot evaluation results (reference: scripts/plot_evaluation_results.py,
plot_batched_results.py — errorbar plots + summary table of C2ST/W2/MMD vs
num_cal across seeds)."""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="results")
    p.add_argument("--out", default="results/plots")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from npe_pfn_tpu.eval.harness import summarize

    os.makedirs(args.out, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.results, "*.json"))):
        if path.endswith(".summary.json") or "benchmark" in path:
            continue
        with open(path) as f:
            results = json.load(f)
        if "cells" not in results:
            continue
        summary = summarize(results)
        if not summary:
            continue
        task = results["task"]
        metrics = sorted(next(iter(summary.values())).keys())
        fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 3.2))
        if len(metrics) == 1:
            axes = [axes]
        num_cals = sorted(summary)
        for ax, m in zip(axes, metrics):
            means = [summary[n][m]["mean"] for n in num_cals]
            stds = [summary[n][m]["std"] for n in num_cals]
            ax.errorbar(num_cals, means, yerr=stds, marker="o", capsize=3)
            ax.set_xscale("log")
            ax.set_xlabel("num simulations")
            ax.set_title(f"{task}: {m}")
            if m == "c2st":
                ax.axhline(0.5, color="gray", ls="--", lw=1)
        fig.tight_layout()
        out_path = os.path.join(args.out, f"{task}.png")
        fig.savefig(out_path, dpi=120)
        print(f"wrote {out_path}")

        # Summary table (plot_batched_results.py:24-153 analog).
        print(f"\n{task}")
        header = ["num_cal"] + [f"{m} (mean±std)" for m in metrics]
        print("  " + " | ".join(header))
        for n in num_cals:
            row = [str(n)] + [
                f"{summary[n][m]['mean']:.3f}±{summary[n][m]['std']:.3f}"
                for m in metrics
            ]
            print("  " + " | ".join(row))


if __name__ == "__main__":
    main()
