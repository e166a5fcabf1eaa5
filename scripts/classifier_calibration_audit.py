#!/usr/bin/env python
"""Audit classifier calibration (reliability curves + ECE) and save
results/calibration.json + a reliability plot.

The ratio-based log_prob and the restricted prior both consume
``predict_proba`` as a calibrated probability (reference npe_pfn.py:683-704,
restricted_prior.py:24-27) — this audit quantifies that assumption for the
shipped checkpoint. Run CPU (small) or TPU (default sizes):

    JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/classifier_calibration_audit.py --small
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/calibration.json")
    p.add_argument("--plot", default="results/calibration.png")
    p.add_argument("--small", action="store_true", help="CPU-sized audit")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    import jax

    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    from npe_pfn_tpu.eval import calibration as C
    from npe_pfn_tpu.models import checkpoint

    if args.checkpoint:
        os.environ["NPE_PFN_TPU_CHECKPOINT"] = args.checkpoint
    model, trained = checkpoint.load_default()
    assert trained, "no checkpoint found"

    nt = 4 if args.small else 16
    out = {
        "checkpoint": checkpoint.default_checkpoint_path(),
        "binary_logistic": C.audit_binary(
            model, jax.random.PRNGKey(0), num_tasks=nt, link="logistic"
        ),
        "binary_mlp": C.audit_binary(
            model, jax.random.PRNGKey(1), num_tasks=nt, link="mlp"
        ),
        "multiclass_3": C.audit_multiclass(
            model, jax.random.PRNGKey(2), num_tasks=max(nt // 2, 2)
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    for name in ("binary_logistic", "binary_mlp"):
        r = out[name]
        print(
            f"{name}: ece={r['ece']:.4f} mean|p̂−p|={r['mean_abs_prob_error']:.4f} "
            f"brier={r['brier']:.4f} (floor {r['brier_true_p']:.4f})"
        )
    r = out["multiclass_3"]
    print(f"multiclass_3: acc={r['accuracy']:.4f} top_class_ece={r['top_class_ece']:.4f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
        for ax, name in zip(axes, ("binary_logistic", "binary_mlp", "multiclass_3")):
            curve = out[name]["curve"]
            conf = np.array(curve["confidence"], float)
            emp = np.array(curve["empirical"], float)
            ax.plot([0, 1], [0, 1], "k--", lw=1)
            ax.plot(conf, emp, "o-")
            ece_key = "ece" if "ece" in out[name] else "top_class_ece"
            ax.set_title(f"{name} (ECE {out[name][ece_key]:.3f})")
            ax.set_xlabel("predicted probability")
            ax.set_ylabel("empirical frequency")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"saved {args.plot}")
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
