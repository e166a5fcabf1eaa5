#!/usr/bin/env python
"""Context-length generalization probe.

TabICA pretrains with up to `num_ctx` (default 384) context rows; inference
may want more (the reference's TabPFN takes ~10K,
docs/sample_batched_implementation.md:245). Row attention has no positional
encoding, so longer contexts are in-distribution *structurally* — this
script measures whether they help or hurt *statistically*, to pick the
default filter_context_size.

    python scripts/length_generalization.py --sizes 128 256 384 512 768 1024
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", nargs="+", type=int, default=[128, 256, 384, 512, 768, 1024])
    p.add_argument("--num_train", type=int, default=4096)
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--num_obs", type=int, default=3)
    p.add_argument("--qry_chunk", type=int, default=256)
    p.add_argument("--out", default=None,
                   help="append JSON-line results to this file")
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import npe_pfn_tpu as npt
    from npe_pfn_tpu.eval import metrics
    from npe_pfn_tpu.models import checkpoint

    model, trained = checkpoint.load_default()
    assert trained, "needs a trained checkpoint"
    task = npt.tasks.get_task("gaussian_linear", dim=5)
    theta, x = task.simulate(jax.random.PRNGKey(0), args.num_train)

    for size in args.sizes:
        est = npt.NPEPFN(
            prior=task.prior, model=model,
            filter_context_size=size, qry_chunk=args.qry_chunk,
        )
        est.append_simulations(theta, x)
        c2sts, std_ratios = [], []
        for j in range(args.num_obs):
            post = est.sample(
                args.num_samples, x[j], rng=jax.random.PRNGKey(10 + j), max_iters=1
            )
            gt = task.posterior_sampler(jax.random.PRNGKey(20 + j), x[j], args.num_samples)
            c2sts.append(float(metrics.c2st(jax.random.PRNGKey(30 + j), post, gt)))
            std_ratios.append(float((post.std(0) / gt.std(0)).mean()))
        rec = {
            "context_size": size,
            "c2st": round(float(np.mean(c2sts)), 4),
            "std_ratio": round(float(np.mean(std_ratios)), 4),
            "checkpoint": os.path.normpath(checkpoint.default_checkpoint_path()),
        }
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
