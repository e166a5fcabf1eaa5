#!/usr/bin/env python
"""Mid-training CPU probe: two_moons C2ST for one or more checkpoints.

Early-warning signal on the multimodal-quality bet while the chip is busy
pretraining (the real arbiter stays the TPU gate in select_checkpoint.py,
results/select_checkpoint.log). Runs entirely on CPU at a reduced protocol
(ctx 512, 1024 samples, 3 obs) so deltas between checkpoints are meaningful
even though absolute numbers differ from the 2048-ctx TPU bundles.

    JAX_PLATFORMS=cpu python scripts/probe_two_moons_cpu.py \
        --ckpts checkpoints/tabica_v5_best.npz checkpoints/tabica_v6_best.npz \
        --out results/probe_two_moons_v6mid.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpts", nargs="+", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--num_train", type=int, default=1000)
    p.add_argument("--num_context", type=int, default=512)
    p.add_argument("--num_samples", type=int, default=1024)
    p.add_argument("--num_obs", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import npe_pfn_tpu as npt
    from npe_pfn_tpu.eval import metrics
    from npe_pfn_tpu.models import checkpoint

    task = npt.tasks.get_task("two_moons")
    theta, x = task.simulate(jax.random.PRNGKey(args.seed), args.num_train)

    records = []
    for ckpt in args.ckpts:
        os.environ["NPE_PFN_TPU_CHECKPOINT"] = ckpt
        model, trained = checkpoint.load_default()
        est = npt.NPEPFN(
            prior=task.prior, model=model,
            filter_context_size=args.num_context, qry_chunk=256,
        )
        est.append_simulations(theta, x)
        c2sts = []
        for j in range(args.num_obs):
            x_o = x[j]
            post = est.sample(
                args.num_samples, x_o, rng=jax.random.PRNGKey(100 + j),
                max_iters=2,
            )
            gt = task.posterior_sampler(
                jax.random.PRNGKey(200 + j), x_o, args.num_samples)
            c = float(metrics.c2st(jax.random.PRNGKey(300 + j),
                                   np.asarray(post), np.asarray(gt)))
            c2sts.append(c)
            print(f"{ckpt} obs{j}: c2st={c:.4f}", flush=True)
        rec = {"ckpt": ckpt, "trained": trained,
               "c2st": c2sts, "mean_c2st": float(np.mean(c2sts)),
               "protocol": {"num_train": args.num_train,
                            "ctx": args.num_context,
                            "num_samples": args.num_samples}}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
