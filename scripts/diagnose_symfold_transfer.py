#!/usr/bin/env python
"""Does the model solve IN-DISTRIBUTION sym-fold inverse problems?

The v6 pretraining bet (results/DIAGNOSIS.md round-4 addendum) is that the
family-B sign-symmetry fold — the exact non-injectivity that makes two_moons
bimodal — transfers to the benchmark. Rounds 4-5 only ever measured the
benchmark side. This probe measures the training side: posterior quality on
tasks drawn from the sym-fold family itself (2D theta, one folded linear
combo, random-MLP simulator — the same generative code path as
pretrain/prior.py:242-258, with exact grid ground truth).

Outcomes:
  - in-dist C2ST ~0.5-0.6 but two_moons ~0.9  => transfer/OOD problem
    (feature stats, prior shape, noise scale) — fixable by matching stats.
  - in-dist C2ST also ~0.9                    => thin reflected modes were
    never learned; prior enrichment alone is a dead end at this scale.

    JAX_PLATFORMS=cpu python scripts/diagnose_symfold_transfer.py \
        --ckpts checkpoints/tabica_v5_best.npz /tmp/v6best_s25k.npz \
        --out results/diagnosis_symfold_transfer.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpts", nargs="+", required=True)
    p.add_argument("--num_tasks", type=int, default=4)
    p.add_argument("--num_train", type=int, default=1000)
    p.add_argument("--num_context", type=int, default=512)
    p.add_argument("--num_samples", type=int, default=1024)
    p.add_argument("--sigma_rel", type=float, default=0.05)
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import npe_pfn_tpu as npt
    from npe_pfn_tpu.distributions import Normal
    from npe_pfn_tpu.eval import metrics
    from npe_pfn_tpu.models import checkpoint
    from npe_pfn_tpu.pretrain.prior import _random_mlp

    G = args.grid
    lin = jnp.linspace(-4.0, 4.0, G)
    tg0, tg1 = jnp.meshgrid(lin, lin, indexing="ij")
    theta_grid = jnp.stack([tg0.ravel(), tg1.ravel()], axis=-1)  # [G*G, 2]
    cell = float(lin[1] - lin[0])

    def make_task(key):
        """One sym-fold inverse task: theta~N(0,I2), v=theta@A, x=mlp(|v0|,v1)+eps.

        Same mechanism as pretrain/prior.py:242-258 (one folded random combo,
        one unfolded — two_moons' structure, tasks/registry.py:60).
        """
        ka, km, kt, kn, ko = jax.random.split(key, 5)
        A = jax.random.normal(ka, (2, 2)) / jnp.sqrt(2.0)

        theta_all = jax.random.normal(kt, (args.num_train + 1, 2))

        def fwd(theta, mlp_key):
            v = theta @ A
            folded = jnp.stack([jnp.abs(v[:, 0]), v[:, 1]], axis=-1)
            return _random_mlp(mlp_key, folded, 2, 64)

        # One MLP application over sims + obs + grid => identical weights.
        stacked = jnp.concatenate([theta_all, theta_grid], axis=0)
        f_all = fwd(stacked, km)
        sd = jnp.maximum(jnp.std(f_all[: args.num_train]), 1e-6)
        sigma = args.sigma_rel * sd
        x_all = f_all[: args.num_train + 1] + sigma * jax.random.normal(
            kn, (args.num_train + 1, 2))
        theta_sims, x_sims = theta_all[:-1], x_all[:-1]
        x_o = x_all[-1]

        f_grid = f_all[args.num_train + 1:]
        loglik = -0.5 * jnp.sum((x_o - f_grid) ** 2, axis=-1) / sigma**2
        logprior = -0.5 * jnp.sum(theta_grid**2, axis=-1)
        logpost = loglik + logprior
        logpost = logpost - jax.scipy.special.logsumexp(logpost)

        # Bimodality bookkeeping: mass on each side of the fold plane v0=0.
        v0_grid = (theta_grid @ A)[:, 0]
        w = jnp.exp(logpost)
        side_pos = jnp.sum(w * (v0_grid > 0))

        idx = jax.random.categorical(ko, logpost, shape=(args.num_samples,))
        jit = jax.random.uniform(
            jax.random.fold_in(ko, 1), (args.num_samples, 2),
            minval=-cell / 2, maxval=cell / 2)
        gt = theta_grid[idx] + jit
        return theta_sims, x_sims, x_o, gt, float(side_pos), A

    # Pre-select tasks whose exact posterior is genuinely bimodal
    # (>=15% mass on the minority side of the fold).
    tasks = []
    k = jax.random.PRNGKey(7)
    tries = 0
    while len(tasks) < args.num_tasks and tries < 50:
        k, sub = jax.random.split(k)
        t = make_task(sub)
        minority = min(t[4], 1.0 - t[4])
        tries += 1
        if minority >= 0.15:
            tasks.append(t)
            print(f"task {len(tasks)}: minority-side GT mass {minority:.3f}",
                  flush=True)

    records = []
    for ckpt in args.ckpts:
        os.environ["NPE_PFN_TPU_CHECKPOINT"] = ckpt
        model, trained = checkpoint.load_default()
        rows = []
        for ti, (theta_sims, x_sims, x_o, gt, side_pos, A) in enumerate(tasks):
            est = npt.NPEPFN(
                prior=Normal(jnp.zeros(2), jnp.ones(2)), model=model,
                filter_context_size=args.num_context, qry_chunk=256,
            )
            est.append_simulations(theta_sims, x_sims)
            post = est.sample(
                args.num_samples, x_o, rng=jax.random.PRNGKey(400 + ti),
                max_iters=2)
            c = float(metrics.c2st(jax.random.PRNGKey(500 + ti),
                                   np.asarray(post), np.asarray(gt)))
            v0_model = np.asarray(post) @ np.asarray(A)
            model_pos = float(np.mean(v0_model[:, 0] > 0))
            rows.append({"task": ti, "c2st": c,
                         "gt_side_pos": side_pos, "model_side_pos": model_pos})
            print(f"{ckpt} task{ti}: c2st={c:.4f} "
                  f"gt_pos={side_pos:.3f} model_pos={model_pos:.3f}",
                  flush=True)
        rec = {"ckpt": ckpt, "trained": trained, "rows": rows,
               "mean_c2st": float(np.mean([r["c2st"] for r in rows])),
               "protocol": {"num_train": args.num_train,
                            "ctx": args.num_context,
                            "sigma_rel": args.sigma_rel}}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
