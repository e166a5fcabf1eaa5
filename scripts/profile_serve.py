#!/usr/bin/env python
"""Serve-side component profile of the headline sampling path (VERDICT r4
item 6: the shipped config runs at ~48% of the analytic roofline — find
where the other half goes before touching any kernel).

Splits ``NPEPFN.sample`` (bench.py config: gaussian_linear 10d, 10k sims
filtered to 2048 context rows, 10,240 samples) into:

  - full_qcK      : the full fused rejection path at qry_chunk=K
  - ar_q{Q}_qcK   : the bare autoregressive_sample kernel at Q query rows
                    (q=10240 vs q=1024 gives the encode/decode split:
                    t(q) = t_encode + q * c_decode, encode is q-independent)

Each stage warms up once (compile; persistent cache under .jax_cache), then
times the min of 3 runs with a device->host materialization as the barrier
(block_until_ready acks the dispatch only on the remote runtime — bench.py).
Results append to a JSONL (one line per stage) and existing stages are
skipped, so the watchdog can restart this script for free.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/round8/profile_serve.jsonl")
    ap.add_argument("--filter_context", type=int, default=2048)
    ap.add_argument("--num_sims", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    from npe_pfn_tpu import NPEPFN
    from npe_pfn_tpu.estimator import autoregressive_sample
    from npe_pfn_tpu.tasks import get_task

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["stage"] for line in f if line.strip()}

    def record(stage, seconds, extra=None):
        rec = {"stage": stage, "seconds": round(seconds, 4), **(extra or {})}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    def timed(fn):
        np.asarray(fn())  # warmup/compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    task = get_task("gaussian_linear", dim=10)
    theta, x = task.simulate(jax.random.PRNGKey(0), args.num_sims)
    x_o = x[0]
    num_samples = 10_240

    # --- full path at several qry_chunk values --------------------------
    for qc in (1024, 2048, 5120, 10240):
        stage = f"full_qc{qc}"
        if stage in done:
            continue
        est = NPEPFN(
            prior=task.prior,
            filter_type="standardized_euclidean_filtering",
            filter_context_size=args.filter_context,
            qry_chunk=qc,
        )
        est.append_simulations(theta, x)
        t = timed(lambda: est.sample(
            num_samples, x_o, rng=jax.random.PRNGKey(2)))
        record(stage, t, {"samples_per_s": round(num_samples / t, 1)})

    # --- bare AR kernel at two query counts (encode/decode split) -------
    est = NPEPFN(
        prior=task.prior,
        filter_type="standardized_euclidean_filtering",
        filter_context_size=args.filter_context,
        qry_chunk=1024,
    )
    est.append_simulations(theta, x)
    xo = est._prep_obs(x_o)
    if xo.ndim == 2:
        xo = xo[0]
    tc, xc, cm = est.get_context(xo, jax.random.PRNGKey(3))

    for q in (10_240, 1024):
        stage = f"ar_q{q}_qc1024"
        if stage in done:
            continue
        x_qry = jnp.broadcast_to(xo, (q, xo.shape[-1]))
        t = timed(lambda: autoregressive_sample(
            est.model, tc, xc, cm, x_qry, jax.random.PRNGKey(4),
            1024, est.target_transform)[0])
        record(stage, t, {"q": q})

    # --- derived split ---------------------------------------------------
    rows = {}
    with open(args.out) as f:
        for line in f:
            r = json.loads(line)
            rows[r["stage"]] = r
    if "ar_q10240_qc1024" in rows and "ar_q1024_qc1024" in rows:
        t_big = rows["ar_q10240_qc1024"]["seconds"]
        t_small = rows["ar_q1024_qc1024"]["seconds"]
        c = (t_big - t_small) / (10_240 - 1024)
        t_enc = t_small - 1024 * c
        summary = {
            "stage": "derived_split",
            "t_encode_s": round(t_enc, 4),
            "t_decode_10240_s": round(10_240 * c, 4),
            "t_rejection_overhead_s": round(
                rows.get("full_qc1024", {}).get("seconds", float("nan"))
                - t_big, 4),
        }
        if "derived_split" not in done:
            with open(args.out, "a") as f:
                f.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
