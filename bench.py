#!/usr/bin/env python
"""Headline benchmark: autoregressive posterior sampling throughput.

Target (BASELINE.md): 10k posterior samples on a 10D sbibm task in <10 s on
a single chip. Reference baseline: the CPU reference samples at ~811 ms per
posterior sample in its own saved benchmark
(notebooks/sampling_comparison.ipynb, Strategy A: 8.11 s for 10 samples) →
1.233 samples/s. vs_baseline = ours / reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the JSON record to this file (keeps the "
                    "committed artifact clean of log lines on stdout)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the remote-compile service in this
    # environment takes minutes for the sampling scan; the repo ships a
    # warmed cache so bench startup is fast.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    from npe_pfn_tpu import NPEPFN
    from npe_pfn_tpu.tasks import get_task

    num_samples = 10_240
    task = get_task("gaussian_linear", dim=10)

    theta, x = task.simulate(jax.random.PRNGKey(0), 1000)
    est = NPEPFN(
        prior=task.prior,
        filter_type="standardized_euclidean_filtering",
        filter_context_size=512,
        qry_chunk=1024,
    )
    est.append_simulations(theta, x)
    x_o = x[0]

    # Warm-up: compile the kernel (first TPU compile is slow and not the
    # steady-state serving cost).
    est.sample(num_samples, x_o, rng=jax.random.PRNGKey(1))

    # Measured through the honest default path (full rejection loop; the
    # Normal prior accepts everything, so the loop exits after one draw,
    # but nothing is bypassed).
    t0 = time.perf_counter()
    samples = est.sample(num_samples, x_o, rng=jax.random.PRNGKey(2))
    jax.block_until_ready(samples)
    elapsed = time.perf_counter() - t0

    throughput = num_samples / elapsed
    baseline_throughput = 10.0 / 8.11  # reference Strategy A, saved output
    record = json.dumps(
        {
            "metric": "posterior_samples_per_sec_10d_gaussian_linear_1chip",
            "value": round(throughput, 2),
            "unit": "samples/s",
            "vs_baseline": round(throughput / baseline_throughput, 1),
        }
    )
    if args.out:
        with open(args.out, "w") as f:
            f.write(record + "\n")
    print(record)


if __name__ == "__main__":
    main()
