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
import os
import sys
import time


def clear_tpu_chip():
    """Yield the single TPU chip from a live pretraining watchdog.

    Only one process may claim the remote TPU at a time (concurrent claims
    die with FAILED_PRECONDITION). If `scripts/pretrain_watchdog.sh` is
    running (pidfile /tmp/pretrain.pid), pause the watchdog with SIGSTOP,
    terminate its trainer child by explicit PID (never pattern matching),
    and wait for the chip to be released. On exit — normal or signal — the
    watchdog is SIGCONTed; its retry loop relaunches the trainer, which
    resumes from the atomic checkpoint (npe_pfn_tpu/pretrain/train.py:206).
    """
    import atexit
    import signal
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return  # CPU run — no chip contention
    pidfile = os.environ.get("PRETRAIN_PIDFILE", "/tmp/pretrain.pid")
    try:
        watchdog = int(open(pidfile).read().strip())
        os.kill(watchdog, 0)
    except (OSError, ValueError):
        return  # no live watchdog

    os.kill(watchdog, signal.SIGSTOP)

    def _resume(*_args):
        try:
            os.kill(watchdog, signal.SIGCONT)
        except OSError:
            pass

    atexit.register(_resume)
    for sig in (signal.SIGTERM, signal.SIGINT):
        prev = signal.getsignal(sig)

        def _handler(signum, frame, _prev=prev):
            _resume()
            if callable(_prev):
                _prev(signum, frame)
            else:
                raise SystemExit(128 + signum)

        signal.signal(sig, _handler)

    kids = subprocess.run(
        ["ps", "-o", "pid=", "--ppid", str(watchdog)],
        capture_output=True, text=True,
    ).stdout.split()
    for kid in kids:
        try:
            os.kill(int(kid), signal.SIGTERM)
        except (OSError, ValueError):
            pass
    time.sleep(8)
    for kid in kids:
        try:
            os.kill(int(kid), signal.SIGKILL)
        except (OSError, ValueError):
            pass
    print(f"[bench] paused pretrain watchdog {watchdog}, "
          f"stopped trainer {kids}; waiting for chip release", file=sys.stderr)
    time.sleep(30)


def main():

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the JSON record to this file (keeps the "
                    "committed artifact clean of log lines on stdout)")
    args = ap.parse_args()

    clear_tpu_chip()

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
    # steady-state serving cost). The device→host materialization is the
    # sync: on the remote axon runtime `block_until_ready` can return
    # before execution finishes (it acks the dispatch, not the result), so
    # an async-timed run overstates throughput by orders of magnitude —
    # same gotcha as scripts/profile_train_step.py.
    import numpy as np

    np.asarray(est.sample(num_samples, x_o, rng=jax.random.PRNGKey(1)))

    # Measured through the honest default path (full rejection loop; the
    # Normal prior accepts everything, so the loop exits after one draw,
    # but nothing is bypassed).
    t0 = time.perf_counter()
    samples = est.sample(num_samples, x_o, rng=jax.random.PRNGKey(2))
    np.asarray(samples)  # host materialization = true completion barrier
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
