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
    """Yield the single TPU chip from any live supervised TPU workload.

    Only one process may claim the remote TPU at a time (concurrent claims
    die with FAILED_PRECONDITION). The driver invokes bench.py while either
    a pretraining watchdog (/tmp/pretrain.pid) or a measurement queue
    (/tmp/queue.pid, e.g. scripts/round4_tpu_queue.sh and its per-stage
    run_with_watchdog.sh wrappers) may hold the chip. For each live root:
    walk its process tree by explicit PIDs (never pattern matching),
    SIGSTOP every supervisor (bash/timeout/...) so nothing can relaunch a
    stage, then SIGTERM→SIGKILL the python leaves that actually claim the
    chip. On exit — normal or signal — all stopped supervisors are
    SIGCONTed; their retry loops relaunch the dead stage, which resumes
    from its atomic checkpoint / incremental saves
    (npe_pfn_tpu/pretrain/train.py:206, scripts/run_with_watchdog.sh).
    """
    import atexit
    import signal
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return  # CPU run — no chip contention

    # Our own supervisor chain is not a foreign workload: when bench runs
    # AS A STAGE of the measurement queue (scripts/round5_tpu_queue.sh),
    # /tmp/queue.pid names an ANCESTOR of this process — freezing that
    # tree would SIGSTOP our own parents and SIGTERM bench itself (the
    # exact failure that silently skipped both round-4 bench stages:
    # bench is a python leaf of the queue's tree, so it killed itself
    # before producing a byte of output).
    def ppid(pid):
        try:
            with open(f"/proc/{pid}/stat") as f:
                # comm may contain spaces/parens; ppid is the field after
                # the state flag, both following the last ')'.
                return int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            return 0

    ancestors, pid = set(), os.getpid()
    while pid > 1:
        ancestors.add(pid)
        pid = ppid(pid)

    roots = []
    for envvar, default in (
        ("PRETRAIN_PIDFILE", "/tmp/pretrain.pid"),
        ("QUEUE_PIDFILE", "/tmp/queue.pid"),
    ):
        path = os.environ.get(envvar, default)
        try:
            pid = int(open(path).read().strip())
            os.kill(pid, 0)
            if pid not in ancestors:
                roots.append(pid)
        except (OSError, ValueError):
            continue
    if not roots:
        return

    def kids_of(pid):
        out = subprocess.run(
            ["ps", "-o", "pid=", "--ppid", str(pid)],
            capture_output=True, text=True,
        ).stdout.split()
        return [int(k) for k in out]

    def comm(pid):
        try:
            with open(f"/proc/{pid}/comm") as f:
                return f.read().strip()
        except OSError:
            return ""

    # Freeze supervisors top-down (so a stopped parent cannot respawn a
    # child between our walk and the kill), collecting python leaves.
    # Pythons are left running — SIGTERM must be deliverable for their
    # cleanup handlers (atomic checkpoint writes) to run.
    stopped, pythons = [], []
    frontier = list(roots)
    while frontier:
        pid = frontier.pop(0)
        if comm(pid).startswith("python"):
            pythons.append(pid)
        else:
            try:
                os.kill(pid, signal.SIGSTOP)
                stopped.append(pid)
            except OSError:
                continue
        frontier.extend(kids_of(pid))

    def _resume(*_args):
        for pid in reversed(stopped):
            try:
                os.kill(pid, signal.SIGCONT)
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

    for pid in pythons:
        try:
            os.kill(pid, signal.SIGTERM)
        except OSError:
            pass
    time.sleep(8)
    for pid in pythons:
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
    print(f"[bench] froze supervisors {stopped}, stopped TPU processes "
          f"{pythons}; waiting for chip release", file=sys.stderr)
    time.sleep(30)


def main():

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the JSON record to this file (keeps the "
                    "committed artifact clean of log lines on stdout)")
    ap.add_argument("--filter_context", type=int, default=2048,
                    help="context rows after filtering. Default = the "
                    "SHIPPED estimator default (estimator.py), so the "
                    "headline measures the config users actually get "
                    "(VERDICT r3 weak #3); pass 512 for continuity with "
                    "the round<=3 numbers.")
    ap.add_argument("--num_sims", type=int, default=10_000,
                    help="simulation pool the context filter draws from "
                    "(reference-realistic: >10k sims filtered per obs, "
                    "npe_pfn.py:721)")
    ap.add_argument("--qry_chunk", type=int, default=2048,
                    help="decode chunk rows. 2048 measured fastest at the "
                    "shipped config (results/round8/profile_serve.jsonl: "
                    "9,966/s vs 9,622 at 1024 and 8,209 at one 10,240-row "
                    "chunk)")
    ap.add_argument("--roofline", action="store_true",
                    help="also emit an analytic speed-of-light estimate "
                    "for this config (see npe_pfn_tpu/utils/roofline.py) "
                    "into --out / stderr")
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

    theta, x = task.simulate(jax.random.PRNGKey(0), args.num_sims)
    est = NPEPFN(
        prior=task.prior,
        filter_type="standardized_euclidean_filtering",
        filter_context_size=args.filter_context,
        qry_chunk=args.qry_chunk,
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
    rec = {
        "metric": "posterior_samples_per_sec_10d_gaussian_linear_1chip",
        "value": round(throughput, 2),
        "unit": "samples/s",
        "vs_baseline": round(throughput / baseline_throughput, 1),
        "filter_context": args.filter_context,
        "num_sims": args.num_sims,
    }
    if args.roofline:
        from npe_pfn_tpu.estimator import _eff_features
        from npe_pfn_tpu.utils.roofline import ar_sampling_roofline

        rl = ar_sampling_roofline(
            est.model.cfg, num_ctx=min(args.filter_context, args.num_sims),
            num_qry=num_samples, dim_theta=task.dim_theta, dim_x=task.dim_x,
            feature_width=_eff_features(est.model, task.dim_x, task.dim_theta),
        )
        rec["roofline"] = rl
        rec["frac_of_roofline"] = round(rl["min_time_s"] / elapsed, 4)
        print(json.dumps(rl, indent=1), file=sys.stderr)
    record = json.dumps(rec)
    if args.out:
        with open(args.out, "w") as f:
            f.write(record + "\n")
    print(record)


if __name__ == "__main__":
    main()
