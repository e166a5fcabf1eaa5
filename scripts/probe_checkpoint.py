#!/usr/bin/env python
"""One-pause mid-training probe of a checkpoint: sampling throughput +
posterior quality in a single TPU claim.

Pauses the pretraining watchdog once (bench.clear_tpu_chip), then runs the
headline bench and the quality gate in-process — chaining them here costs
one ~4-min chip claim instead of two. Training resumes automatically at
process exit.

    python scripts/probe_checkpoint.py --ckpt checkpoints/tabica_v4_best.npz \
        --out results/probe_v4.json
"""

import argparse
import json
import os
import runpy
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip_bench", action="store_true")
    ap.add_argument("--profile_dir", default=None,
                    help="also capture a jax.profiler trace of one warm "
                    "10k-sample call (serving-path hotspot analysis)")
    ap.add_argument("--num_train", type=int, default=1000)
    ap.add_argument("--num_samples", type=int, default=1024)
    ap.add_argument("--num_context", type=int, default=2048)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    os.environ["NPE_PFN_TPU_CHECKPOINT"] = args.ckpt

    import bench

    bench.clear_tpu_chip()

    records = {"ckpt": args.ckpt}

    if not args.skip_bench:
        bench_out = "/tmp/probe_bench.json"
        sys.argv = ["bench.py", "--out", bench_out]
        runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
        with open(bench_out) as f:
            records["bench"] = json.loads(f.readline())

    if args.profile_dir:
        # Serving-path trace: one warm 10,240-sample call on the default
        # bench task (non-fatal — the remote runtime may lack profiler
        # support, see pretrain/train.py profiling hooks).
        try:
            import jax

            from npe_pfn_tpu import NPEPFN
            from npe_pfn_tpu.tasks import get_task

            task = get_task("gaussian_linear", dim=10)
            theta, x = task.simulate(jax.random.PRNGKey(0), 1000)
            est = NPEPFN(prior=task.prior, filter_context_size=512,
                         qry_chunk=1024)
            est.append_simulations(theta, x)
            est.sample(10_240, x[0], rng=jax.random.PRNGKey(1))  # warm
            jax.profiler.start_trace(args.profile_dir)
            s = est.sample(10_240, x[0], rng=jax.random.PRNGKey(2))
            jax.block_until_ready(s)
            jax.profiler.stop_trace()
            records["profile_dir"] = args.profile_dir
        except Exception as e:  # pragma: no cover - diagnostics only
            records["profile_error"] = f"{type(e).__name__}: {e}"

    qc_out = "/tmp/probe_quality.jsonl"
    sys.argv = [
        "quality_check.py",
        "--num_train", str(args.num_train),
        "--num_samples", str(args.num_samples),
        "--num_context", str(args.num_context),
    ]
    # quality_check prints JSON lines; capture them through a tee-ish stdout.
    import io

    class Tee(io.TextIOBase):
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)
            return len(s)

        def flush(self):
            for st in self.streams:
                st.flush()

    captured = io.StringIO()
    old = sys.stdout
    sys.stdout = Tee(old, captured)
    try:
        runpy.run_path(
            os.path.join(root, "scripts", "quality_check.py"),
            run_name="__main__",
        )
    finally:
        sys.stdout = old
    quality = []
    for line in captured.getvalue().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                quality.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    records["quality"] = quality

    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(records) + "\n")
    print(json.dumps(records))


if __name__ == "__main__":
    main()
