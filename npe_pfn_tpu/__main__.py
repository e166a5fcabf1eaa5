"""Command-line entry point: ``python -m npe_pfn_tpu <command>``.

The reference exposes its workflows only as library calls plus ad-hoc
scripts (SURVEY §2.2); a framework should let a user run the headline
flows without writing code. Commands:

- ``info``    — version, checkpoint, backend, devices.
- ``tasks``   — the benchmark task registry and what ground truth each has.
- ``sample``  — training-free posterior sampling on a task: simulate,
  bind context, draw posterior samples at an observation, save ``.npy``.
- ``tsnpe``   — sequential (truncated) inference with a simulation budget.

All commands run on CPU too: when the backend is not TPU the checkpoint's
bfloat16 compute dtype is coerced to float32 (the CPU backend cannot
execute bf16 dots); weights are stored f32, so this changes only matmul
rounding.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _load_model():
    import jax

    from .models import checkpoint

    model, trained = checkpoint.load_default()
    if jax.default_backend() != "tpu" and model.cfg.dtype == "bfloat16":
        cfg = dataclasses.replace(model.cfg, dtype="float32")
        model = dataclasses.replace(model, cfg=cfg)
        print("[cli] non-TPU backend: compute dtype coerced bf16 -> f32",
              file=sys.stderr)
    if not trained:
        print("[cli] WARNING: no pretrained checkpoint found — random "
              "weights, output will be garbage", file=sys.stderr)
    return model


def cmd_info(args):
    import jax

    from . import __version__
    from .models import checkpoint

    path = checkpoint.default_checkpoint_path()
    rec = {
        "version": __version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "checkpoint": path,
    }
    try:
        with open(path + ".json") as f:
            rec["model_config"] = json.load(f)
    except OSError:
        rec["model_config"] = None
    print(json.dumps(rec, indent=2))


def cmd_tasks(args):
    from .tasks import get_task, list_tasks

    rows = []
    for name in list_tasks():
        t = get_task(name)
        gt = []
        if t.posterior_sampler is not None:
            gt.append("posterior-sampler")
        if t.posterior_log_prob is not None:
            gt.append("log-prob")
        rows.append((name, t.dim_theta, t.dim_x, "+".join(gt) or "-"))
    w = max(len(r[0]) for r in rows)
    print(f"{'task':<{w}}  dim_theta  dim_x  ground_truth")
    for name, dt, dx, gt in rows:
        print(f"{name:<{w}}  {dt:>9}  {dx:>5}  {gt}")


def _common_sampling_args(p):
    p.add_argument("--task", required=True, help="see `tasks` command")
    p.add_argument("--num-sims", type=int, default=1024,
                   help="simulation budget (context size before filtering)")
    p.add_argument("--num-samples", type=int, default=1024,
                   help="posterior draws at the observation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--x-o", type=float, nargs="*", default=None,
                   help="observation; default: simulate one from the prior")
    p.add_argument("--out", default=None, help="save samples to this .npy")


def _resolve_observation(task, args, rng):
    import jax
    import jax.numpy as jnp

    if args.x_o is not None:
        x_o = jnp.asarray(args.x_o, jnp.float32)
        if x_o.shape != (task.dim_x,):
            raise SystemExit(
                f"--x-o needs {task.dim_x} values for {task.name}, got "
                f"{x_o.shape[0]}"
            )
        return x_o, None
    theta_true, x = task.simulate(rng, 1)
    return x[0], theta_true[0]


def _report(task, samples, theta_true, out):
    import numpy as np

    s = np.asarray(samples)
    print(f"posterior samples: {s.shape}")
    for d in range(s.shape[1]):
        line = f"  theta[{d}]: mean {s[:, d].mean():+.4f}  std {s[:, d].std():.4f}"
        if theta_true is not None:
            line += f"  (true {float(theta_true[d]):+.4f})"
        print(line)
    if out:
        np.save(out, s)
        print(f"saved -> {out}")


def cmd_sample(args):
    import jax

    from .estimator import NPEPFN
    from .tasks import get_task

    task = get_task(args.task)
    rng = jax.random.PRNGKey(args.seed)
    k_sim, k_obs, k_post = jax.random.split(rng, 3)
    theta, x = task.simulate(k_sim, args.num_sims)
    x_o, theta_true = _resolve_observation(task, args, k_obs)
    est = NPEPFN(prior=task.prior, model=_load_model())
    est.append_simulations(theta, x)
    samples = est.sample(args.num_samples, x=x_o, rng=k_post)
    _report(task, samples, theta_true, args.out)
    diag = getattr(est, "last_diagnostics", None)
    if diag:
        print(f"diagnostics: { {k: v for k, v in diag.items()} }")


def cmd_tsnpe(args):
    import jax

    from .tasks import get_task
    from .tsnpe import run_tsnpe

    task = get_task(args.task)
    rng = jax.random.PRNGKey(args.seed)
    k_obs, k_run, k_post = jax.random.split(rng, 3)
    x_o, theta_true = _resolve_observation(task, args, k_obs)
    est = run_tsnpe(
        task.simulator, task.prior, x_o,
        num_rounds=args.num_rounds, num_simulations=args.num_sims,
        rng=k_run, model=_load_model(),
    )
    samples = est.sample(args.num_samples, x=x_o, rng=k_post)
    _report(task, samples, theta_true, args.out)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m npe_pfn_tpu",
        description="TPU-native training-free simulation-based inference",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("info", help="version / checkpoint / devices").set_defaults(
        fn=cmd_info
    )
    sub.add_parser("tasks", help="list benchmark tasks").set_defaults(
        fn=cmd_tasks
    )
    p = sub.add_parser("sample", help="training-free posterior sampling")
    _common_sampling_args(p)
    p.set_defaults(fn=cmd_sample)
    p = sub.add_parser("tsnpe", help="sequential (truncated) inference")
    _common_sampling_args(p)
    p.add_argument("--num-rounds", type=int, default=3)
    p.set_defaults(fn=cmd_tsnpe)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
