#!/usr/bin/env python
"""A/B-time the pretraining step: dense row attention vs the trainable
Pallas flash kernel.

Round-3 profiling (jax.profiler trace over 20 steps of the v3 recipe) showed
the step is HBM-bandwidth-bound, not small-matmul-bound: the dense row
attention materializes f32 score tensors of shape
[D=8, T=33, H=4, 768, 768] (~2.5 GB per materialization) in the forward and
again in the rematted backward — "convolution fusion" was 345 ms of the
465 ms device step. The flash kernel keeps scores in VMEM and never
materializes them, so it should win even at 768-row contexts (the "auto"
dispatch only enables it at >=2048 rows, a threshold tuned for inference).

This script times `train_step` with identical shapes under each mode and
prints one JSON line per mode so the winner can be wired into the v3/v4
pretraining recipe (`scripts/pretrain_tabica.py --flash on`).

Usage (pauses any live pretraining watchdog first — one TPU process rule):
    python scripts/profile_train_step.py --steps 20 --out results/train_step_ab.json
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flash", action="append", choices=["auto", "on", "off"],
                    help="modes to time (repeatable; default: off,on)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--num_datasets", type=int, default=8)
    ap.add_argument("--num_ctx", type=int, default=768)
    ap.add_argument("--num_qry", type=int, default=128)
    ap.add_argument("--num_bars", type=int, default=1024)
    ap.add_argument("--d_model", type=int, default=128)
    ap.add_argument("--num_heads", type=int, default=4,
                    help="row-attention score traffic scales with H "
                    "([D,T,H,N,N] f32) — fewer, wider heads cut the "
                    "dominant HBM term")
    ap.add_argument("--num_layers", type=int, default=6)
    ap.add_argument("--row_pool_slots", type=int, default=0,
                    help="pool each row's T tokens into K slots before row "
                    "attention (0 = dense); A/B the measured HBM lever")
    ap.add_argument("--scores_dtype", action="append",
                    choices=["float32", "bfloat16"],
                    help="storage dtype(s) of the dense-path attention "
                    "scores (repeatable; default: float32)")
    ap.add_argument("--num_experts", type=int, default=0,
                    help="MoE MLP experts per block (0 = dense); A/B the "
                    "capacity-at-flat-step-cost hypothesis (scores, not "
                    "MLP FLOPs, dominate the measured step)")
    ap.add_argument("--moe_top_k", type=int, default=2)
    ap.add_argument("--log_loss_every", type=int, default=0,
                    help="print the loss every N steps (loss-parity runs)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    modes = args.flash or ["off", "on"]
    sdts = args.scores_dtype or ["float32"]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.clear_tpu_chip()

    import jax

    from npe_pfn_tpu.models import TabICAConfig, TabICAModel
    from npe_pfn_tpu.pretrain import prior
    from npe_pfn_tpu.pretrain import train as T

    records = []
    for mode, sdt in [(m, d) for m in modes for d in sdts]:
        cfg = TabICAConfig(
            d_model=args.d_model,
            num_heads=args.num_heads,
            num_layers=args.num_layers,
            num_bars=args.num_bars,
            flash=mode,
            scores_dtype=sdt,
            row_pool_slots=args.row_pool_slots,
            num_experts=args.num_experts,
            moe_top_k=args.moe_top_k,
        )
        tcfg = T.TrainConfig(num_datasets=args.num_datasets, max_steps=1 << 30)
        pcfg = prior.PriorConfig(
            num_features=32,
            num_ctx=args.num_ctx,
            num_qry=args.num_qry,
            max_active_features=24,
        )
        model = TabICAModel.create(jax.random.PRNGKey(0), cfg)
        params = model.params
        opt_state = T.make_optimizer(tcfg).init(params)
        rng = jax.random.PRNGKey(1)

        def step(params, opt_state, i):
            return T.train_step(
                cfg, tcfg, pcfg, params, opt_state, model.borders,
                jax.random.fold_in(rng, i), None,
            )

        # Sync with a host transfer (float(loss)) every step, exactly like
        # the real training loop: on the remote axon runtime
        # block_until_ready returned early here (an "off" run timed at
        # 0.7 ms/step vs the live trainer's honest 500 ms/step), so
        # enqueue-only timing wildly overstates throughput.
        t0 = time.time()
        params, opt_state, loss, _ = step(params, opt_state, 0)
        float(loss)
        compile_s = time.time() - t0

        t0 = time.time()
        losses = []
        for i in range(1, args.steps + 1):
            params, opt_state, loss, _ = step(params, opt_state, i)
            l = float(loss)
            if args.log_loss_every and i % args.log_loss_every == 0:
                losses.append(round(l, 5))
        ms = (time.time() - t0) / args.steps * 1e3

        rec = {
            "flash": mode,
            "scores_dtype": sdt,
            "ms_per_step": round(ms, 1),
            "steps_per_s": round(1e3 / ms, 2),
            "compile_s": round(compile_s, 1),
            "loss_last": round(float(loss), 4),
            **({"loss_curve": losses} if losses else {}),
            "shapes": {
                "num_datasets": args.num_datasets,
                "num_ctx": args.num_ctx,
                "num_qry": args.num_qry,
                "d_model": args.d_model,
                "num_heads": args.num_heads,
                "num_layers": args.num_layers,
                "num_bars": args.num_bars,
                "num_experts": args.num_experts,
            },
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
