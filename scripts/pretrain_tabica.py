#!/usr/bin/env python
"""Pretrain the TabICA tabular in-context transformer on synthetic prior tasks.

This is the one-off offline phase that produces the frozen checkpoint shipped
with the framework (the analog of the TabPFNv2 weights the reference pulls in
as an external dependency). Run on TPU:

    python scripts/pretrain_tabica.py --max_steps 100000 \
        --ckpt checkpoints/tabica_v1.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from npe_pfn_tpu.models.config import TabICAConfig
from npe_pfn_tpu.pretrain import prior, train


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="checkpoints/tabica_v1.npz")
    p.add_argument("--log", default="checkpoints/train_log.jsonl")
    p.add_argument("--max_steps", type=int, default=200_000)
    p.add_argument("--num_datasets", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lr_trunk", type=float, default=None,
                   help="peak lr for the transformer trunk (head uses --lr); "
                        "use for warm-restart refinement")
    p.add_argument("--warmup_steps", type=int, default=2000)
    p.add_argument("--init_from", default=None,
                   help="warm-start params from this checkpoint (head "
                        "upsampled if num_bars differs)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--d_model", type=int, default=128)
    p.add_argument("--num_layers", type=int, default=6)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_bars", type=int, default=256)
    p.add_argument("--max_features", type=int, default=32)
    p.add_argument("--num_ctx", type=int, default=384)
    p.add_argument("--num_qry", type=int, default=128)
    p.add_argument("--time_limit_s", type=float, default=None)
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--val_every", type=int, default=500)
    p.add_argument("--no_resume", action="store_true")
    # v2 prior enrichment (see npe_pfn_tpu/pretrain/prior.py)
    p.add_argument("--p_heteroscedastic", type=float, default=0.0)
    p.add_argument("--p_heavy_tail", type=float, default=0.0)
    p.add_argument("--p_categorical_feats", type=float, default=0.0)
    p.add_argument("--p_multimodal", type=float, default=0.0,
                   help="family C share: explicit mixture conditionals")
    p.add_argument("--p_sym_fold", type=float, default=0.0,
                   help="fraction of inverse tasks with |.|-folded theta")
    p.add_argument("--max_mixture_components", type=int, default=4)
    p.add_argument("--mm_mu_input_scale", type=float, default=1.0,
                   help="scale x before the family-C mu/w MLPs; <1 makes "
                   "mode locations vary smoothly with x so thin modes are "
                   "learnable in context (results/DIAGNOSIS.md addendum)")
    p.add_argument("--mm_sig_lo", type=float, default=-2.5,
                   help="log10 lower bound of family-C component scales; "
                   "-1.7 keeps thin modes resolvable from ~500-row context")
    p.add_argument("--p_marginal_mixture", type=float, default=0.0,
                   help="fraction of family-C tasks that are pure marginal "
                   "mixtures (y independent of x) — teaches spike+slab "
                   "in-context density estimation (prior.py PriorConfig)")
    # Feature-count curriculum (see TrainConfig.feat_curriculum_steps)
    p.add_argument("--feat_curriculum_steps", type=int, default=0)
    p.add_argument("--feat_curriculum_init", type=int, default=8)
    p.add_argument("--max_active_features", type=int, default=None,
                   help="active-feature cap (default min(24, max_features))")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace over this many steps")
    p.add_argument("--profile_dir", default="/tmp/npe_pfn_tpu_pretrain_trace")
    p.add_argument("--scores_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="attention-score storage dtype; bfloat16 halves the "
                   "dominant HBM term of the step (softmax still reduces in "
                   "f32) — flip only with a measured loss-parity run")
    p.add_argument("--row_pool_slots", type=int, default=0,
                   help="Perceiver-style row-attention bottleneck: pool each "
                   "row's T cell tokens into K learned slots before row "
                   "attention (cuts the dominant HBM term from T*N^2 to "
                   "K*N^2, results/train_step_ab.json). 0 = off; requires a "
                   "from-scratch run")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="matmul compute dtype; float32 enables CPU smoke "
                   "runs (the CPU backend cannot execute bf16 dots)")
    p.add_argument("--num_experts", type=int, default=0,
                   help="mixture-of-experts MLP: experts per block (0 = "
                   "dense). Computed densely over experts (static shapes; "
                   "the step is HBM-bound on attention scores, so the extra "
                   "MLP FLOPs are largely hidden) — a capacity lever at "
                   "near-constant step cost; A/B with profile_train_step.py")
    p.add_argument("--moe_top_k", type=int, default=2,
                   help="experts each token is routed to (top-k gating)")
    p.add_argument("--moe_aux_weight", type=float, default=0.01,
                   help="weight of the Switch-style load-balance aux loss")
    p.add_argument("--flash", choices=["auto", "on", "off"], default="auto",
                   help="row-attention flash mode; 'auto' uses the dense path "
                   "below 2048 context rows, which profiling showed is "
                   "HBM-bound at pretraining shapes (scripts/"
                   "profile_train_step.py) — pass 'on' for the Pallas kernel")
    args = p.parse_args()

    cfg = TabICAConfig(
        d_model=args.d_model,
        num_heads=args.num_heads,
        num_layers=args.num_layers,
        max_features=args.max_features,
        num_bars=args.num_bars,
        dtype=args.dtype,
        flash=args.flash,
        scores_dtype=args.scores_dtype,
        row_pool_slots=args.row_pool_slots,
        num_experts=args.num_experts,
        moe_top_k=args.moe_top_k,
    )
    tcfg = train.TrainConfig(
        num_datasets=args.num_datasets,
        lr=args.lr,
        lr_trunk=args.lr_trunk,
        warmup_steps=args.warmup_steps,
        max_steps=args.max_steps,
        seed=args.seed,
        ckpt_every=args.ckpt_every,
        val_every=args.val_every,
        feat_curriculum_steps=args.feat_curriculum_steps,
        feat_curriculum_init=args.feat_curriculum_init,
        moe_aux_weight=args.moe_aux_weight,
    )
    pcfg = prior.PriorConfig(
        num_features=args.max_features,
        num_ctx=args.num_ctx,
        num_qry=args.num_qry,
        max_active_features=(
            args.max_active_features
            if args.max_active_features is not None
            else min(24, args.max_features)
        ),
        p_heteroscedastic=args.p_heteroscedastic,
        p_heavy_tail=args.p_heavy_tail,
        p_categorical_feats=args.p_categorical_feats,
        p_multimodal=args.p_multimodal,
        p_sym_fold=args.p_sym_fold,
        max_mixture_components=args.max_mixture_components,
        mm_mu_input_scale=args.mm_mu_input_scale,
        mm_sig_lo=args.mm_sig_lo,
        p_marginal_mixture=args.p_marginal_mixture,
    )

    import jax

    print(f"devices: {jax.devices()}")
    from npe_pfn_tpu.models import transformer

    n_params = transformer.param_count(transformer.init_params(jax.random.PRNGKey(0), cfg))
    print(f"model params: {n_params/1e6:.2f}M")

    train.train(
        cfg,
        tcfg,
        pcfg,
        ckpt_path=args.ckpt,
        resume=not args.no_resume,
        log_path=args.log,
        time_limit_s=args.time_limit_s,
        init_from=args.init_from,
        profile_steps=args.profile_steps,
        profile_dir=args.profile_dir,
    )


if __name__ == "__main__":
    main()
