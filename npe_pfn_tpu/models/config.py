"""Model configuration for the TabICA in-context tabular transformer.

TabICA ("Tabular In-Context Attention") is this framework's from-scratch,
TPU-native replacement for the external PyTorch TabPFNv2 package that the
reference depends on (reference: pyproject.toml:15 pins `tabpfn 2.2.1`;
invoked at npe_pfn.py:140-146). The reference treats that model as an opaque
`fit(X, y)` + `predict(X, output_type="full")` black box; here the model is a
pure function of (params, context, query) so the whole autoregressive
sampling loop can live under one `jax.jit`.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TabICAConfig:
    """Hyperparameters of the two-axis in-context tabular transformer.

    The architecture follows the TabPFNv2 *scheme* (per-cell tokens, attention
    across the feature axis and across the row axis, piecewise-constant "bar
    distribution" regression head) but is an original design sized to be
    pretrained from scratch on synthetic prior tasks on a single TPU chip.
    """

    # Width of every cell token.
    d_model: int = 128
    # Attention heads (shared count for feature-axis and row-axis attention).
    num_heads: int = 4
    # Transformer blocks; each block = feature-attn + row-attn + MLP.
    num_layers: int = 6
    # MLP hidden expansion factor.
    mlp_ratio: int = 4
    # Maximum number of input feature columns the model is trained for.
    # Inference-time inputs are padded/masked to this width.
    max_features: int = 32
    # Number of buckets of the bar-distribution regression head.
    num_bars: int = 256
    # Numerical range (in context-normalized target units) covered by the
    # finite bar borders; the two edge buckets carry half-normal tails.
    bar_range: float = 6.0
    # Dropout is intentionally 0: the model is used frozen at inference and
    # pretraining uses fresh synthetic data every step (no overfitting risk).
    dropout: float = 0.0
    # Compute dtype for matmuls ("bfloat16" on TPU, "float32" for tests).
    dtype: str = "bfloat16"
    # Storage dtype of the materialized attention-score tensors in the dense
    # row-attention path. The train step is HBM-bound on these [D,T,H,N,N]
    # tensors (results/train_step_ab.json), so "bfloat16" halves the dominant
    # traffic; softmax still reduces in float32 (max/exp/sum accumulate in
    # f32 registers — only the HBM-resident tensor is bf16). Default stays
    # f32: flip per-run once loss parity is measured (scripts/
    # profile_train_step.py --scores_dtype).
    scores_dtype: str = "float32"
    # Perceiver-style row-attention bottleneck: pool each row's T=F+1 cell
    # tokens into this many learned slots (cross-attention), run row-axis
    # attention on the slots only, and scatter back to the tokens with a
    # second cross-attention. The measured train-step cost is HBM-bound on
    # the per-token row-attention score tensors [T, H, N, N]
    # (results/train_step_ab.json) — pooling cuts that dominant term from
    # T*N^2 to K*N^2 (~4x at T=33, K=8) and shrinks the serving K/V cache
    # the same way. 0 disables (the shipped v1-v4 checkpoints use 0);
    # requires a from-scratch pretrain to evaluate.
    row_pool_slots: int = 0
    # Mixture-of-experts MLP: number of expert MLPs per block (0 = dense,
    # the shipped v1-v4 checkpoints). Routing is per-cell-token top-k with
    # a learned linear router; all experts are computed densely and combined
    # by the (masked-softmax) gate weights. Dense-all-experts is deliberate
    # on TPU at small expert counts: static shapes, no sort/scatter dispatch,
    # every matmul stays MXU-shaped — and because the measured train step is
    # HBM-bound on attention scores (results/train_step_ab.json), the extra
    # MLP FLOPs are largely hidden. Expert parallelism
    # (parallel/expert_parallel.py) shards the expert axis over an "ep" mesh
    # axis; GSPMD turns the gate-weighted combine into the psum.
    num_experts: int = 0
    # Experts each token is routed to (top-k gating); must be <= num_experts.
    moe_top_k: int = 2
    # Row-axis flash attention (Pallas): "auto" enables it on TPU for long
    # contexts, "on"/"off" force it. Static jit argument — switching it
    # retraces, as it must.
    flash: str = "auto"
    # Run the Pallas kernel in interpreter mode (CPU tests only).
    flash_interpret: bool = False

    def __post_init__(self):
        if self.num_experts and not (1 <= self.moe_top_k <= self.num_experts):
            raise ValueError(
                f"moe_top_k={self.moe_top_k} must be in [1, num_experts="
                f"{self.num_experts}]"
            )

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.num_heads == 0
        return self.d_model // self.num_heads
