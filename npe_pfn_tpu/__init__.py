"""npe_pfn_tpu — a TPU-native simulation-based-inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``pruhlmann/npe-pfn``: training-free neural posterior estimation where a
pretrained tabular in-context transformer (TabICA, replacing the PyTorch
TabPFNv2 dependency) serves as the density estimator, plus truncated
sequential inference (TSNPE), support estimation, context filtering,
ratio-based density evaluation, and a full evaluation harness — all designed
for TPU: pure functions under jit, fixed shapes, lax.scan autoregression,
sharding over device meshes.
"""

__version__ = "0.1.0"

from . import models  # noqa: F401

__all__ = ["models", "__version__"]
