"""npe_pfn_tpu — a TPU-native simulation-based-inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``pruhlmann/npe-pfn``: training-free neural posterior estimation where a
pretrained tabular in-context transformer (TabICA, replacing the PyTorch
TabPFNv2 dependency) serves as the density estimator, plus truncated
sequential inference (TSNPE), support estimation, context filtering,
ratio-based density evaluation, and a full evaluation harness — all designed
for TPU: pure functions under jit, fixed shapes, lax.scan autoregression,
sharding over device meshes.

Public API parity with the reference's exports (reference __init__.py:1-12):
``NPEPFN`` ≙ TabPFN_Based_NPE_PFN, ``UnconditionalEstimator`` ≙
TabPFN_Based_Uncond_Estimator, ``run_tsnpe`` ≙ run_tsnpe_pfn.
"""

__version__ = "0.1.0"

from . import distributions, embeddings, filters, models, tasks  # noqa: F401
from .baselines import FlowNPE  # noqa: F401
from .estimator import NPEPFN, DensityRatioEstimator  # noqa: F401
from .rejection import accept_reject_sample  # noqa: F401
from .restricted_prior import RestrictedPrior  # noqa: F401
from .serving import CachedPosterior  # noqa: F401
from .support import PosteriorSupport, prereject_with_bounds  # noqa: F401
from .tsnpe import run_tsnpe, simulate_for_sbi  # noqa: F401
from .unconditional import UnconditionalEstimator  # noqa: F401

__all__ = [
    "NPEPFN",
    "DensityRatioEstimator",
    "FlowNPE",
    "PosteriorSupport",
    "RestrictedPrior",
    "CachedPosterior",
    "UnconditionalEstimator",
    "accept_reject_sample",
    "run_tsnpe",
    "simulate_for_sbi",
    "prereject_with_bounds",
    "distributions",
    "embeddings",
    "filters",
    "models",
    "tasks",
    "__version__",
]
