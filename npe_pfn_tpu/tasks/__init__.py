"""Benchmark tasks: jittable/vmappable JAX simulators + priors.

The reference benchmarks against RoPEFM data files (pendulum,
high_dim_gaussian, wind_tunnel — loaded from .pt artifacts,
evaluate_ropefm.py:327-380) and sbibm-style toys in its demo (two moons,
demo.ipynb cell 2). Those data artifacts don't exist here, so the task suite
is the sbibm family named by BASELINE.json: every simulator is a pure
function ``sim(rng, theta) -> x`` that vmaps and jits on TPU — simulation
itself rides the accelerator, which the reference never does
(its simulators are host-side Python via sbi, tsnpe_pfn.py:86-91).
"""

from .registry import Task, get_task, list_tasks  # noqa: F401
