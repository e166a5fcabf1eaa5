"""Tracing, timing, and progress observability.

The reference has only ad-hoc wall-clock timing and tqdm bars (SURVEY §5:
time.perf_counter in tests, torch.cuda.synchronize-bracketed timers in
scripts/sampling_comparison.py:104-121, tqdm in the samplers). TPU-native
replacements:

- ``phase_timer``: wall-clock phase timing that blocks on device results
  (the synchronize analog) and accumulates a per-phase report;
- ``trace``: jax.profiler trace context producing xprof/TensorBoard dumps;
- ``progress``: lightweight host callback counter for the Python-level
  rejection loops (device-side loops are fully fused and need no bars).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class PhaseTimers:
    """Accumulating per-phase timers; device-synchronized."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: object = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_s": round(self.totals[k] / max(self.counts[k], 1), 4),
            }
            for k in sorted(self.totals)
        }

    def __str__(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/npe_pfn_tpu_trace") -> Iterator[str]:
    """jax.profiler trace context; open the dump with xprof/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Progress:
    """Minimal progress reporter for host-level accept/reject loops
    (tqdm analog, reference accept_reject_sampler.py:34-38) — prints only on
    change and only when enabled, so it costs nothing under jit."""

    def __init__(self, total: int, desc: str = "", enabled: bool = True):
        self.total = total
        self.desc = desc
        self.enabled = enabled
        self.n = 0
        self._t0 = time.perf_counter()

    def update(self, n: int) -> None:
        self.n += n
        if self.enabled:
            rate = self.n / max(time.perf_counter() - self._t0, 1e-9)
            print(
                f"\r{self.desc}: {self.n}/{self.total} ({rate:.0f}/s)",
                end="" if self.n < self.total else "\n",
                flush=True,
            )
