"""Honest timing in the TPU eval bundle (scripts/tpu_eval_bundle.py).

On the remote axon runtime `jax.block_until_ready` acks the dispatch, not
completion, so any timed region that does not end with a device→host
materialization overstates throughput by 100-700× (STATUS r3 #13/#16; the
round-3 bundles shipped an 884k samples/s headline this way). These tests
pin the fixed `timed()` helper: it must materialize every array leaf of the
result on the host before stopping the clock, and the headline section must
refuse to record a physically implausible rate.
"""

import importlib.util
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _load_bundle():
    spec = importlib.util.spec_from_file_location(
        "tpu_eval_bundle", os.path.join(_ROOT, "scripts", "tpu_eval_bundle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_timed_materializes_array_leaves(monkeypatch):
    bundle = _load_bundle()
    pulled = []
    real_asarray = np.asarray

    def spy_asarray(x, *a, **k):
        pulled.append(x)
        return real_asarray(x, *a, **k)

    monkeypatch.setattr(np, "asarray", spy_asarray)

    out, dt = bundle.timed(lambda: {"a": jnp.ones((4,)), "b": 3.0})
    assert set(out) == {"a", "b"}
    assert dt >= 0.0
    # The jnp array leaf must have been pulled to host inside the timed region.
    assert any(x is out["a"] for x in pulled)


def test_timed_handles_non_array_outputs():
    bundle = _load_bundle()
    out, dt = bundle.timed(lambda: 42)
    assert out == 42 and dt >= 0.0
    out, dt = bundle.timed(lambda: (jnp.zeros(()), "s", None))
    assert out[1] == "s"


def test_timed_clock_covers_host_transfer(monkeypatch):
    """The materialization cost must land INSIDE the measured interval:
    if np.asarray stalls, the reported time grows accordingly."""
    bundle = _load_bundle()
    real_asarray = np.asarray

    def slow_asarray(x, *a, **k):
        time.sleep(0.05)
        return real_asarray(x, *a, **k)

    monkeypatch.setattr(np, "asarray", slow_asarray)
    _, dt = bundle.timed(lambda: jnp.ones((2,)))
    assert dt >= 0.05


def test_headline_rejects_async_dispatch_rates():
    """A no-op-fast headline (>1e6 samples/s for 10k samples through the
    rejection path) is the async-leak signature and must raise, not be
    recorded as a result."""
    src = open(os.path.join(_ROOT, "scripts", "tpu_eval_bundle.py")).read()
    assert "async dispatch" in src and "1e6" in src
    # And timed() itself must not rely on block_until_ready as the barrier
    # (docstring excluded — it documents the gotcha by name).
    timed_src = src.split("def timed(")[1].split("\ndef ")[0]
    timed_code = timed_src.split('"""')[-1]
    assert "block_until_ready" not in timed_code
    assert "np.asarray" in timed_code
