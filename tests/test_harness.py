"""Eval harness: grid evaluation, partial-result checkpointing, resume."""

import json

import jax
import pytest

import npe_pfn_tpu as npt
from npe_pfn_tpu.eval import harness
from npe_pfn_tpu.models import TabICAConfig, TabICAModel


@pytest.fixture(scope="module")
def small_kwargs():
    model = TabICAModel.create(
        jax.random.PRNGKey(0),
        TabICAConfig(d_model=32, num_heads=2, num_layers=2, max_features=8,
                     num_bars=16, dtype="float32"),
    )
    return {"model": model, "filter_context_size": 32, "qry_chunk": 16}


def test_harness_grid_and_resume(tmp_path, small_kwargs):
    task = npt.tasks.get_task("two_moons")
    path = str(tmp_path / "res.json")
    res = harness.evaluate_task(
        task, num_cal_grid=(10, 20), seeds=(0,), num_test=6,
        num_posterior_samples=16, estimator_kwargs=small_kwargs,
        results_path=path,
    )
    assert len(res["cells"]) == 2
    for cell in res["cells"].values():
        assert all(k in cell for k in ("c2st", "wasserstein", "mmd", "wall_s"))

    # Resume: cells are not recomputed (wall_s preserved identically).
    with open(path) as f:
        saved = json.load(f)
    res2 = harness.evaluate_task(
        task, num_cal_grid=(10, 20), seeds=(0,), num_test=6,
        num_posterior_samples=16, estimator_kwargs=small_kwargs,
        results_path=path,
    )
    for key in saved["cells"]:
        assert res2["cells"][key]["wall_s"] == saved["cells"][key]["wall_s"]

    summary = harness.summarize(res2)
    assert set(summary) == {10, 20}


def test_harness_image_task_conv_c2st(tmp_path, small_kwargs):
    """Image-shaped task: auto random-projection embedding + trained conv
    joint C2ST (reference CNN classifiers, evaluate_ropefm_batched.py:118-304)."""
    task = npt.tasks.get_task("gaussian_bump_image")
    assert task.x_image_shape == (32, 32)
    res = harness.evaluate_task(
        task, num_cal_grid=(16,), seeds=(0,), num_test=10,
        num_posterior_samples=8, estimator_kwargs=dict(small_kwargs),
        results_path=str(tmp_path / "bump.json"),
    )
    cell = res["cells"]["num_cal=16/seed=0"]
    assert 0.0 <= cell["c2st"] <= 1.0
