"""CLI entry point (`python -m npe_pfn_tpu`): registry/info commands and
argument validation. The heavy sampling commands are exercised end-to-end
manually / in the bundle; here we pin the cheap, always-on surface."""

import argparse
import json

import jax
import pytest

from npe_pfn_tpu import __main__ as cli
from npe_pfn_tpu.tasks import get_task


def test_tasks_command(capsys):
    cli.main(["tasks"])
    out = capsys.readouterr().out
    assert "two_moons" in out and "gaussian_linear" in out
    assert "posterior-sampler+log-prob" in out


def test_info_command(capsys):
    cli.main(["info"])
    rec = json.loads(capsys.readouterr().out)
    assert rec["version"] and rec["backend"] == "cpu"
    assert "checkpoint" in rec


def test_observation_validation():
    task = get_task("two_moons")
    args = argparse.Namespace(x_o=[1.0, 2.0, 3.0])  # dim_x is 2
    with pytest.raises(SystemExit):
        cli._resolve_observation(task, args, jax.random.PRNGKey(0))
    args = argparse.Namespace(x_o=[0.1, -0.2])
    x_o, theta_true = cli._resolve_observation(task, args, jax.random.PRNGKey(0))
    assert x_o.shape == (2,) and theta_true is None
    args = argparse.Namespace(x_o=None)
    x_o, theta_true = cli._resolve_observation(task, args, jax.random.PRNGKey(0))
    assert x_o.shape == (2,) and theta_true.shape == (2,)
