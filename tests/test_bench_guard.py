"""The bench chip-yield guard (bench.clear_tpu_chip).

Only one process may claim the remote TPU; the driver invokes `bench.py`
while a pretraining watchdog (scripts/pretrain_watchdog.sh) may hold the
chip. The guard must pause the watchdog, terminate its trainer child by
explicit PID, and resume the watchdog on interpreter exit so training
continues from the atomic checkpoint.
"""

import atexit
import os
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _proc_state(pid: int) -> str:
    with open(f"/proc/{pid}/stat") as f:
        return f.read().split()[2]


@pytest.fixture
def dummy_watchdog(tmp_path, monkeypatch):
    pidfile = tmp_path / "wd.pid"
    wd = subprocess.Popen(
        ["bash", "-c", f"echo $$ > {pidfile}; sleep 60 & wait"]
    )
    deadline = time.time() + 5
    while not pidfile.exists() and time.time() < deadline:
        time.sleep(0.05)
    monkeypatch.setenv("PRETRAIN_PIDFILE", str(pidfile))
    # conftest pins JAX_PLATFORMS=cpu, which makes the guard a no-op;
    # simulate the driver's TPU environment.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    yield wd
    try:
        os.kill(wd.pid, signal.SIGCONT)
        os.kill(wd.pid, signal.SIGKILL)
    except OSError:
        pass
    wd.wait()


def test_guard_pauses_watchdog_and_kills_trainer(dummy_watchdog, monkeypatch):
    # Shrink the chip-release waits so the test stays fast. bench.time is
    # this module's time object too — capture the real sleep first.
    real_sleep = time.sleep
    monkeypatch.setattr(bench.time, "sleep", lambda s: real_sleep(min(s, 0.2)))
    bench.clear_tpu_chip()
    wd_pid = dummy_watchdog.pid
    assert _proc_state(wd_pid) == "T"  # stopped, cannot relaunch the trainer
    kids = subprocess.run(
        ["ps", "-o", "stat=", "--ppid", str(wd_pid)],
        capture_output=True, text=True,
    ).stdout.split()
    assert all(s.startswith("Z") for s in kids)  # trainer dead (unreaped)
    # Interpreter exit resumes the watchdog (atexit hook).
    atexit._run_exitfuncs()
    time.sleep(0.3)
    assert _proc_state(wd_pid) != "T"


def test_guard_noop_on_cpu(dummy_watchdog, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.clear_tpu_chip()
    assert _proc_state(dummy_watchdog.pid) != "T"  # untouched


def test_guard_noop_without_pidfile(tmp_path, monkeypatch):
    monkeypatch.setenv("PRETRAIN_PIDFILE", str(tmp_path / "absent.pid"))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    bench.clear_tpu_chip()  # must not raise
