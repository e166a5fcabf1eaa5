"""The bench chip-yield guard (bench.clear_tpu_chip).

Only one process may claim the remote TPU; the driver invokes `bench.py`
while a pretraining watchdog (scripts/pretrain_watchdog.sh) or a
measurement queue (scripts/round4_tpu_queue.sh + run_with_watchdog.sh
stage wrappers) may hold the chip. The guard must freeze every supervisor
in those trees by explicit PID (never pattern matching), terminate the
python leaves that actually claim the chip, and resume the supervisors on
interpreter exit so the dead stage relaunches from its atomic saves.
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


def _wait_for(path, secs=5.0):
    deadline = time.time() + secs
    while not os.path.exists(str(path)) and time.time() < deadline:
        time.sleep(0.05)


def _tree_pids(root: int):
    out = subprocess.run(
        ["ps", "-o", "pid=", "--ppid", str(root)],
        capture_output=True, text=True,
    ).stdout.split()
    pids = []
    for k in out:
        pids.append(int(k))
        pids.extend(_tree_pids(int(k)))
    return pids


def _cleanup_tree(root: int):
    for pid in [root] + _tree_pids(root):
        for sig in (signal.SIGCONT, signal.SIGKILL):
            try:
                os.kill(pid, sig)
            except OSError:
                pass


@pytest.fixture
def dummy_watchdog(tmp_path, monkeypatch):
    """bash watchdog with a python 'trainer' child, like pretrain_watchdog."""
    pidfile = tmp_path / "wd.pid"
    wd = subprocess.Popen(
        ["bash", "-c",
         f"echo $$ > {pidfile}; python -c 'import time; time.sleep(60)' & wait"]
    )
    _wait_for(pidfile)
    time.sleep(0.3)  # let the python child exist
    monkeypatch.setenv("PRETRAIN_PIDFILE", str(pidfile))
    # Point the queue pidfile away from any REAL live queue on this host.
    monkeypatch.setenv("QUEUE_PIDFILE", str(tmp_path / "no_queue.pid"))
    # conftest pins JAX_PLATFORMS=cpu, which makes the guard a no-op;
    # simulate the driver's TPU environment.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    yield wd
    _cleanup_tree(wd.pid)
    wd.wait()


@pytest.fixture
def dummy_queue(tmp_path, monkeypatch):
    """queue bash -> stage-watchdog bash -> python, like round4_tpu_queue."""
    pidfile = tmp_path / "queue.pid"
    q = subprocess.Popen(
        ["bash", "-c",
         f"echo $$ > {pidfile}; "
         "bash -c \"python -c 'import time; time.sleep(60)' & wait\" & wait"]
    )
    _wait_for(pidfile)
    time.sleep(0.4)  # let the inner tree exist
    monkeypatch.setenv("QUEUE_PIDFILE", str(pidfile))
    monkeypatch.setenv("PRETRAIN_PIDFILE", str(tmp_path / "no_wd.pid"))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    yield q
    _cleanup_tree(q.pid)
    q.wait()


def _fast_sleeps(monkeypatch):
    # Shrink the chip-release waits so the test stays fast. bench.time is
    # this module's time object too — capture the real sleep first.
    real_sleep = time.sleep
    monkeypatch.setattr(bench.time, "sleep", lambda s: real_sleep(min(s, 0.2)))


def test_guard_pauses_watchdog_and_kills_trainer(dummy_watchdog, monkeypatch):
    _fast_sleeps(monkeypatch)
    bench.clear_tpu_chip()
    wd_pid = dummy_watchdog.pid
    assert _proc_state(wd_pid) == "T"  # stopped, cannot relaunch the trainer
    kids = subprocess.run(
        ["ps", "-o", "stat=", "--ppid", str(wd_pid)],
        capture_output=True, text=True,
    ).stdout.split()
    assert kids and all(s.startswith("Z") for s in kids)  # trainer dead
    # Interpreter exit resumes the watchdog (atexit hook).
    atexit._run_exitfuncs()
    time.sleep(0.3)
    assert _proc_state(wd_pid) != "T"


def test_guard_freezes_queue_tree_and_kills_leaf(dummy_queue, monkeypatch):
    _fast_sleeps(monkeypatch)
    q_pid = dummy_queue.pid
    before = _tree_pids(q_pid)
    assert before, "queue tree failed to start"
    bench.clear_tpu_chip()
    assert _proc_state(q_pid) == "T"  # queue frozen: no next stage launches
    shells_stopped, python_dead = 0, 0
    for pid in before:
        try:
            state = _proc_state(pid)
        except OSError:
            python_dead += 1  # reaped already
            continue
        with open(f"/proc/{pid}/comm") as f:
            name = f.read().strip()
        if name.startswith("python"):
            assert state.startswith("Z") or state == "X"
            python_dead += 1
        else:
            assert state == "T"
            shells_stopped += 1
    assert shells_stopped >= 1 and python_dead >= 1
    # Interpreter exit resumes every frozen supervisor.
    atexit._run_exitfuncs()
    time.sleep(0.3)
    assert _proc_state(q_pid) != "T"


def test_guard_noop_on_cpu(dummy_watchdog, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.clear_tpu_chip()
    assert _proc_state(dummy_watchdog.pid) != "T"  # untouched


def test_guard_skips_own_ancestor_chain(tmp_path, monkeypatch):
    """bench launched AS A QUEUE STAGE must not freeze/kill its own tree.

    Regression: round5_tpu_queue.sh stage 2 runs bench.py as a descendant
    of the process named by /tmp/queue.pid; the guard walked that tree,
    SIGSTOPped bench's own supervisors and SIGTERMed bench itself, so both
    bench stages silently produced nothing.
    """
    own = tmp_path / "queue.pid"
    own.write_text(str(os.getpid()))  # self is trivially its own ancestor
    parent = tmp_path / "wd.pid"
    parent.write_text(str(os.getppid()))
    monkeypatch.setenv("QUEUE_PIDFILE", str(own))
    monkeypatch.setenv("PRETRAIN_PIDFILE", str(parent))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    bench.clear_tpu_chip()  # must be a no-op, not self-termination
    assert _proc_state(os.getpid()) in ("R", "S", "D")
    if os.getppid() > 1:
        assert _proc_state(os.getppid()) != "T"


def test_guard_noop_without_pidfile(tmp_path, monkeypatch):
    monkeypatch.setenv("PRETRAIN_PIDFILE", str(tmp_path / "absent.pid"))
    monkeypatch.setenv("QUEUE_PIDFILE", str(tmp_path / "absent2.pid"))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    bench.clear_tpu_chip()  # must not raise
