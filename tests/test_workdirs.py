"""Scratch-directory lifecycle (flink_adcom_spark/workdirs.py).

The gate builders lean on two invariants: every gate_workdir() call starts
from an EMPTY directory (a stale file would feed committed checkpoints or
old batch_id partitions into the externally-gated streaming queries), and
roots left by dead processes are reaped — including the PID-reuse case
where a dead process's root carries OUR pid (ADVICE r10)."""

import os
import subprocess
import sys
import tempfile

from flink_adcom_spark import workdirs


def test_gate_workdir_fresh_generation():
    a = workdirs.gate_workdir("t_lifecycle")
    open(os.path.join(a, "stale.txt"), "w").write("x")
    b = workdirs.gate_workdir("t_lifecycle")
    assert b != a
    assert os.listdir(b) == []
    # previous generation survives (two-outstanding-builds window)
    assert os.path.exists(os.path.join(a, "stale.txt"))
    c = workdirs.gate_workdir("t_lifecycle")
    assert not os.path.exists(a)  # two generations back is reaped
    assert os.path.exists(b) and os.listdir(c) == []


def test_own_pid_root_wiped_at_import():
    """A root named for the CURRENT pid that exists when the module is first
    imported belongs to a dead pid-reuse predecessor: a fresh interpreter
    must wipe it rather than resurrect its checkpoints (ADVICE r10)."""
    code = (
        "import os, sys, tempfile\n"
        "root = os.path.join(tempfile.gettempdir(),"
        " f'spark_graft_gate_{os.getpid()}')\n"
        "os.makedirs(os.path.join(root, 'streamtag', 'g0'), exist_ok=True)\n"
        "marker = os.path.join(root, 'streamtag', 'g0', 'ckpt')\n"
        "open(marker, 'w').write('committed-by-dead-process')\n"
        "sys.path.insert(0, sys.argv[1])\n"
        "from flink_adcom_spark import workdirs\n"
        "assert not os.path.exists(marker), 'stale own-pid root survived import'\n"
        "d = workdirs.gate_workdir('streamtag')\n"
        "assert os.listdir(d) == [], 'gate dir not empty'\n"
        "print('CLEAN')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code, repo],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "CLEAN" in out.stdout


def test_dead_pid_sibling_reaped():
    base = tempfile.gettempdir()
    # pids are bounded by /proc/sys/kernel/pid_max; 2**22 is the Linux
    # ceiling, so +5 can never be a live pid
    dead = os.path.join(base, "spark_graft_gate_4194309")
    os.makedirs(dead, exist_ok=True)
    workdirs._reap_stale_roots()
    assert not os.path.exists(dead)
