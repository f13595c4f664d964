"""Multi-host (DCN) seam: the 2-process jax.distributed CPU dryrun must pass.

Covers SURVEY.md §2.5's "DCN via jax.distributed.initialize" claim — the
in-process tests can't: a real multi-host mesh needs separate OS processes
with their own JAX runtimes, so this test shells out to
``tools/dryrun_multihost.py`` (2 processes x 2 virtual CPU devices, one real
DP train step in both gspmd and shard_map modes, cross-host loss equality).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_dp_step():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=340, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIHOST-DRYRUN-OK" in proc.stdout, proc.stdout + proc.stderr
