"""Run crash-prone tests in a fresh subprocess.

jaxlib 0.9.0's XLA:CPU compiler intermittently segfaults/aborts when
compiling the large mesh-sharded, donated-buffer GAN train-step executable
in a process that has already done substantial JAX work (reliably passes
in a fresh process; crashes take the whole pytest run down, not just the
test). Until the upstream bug is fixed, the mesh-trainer tests re-invoke
themselves under a fresh interpreter.
"""

from __future__ import annotations

import os
import subprocess
import sys

_ENV = "WETTS_TEST_ISOLATED"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_isolated(nodeid: str, timeout: int = 3600) -> bool:
    """If not already isolated, run `nodeid` in a subprocess and return
    True (the caller should then return immediately); inside the
    subprocess, return False so the test body executes."""
    if os.environ.get(_ENV):
        return False
    env = dict(os.environ)
    env[_ENV] = "1"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", nodeid, "-q", "-x"],
        cwd=_REPO, env=env, capture_output=True, timeout=timeout)
    if proc.returncode != 0:
        raise AssertionError(
            f"isolated test {nodeid} failed (exit {proc.returncode}):\n"
            f"{proc.stdout.decode()[-4000:]}\n{proc.stderr.decode()[-2000:]}")
    return True
