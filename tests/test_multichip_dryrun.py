"""Driver-gate regression test: dryrun_multichip(8) must finish in budget.

Round 1's driver gate (MULTICHIP_r01.json) failed rc=124: the full GAN
train step at the old dryrun config took >9 min of XLA:CPU compile on a
2-vCPU host, and persistent-cache serialization of the mesh-sharded
executable doubled it. This test runs the exact driver entry point in a
fresh subprocess under a hard timeout so a compile-cost regression is
caught locally before the driver sees it.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# observed ~230s end-to-end on an idle 2-vCPU host; leave headroom for
# compile-time variance but stay under any plausible driver budget
_BUDGET_S = 540


def test_dryrun_multichip_within_budget():
    env = dict(os.environ)
    # present the same environment the driver uses: virtual CPU devices
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, "-u", "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=_REPO, env=env, capture_output=True, timeout=_BUDGET_S)
    out = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, f"dryrun failed rc={proc.returncode}:\n{out[-4000:]}"
    assert "dryrun_multichip OK" in out
