"""Multi-host smoke: jax.distributed over two local CPU processes.

The only line of the multihost path nothing else exercises is
`bin/train_vits --multihost`'s jax.distributed.initialize() + the
per-process data feeding (BucketBatcher rank striding ->
make_array_from_process_local_data in parallel/mesh.shard_batch). Two
local processes (coordinator + worker), each with 2 virtual CPU devices
(4 global), run ONE real training step of the tiny config through the
actual CLI entry. Reference analog: torchrun --nproc_per_node DDP init
(wetts/vits/train.py:43-58).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_train import make_dataset, tiny_cfg

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    manifest, pt, st = make_dataset(tmp_path, n=8)
    cfg_path = tmp_path / "cfg.json"
    cfg = tiny_cfg()
    cfg.train.log_interval = 1
    with open(cfg_path, "w") as f:
        json.dump(cfg.to_dict(), f)
    model_dir = tmp_path / "exp"
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=_REPO,
        )
        env.pop("WETTS_TEST_ISOLATED", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "wetts_tpu.bin.train_vits",
             "-c", str(cfg_path), "-m", str(model_dir),
             "--train_data", manifest, "--phone_table", pt,
             "--speaker_table", st, "--max_steps", "1",
             "--no_donate", "--plain_decoder", "--multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            cwd=_REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} failed rc={p.returncode}:\n{out[-4000:]}")

    # rank 0 logged exactly one finite step; rank 1 stayed silent
    metrics = [json.loads(line)
               for line in open(model_dir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics if "loss/g_total" in m]
    assert steps == [1], f"expected one rank-0 step record, got {steps}"
    assert np.isfinite(metrics[0]["loss/g_total"])
    # Trainer writes Orbax step dirs directly under the run dir
    assert any(d.isdigit() for d in os.listdir(model_dir))
