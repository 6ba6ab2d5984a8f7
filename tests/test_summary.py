"""TensorBoard summaries + plotting (reference train.py:509-581 TB logs)."""

import os

import numpy as np

from tests.test_train import _no_persistent_cache  # noqa: F401 (autouse:
#   jaxlib 0.9.0 segfaults caching the mesh-sharded trainer executable)
from wetts_tpu.utils.summary import (
    Summary,
    plot_alignment_to_numpy,
    plot_spectrogram_to_numpy,
)


def test_plot_helpers_produce_images():
    spec = np.random.default_rng(0).standard_normal((20, 64))
    img = plot_spectrogram_to_numpy(spec)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    attn = np.abs(np.random.default_rng(1).standard_normal((30, 12)))
    img2 = plot_alignment_to_numpy(attn)
    assert img2.ndim == 3 and img2.shape[2] == 3


def test_summary_writes_event_files(tmp_path):
    s = Summary(str(tmp_path))
    s.scalars(1, {"loss/g_total": 1.5, "lr": 2e-4})
    s.image(1, "gen/mel", plot_spectrogram_to_numpy(np.zeros((8, 16))))
    s.audio(1, "gen/audio", np.zeros(800, np.float32), 8000)
    s.flush()
    s.close()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert files, os.listdir(tmp_path)
    assert os.path.getsize(os.path.join(tmp_path, files[0])) > 0


def test_trainer_writes_tb(tmp_path):
    """Trainer end-to-end: metrics + eval media land in model_dir/tb."""
    from tests.isolation import run_isolated

    if run_isolated("tests/test_summary.py::test_trainer_writes_tb"):
        return
    from tests.test_train import make_dataset, tiny_cfg
    from wetts_tpu.train.trainer import Trainer

    manifest, pt, st = make_dataset(tmp_path)
    cfg = tiny_cfg()
    cfg.train.eval_interval = 2
    model_dir = str(tmp_path / "exp")
    trainer = Trainer(cfg, model_dir, manifest, pt, st,
                      val_manifest=manifest, n_devices=2, donate=False,
                      use_fast_decoder=False)
    trainer.train(max_steps=2)
    tb_dir = os.path.join(model_dir, "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
