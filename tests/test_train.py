"""End-to-end mini training: synthetic dataset -> 2 GAN steps -> resume."""

import json
import os

import numpy as np
import pytest

from wetts_tpu.config import Config


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """jaxlib 0.9.0's CPU backend can segfault/abort when serializing a
    mesh-sharded, donated-buffer executable into the persistent compilation
    cache (compilation_cache.put_executable_and_time) — the Trainer's
    train_step is exactly that shape. Skip persistent-cache writes for
    these tests; everything else in the suite still caches.

    The cache object is memoized at first use, so changing the config dir
    alone is a no-op once any earlier test compiled something —
    reset_cache() forces the config to be re-read."""
    import jax
    from jax._src import compilation_cache as cc

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    cc.reset_cache()


def make_dataset(tmp_path, n=6, sr=8000, hop=16):
    """Synthetic sine-wave corpus + manifest + tables."""
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir(exist_ok=True)
    from wetts_tpu.utils.wav import write_wav

    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        frames = int(rng.integers(40, 80))
        t = np.arange(frames * hop) / sr
        wav = 0.5 * np.sin(2 * np.pi * (100 + 50 * i) * t)
        path = str(wav_dir / f"u{i}.wav")
        write_wav(path, wav.astype(np.float32), sr)
        phones = " ".join(
            f"p{int(p)}" for p in rng.integers(0, 8, size=int(rng.integers(5, 12))))
        lines.append(f"{path}|spk{i % 2}|{phones}")
    manifest = tmp_path / "train.txt"
    manifest.write_text("\n".join(lines))
    phone_table = tmp_path / "phones.txt"
    phone_table.write_text("\n".join(f"p{i} {i}" for i in range(8)))
    speaker_table = tmp_path / "speakers.txt"
    speaker_table.write_text("spk0 0\nspk1 1")
    return str(manifest), str(phone_table), str(speaker_table)


def tiny_cfg():
    """Smallest config that exercises every train-step code path.

    Sized for XLA:CPU compile cost on a 2-vCPU CI host: 2 upsample stages
    (not the production 4) keep the full GAN step's compile under ~2 min —
    the r1 4-stage version took 19+ min and tripped a jaxlib 0.9.0 abort
    (see tests/isolation.py)."""
    return Config.from_dict({
        "train": {"segment_size": 256, "batch_size": 2, "log_interval": 1,
                  "eval_interval": 1000, "epochs": 10000},
        "data": {"filter_length": 128, "hop_length": 16, "win_length": 128,
                 "sampling_rate": 8000, "n_mel_channels": 20},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [4, 4], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8], "gin_channels": 8,
        },
    })


def test_dataset_and_batcher(tmp_path):
    from wetts_tpu.data.dataset import TTSDataset, read_table
    from wetts_tpu.data.sampler import BucketBatcher

    manifest, pt, st = make_dataset(tmp_path)
    cfg = tiny_cfg()
    ds = TTSDataset(manifest, read_table(pt), read_table(st), cfg.data)
    assert len(ds) == 6
    batcher = BucketBatcher(ds, 2, boundaries=(32, 64, 96), seed=1)
    batches = list(batcher(epoch=1))
    assert batches
    for b in batches:
        assert b.phone_ids.shape[0] == 2
        assert b.wav.shape[1] % cfg.data.hop_length == 0
        assert (b.spec_lengths * cfg.data.hop_length == b.wav_lengths).all()
        # epoch determinism
    ids1 = [i for _, i in batcher.epoch_batches(3)]
    ids2 = [i for _, i in batcher.epoch_batches(3)]
    assert ids1 == ids2
    assert ids1 != [i for _, i in batcher.epoch_batches(4)]


def test_trainer_two_steps_and_resume(tmp_path):
    from tests.isolation import run_isolated

    if run_isolated(
            "tests/test_train.py::test_trainer_two_steps_and_resume"):
        return
    from wetts_tpu.train.trainer import Trainer

    manifest, pt, st = make_dataset(tmp_path)
    cfg = tiny_cfg()
    model_dir = str(tmp_path / "exp")
    trainer = Trainer(cfg, model_dir, manifest, pt, st, n_devices=2,
                      donate=False, use_fast_decoder=False)
    final = trainer.train(max_steps=2)
    assert final == 2
    metrics = [json.loads(l) for l in
               open(os.path.join(model_dir, "metrics.jsonl"))]
    assert metrics and np.isfinite(metrics[-1]["loss/g_total"])

    # resume picks up from the saved step
    trainer2 = Trainer(cfg, model_dir, manifest, pt, st, n_devices=2,
                      donate=False, use_fast_decoder=False)
    assert trainer2.start_step == 2
    final2 = trainer2.train(max_steps=3)
    assert final2 == 3
