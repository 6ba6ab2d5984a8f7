"""MCD evaluation tool (bin/eval_mcd.py) unit tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

from wetts_tpu.bin.eval_mcd import (
    MCD_CONST,
    dtw_path,
    mcd_from_cepstra,
    mcd_wav,
    mel_cepstra,
)

SR = 22050


def _tone(freqs, n=SR // 2, amp=0.3):
    t = np.arange(n) / SR
    return amp * sum(np.sin(2 * np.pi * f * t) for f in freqs).astype(
        np.float32)


def test_mcd_identity_is_zero():
    x = _tone([220, 440])
    assert mcd_wav(x, x, SR) == pytest.approx(0.0, abs=1e-5)


def test_mcd_level_invariant():
    """MCD excludes c0, so a pure gain change (log-mel shifted by a
    constant) must score ~0. Broadband noise keeps every mel band above
    the log-compression floor, where the shift really is constant."""
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(SR // 2)).astype(np.float32)
    assert mcd_wav(0.5 * x, x, SR) == pytest.approx(0.0, abs=1e-3)


def test_mcd_differs_for_different_spectra():
    a = _tone([220])
    b = _tone([1760])
    assert mcd_wav(a, b, SR) > 1.0


def test_mcd_formula_matches_numpy_oracle():
    """mcd_from_cepstra on equal-length aligned cepstra == the closed-form
    expression (DTW of offset-free sequences is the diagonal)."""
    rng = np.random.default_rng(0)
    c1 = rng.standard_normal((20, 13)).astype(np.float32)
    c2 = c1 + 0.1 * rng.standard_normal((20, 13)).astype(np.float32)
    want = MCD_CONST * np.mean(
        np.sqrt(((c1[:, 1:] - c2[:, 1:]) ** 2).sum(axis=1)))
    # identical-shape, small-perturbation pair: the optimal path may still
    # skip frames, which can only LOWER the mean distance
    got = mcd_from_cepstra(c1, c2)
    naive = mcd_from_cepstra(c1, c2, use_dtw=False)
    assert naive == pytest.approx(want, rel=1e-6)
    assert got <= want * (1 + 1e-6)


def test_dtw_aligns_time_shift():
    """A time-shifted copy scores ~0 with DTW, clearly nonzero without."""
    x = np.concatenate([_tone([220], n=SR // 4), _tone([880], n=SR // 4)])
    shifted = np.concatenate([x[2048:], x[:2048]])
    with_dtw = mcd_wav(shifted, x, SR)
    without = mcd_wav(shifted, x, SR, use_dtw=False)
    assert with_dtw < without * 0.5


def test_dtw_path_monotonic():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((15, 4))
    b = rng.standard_normal((11, 4))
    ia, ib = dtw_path(a, b)
    assert ia[0] == 0 and ib[0] == 0
    assert ia[-1] == 14 and ib[-1] == 10
    assert (np.diff(ia) >= 0).all() and (np.diff(ib) >= 0).all()
    assert ((np.diff(ia) + np.diff(ib)) >= 1).all()


def test_mel_cepstra_shape():
    c = mel_cepstra(_tone([440]), SR)
    assert c.shape[1] == 13 and c.shape[0] > 20
    assert np.isfinite(c).all()


def test_cli_batch_mode(tmp_path):
    """End-to-end CLI: manifest + gen_dir pairing, JSON output."""
    from wetts_tpu.utils.wav import write_wav

    ref_dir = tmp_path / "ref"
    gen_dir = tmp_path / "gen"
    ref_dir.mkdir()
    gen_dir.mkdir()
    lines = []
    rng = np.random.default_rng(2)
    for i in range(2):
        # broadband noise: every mel band above the log floor, so the 0.8
        # gain difference lands almost entirely in the excluded c0
        x = (0.3 * rng.standard_normal(SR // 2)).astype(np.float32)
        write_wav(str(ref_dir / f"utt{i}.wav"), x, SR)
        write_wav(str(gen_dir / f"utt{i}.wav"), x * 0.8, SR)
        lines.append(f"{ref_dir}/utt{i}.wav|spk0|a b c")
    manifest = tmp_path / "test.txt"
    manifest.write_text("\n".join(lines) + "\n")
    proc = subprocess.run(
        [sys.executable, "-m", "wetts_tpu.bin.eval_mcd",
         "--test_file", str(manifest), "--gen_dir", str(gen_dir)],
        capture_output=True, text=True, check=True)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["n_pairs"] == 2
    # int16 wav round-trip + 0.8 gain: tiny but nonzero quantization MCD
    assert out["mean"] < 1.0
