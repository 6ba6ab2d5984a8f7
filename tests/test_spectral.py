"""Spectral ops vs torch.stft / reference formulas (torch CPU as oracle).

The oracle code below reimplements the reference pipeline's *published
semantics* (reflect pad (n_fft-hop)/2, center=False torch.stft, hann window,
sqrt(pow^2 + 1e-6), slaney mel, log-clamp 1e-5) using torch directly.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from wetts_tpu.ops import (
    stft_magnitude,
    mel_filterbank,
    mel_spectrogram,
    spec_to_mel,
    dynamic_range_compression,
)


def torch_spectrogram(y: np.ndarray, n_fft, hop, win) -> np.ndarray:
    yt = torch.from_numpy(y)
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True)
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6)
    return mag.numpy()  # [B, n_bins, F]


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (512, 128, 512)])
def test_stft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, hop * 40)).astype(np.float32) * 0.5
    got = np.asarray(stft_magnitude(jnp.asarray(y), n_fft, hop, win))  # [B,F,bins]
    want = torch_spectrogram(y, n_fft, hop, win).transpose(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_stft_frame_count():
    y = jnp.zeros((1, 256 * 32))
    spec = stft_magnitude(y, 1024, 256, 1024)
    assert spec.shape == (1, 32, 513)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every filter has some support, triangles overlap neighbours only
    assert (fb.sum(axis=0) > 0).all()
    # slaney norm: filters integrate to ~2/bandwidth -> peak values are small
    assert fb.max() < 0.1


def test_mel_filterbank_against_known_values():
    # Spot-check the slaney-scale breakpoints: mel(1000 Hz) == 15.0,
    # and the filterbank on an all-ones spectrum equals the column sums.
    from wetts_tpu.ops.spectral import _hz_to_mel_slaney, _mel_to_hz_slaney
    assert abs(_hz_to_mel_slaney(1000.0) - 15.0) < 1e-9
    np.testing.assert_allclose(_mel_to_hz_slaney(_hz_to_mel_slaney(4321.0)), 4321.0)


def test_mel_spectrogram_pipeline():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, 256 * 20)).astype(np.float32) * 0.3
    mel = np.asarray(mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024))
    assert mel.shape == (2, 20, 80)
    # oracle: torch stft -> numpy mel matmul -> log clamp
    spec = torch_spectrogram(y, 1024, 256, 1024).transpose(0, 2, 1)
    fb = mel_filterbank(22050, 1024, 80)
    want = np.log(np.clip(spec @ fb, 1e-5, None))
    np.testing.assert_allclose(mel, want, atol=5e-4, rtol=1e-3)


def test_spec_to_mel_consistency():
    rng = np.random.default_rng(2)
    spec = jnp.asarray(np.abs(rng.standard_normal((1, 10, 513))).astype(np.float32))
    mel = spec_to_mel(spec, 1024, 80, 22050)
    assert mel.shape == (1, 10, 80)


def test_dynamic_range_compression_clamps():
    x = jnp.array([0.0, 1e-7, 1.0])
    out = np.asarray(dynamic_range_compression(x))
    np.testing.assert_allclose(out[:2], np.log(1e-5), rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-7)
