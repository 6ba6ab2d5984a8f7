"""iSTFT op vs torch.istft (torchaudio.InverseSpectrogram semantics)."""

import numpy as np
import jax.numpy as jnp
import torch

from wetts_tpu.ops.spectral import istft


def test_istft_matches_torch():
    rng = np.random.default_rng(0)
    n_fft, hop, win = 256, 64, 256
    f = 12
    n_bins = n_fft // 2 + 1
    re = rng.standard_normal((2, f, n_bins)).astype(np.float32)
    im = rng.standard_normal((2, f, n_bins)).astype(np.float32)
    im[:, :, 0] = 0.0
    im[:, :, -1] = 0.0
    got = np.asarray(istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop, win))
    spec = torch.complex(torch.from_numpy(re), torch.from_numpy(im))
    want = torch.istft(
        spec.transpose(1, 2), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=True).numpy()
    assert got.shape == want.shape == (2, (f - 1) * hop)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_istft_roundtrip():
    # stft -> istft reconstructs the interior of the signal
    from wetts_tpu.ops.spectral import hann_window, _dft_basis, frame_signal
    rng = np.random.default_rng(1)
    n_fft, hop = 256, 64
    t = hop * 40
    y = rng.standard_normal((1, t)).astype(np.float32)
    yt = torch.from_numpy(y)
    spec = torch.stft(yt, n_fft, hop, window=torch.hann_window(n_fft),
                      center=True, return_complex=True)
    re = jnp.asarray(spec.real.numpy().transpose(0, 2, 1))
    im = jnp.asarray(spec.imag.numpy().transpose(0, 2, 1))
    rec = np.asarray(istft(re, im, n_fft, hop, n_fft))
    np.testing.assert_allclose(rec[0, : t], y[0], atol=1e-4)
