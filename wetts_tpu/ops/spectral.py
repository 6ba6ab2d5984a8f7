"""STFT / mel-spectrogram DSP matching the reference numerics.

Behavioral parity targets (reference: wetts/vits/utils/mel_processing.py):
- reflect-pad by (n_fft - hop)/2 on both sides, then center=False STFT with a
  periodic Hann window (mel_processing.py:42-76),
- magnitude = sqrt(re^2 + im^2 + 1e-6)  (mel_processing.py:74),
- mel filterbank = librosa-style slaney-scale, slaney-normalized triangles
  (mel_processing.py:80-95; reimplemented from the published formula, librosa
  is not a dependency),
- log-compression log(clamp(x, min=1e-5)) (mel_processing.py:10-12).

TPU-first design: frames are extracted with a strided gather and the DFT is a
single [n_frames, n_fft] x [n_fft, 2*n_bins] matmul against a precomputed real
Fourier basis -> lands on the MXU, batched over B. No FFT primitive is needed
and the whole pipeline (frame, window, matmul, magnitude, mel matmul, log) is
one fused XLA computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Window / basis / filterbank construction (host-side, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int) -> np.ndarray:
    """[n_fft, 2 * n_bins] real DFT basis (cos | -sin columns)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_part = min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_part, f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """[n_bins, n_mels] slaney-scale, slaney-normalized mel filterbank.

    Numerically equivalent to librosa.filters.mel(htk=False, norm='slaney')
    transposed, which is what the reference multiplies spectrograms by
    (mel_processing.py:87-95).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)  # [n_mels + 2]
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]  # [n_mels+2, n_bins]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


# ---------------------------------------------------------------------------
# jit-side ops
# ---------------------------------------------------------------------------


def frame_signal(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """[B, T] -> [B, n_frames, n_fft] strided frames (one XLA gather)."""
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return y[:, idx]


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    eps: float = 1e-6,
) -> jax.Array:
    """Reflect-padded, center=False STFT magnitude.

    y: [B, T] waveform -> [B, n_frames, n_bins] magnitudes with
    n_frames = T // hop (for T a multiple of hop), matching
    mel_processing.spectrogram_torch (reference :42-76).
    """
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)  # [B, F, n_fft]
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:  # torch zero-pads the window symmetrically
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    basis = jnp.asarray(_dft_basis(n_fft))  # [n_fft, 2*n_bins]
    spec = jnp.einsum(
        "bfn,nk->bfk", frames * window[None, None, :], basis,
        preferred_element_type=jnp.float32,
    )
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return jnp.sqrt(re * re + im * im + eps)


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5, c: float = 1.0) -> jax.Array:
    """log(clamp(x, clip_val) * C) (reference mel_processing.py:10-12)."""
    return jnp.log(jnp.clip(x, min=clip_val) * c)


def spectrogram(y: jax.Array, n_fft: int, hop_length: int, win_length: int) -> jax.Array:
    """Linear-magnitude spectrogram, [B, T] -> [B, F, n_bins]."""
    return stft_magnitude(y, n_fft, hop_length, win_length)


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """[B, F, n_bins] linear magnitudes -> [B, F, n_mels] log-mel."""
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    return dynamic_range_compression(
        jnp.einsum("bfk,km->bfm", spec, fb, preferred_element_type=jnp.float32)
    )


@functools.lru_cache(maxsize=None)
def _idft_basis(n_fft: int) -> np.ndarray:
    """[2 * n_bins, n_fft] inverse real-DFT basis (irfft as one matmul)."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    cos_b = (c * np.cos(ang)) / n_fft
    sin_b = (-c * np.sin(ang)) / n_fft
    return np.concatenate([cos_b, sin_b], axis=0).astype(np.float32)


def istft(
    spec_real: jax.Array,
    spec_imag: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
) -> jax.Array:
    """Inverse STFT with hann window + overlap-add (torch.istft semantics).

    spec_real/spec_imag: [B, F, n_bins] -> waveform [B, (F-1)*hop] when
    center=True (the torchaudio.InverseSpectrogram config used by the Vocos
    decoder, reference decoders.py:281-304).

    TPU-first: irfft is a single matmul with a precomputed inverse basis;
    overlap-add exploits hop | n_fft by summing R = n_fft/hop shifted copies
    (no scatter).
    """
    assert n_fft % hop_length == 0, "istft requires hop | n_fft"
    b, f, _ = spec_real.shape
    basis = jnp.asarray(_idft_basis(n_fft))
    frames = jnp.einsum(
        "bfk,kt->bft", jnp.concatenate([spec_real, spec_imag], axis=-1), basis,
        preferred_element_type=jnp.float32)  # [B, F, n_fft]
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, None, :]

    r = n_fft // hop_length
    total = (f - 1) * hop_length + n_fft
    # chunk c of frame m lands at output block m + c (blocks of size hop)
    chunks = frames.reshape(b, f, r, hop_length)
    out = jnp.zeros((b, f + r - 1, hop_length))
    for c in range(r):
        out = out.at[:, c : c + f].add(chunks[:, :, c])
    out = out.reshape(b, total)

    wsq = (window * window)[None, :].reshape(1, r, hop_length)
    env = jnp.zeros((f + r - 1, hop_length))
    for c in range(r):
        env = env.at[c : c + f].add(jnp.broadcast_to(wsq[:, c], (f, hop_length)))
    env = env.reshape(total)
    out = out / jnp.maximum(env, 1e-11)[None, :]

    if center:
        half = n_fft // 2
        out = out[:, half : total - half]
    return out


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """[B, T] waveform -> [B, F, n_mels] log-mel (reference :114-182)."""
    spec = stft_magnitude(y, n_fft, hop_length, win_length)
    return spec_to_mel(spec, n_fft, n_mels, sample_rate, fmin, fmax)
