"""GAN discriminators: multi-period / multi-scale / multi-resolution,
duration discriminators, WavLM (SLM) discriminator.

Behavioral parity targets (reference wetts/vits/model/discriminators.py):
- DiscriminatorP (:21-95): reflect-pad waveform to a period multiple,
  reshape to 2D, (k,1)-kernel conv stack,
- DiscriminatorS (:98-124): grouped 1D conv stack,
- DiscriminatorR (:127-225): complex STFT -> 2-channel 2D convs over 5
  frequency sub-bands (DC removal + peak norm first),
- MultiPeriodDiscriminator (:228-254) = S + P(2,3,5,7,11),
- MultiPeriodMultiResolutionDiscriminator (:256-283) = R(2048,1024,512) + Ps,
- DurationDiscriminatorV1/V2 (:287-449),
- WavLMDiscriminator (:452-498).

Waveforms are [B, T, 1]; every sub-discriminator returns (logits, fmap list).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.layers import (
    Conv1d,
    Conv2dTorch,
    Dense,
    LayerNorm,
    LRELU_SLOPE,
    get_padding,
)
from wetts_tpu.ops.spectral import stft_magnitude, hann_window, _dft_basis

Array = jax.Array

AVAILABLE_DURATION_DISCRIMINATOR_TYPES = ["dur_disc_1", "dur_disc_2"]


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    # im2col: compute the (k, 1) strided convs as explicit gather+matmul
    # (layers.Conv2dTorch im2col). Same math and params (equivalence incl.
    # grads pinned in tests/test_models.py::test_discriminator_im2col).
    # Default OFF: measured on v5e it made the full GAN train step 30%
    # SLOWER (141 vs 108 ms, tools/profile_components.py --what train) —
    # the backward of the tap-gather concat lowers to scatter-adds that
    # cost more than XLA's native strided-conv grad. Kept as the
    # documented negative result for the "discriminators are the hotspot"
    # investigation (round-5); the conv lowering is the faster path.
    im2col: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        """x: [B, T, 1] -> (flattened logits, feature maps)."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        # [B, T/p, p, C] — NHWC with H = frames, W = period
        x = x.reshape(b, t // self.period, self.period, c)
        fmap = []
        channels = [32, 128, 512, 1024]
        pad = get_padding(self.kernel_size, 1)
        for i, ch in enumerate(channels):
            x = Conv2dTorch(ch, (self.kernel_size, 1), (self.stride, 1),
                            (pad, 0), weight_norm=True,
                            im2col=self.im2col, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2dTorch(1024, (self.kernel_size, 1), (1, 1), (pad, 0),
                        weight_norm=True, im2col=self.im2col,
                        name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2dTorch(1, (3, 1), (1, 1), (1, 0), weight_norm=True,
                        name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        b = x.shape[0]
        fmap = []
        specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, p) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, padding=p, groups=g,
                       weight_norm=True, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


def _complex_spectrogram(y: Array, n_fft: int, hop: int) -> Array:
    """torchaudio Spectrogram(power=None, center=True) equivalent.

    y: [B, T] -> [B, F, n_bins, 2] (re, im channels)."""
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = y[:, idx]
    window = jnp.asarray(hann_window(n_fft))
    basis = jnp.asarray(_dft_basis(n_fft))
    spec = jnp.einsum("bfn,nk->bfk", frames * window[None, None, :], basis,
                      preferred_element_type=jnp.float32)
    n_bins = n_fft // 2 + 1
    return jnp.stack([spec[..., :n_bins], spec[..., n_bins:]], axis=-1)


class DiscriminatorR(nn.Module):
    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        b = x.shape[0]
        y = x[..., 0]  # [B, T]
        # DC removal + peak normalization (reference :189-200)
        y = y - jnp.mean(y, axis=-1, keepdims=True)
        y = 0.8 * y / (jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-9)
        spec = _complex_spectrogram(
            y, self.window_length, int(self.window_length * self.hop_factor))
        # [B, F_time, n_bins, 2] — NHWC with C = (re, im)
        n_bins = self.window_length // 2 + 1
        band_idx = [(int(lo * n_bins), int(hi * n_bins))
                    for lo, hi in self.bands]
        fmap = []
        outs = []
        for bi, (lo, hi) in enumerate(band_idx):
            h = spec[:, :, lo:hi, :]
            convs = [
                ((3, 9), (1, 1), (1, 4)),
                ((3, 9), (1, 2), (1, 4)),
                ((3, 9), (1, 2), (1, 4)),
                ((3, 9), (1, 2), (1, 4)),
                ((3, 3), (1, 1), (1, 1)),
            ]
            for i, (k, s, p) in enumerate(convs):
                h = Conv2dTorch(self.channels, k, s, p, weight_norm=True,
                                name=f"band{bi}_conv{i}")(h)
                h = nn.leaky_relu(h, 0.1)
                if i > 0:
                    fmap.append(h)
            outs.append(h)
        x = jnp.concatenate(outs, axis=2)  # concat along frequency
        x = Conv2dTorch(1, (3, 3), (1, 1), (1, 1), weight_norm=True,
                        name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    def setup(self):
        self.disc_s = DiscriminatorS(name="disc_s")
        self.disc_p = [DiscriminatorP(p, name=f"disc_p_{p}")
                       for p in self.periods]

    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in [self.disc_s, *self.disc_p]:
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiPeriodMultiResolutionDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)

    def setup(self):
        self.disc_r = [DiscriminatorR(w, name=f"disc_r_{w}")
                       for w in self.fft_sizes]
        self.disc_p = [DiscriminatorP(p, name=f"disc_p_{p}")
                       for p in self.periods]

    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in [*self.disc_r, *self.disc_p]:
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DurationDiscriminatorV1(nn.Module):
    """VITS2 duration discriminator, v1 (convs without norms, :287-369)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    def setup(self):
        pad = self.kernel_size // 2
        self.conv_1 = Conv1d(self.filter_channels, self.kernel_size,
                             padding=pad, name="conv_1")
        self.conv_2 = Conv1d(self.filter_channels, self.kernel_size,
                             padding=pad, name="conv_2")
        self.dur_proj = Conv1d(self.filter_channels, 1, name="dur_proj")
        self.pre_out_conv_1 = Conv1d(self.filter_channels, self.kernel_size,
                                     padding=pad, name="pre_out_conv_1")
        self.pre_out_conv_2 = Conv1d(self.filter_channels, self.kernel_size,
                                     padding=pad, name="pre_out_conv_2")
        self.output_layer = Dense(1, name="output_layer")

    def _probability(self, x, x_mask, dur):
        dur = self.dur_proj(dur)
        h = jnp.concatenate([x, dur], axis=-1)
        h = self.pre_out_conv_1(h * x_mask)
        h = self.pre_out_conv_2(h * x_mask)
        h = h * x_mask
        return jax.nn.sigmoid(self.output_layer(h))

    def __call__(self, x, x_mask, dur_r, dur_hat):
        x = jax.lax.stop_gradient(x)
        x = self.conv_1(x * x_mask)
        x = self.conv_2(x * x_mask)
        return [self._probability(x, x_mask, d) for d in (dur_r, dur_hat)]


class DurationDiscriminatorV2(nn.Module):
    """VITS2 duration discriminator, v2 (relu + LayerNorm, :372-449)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    def setup(self):
        pad = self.kernel_size // 2
        self.conv_1 = Conv1d(self.filter_channels, self.kernel_size,
                             padding=pad, name="conv_1")
        self.norm_1 = LayerNorm(self.filter_channels, name="norm_1")
        self.conv_2 = Conv1d(self.filter_channels, self.kernel_size,
                             padding=pad, name="conv_2")
        self.norm_2 = LayerNorm(self.filter_channels, name="norm_2")
        self.dur_proj = Conv1d(self.filter_channels, 1, name="dur_proj")
        self.pre_out_conv_1 = Conv1d(self.filter_channels, self.kernel_size,
                                     padding=pad, name="pre_out_conv_1")
        self.pre_out_norm_1 = LayerNorm(self.filter_channels,
                                        name="pre_out_norm_1")
        self.pre_out_conv_2 = Conv1d(self.filter_channels, self.kernel_size,
                                     padding=pad, name="pre_out_conv_2")
        self.pre_out_norm_2 = LayerNorm(self.filter_channels,
                                        name="pre_out_norm_2")
        self.output_layer = Dense(1, name="output_layer")

    def _probability(self, x, x_mask, dur):
        dur = self.dur_proj(dur)
        h = jnp.concatenate([x, dur], axis=-1)
        h = self.pre_out_conv_1(h * x_mask)
        h = jax.nn.relu(h)
        h = self.pre_out_norm_1(h)
        h = self.pre_out_conv_2(h * x_mask)
        h = jax.nn.relu(h)
        h = self.pre_out_norm_2(h)
        h = h * x_mask
        return jax.nn.sigmoid(self.output_layer(h))

    def __call__(self, x, x_mask, dur_r, dur_hat):
        x = jax.lax.stop_gradient(x)
        x = self.conv_1(x * x_mask)
        x = jax.nn.relu(x)
        x = self.norm_1(x)
        x = self.conv_2(x * x_mask)
        x = jax.nn.relu(x)
        x = self.norm_2(x)
        return [self._probability(x, x_mask, d) for d in (dur_r, dur_hat)]


class WavLMDiscriminator(nn.Module):
    """Discriminator over stacked frozen-WavLM hidden states (:452-498)."""

    slm_hidden: int = 768
    slm_layers: int = 13
    initial_channel: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: [B, T, slm_hidden * slm_layers] -> [B, T'] logits."""
        b = x.shape[0]
        ic = self.initial_channel
        x = Conv1d(ic, 1, weight_norm=True, name="pre")(x)
        for i, ch in enumerate([ic * 2, ic * 4, ic * 4]):
            x = Conv1d(ch, 5, padding=2, weight_norm=True,
                       name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
        x = Conv1d(1, 3, padding=1, weight_norm=True, name="conv_post")(x)
        return x.reshape(b, -1)
