"""Vocos-style iSTFT vocoder (alternative decoder).

Behavioral parity target: wetts/vits/model/decoders.py:221-308 —
ReflectionPad([1,0]) -> 1x1 in_conv -> N x ConvNeXt blocks (depthwise conv 3 +
LN + pointwise MLP with gelu + layer scale) -> LN -> 1x1 out_conv ->
(log-magnitude, phase) -> exp clamp 1e2 -> iSTFT (center=True).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.layers import Conv1d, LayerNorm
from wetts_tpu.ops.spectral import istft

Array = jax.Array


class ConvNeXtLayer(nn.Module):
    channels: int
    h_channels: int
    scale: float

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        x = Conv1d(self.channels, 3, padding=1, groups=self.channels,
                   name="dw_conv")(x)
        x = LayerNorm(self.channels, name="norm")(x)
        x = Conv1d(self.h_channels, 1, name="pw_conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = Conv1d(self.channels, 1, name="pw_conv2")(x)
        layer_scale = self.param(
            "scale", lambda key, shape: jnp.full(shape, self.scale),
            (self.channels,))
        return res + layer_scale * x


class VocosGenerator(nn.Module):
    in_channels: int
    channels: int
    h_channels: int
    out_channels: int  # 2 * (n_fft // 2 + 1)
    num_layers: int
    istft_n_fft: int = 1024
    istft_hop_length: int = 256
    istft_win_length: int = 1024
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: Array, g: Optional[Array] = None) -> Array:
        """x: [B, T, C] latent -> [B, T * hop, 1] waveform."""
        # ReflectionPad1d([1, 0]) on the time axis
        x = jnp.concatenate([x[:, 1:2], x], axis=1)
        x = Conv1d(self.channels, 1, name="in_conv")(x)
        if g is not None and self.gin_channels != 0:
            x = x + Conv1d(self.channels, 1, name="cond")(g)
        x = LayerNorm(self.channels, name="norm_pre")(x)
        scale = 1.0 / self.num_layers
        for i in range(self.num_layers):
            x = ConvNeXtLayer(self.channels, self.h_channels, scale,
                              name=f"layer_{i}")(x)
        x = LayerNorm(self.channels, name="norm_post")(x)
        x = Conv1d(self.out_channels, 1, name="out_conv")(x)
        half = self.out_channels // 2
        mag = jnp.minimum(jnp.exp(x[..., :half]), 1e2)
        phase = x[..., half:]
        audio = istft(mag * jnp.cos(phase), mag * jnp.sin(phase),
                      self.istft_n_fft, self.istft_hop_length,
                      self.istft_win_length, center=True)
        return audio[:, :, None]
