"""HiFi-GAN style waveform decoder.

Behavioral parity target: wetts/vits/model/decoders.py:15-218 —
conv_pre(7) -> N x [leaky_relu(0.1) -> weight-normed ConvTranspose upsample ->
multi-kernel MRF resblocks averaged] -> leaky_relu(default 0.01!) ->
conv_post(7, no bias) -> tanh; global speaker conditioning added after
conv_pre. ResBlock1 = 3x(dilated conv + plain conv); ResBlock2 = 2 dilated
convs.

This is the FLOP-dominant module (SURVEY §3.1 hot loop #4): all convs are
channel-last so XLA tiles them onto the MXU; upsampling is an input-dilated
conv (no gather/scatter).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    LRELU_SLOPE,
    get_padding,
)

Array = jax.Array


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: Array, x_mask: Optional[Array] = None) -> Array:
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        weight_norm=True, name=f"conv1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=1,
                        padding=get_padding(self.kernel_size, 1),
                        weight_norm=True, name=f"conv2_{i}")(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x: Array, x_mask: Optional[Array] = None) -> Array:
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        weight_norm=True, name=f"conv_{i}")(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class Generator(nn.Module):
    """[B, T, C_inter] latent -> [B, T * prod(upsample_rates), 1] waveform."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: Array, g: Optional[Array] = None) -> Array:
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2

        x = Conv1d(self.upsample_initial_channel, 7, padding=3,
                   name="conv_pre")(x)
        if g is not None and self.gin_channels != 0:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        for i, (u, k) in enumerate(
                zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                weight_norm=True, name=f"up_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes,
                        self.resblock_dilation_sizes)):
                r = res_cls(ch, rk, tuple(rd),
                            name=f"resblock_{i}_{j}")(x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
        # NB: default torch leaky_relu slope 0.01 here (decoders.py:78)
        x = nn.leaky_relu(x, 0.01)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)
