"""WaveNet residual stack (WN) — posterior encoder / coupling nets.

Behavioral parity target: wetts/vits/model/modules.py:10-95 — dilated convs
with gated tanh/sigmoid activation, global speaker conditioning projected once
to 2*H*n_layers channels, residual/skip split, weight norm on every conv.

Channel-last; the per-layer loop is unrolled at trace time (n_layers is
static), letting XLA pipeline the dilated convs.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn
import jax.numpy as jnp

from wetts_tpu.models.layers import Conv1d, fused_add_tanh_sigmoid_multiply

Array = jax.Array


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, g: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        assert self.kernel_size % 2 == 1
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)

        g_all = None
        if g is not None and self.gin_channels > 0:
            g_all = Conv1d(2 * h * self.n_layers, 1, weight_norm=True,
                           name="cond_layer")(g)  # [B, 1, 2H*L]

        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(2 * h, self.kernel_size, padding=padding,
                          dilation=dilation, weight_norm=True,
                          name=f"in_{i}")(x)
            if g_all is not None:
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = drop(fused_add_tanh_sigmoid_multiply(x_in, g_l, h))
            if i < self.n_layers - 1:
                res_skip = Conv1d(2 * h, 1, weight_norm=True,
                                  name=f"res_skip_{i}")(acts)
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                res_skip = Conv1d(h, 1, weight_norm=True,
                                  name=f"res_skip_{i}")(acts)
                output = output + res_skip
        return output * x_mask
