"""Text encoder (prior) and posterior encoder.

Behavioral parity targets (reference wetts/vits/model/encoders.py):
- TextEncoder (:11-57): phone embedding scaled by sqrt(hidden) ->
  rel-pos transformer -> 1x1 conv to (m_p, logs_p),
- PosteriorEncoder (:60-99): 1x1 pre -> WN(16 layers) -> 1x1 proj to
  (m_q, logs_q) and a reparameterized sample z.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.attention import Encoder
from wetts_tpu.models.layers import Conv1d
from wetts_tpu.models.wavenet import WN
from wetts_tpu.ops.masking import sequence_mask

Array = jax.Array


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: Array, x_lengths: Array, g: Optional[Array] = None,
                 deterministic: bool = True
                 ) -> Tuple[Array, Array, Array, Array]:
        """x: [B, T] int phone ids -> (hidden, m_p, logs_p, x_mask[B,T,1])."""
        emb = self.param(
            "emb",
            lambda key, shape: jax.random.normal(key, shape)
            * self.hidden_channels**-0.5,
            (self.n_vocab, self.hidden_channels))
        h = emb[x] * math.sqrt(self.hidden_channels)  # [B, T, H]
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None]
        h = Encoder(self.hidden_channels, self.filter_channels, self.n_heads,
                    self.n_layers, self.kernel_size, self.p_dropout,
                    gin_channels=self.gin_channels,
                    name="encoder")(h * x_mask, x_mask, g=g,
                                    deterministic=deterministic)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * x_mask
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        return h, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: Array, x_lengths: Array, g: Optional[Array] = None,
                 deterministic: bool = True
                 ) -> Tuple[Array, Array, Array, Array]:
        """x: [B, T, spec_channels] -> (z, m_q, logs_q, y_mask[B,T,1])."""
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels,
               name="enc")(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * x_mask
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        noise = jax.random.normal(self.make_rng("noise"), m.shape)
        z = (m + noise * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask
