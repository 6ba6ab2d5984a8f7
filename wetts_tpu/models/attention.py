"""Relative-position transformer blocks (text encoder / flow transformers).

Behavioral parity targets (reference wetts/vits/model/attentions.py):
- MultiHeadAttention with learned relative-position embeddings
  (window_size=4, heads shared), rel<->abs index shuffles (:302-358),
  -1e4 mask fill (:262), optional proximal bias (:360-370) and block-local
  masking (:263-269),
- FFN with same/causal conv padding and relu-or-approx-gelu (:373-429),
- post-norm Encoder with speaker conditioning injected before the
  `cond_layer_idx`-th block (VITS2; :38-48, :74-78),
- causal FFT block used by transformer flows, with WaveNet-style gated
  speaker conditioning (:551-634),
- Decoder with enc-dec cross attention (:90-169).

All channel-last: x is [B, T, C]. The rel<->abs shuffles are pure
pad+reshape+slice, so XLA compiles them to layout changes — no gathers.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.layers import (
    Dense,
    LayerNorm,
    fused_add_tanh_sigmoid_multiply,
    xavier_uniform_init,
)
from wetts_tpu.ops.masking import subsequent_mask

Array = jax.Array


def _relative_to_absolute(x: Array) -> Array:
    """[B, H, L, 2L-1] -> [B, H, L, L] (reference :321-340)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1:]


def _absolute_to_relative(x: Array) -> Array:
    """[B, H, L, L] -> [B, H, L, 2L-1] (reference :342-358)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _slice_relative_embeddings(emb: Array, length: int, window_size: int) -> Array:
    """Center-pad/slice [Hr, 2w+1, D] -> [Hr, 2*length-1, D] (reference :302-319)."""
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, slice_start : slice_start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = None
    heads_share: bool = True
    block_length: Optional[int] = None
    proximal_bias: bool = False
    proximal_init: bool = False  # init-only feature; see note in __call__

    @nn.compact
    def __call__(self, x: Array, c: Array, attn_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """x: queries [B, T_t, C]; c: keys/values [B, T_s, C].

        attn_mask: broadcastable to [B, 1, T_t, T_s] (1 = attend).
        Note: `proximal_init` (copying q-init into k) only affects the random
        initialization, never loaded checkpoints; here k gets its own init.
        """
        k_channels = self.channels // self.n_heads
        q = Dense(self.channels, kernel_init=xavier_uniform_init, name="conv_q")(x)
        k = Dense(self.channels, kernel_init=xavier_uniform_init, name="conv_k")(c)
        v = Dense(self.channels, kernel_init=xavier_uniform_init, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        # [B, T, C] -> [B, H, T, D]
        def split(a, t):
            return a.reshape(b, t, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        q = split(q, t_t)
        k = split(k, t_s)
        v = split(v, t_s)

        scale = 1.0 / math.sqrt(k_channels)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32)

        if self.window_size is not None:
            assert t_s == t_t, "relative attention needs self-attention"
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: jax.random.normal(key, shape) * rel_stddev,
                (n_heads_rel, 2 * self.window_size + 1, k_channels))
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: jax.random.normal(key, shape) * rel_stddev,
                (n_heads_rel, 2 * self.window_size + 1, k_channels))
            key_rel = _slice_relative_embeddings(emb_rel_k, t_s, self.window_size)
            # [B,H,L,D] x [Hr,M,D] -> [B,H,L,M]
            rel_logits = jnp.einsum(
                "bhld,hmd->bhlm", q * scale, key_rel,
                preferred_element_type=jnp.float32)
            scores = scores + _relative_to_absolute(rel_logits)

        if self.proximal_bias:
            assert t_s == t_t
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
            if self.block_length is not None:
                assert t_s == t_t
                pos = jnp.arange(t_s)
                band = (jnp.abs(pos[None, :] - pos[:, None])
                        <= self.block_length)
                scores = jnp.where(band[None, None], scores, -1e4)

        p_attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        p_attn = nn.Dropout(self.p_dropout, deterministic=deterministic)(p_attn)
        output = jnp.einsum(
            "bhts,bhsd->bhtd", p_attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p_attn)
            value_rel = _slice_relative_embeddings(emb_rel_v, t_s, self.window_size)
            output = output + jnp.einsum(
                "bhlm,hmd->bhld", rel_weights, value_rel,
                preferred_element_type=jnp.float32).astype(x.dtype)
        output = output.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Dense(self.out_channels, name="conv_o")(output)


class FFN(nn.Module):
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False

    def _pad(self, x: Array) -> Array:
        if self.kernel_size == 1:
            return x
        if self.causal:
            pad_l, pad_r = self.kernel_size - 1, 0
        else:
            pad_l = (self.kernel_size - 1) // 2
            pad_r = self.kernel_size // 2
        return jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, deterministic: bool = True) -> Array:
        from wetts_tpu.models.layers import Conv1d

        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(
            self._pad(x * x_mask))
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jax.nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(
            self._pad(x * x_mask))
        return x * x_mask


class Encoder(nn.Module):
    """Post-norm relative-position transformer encoder.

    Speaker conditioning (VITS2 `use_spk_conditioned_encoder`): if
    gin_channels > 0 and g is passed, g is linearly projected and added to x
    right before block `cond_layer_idx` (reference :74-78).
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: Optional[int] = 4
    gin_channels: int = 0
    cond_layer_idx: int = 2

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, g: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        # x_mask: [B, T, 1]; attn mask [B, 1, T_t, T_s]
        attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]
                     ).reshape(x.shape[0], 1, x.shape[1], x.shape[1])
        x = x * x_mask
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            if g is not None and self.gin_channels > 0 and i == self.cond_layer_idx:
                g_proj = Dense(self.hidden_channels, name="spk_emb_linear")(g)
                x = (x + g_proj) * x_mask
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=self.window_size,
                name=f"attn_{i}")(x, x, attn_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + drop(y))
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, self.p_dropout, name=f"ffn_{i}")(
                        x, x_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + drop(y))
        return x * x_mask


class Decoder(nn.Module):
    """Causal self-attention + enc-dec cross-attention decoder (:90-169)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    proximal_init: bool = True

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, h: Array, h_mask: Array,
                 deterministic: bool = True) -> Array:
        t = x.shape[1]
        self_attn_mask = subsequent_mask(t)
        encdec_mask = (h_mask[:, None, None, :, 0] * x_mask[:, None, :, 0:1]
                       ).reshape(x.shape[0], 1, t, h.shape[1])
        x = x * x_mask
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, proximal_bias=self.proximal_bias,
                proximal_init=self.proximal_init,
                name=f"self_attn_{i}")(x, x, self_attn_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm0_{i}")(x + drop(y))
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout,
                name=f"encdec_attn_{i}")(x, h, encdec_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + drop(y))
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, self.p_dropout, causal=True,
                    name=f"ffn_{i}")(x, x_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + drop(y))
        return x * x_mask


class FFT(nn.Module):
    """Causal transformer block used inside transformer flows (:551-634).

    When `gin_channels > 0`, each layer applies WaveNet-style gated speaker
    conditioning before self-attention (cond_pre 1x1 -> gated add).
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int = 1
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    proximal_init: bool = True
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, g: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        from wetts_tpu.models.layers import Conv1d

        g_all = None
        cond_pre = None
        if g is not None and self.gin_channels > 0:
            g_all = Conv1d(
                2 * self.hidden_channels * self.n_layers, 1,
                weight_norm=True, name="cond_layer")(g)  # [B, 1, 2HC*L]
            cond_pre = Conv1d(2 * self.hidden_channels, 1, name="cond_pre")
        t = x.shape[1]
        self_attn_mask = subsequent_mask(t)
        x = x * x_mask
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            if g_all is not None:
                x_pre = cond_pre(x)  # shared across layers (reference :576-577)
                off = i * 2 * self.hidden_channels
                g_l = g_all[..., off : off + 2 * self.hidden_channels]
                x = fused_add_tanh_sigmoid_multiply(
                    x_pre, g_l, self.hidden_channels)
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, proximal_bias=self.proximal_bias,
                proximal_init=self.proximal_init,
                name=f"self_attn_{i}")(x, x, self_attn_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm0_{i}")(x + drop(y))
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, self.p_dropout, causal=True,
                    name=f"ffn_{i}")(x, x_mask, deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + drop(y))
        return x * x_mask
