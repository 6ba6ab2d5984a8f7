"""Normalizing flows over the VITS latent (prior flow).

Behavioral parity targets (reference wetts/vits/model/flows.py):
- ResidualCouplingLayer (mean-only affine coupling over channel halves,
  :457-516) + Flip (modules.py:98-106) -- the VITS1 flow,
- VITS2 transformer-augmented variants selected by `transformer_flow_type`
  in AVAILABLE_FLOW_TYPES (:7-13): pre_conv (:89-176), pre_conv2 (:16-86),
  fft (:179-238), mono_layer_inter_residual / mono_layer_post_residual
  (:241-324), assembled by ResidualCouplingTransformersBlock (:327-454).

Forward returns (x, logdet); reverse returns x. Channel-last: the coupling
split is over the last axis, and Flip reverses it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.attention import FFT, Encoder
from wetts_tpu.models.layers import Conv1d, zeros_init
from wetts_tpu.models.wavenet import WN

Array = jax.Array

AVAILABLE_FLOW_TYPES = [
    "pre_conv",
    "pre_conv2",
    "fft",
    "mono_layer_inter_residual",
    "mono_layer_post_residual",
]


def flip_channels(x: Array) -> Array:
    return jnp.flip(x, axis=-1)


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    def setup(self):
        assert self.channels % 2 == 0
        self.half_channels = self.channels // 2
        self.pre = Conv1d(self.hidden_channels, 1, name="pre")
        self.enc = WN(self.hidden_channels, self.kernel_size,
                      self.dilation_rate, self.n_layers,
                      gin_channels=self.gin_channels,
                      p_dropout=self.p_dropout, name="enc")
        self.post = Conv1d(self.half_channels * (2 - self.mean_only), 1,
                           zero_init=True, name="post")

    def _stats(self, x0, x_mask, g, deterministic):
        h = self.pre(x0) * x_mask
        h = self.enc(h, x_mask, g=g, deterministic=deterministic)
        stats = self.post(h) * x_mask
        if self.mean_only:
            return stats, jnp.zeros_like(stats)
        return (stats[..., : self.half_channels],
                stats[..., self.half_channels :])

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x0, x1 = x[..., : self.half_channels], x[..., self.half_channels :]
        m, logs = self._stats(x0, x_mask, g, deterministic)
        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingTransformersLayer(nn.Module):
    """'pre_conv': a rel-pos-free transformer preprocesses x0 (reference :89-176)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    def setup(self):
        assert self.channels % 2 == 0
        self.half_channels = self.channels // 2
        self.pre_transformer = Encoder(
            self.half_channels, self.half_channels, n_heads=2, n_layers=2,
            kernel_size=3, p_dropout=0.1, window_size=None,
            name="pre_transformer")
        self.pre = Conv1d(self.hidden_channels, 1, name="pre")
        self.enc = WN(self.hidden_channels, self.kernel_size,
                      self.dilation_rate, self.n_layers,
                      gin_channels=self.gin_channels,
                      p_dropout=self.p_dropout, name="enc")
        self.post = Conv1d(self.half_channels * (2 - self.mean_only), 1,
                           zero_init=True, name="post")

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x0, x1 = x[..., : self.half_channels], x[..., self.half_channels :]
        x0_ = self.pre_transformer(x0 * x_mask, x_mask,
                                   deterministic=deterministic) + x0
        h = self.pre(x0_) * x_mask
        h = self.enc(h, x_mask, g=g, deterministic=deterministic)
        stats = self.post(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m = stats[..., : self.half_channels]
            logs = stats[..., self.half_channels :]
        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class ResidualCouplingTransformersLayer2(nn.Module):
    """'pre_conv2': transformer on the hidden h after `pre` (reference :16-86)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    def setup(self):
        assert self.channels % 2 == 0
        self.half_channels = self.channels // 2
        self.pre = Conv1d(self.hidden_channels, 1, name="pre")
        self.pre_transformer = Encoder(
            self.hidden_channels, self.hidden_channels, n_heads=2, n_layers=1,
            kernel_size=self.kernel_size, p_dropout=self.p_dropout,
            name="pre_transformer")
        self.enc = WN(self.hidden_channels, self.kernel_size,
                      self.dilation_rate, self.n_layers,
                      gin_channels=self.gin_channels,
                      p_dropout=self.p_dropout, name="enc")
        self.post = Conv1d(self.half_channels * (2 - self.mean_only), 1,
                           zero_init=True, name="post")

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x0, x1 = x[..., : self.half_channels], x[..., self.half_channels :]
        h = self.pre(x0) * x_mask
        h = h + self.pre_transformer(h * x_mask, x_mask,
                                     deterministic=deterministic)
        h = self.enc(h, x_mask, g=g, deterministic=deterministic)
        stats = self.post(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m = stats[..., : self.half_channels]
            logs = stats[..., self.half_channels :]
        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class FFTransformerCouplingLayer(nn.Module):
    """'fft': causal FFT block as the coupling net (reference :179-238)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int = 2
    p_dropout: float = 0.0
    filter_channels: int = 768
    gin_channels: int = 0
    mean_only: bool = False

    def setup(self):
        assert self.channels % 2 == 0
        self.half_channels = self.channels // 2
        self.pre = Conv1d(self.hidden_channels, 1, name="pre")
        self.enc = FFT(self.hidden_channels, self.filter_channels,
                       self.n_heads, self.n_layers, self.kernel_size,
                       self.p_dropout, gin_channels=self.gin_channels,
                       name="enc")
        self.post = Conv1d(self.half_channels * (2 - self.mean_only), 1,
                           zero_init=True, name="post")

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x0, x1 = x[..., : self.half_channels], x[..., self.half_channels :]
        h = self.pre(x0) * x_mask
        h_ = self.enc(h, x_mask, g=g, deterministic=deterministic)
        h = h_ + h
        stats = self.post(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m = stats[..., : self.half_channels]
            logs = stats[..., self.half_channels :]
        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class MonoTransformerFlowLayer(nn.Module):
    """Mono-layer transformer flow (reference :241-324), both residual modes."""

    channels: int
    hidden_channels: int
    mean_only: bool = False
    residual_connection: bool = False

    def setup(self):
        assert self.channels % 2 == 0
        self.half_channels = self.channels // 2
        self.pre_transformer = Encoder(
            self.half_channels, self.half_channels, n_heads=2, n_layers=2,
            kernel_size=3, p_dropout=0.1, window_size=None,
            name="pre_transformer")
        self.post = Conv1d(self.half_channels * (2 - self.mean_only), 1,
                           zero_init=True, name="post")

    def _stats(self, h, x_mask):
        stats = self.post(h) * x_mask
        if self.mean_only:
            return stats, jnp.zeros_like(stats)
        return (stats[..., : self.half_channels],
                stats[..., self.half_channels :])

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        half = self.half_channels
        if self.residual_connection:
            if not reverse:
                x0, x1 = x[..., :half], x[..., half:]
                x0_ = self.pre_transformer(x0, x_mask,
                                           deterministic=deterministic)
                m, logs = self._stats(x0_, x_mask)
                x1 = m + x1 * jnp.exp(logs) * x_mask
                x_ = jnp.concatenate([x0, x1], -1)
                x = x + x_
                logdet = jnp.sum(jnp.log(jnp.exp(logs) + 1), axis=(1, 2))
                logdet = logdet + jnp.log(2.0) * (x0.shape[1] * x0.shape[2])
                return x, logdet
            x0, x1 = x[..., :half], x[..., half:]
            x0 = x0 / 2
            x0_ = self.pre_transformer(x0, x_mask, deterministic=deterministic)
            m, logs = self._stats(x0_, x_mask)
            x1_ = ((x1 - m) / (1 + jnp.exp(-logs))) * x_mask
            return jnp.concatenate([x0, x1_], -1)
        x0, x1 = x[..., :half], x[..., half:]
        x0_ = self.pre_transformer(x0 * x_mask, x_mask,
                                   deterministic=deterministic)
        h = x0_ + x0
        m, logs = self._stats(h, x_mask)
        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            return jnp.concatenate([x0, x1], -1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], -1)


class _Flip:
    """Parameterless flip pseudo-flow."""

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x = flip_channels(x)
        if not reverse:
            return x, jnp.zeros((x.shape[0],), dtype=x.dtype)
        return x


class ResidualCouplingBlock(nn.Module):
    """Flow stack: couplings interleaved with Flips (reference :327-454).

    `transformer_flow_type=None` (or use_transformer_flows=False) gives the
    VITS1 stack of n_flows x (mean-only coupling + flip).
    """

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    use_transformer_flows: bool = False
    transformer_flow_type: str = "pre_conv"

    def setup(self):
        flows = []
        ftype = (self.transformer_flow_type
                 if self.use_transformer_flows else None)
        if ftype is not None and ftype not in AVAILABLE_FLOW_TYPES:
            raise ValueError(
                f"transformer_flow_type must be one of {AVAILABLE_FLOW_TYPES}")
        for i in range(self.n_flows):
            if ftype == "pre_conv":
                flows.append(ResidualCouplingTransformersLayer(
                    self.channels, self.hidden_channels, self.kernel_size,
                    self.dilation_rate, self.n_layers,
                    gin_channels=self.gin_channels, mean_only=True,
                    name=f"flow_{i}"))
                flows.append(_Flip())
            elif ftype == "pre_conv2":
                flows.append(ResidualCouplingTransformersLayer2(
                    self.channels, self.hidden_channels, self.kernel_size,
                    self.dilation_rate, self.n_layers,
                    gin_channels=self.gin_channels, mean_only=True,
                    name=f"flow_{i}"))
                flows.append(_Flip())
            elif ftype == "fft":
                # NB: reference passes (dilation_rate, n_layers) positionally
                # into (n_layers, n_heads) (flows.py:381-389) — mirrored here.
                flows.append(FFTransformerCouplingLayer(
                    self.channels, self.hidden_channels, self.kernel_size,
                    n_layers=self.dilation_rate, n_heads=self.n_layers,
                    gin_channels=self.gin_channels, mean_only=True,
                    name=f"flow_{i}"))
                flows.append(_Flip())
            elif ftype in ("mono_layer_inter_residual",
                           "mono_layer_post_residual"):
                flows.append(ResidualCouplingLayer(
                    self.channels, self.hidden_channels, self.kernel_size,
                    self.dilation_rate, self.n_layers,
                    gin_channels=self.gin_channels, mean_only=True,
                    name=f"flow_{i}"))
                flows.append(_Flip())
                flows.append(MonoTransformerFlowLayer(
                    self.channels, self.hidden_channels, mean_only=True,
                    residual_connection=(ftype == "mono_layer_post_residual"),
                    name=f"mono_{i}"))
            else:
                flows.append(ResidualCouplingLayer(
                    self.channels, self.hidden_channels, self.kernel_size,
                    self.dilation_rate, self.n_layers,
                    gin_channels=self.gin_channels, mean_only=True,
                    name=f"flow_{i}"))
                flows.append(_Flip())
        self.flows = flows

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, reverse=False,
                            deterministic=deterministic)
            return x
        for flow in reversed(self.flows):
            x = flow(x, x_mask, g=g, reverse=True,
                     deterministic=deterministic)
        return x
