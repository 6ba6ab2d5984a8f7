"""Duration predictors: stochastic (flow-based) and deterministic.

Behavioral parity targets (reference wetts/vits/model/duration_predictors.py):
- DDSConv dilated depth-separable stack (:12-57),
- ConvFlow neural-spline coupling (:60-122) with the /sqrt(filter_channels)
  parameter scaling (:100-104),
- ElementwiseAffine (:125-141) and Log flow (:144-153),
- StochasticDurationPredictor (:156-263): posterior flow over (u, nu),
  input detach (:213), train-path NLL (:221-253), reverse sampling dropping
  one "useless" ConvFlow (:254-263),
- DurationPredictor conv-relu-LN x2 (:266-311).

Noise sites (`torch.randn` :229, :257) take explicit PRNG keys via flax's
'noise' rng collection.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.models.layers import Conv1d, Dense, LayerNorm, zeros_init
from wetts_tpu.ops.splines import piecewise_rational_quadratic_transform

Array = jax.Array


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack with LN + gelu."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, g: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        if g is not None:
            x = x + g
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            padding = (self.kernel_size * dilation - dilation) // 2
            y = Conv1d(self.channels, self.kernel_size, padding=padding,
                       dilation=dilation, groups=self.channels,
                       name=f"sep_{i}")(x * x_mask)
            y = LayerNorm(self.channels, name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"pw_{i}")(y)
            y = LayerNorm(self.channels, name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            x = x + drop(y)
        return x * x_mask


class ConvFlow(nn.Module):
    """Rational-quadratic spline coupling over 2-channel duration latents."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    def setup(self):
        self.half_channels = self.in_channels // 2
        self.pre = Conv1d(self.filter_channels, 1, name="pre")
        self.convs = DDSConv(self.filter_channels, self.kernel_size,
                             self.n_layers, p_dropout=0.0, name="convs")
        self.proj = Conv1d(self.half_channels * (self.num_bins * 3 - 1), 1,
                           zero_init=True, name="proj")

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x0 = x[..., : self.half_channels]
        x1 = x[..., self.half_channels :]
        h = self.pre(x0)
        h = self.convs(h, x_mask, g=g, deterministic=deterministic)
        h = self.proj(h) * x_mask  # [B, T, half*(3K-1)]

        b, t, _ = x0.shape
        # channel-major layout matches torch reshape(b, c, -1, t) (:96-98)
        h = h.reshape(b, t, self.half_channels, 3 * self.num_bins - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound)
        x = jnp.concatenate([x0, x1], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x, logdet
        return x


class ElementwiseAffine(nn.Module):
    channels: int

    def setup(self):
        self.m = self.param("m", zeros_init, (self.channels,))
        self.logs = self.param("logs", zeros_init, (self.channels,))

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        if not reverse:
            y = (self.m + jnp.exp(self.logs) * x) * x_mask
            logdet = jnp.sum(self.logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - self.m) * jnp.exp(-self.logs) * x_mask


def log_flow_forward(x, x_mask):
    y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
    logdet = jnp.sum(-y, axis=(1, 2))
    return y, logdet


class _Flip:
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros((x.shape[0],), dtype=x.dtype)
        return x


class StochasticDurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int  # NB: overridden to in_channels (reference :168)
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference quirk: filter_channels = in_channels
        self._fc = fc
        flows = [ElementwiseAffine(2, name="flow_ea")]
        for i in range(self.n_flows):
            flows.append(ConvFlow(2, fc, self.kernel_size, n_layers=3,
                                  name=f"flow_conv_{i}"))
            flows.append(_Flip())
        self.flows = flows

        self.post_pre = Conv1d(fc, 1, name="post_pre")
        self.post_proj = Conv1d(fc, 1, name="post_proj")
        self.post_convs = DDSConv(fc, self.kernel_size, n_layers=3,
                                  p_dropout=self.p_dropout, name="post_convs")
        post_flows = [ElementwiseAffine(2, name="post_flow_ea")]
        for i in range(4):
            post_flows.append(ConvFlow(2, fc, self.kernel_size, n_layers=3,
                                       name=f"post_flow_conv_{i}"))
            post_flows.append(_Flip())
        self.post_flows = post_flows

        self.pre = Conv1d(fc, 1, name="pre")
        self.proj = Conv1d(fc, 1, name="proj")
        self.convs = DDSConv(fc, self.kernel_size, n_layers=3,
                             p_dropout=self.p_dropout, name="convs")
        if self.gin_channels != 0:
            self.cond = Conv1d(fc, 1, name="cond")

    def __call__(self, x, x_mask, w=None, g=None, reverse=False,
                 noise_scale=1.0, deterministic=True):
        """x: [B, T, C] text-encoder hidden; w: [B, T, 1] durations.

        Train (reverse=False): returns per-utterance NLL [B].
        Reverse: samples log-durations [B, T, 1].
        """
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None and self.gin_channels != 0:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g)
        x = self.convs(x, x_mask, deterministic=deterministic)
        x = self.proj(x) * x_mask

        if not reverse:
            assert w is not None
            h_w = self.post_pre(w)
            h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * x_mask
            e_q = (jax.random.normal(
                self.make_rng("noise"), (w.shape[0], w.shape[1], 2)) * x_mask)
            z_q = e_q
            logdet_tot_q = 0.0
            for flow in self.post_flows:
                z_q, logdet_q = flow(z_q, x_mask, g=(x + h_w),
                                     deterministic=deterministic)
                logdet_tot_q += logdet_q
            z_u, z1 = z_q[..., 0:1], z_q[..., 1:2]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
                axis=(1, 2))
            logq = (jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask,
                            axis=(1, 2)) - logdet_tot_q)

            z0, logdet = log_flow_forward(z0, x_mask)
            logdet_tot = logdet
            z = jnp.concatenate([z0, z1], axis=-1)
            for flow in self.flows:
                z, logdet = flow(z, x_mask, g=x, deterministic=deterministic)
                logdet_tot = logdet_tot + logdet
            nll = (jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask,
                           axis=(1, 2)) - logdet_tot)
            return nll + logq  # [B]

        # reverse: drop the first ConvFlow of the reversed chain (:255-256)
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]
        z = (jax.random.normal(
            self.make_rng("noise"), (x.shape[0], x.shape[1], 2))
            * noise_scale)
        for flow in flows:
            z = flow(z, x_mask, g=x, reverse=True, deterministic=deterministic)
        return z[..., 0:1]  # logw


class DurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels != 0:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(self.in_channels, 1, name="cond")(g)
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size,
                   padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(self.filter_channels, name="norm_1")(x)
        x = drop(x)
        x = Conv1d(self.filter_channels, self.kernel_size,
                   padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(self.filter_channels, name="norm_2")(x)
        x = drop(x)
        x = Conv1d(1, 1, name="proj")(x * x_mask)
        return x * x_mask
