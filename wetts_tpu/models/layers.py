"""Convolution / normalization primitives, channel-last, torch-compatible.

These primitives reproduce the exact arithmetic of the reference's building
blocks (torch Conv1d/ConvTranspose1d with integer padding, weight
normalization with per-output-channel norms, LayerNorm over channels —
wetts/vits/model/normalization.py:6-19) so that reference checkpoints can be
converted weight-for-weight, while using TPU-friendly layouts:

- activations are [B, T, C] (C on the 128-wide lane dimension),
- conv kernels are stored [K, C_in/groups, C_out] ('WIO'), the layout XLA's
  TPU conv lowering consumes directly,
- weight norm is a differentiable reparameterization (g * v / ||v||), matching
  torch.nn.utils.weight_norm(dim=0); `fold=True` collapses it at load time for
  inference.

Initializers replicate torch defaults (kaiming-uniform(a=sqrt(5)) == U(±1/sqrt
(fan_in)) for conv weight and bias) so training dynamics start from the same
distribution as the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
LRELU_SLOPE = 0.1


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), +) where fan_in = K * C_in_per_group. shape=[K,I,O]."""
    fan_in = shape[0] * shape[1]
    bound = fan_in**-0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = fan_in**-0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps matching torch (1e-5)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class Conv1d(nn.Module):
    """torch.nn.Conv1d equivalent on [B, T, C] activations.

    padding: integer zero-padding applied to both sides (torch semantics).
    weight_norm: reparameterize kernel as g * v / ||v|| (norm per out-channel
    over [K, I] — torch weight_norm(dim=0) on a [O, I, K] torch tensor).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    zero_init: bool = False  # zero kernel+bias (flow identity init)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        assert in_features % self.groups == 0
        kshape = (self.kernel_size, in_features // self.groups, self.features)
        if self.zero_init:
            kernel = self.param("kernel", zeros_init, kshape)
            if self.use_bias:
                b = self.param("bias", zeros_init, (self.features,))
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (self.stride,),
                [(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                feature_group_count=self.groups,
                dimension_numbers=("NWC", "WIO", "NWC"))
            return y + b.astype(y.dtype) if self.use_bias else y
        if self.weight_norm:
            v = self.param("v", torch_conv_kernel_init, kshape)
            # g initialized to ||v|| so the initial forward equals a plain conv
            g = self.param(
                "g", lambda rng: jnp.sqrt((v * v).sum(axis=(0, 1)) + 0.0))
            norm = jnp.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
            kernel = v * (g[None, None, :] / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", torch_conv_kernel_init, kshape)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            feature_group_count=self.groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            fan_in = kshape[0] * kshape[1]
            b = self.param("bias", torch_bias_init_for(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d equivalent on [B, T, C].

    Implemented as an input-dilated convolution with a flipped kernel, which
    is exactly torch's transposed conv (output length = (T-1)*stride - 2*pad
    + K). The kernel is stored in torch layout [C_in, C_out, K] so reference
    checkpoints (HiFi-GAN `ups.*`, decoders.py:39-48) map 1:1.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kshape = (in_features, self.features, self.kernel_size)  # torch layout

        def kinit(key, shape, dtype=jnp.float32):
            # torch ConvTranspose1d: fan_in = C_out * K (weight[ C_in,C_out,K ])
            fan_in = shape[1] * shape[2]
            bound = fan_in**-0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.weight_norm:
            v = self.param("v", kinit, kshape)
            # torch weight_norm(dim=0): per-in-channel norms over [C_out, K]
            g = self.param(
                "g", lambda rng: jnp.sqrt((v * v).sum(axis=(1, 2)) + 0.0))
            norm = jnp.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
            w = v * (g[:, None, None] / jnp.maximum(norm, 1e-12))
        else:
            w = self.param("kernel", kinit, kshape)
        # [C_in, C_out, K] -> flip time -> [K, C_in, C_out] for 'WIO'
        kernel = jnp.transpose(jnp.flip(w, axis=2), (2, 0, 1))
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            fan_in = self.features * self.kernel_size
            b = self.param("bias", torch_bias_init_for(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Dense(nn.Module):
    """1x1 conv / linear with torch-default or custom init."""

    features: int
    use_bias: bool = True
    kernel_init: Any = None  # [in, out]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]

        def default_init(key, shape, dtype=jnp.float32):
            bound = shape[0] ** -0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", self.kernel_init or default_init, (in_features, self.features))
        y = jnp.einsum(
            "...i,io->...o", x, kernel.astype(x.dtype),
            preferred_element_type=x.dtype)
        if self.use_bias:
            b = self.param(
                "bias", torch_bias_init_for(in_features), (self.features,))
            y = y + b.astype(y.dtype)
        return y


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class Conv2dTorch(nn.Module):
    """torch.nn.Conv2d equivalent on [B, H, W, C] with optional weight norm.

    im2col=True computes a (k, 1)-kernel strided conv as an explicit
    gather + one dot_general ([B, H_out, W, k*C] @ [k*C, O]) instead of
    conv_general_dilated. Same math, same params — but the contraction is
    a clean [k*C, O] matmul the MXU tiles directly, where XLA's strided-
    conv lowering of the discriminator shapes measured ~13% MFU
    (tools/profile_components.py --what train/disc). Used by
    DiscriminatorP, whose W dim (the period) is pure batch."""

    features: int
    kernel_size: tuple
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    im2col: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kshape = (*self.kernel_size, in_features, self.features)  # HWIO

        def kinit(key, shape, dtype=jnp.float32):
            fan_in = shape[0] * shape[1] * shape[2]
            bound = fan_in**-0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.weight_norm:
            v = self.param("v", kinit, kshape)
            g = self.param(
                "g", lambda rng: jnp.sqrt((v * v).sum(axis=(0, 1, 2)) + 0.0))
            norm = jnp.sqrt((v * v).sum(axis=(0, 1, 2), keepdims=True))
            kernel = v * (g[None, None, None, :] / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", kinit, kshape)
        if self.im2col and self.kernel_size[1] == 1 and self.stride[1] == 1:
            kh, sh, ph = (self.kernel_size[0], self.stride[0],
                          self.padding[0])
            xp = x if ph == 0 else jnp.pad(
                x, ((0, 0), (ph, ph), (0, 0), (0, 0)))
            h_out = (xp.shape[1] - kh) // sh + 1
            cols = jnp.concatenate(
                [jax.lax.slice_in_dim(xp, j, j + (h_out - 1) * sh + 1,
                                      stride=sh, axis=1)
                 for j in range(kh)], axis=-1)  # [B, H_out, W, kh*C]
            w2 = kernel.reshape(kh * in_features, self.features)
            y = jax.lax.dot_general(
                cols, w2.astype(x.dtype),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=self.stride,
                padding=[(self.padding[0], self.padding[0]),
                         (self.padding[1], self.padding[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            fan_in = kshape[0] * kshape[1] * kshape[2]
            b = self.param("bias", torch_bias_init_for(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y


def fused_add_tanh_sigmoid_multiply(a: Array, b: Array, n_channels: int) -> Array:
    """Gated activation tanh(x[:n]) * sigmoid(x[n:]) of a + b.

    (reference commons.py:98-105; XLA fuses this into one VPU kernel.)
    """
    s = a + b
    return jnp.tanh(s[..., :n_channels]) * jax.nn.sigmoid(s[..., n_channels:])


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2
