"""WavLM speech encoder (frozen feature extractor for the SLM loss).

From-scratch flax implementation of the WavLM architecture (base variant:
group-norm feature extractor, post-norm encoder, gated relative-position-
bias attention with T5-style log buckets) sufficient for
`output_hidden_states` feature extraction — the role the frozen
microsoft/wavlm-base-plus plays in the reference's WavLMLoss
(wetts/vits/losses.py:63-153). `convert_hf_wavlm` maps a HuggingFace torch
WavLMModel state_dict onto this module; parity vs the torch implementation
is tested with a random small config (tests/test_wavlm.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls) -> "WavLMConfig":
        return cls(hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, conv_dim=(16, 16, 16),
                   conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
                   num_conv_pos_embeddings=16,
                   num_conv_pos_embedding_groups=4, num_buckets=40,
                   max_distance=100)


def _conv1d(x, kernel, stride=1, padding=0, groups=1):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride,), [(padding, padding)],
        feature_group_count=groups, dimension_numbers=("NWC", "WIO", "NWC"))


class FeatureEncoder(nn.Module):
    """Raw waveform [B, T] -> conv features [B, T', conv_dim[-1]]."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.cfg
        h = x[:, :, None]
        for i, (dim, k, s) in enumerate(
                zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            in_dim = 1 if i == 0 else c.conv_dim[i - 1]
            kernel = self.param(f"conv_{i}", nn.initializers.he_normal(),
                                (k, in_dim, dim))
            h = _conv1d(h, kernel, stride=s)
            if c.conv_bias:
                b = self.param(f"conv_bias_{i}", nn.initializers.zeros,
                               (dim,))
                h = h + b
            if i == 0:
                # GroupNorm(groups == channels) == per-channel instance norm
                mean = h.mean(axis=1, keepdims=True)
                var = h.var(axis=1, keepdims=True)
                h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
                scale = self.param("gn_scale", nn.initializers.ones, (dim,))
                bias = self.param("gn_bias", nn.initializers.zeros, (dim,))
                h = h * scale + bias
            h = jax.nn.gelu(h, approximate=False)
        return h


def _relative_bucket(rel: Array, num_buckets: int, max_distance: int) -> Array:
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = (max_exact + (jnp.log(rel.astype(jnp.float32) / max_exact)
                          / math.log(max_distance / max_exact)
                          * (nb - max_exact))).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


class WavLMAttention(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x: Array, position_bias: Optional[Array]
                 ) -> Tuple[Array, Array]:
        c = self.cfg
        b, t, _ = x.shape
        head_dim = c.hidden_size // c.num_heads

        if position_bias is None:
            pos = jnp.arange(t)
            rel = pos[None, :] - pos[:, None]
            buckets = _relative_bucket(rel, c.num_buckets, c.max_distance)
            emb = self.param("rel_attn_embed", nn.initializers.normal(0.02),
                             (c.num_buckets, c.num_heads))
            position_bias = jnp.transpose(emb[buckets], (2, 0, 1))  # [H,T,T]

        # gated relative position bias
        gated = x.reshape(b, t, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated)
        proj = proj.reshape(b, c.num_heads, t, 2, 4).sum(-1)
        gate_a = jax.nn.sigmoid(proj[..., 0])  # [B, H, T]
        gate_b = jax.nn.sigmoid(proj[..., 1])
        const = self.param("gru_rel_pos_const", nn.initializers.ones,
                           (1, c.num_heads, 1))
        gate = gate_a * (gate_b * const - 1.0) + 2.0  # [B, H, T]
        gated_bias = gate[:, :, :, None] * position_bias[None]  # [B,H,T,T]

        q = nn.Dense(c.hidden_size, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, name="v_proj")(x)

        def split(a):
            return a.reshape(b, t, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k),
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(head_dim) + gated_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, split(v),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        out = nn.Dense(c.hidden_size, name="out_proj")(out)
        return out, position_bias


class WavLMEncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x: Array, position_bias: Optional[Array]):
        c = self.cfg
        attn, position_bias = WavLMAttention(
            c, self.has_relative_position_bias, name="attention")(
                x, position_bias)
        x = x + attn
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output_dense")(h)
        x = x + h
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        return x, position_bias


class WavLMModel(nn.Module):
    """Waveform [B, T] -> list of hidden states (num_layers + 1 tensors)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        c = self.cfg
        feat = FeatureEncoder(c, name="feature_extractor")(x)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="feat_norm")(feat)
        h = nn.Dense(c.hidden_size, name="feat_proj")(h)

        # positional conv embedding (weight-normed conv, SAME-pad trimmed)
        k = c.num_conv_pos_embeddings
        v = self.param("pos_conv_v", nn.initializers.he_normal(),
                       (k, c.hidden_size // c.num_conv_pos_embedding_groups,
                        c.hidden_size))
        # torch weight_norm(dim=2) on weight [O, I, K]: per-K norms over
        # [O, I] — our layout [K, I, O]: norms over (1, 2) per k index
        norm = jnp.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        g_k = self.param(
            "pos_conv_gk",
            lambda rng: jnp.sqrt((v * v).sum(axis=(1, 2)) + 0.0))
        kernel = v * (g_k[:, None, None] / jnp.maximum(norm, 1e-12))
        pos_bias = self.param("pos_conv_bias", nn.initializers.zeros,
                              (c.hidden_size,))
        pos = _conv1d(h, kernel, padding=k // 2,
                      groups=c.num_conv_pos_embedding_groups) + pos_bias
        if k % 2 == 0:
            pos = pos[:, :-1]
        pos = jax.nn.gelu(pos, approximate=False)
        h = h + pos
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_norm")(h)

        hidden_states = [h]
        position_bias = None
        for i in range(c.num_layers):
            h, position_bias = WavLMEncoderLayer(
                c, has_relative_position_bias=(i == 0),
                name=f"layer_{i}")(h, position_bias)
            hidden_states.append(h)
        return hidden_states


def make_slm_feature_fn(cfg: WavLMConfig, params, model_sr: int,
                        slm_sr: int = 16000):
    """Returns wav [B, T, 1] -> stacked hidden features [B, T', H * (L+1)].

    The stacking matches the reference's
    torch.stack(hidden_states, 1).transpose(-1,-2).flatten(1,2)
    (losses.py:95-99): layer-major over the channel axis.
    """
    from wetts_tpu.ops.resample import resample

    model = WavLMModel(cfg)

    def feature_fn(wav: Array) -> Array:
        x = wav[:, :, 0] if wav.ndim == 3 else wav
        x = resample(x, model_sr, slm_sr)
        hs = model.apply({"params": params}, x)
        # [L+1, B, T, H] -> [B, T, (L+1)*H] layer-major
        stacked = jnp.stack(hs, axis=0)
        l, b, t, h = stacked.shape
        return jnp.transpose(stacked, (1, 2, 0, 3)).reshape(b, t, l * h)

    return feature_fn


def convert_hf_wavlm(state_dict, cfg: WavLMConfig):
    """HuggingFace WavLMModel state_dict -> flax params for WavLMModel."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {}
    fe = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]  # [O, I, K]
        fe[f"conv_{i}"] = np.transpose(w, (2, 1, 0))
        if cfg.conv_bias:
            fe[f"conv_bias_{i}"] = sd[
                f"feature_extractor.conv_layers.{i}.conv.bias"]
    fe["gn_scale"] = sd["feature_extractor.conv_layers.0.layer_norm.weight"]
    fe["gn_bias"] = sd["feature_extractor.conv_layers.0.layer_norm.bias"]
    params["feature_extractor"] = fe
    params["feat_norm"] = ln("feature_projection.layer_norm")
    params["feat_proj"] = lin("feature_projection.projection")

    # positional conv (torch weight [O, I/g, K], weight_norm dim=2)
    for g_name in ("encoder.pos_conv_embed.conv.weight_g",
                   "encoder.pos_conv_embed.conv.parametrizations.weight.original0"):
        if g_name in sd:
            wg = sd[g_name]  # [1, 1, K]
            wv = sd[g_name.replace("weight_g", "weight_v").replace(
                "original0", "original1")]  # [O, I/g, K]
            break
    v = np.transpose(wv, (2, 1, 0))  # [K, I/g, O]
    params["pos_conv_v"] = v
    params["pos_conv_gk"] = wg.reshape(-1)
    params["pos_conv_bias"] = sd["encoder.pos_conv_embed.conv.bias"]
    params["encoder_norm"] = ln("encoder.layer_norm")

    for i in range(cfg.num_layers):
        b = f"encoder.layers.{i}"
        layer = {
            "attention": {
                "q_proj": lin(f"{b}.attention.q_proj"),
                "k_proj": lin(f"{b}.attention.k_proj"),
                "v_proj": lin(f"{b}.attention.v_proj"),
                "out_proj": lin(f"{b}.attention.out_proj"),
                "gru_rel_pos_linear": lin(
                    f"{b}.attention.gru_rel_pos_linear"),
                "gru_rel_pos_const": sd[
                    f"{b}.attention.gru_rel_pos_const"][..., 0],
            },
            "layer_norm": ln(f"{b}.layer_norm"),
            "intermediate_dense": lin(f"{b}.feed_forward.intermediate_dense"),
            "output_dense": lin(f"{b}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{b}.final_layer_norm"),
        }
        if i == 0:
            layer["attention"]["rel_attn_embed"] = sd[
                f"{b}.attention.rel_attn_embed.weight"]
        params[f"layer_{i}"] = layer
    return jax.tree.map(jnp.asarray, params)
