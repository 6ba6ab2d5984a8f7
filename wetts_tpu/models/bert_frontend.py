"""BERT-based unified Mandarin frontend model (prosody + polyphone).

Behavioral parity target: wetts/frontend/model.py:21-73 — a frozen Chinese
BERT (bert-base-chinese d=768/h=12L... the reference freezes all BERT params,
:30-31) followed by ONE trainable torch-style TransformerEncoderLayer
(post-LN, relu FFN — torch defaults) and two token-level linear heads
(polyphone classes, prosody ranks). `export_forward` (:63-73) additionally
applies softmax and builds attention inputs from bare ids.

The BERT encoder here is a from-scratch flax implementation of the standard
architecture; `convert_hf_bert` maps a HuggingFace torch state_dict onto it
so locally available bert-base-chinese / TinyBERT weights load directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128  # bert-base-chinese
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "BertConfig":
        return cls(vocab_size=vocab_size, hidden_size=32, num_layers=2,
                   num_heads=2, intermediate_size=64, max_position=64)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: Array, mask: Array, deterministic=True) -> Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, name="query")(x)
        k = nn.Dense(c.hidden_size, name="key")(x)
        v = nn.Dense(c.hidden_size, name="value")(x)
        b, t, _ = x.shape

        def split(a):
            return a.reshape(b, t, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k),
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(head_dim)
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, split(v),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        return nn.Dense(c.hidden_size, name="output")(out)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: Array, mask: Array, deterministic=True) -> Array:
        c = self.cfg
        attn = BertSelfAttention(c, name="attention")(x, mask, deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_norm")(
            x + attn)
        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="ffn_output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_norm")(
            x + h)


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 token_type_ids: Optional[Array] = None,
                 deterministic=True) -> Array:
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(c.vocab_size, c.hidden_size,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position, c.hidden_size,
                       name="position_embeddings")(
            jnp.arange(input_ids.shape[1])[None, :])
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_norm")(
            word + pos + typ)
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer_{i}")(x, attention_mask,
                                                deterministic)
        return x


class TorchTransformerLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer equivalent (post-LN, relu FFN)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Array,
                 deterministic=True) -> Array:
        head_dim = self.d_model // self.nhead
        b, t, _ = x.shape
        # torch MultiheadAttention: fused in_proj [3d, d] then out_proj
        qkv = nn.Dense(3 * self.d_model, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(a):
            return a.reshape(b, t, self.nhead, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k),
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(head_dim)
        scores = jnp.where(key_padding_mask[:, None, None, :] > 0, scores,
                           -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhts,bhsd->bhtd", probs, split(v),
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, self.d_model)
        attn = nn.Dense(self.d_model, name="out_proj")(attn)
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1")(x + drop(attn))
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = jax.nn.relu(h)
        h = nn.Dense(self.d_model, name="linear2")(drop(h))
        return nn.LayerNorm(name="norm2")(x + drop(h))


class FrontendModel(nn.Module):
    num_polyphones: int
    num_prosody: int
    bert: BertConfig
    # reference transform-layer dims: bert-base-chinese -> (8, 2048),
    # TinyBERT-4L -> (12, 1200) (model.py:33-47)
    transform_heads: int = 8
    transform_ffn: int = 2048

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 token_type_ids: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        h = BertEncoder(self.bert, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic)
        # reference freezes BERT (model.py:30-31)
        h = jax.lax.stop_gradient(h)
        h = TorchTransformerLayer(
            self.bert.hidden_size, self.transform_heads, self.transform_ffn,
            name="transform")(h, attention_mask, deterministic)
        phone_pred = nn.Dense(self.num_polyphones, name="phone_classifier")(h)
        prosody_pred = nn.Dense(self.num_prosody,
                                name="prosody_classifier")(h)
        return phone_pred, prosody_pred

    def export(self, input_ids: Array) -> Tuple[Array, Array]:
        """Bare-ids path with softmax outputs (reference :63-73)."""
        mask = jnp.ones_like(input_ids)
        phone, prosody = self(input_ids, mask)
        return jax.nn.softmax(phone, -1), jax.nn.softmax(prosody, -1)


def convert_hf_bert(state_dict: Dict[str, np.ndarray], cfg: BertConfig
                    ) -> Dict:
    """HuggingFace BertModel state_dict -> BertEncoder params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": lin(f"{b}.attention.self.query"),
                "key": lin(f"{b}.attention.self.key"),
                "value": lin(f"{b}.attention.self.value"),
                "output": lin(f"{b}.attention.output.dense"),
            },
            "attention_norm": ln(f"{b}.attention.output.LayerNorm"),
            "intermediate": lin(f"{b}.intermediate.dense"),
            "ffn_output": lin(f"{b}.output.dense"),
            "output_norm": ln(f"{b}.output.LayerNorm"),
        }
    return jax.tree.map(jnp.asarray, params)


def convert_frontend_torch(state_dict: Dict[str, np.ndarray]):
    """Full reference FrontendModel state_dict -> (params, meta).

    Accepts the tensors of wetts/frontend/model.py:21-49 under their
    state-dict names (`bert.*`, `transform.*`, `phone_classifier`,
    `prosody_classifier`) — the naming both the torch checkpoints and the
    exported final.onnx initializers use (export_forward traces every
    parameter, so nothing is missing from the ONNX bundle).

    Returns (params, dict(bert=BertConfig, num_polyphones, num_prosody,
    transform_heads, transform_ffn)); head counts follow the reference's
    d_model dispatch (model.py:33-42: 768 -> transform nhead 8,
    312 (TinyBERT) -> 12; HF BERT heads are hidden//64).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    bert_sd = {k[len("bert."):]: v for k, v in sd.items()
               if k.startswith("bert.") and ".pooler." not in k}
    hidden = bert_sd["embeddings.word_embeddings.weight"].shape[1]
    n_layers = 1 + max(int(k.split(".")[2]) for k in bert_sd
                       if k.startswith("encoder.layer."))
    cfg = BertConfig(
        vocab_size=bert_sd["embeddings.word_embeddings.weight"].shape[0],
        hidden_size=hidden,
        num_layers=n_layers,
        num_heads=max(1, hidden // 64) if hidden % 64 == 0 else 12,
        intermediate_size=bert_sd[
            "encoder.layer.0.intermediate.dense.weight"].shape[0],
        max_position=bert_sd[
            "embeddings.position_embeddings.weight"].shape[0],
        type_vocab_size=bert_sd[
            "embeddings.token_type_embeddings.weight"].shape[0])

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T.astype(np.float32),
                "bias": sd[prefix + ".bias"].astype(np.float32)}

    def norm(prefix):
        return {"scale": sd[prefix + ".weight"].astype(np.float32),
                "bias": sd[prefix + ".bias"].astype(np.float32)}

    params = {
        "bert": jax.tree.map(np.asarray, convert_hf_bert(bert_sd, cfg)),
        "transform": {
            "in_proj": {
                "kernel": sd["transform.self_attn.in_proj_weight"
                             ].T.astype(np.float32),
                "bias": sd["transform.self_attn.in_proj_bias"
                           ].astype(np.float32)},
            "out_proj": lin("transform.self_attn.out_proj"),
            "linear1": lin("transform.linear1"),
            "linear2": lin("transform.linear2"),
            "norm1": norm("transform.norm1"),
            "norm2": norm("transform.norm2"),
        },
        "phone_classifier": lin("phone_classifier"),
        "prosody_classifier": lin("prosody_classifier"),
    }
    meta = {
        "bert": cfg,
        "num_polyphones": sd["phone_classifier.weight"].shape[0],
        "num_prosody": sd["prosody_classifier.weight"].shape[0],
        "transform_heads": 12 if hidden == 312 else 8,
        "transform_ffn": sd["transform.linear1.weight"].shape[0],
    }
    return params, meta
