"""WavLM flax port vs the torch transformers implementation (random weights)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from wetts_tpu.models.wavlm import (
    WavLMConfig,
    WavLMModel,
    convert_hf_wavlm,
    make_slm_feature_fn,
)


def make_torch_wavlm():
    from transformers import WavLMConfig as HFConfig
    from transformers.models.wavlm.modeling_wavlm import (
        WavLMModel as HFWavLM,
    )

    cfg = WavLMConfig.tiny()
    hf = HFConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        num_buckets=cfg.num_buckets,
        max_bucket_distance=cfg.max_distance,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
        hidden_act="gelu", feat_extract_activation="gelu",
    )
    torch.manual_seed(0)
    model = HFWavLM(hf)
    model.eval()
    return cfg, model


def test_wavlm_hidden_states_match_torch():
    cfg, tmodel = make_torch_wavlm()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "masked_spec_embed" not in k}
    params = convert_hf_wavlm(sd, cfg)
    jmodel = WavLMModel(cfg)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 800)).astype(np.float32) * 0.2
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(wav), output_hidden_states=True)
    want = [h.numpy() for h in tout.hidden_states]
    got = jmodel.apply({"params": params}, jnp.asarray(wav))
    assert len(got) == len(want) == cfg.num_layers + 1
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4,
                                   err_msg=f"hidden state {i}")


def test_slm_feature_fn_shape():
    cfg, tmodel = make_torch_wavlm()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "masked_spec_embed" not in k}
    params = convert_hf_wavlm(sd, cfg)
    fn = make_slm_feature_fn(cfg, params, model_sr=22050, slm_sr=16000)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 2205, 1)).astype(np.float32))
    feats = fn(wav)
    assert feats.ndim == 3 and feats.shape[0] == 2
    assert feats.shape[-1] == (cfg.num_layers + 1) * cfg.hidden_size
    assert np.isfinite(np.asarray(feats)).all()
