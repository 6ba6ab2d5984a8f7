"""Golden numerics: converted reference weights must reproduce reference
outputs (the BASELINE.json allclose gate, run against the published torch
implementation as oracle).

The deterministic inference path (noise_scale=0, noise_scale_w=0, eval mode)
covers: text encoder (rel-pos attention), duration predictor reverse,
generate_path, flow reverse, and the HiFi-GAN decoder.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from reference_oracle import load_reference_vits
from wetts_tpu.config import Config
from wetts_tpu.models.synthesizer import Synthesizer
from wetts_tpu.utils.convert import convert_synthesizer


def small_cfg(**model_overrides):
    model = {
        "inter_channels": 32, "hidden_channels": 32, "filter_channels": 64,
        "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.1,
        "resblock": "1", "resblock_kernel_sizes": [3, 5],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
        "upsample_rates": [4, 4], "upsample_initial_channel": 64,
        "upsample_kernel_sizes": [8, 8], "gin_channels": 16,
    }
    model.update(model_overrides)
    return Config.from_dict({
        "train": {"segment_size": 256},
        "data": {"filter_length": 64, "hop_length": 16, "win_length": 64},
        "model": model, "num_phones": 24, "num_speakers": 3})


def build_pair(cfg, seed=0):
    """(torch reference model, jax model, converted flax variables)."""
    ref_models = load_reference_vits()
    torch.manual_seed(seed)
    mc = cfg.model
    kwargs = dict(
        n_vocab=cfg.num_phones,
        spec_channels=cfg.data.spec_channels,
        segment_size=cfg.train.segment_size // cfg.data.hop_length,
        inter_channels=mc.inter_channels,
        hidden_channels=mc.hidden_channels,
        filter_channels=mc.filter_channels,
        n_heads=mc.n_heads,
        n_layers=mc.n_layers,
        kernel_size=mc.kernel_size,
        p_dropout=mc.p_dropout,
        resblock=mc.resblock,
        resblock_kernel_sizes=list(mc.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in mc.resblock_dilation_sizes],
        upsample_rates=list(mc.upsample_rates),
        upsample_initial_channel=mc.upsample_initial_channel,
        upsample_kernel_sizes=list(mc.upsample_kernel_sizes),
        n_speakers=cfg.num_speakers,
        gin_channels=mc.gin_channels,
        use_sdp=mc.use_sdp,
        use_transformer_flows=mc.use_transformer_flows,
        transformer_flow_type=mc.transformer_flow_type,
        use_spk_conditioned_encoder=mc.use_spk_conditioned_encoder,
        vocoder_type=mc.vocoder_type,
        vocos_channels=mc.vocos_channels,
        vocos_h_channels=mc.vocos_h_channels,
        vocos_out_channels=mc.vocos_out_channels,
        vocos_num_layers=mc.vocos_num_layers,
        vocos_istft_config=dict(mc.vocos_istft_config, center=True),
    )
    tmodel = ref_models.SynthesizerTrn(**kwargs)
    tmodel.eval()
    state_dict = {k: v.detach().numpy()
                  for k, v in tmodel.state_dict().items()}
    params = convert_synthesizer(state_dict, cfg)
    jmodel = Synthesizer.from_config(cfg)
    return tmodel, jmodel, {"params": params}


def infer_pair(cfg, tmodel, jmodel, variables, seed=1):
    rng = np.random.default_rng(seed)
    b, t_text = 2, 9
    x = rng.integers(1, cfg.num_phones, size=(b, t_text))
    xl = np.array([t_text, t_text])
    sid = np.array([0, 1])
    with torch.no_grad():
        t_audio, t_attn, t_y_mask, _ = tmodel.infer(
            torch.from_numpy(x), torch.from_numpy(xl),
            torch.from_numpy(sid), noise_scale=0.0, length_scale=1.0,
            noise_scale_w=0.0)
    t_len = int(t_y_mask.sum(dim=(1, 2)).max())
    max_frames = t_len  # align the static bound with torch's dynamic length
    j_audio, j_ylen, j_attn = jmodel.apply(
        variables, jnp.asarray(x), jnp.asarray(xl), jnp.asarray(sid),
        0.0, 1.0, 0.0, max_frames, method=Synthesizer.infer,
        rngs={"noise": jax.random.PRNGKey(0)})
    return (t_audio.numpy(), t_y_mask.numpy(), np.asarray(j_audio),
            np.asarray(j_ylen))


@pytest.mark.parametrize("overrides", [
    {},  # VITS1 + SDP
    {"use_sdp": False},
    {"use_transformer_flows": True, "transformer_flow_type": "pre_conv"},
    # NB: gin_channels=0 for fft — the reference's speaker-conditioned FFT
    # flow crashes on an unimported `weight_norm` (attentions.py:534-540),
    # so only the unconditioned variant can be oracle-tested.
    {"use_transformer_flows": True, "transformer_flow_type": "fft",
     "gin_channels": 0},
    {"use_transformer_flows": True,
     "transformer_flow_type": "mono_layer_post_residual"},
    # Vocos decoder e2e (published-baseline configuration family;
    # reference decoders.py:221-308): istft geometry scaled to the test
    # hop (n_fft 64 / hop 16), out_channels = 2 * (64 // 2 + 1)
    {"vocoder_type": "vocos", "vocos_channels": 32, "vocos_h_channels": 64,
     "vocos_out_channels": 66, "vocos_num_layers": 2,
     "vocos_istft_config": {"n_fft": 64, "hop_length": 16,
                            "win_length": 64}},
])
def test_infer_parity(overrides):
    cfg = small_cfg(**overrides)
    if overrides.get("gin_channels") == 0:
        cfg.num_speakers = 0
    tmodel, jmodel, variables = build_pair(cfg)
    t_audio, t_y_mask, j_audio, j_ylen = infer_pair(
        cfg, tmodel, jmodel, variables)
    t_lens = t_y_mask.sum(axis=(1, 2)).astype(int)
    np.testing.assert_array_equal(j_ylen, t_lens)
    hop = np.prod(cfg.model.upsample_rates)
    for i in range(t_audio.shape[0]):
        n = t_lens[i] * hop
        got = j_audio[i, :n, 0]
        want = t_audio[i, 0, :n]
        np.testing.assert_allclose(got, want, atol=2e-4,
                                   err_msg=f"utt {i} ({overrides})")


def test_training_stats_parity():
    """Posterior mean/logvar + flow forward + MAS alignment parity."""
    cfg = small_cfg()
    tmodel, jmodel, variables = build_pair(cfg)
    rng = np.random.default_rng(2)
    b, t_spec = 2, 20
    spec = rng.standard_normal(
        (b, t_spec, cfg.data.spec_channels)).astype(np.float32)
    yl = np.array([t_spec, 16])
    sid = np.array([1, 2])

    with torch.no_grad():
        g_t = tmodel.emb_g(torch.from_numpy(sid)).unsqueeze(-1)
        z_t, m_q_t, logs_q_t, y_mask_t = tmodel.enc_q(
            torch.from_numpy(spec.transpose(0, 2, 1)),
            torch.from_numpy(yl), g=g_t)
        # flow forward on the deterministic mean instead of the sample
        zp_t = tmodel.flow(m_q_t, y_mask_t, g=g_t)

    def jax_stats(params, spec, yl, sid):
        model = jmodel.bind(params, rngs={"noise": jax.random.PRNGKey(0)})
        g = model._speaker(jnp.asarray(sid))
        z, m_q, logs_q, y_mask = model.enc_q(
            jnp.asarray(spec), jnp.asarray(yl), g=g)
        zp = model.flow(m_q, y_mask, g=g)
        return m_q, logs_q, zp

    m_q_j, logs_q_j, zp_j = jax_stats(variables, spec, yl, sid)
    np.testing.assert_allclose(
        np.asarray(m_q_j), m_q_t.numpy().transpose(0, 2, 1), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logs_q_j), logs_q_t.numpy().transpose(0, 2, 1), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(zp_j), zp_t.numpy().transpose(0, 2, 1), atol=1e-4)


def test_voice_conversion_parity():
    """VC composition parity (models.py:369-376): posterior mean -> flow
    fwd with g_src -> flow reverse with g_tgt -> decoder with g_tgt.

    The reference's voice_conversion samples z stochastically (enc_q
    randn); parity is asserted on the deterministic mean path, which
    exercises the same speaker-swap plumbing end-to-end."""
    cfg = small_cfg()
    tmodel, jmodel, variables = build_pair(cfg)
    rng = np.random.default_rng(5)
    b, t_spec = 2, 18
    spec = rng.standard_normal(
        (b, t_spec, cfg.data.spec_channels)).astype(np.float32)
    yl = np.array([t_spec, 14])
    sid_src = np.array([0, 1])
    sid_tgt = np.array([2, 0])

    with torch.no_grad():
        g_src = tmodel.emb_g(torch.from_numpy(sid_src)).unsqueeze(-1)
        g_tgt = tmodel.emb_g(torch.from_numpy(sid_tgt)).unsqueeze(-1)
        _, m_q, _, y_mask = tmodel.enc_q(
            torch.from_numpy(spec.transpose(0, 2, 1)),
            torch.from_numpy(yl), g=g_src)
        z_p = tmodel.flow(m_q, y_mask, g=g_src)
        z_hat = tmodel.flow(z_p, y_mask, g=g_tgt, reverse=True)
        o_t = tmodel.dec(z_hat * y_mask, g=g_tgt)

    model = jmodel.bind(variables, rngs={"noise": jax.random.PRNGKey(0)})
    gs = model._speaker(jnp.asarray(sid_src))
    gt = model._speaker(jnp.asarray(sid_tgt))
    _, m_q_j, _, y_mask_j = model.enc_q(jnp.asarray(spec),
                                        jnp.asarray(yl), g=gs)
    z_p_j = model.flow(m_q_j, y_mask_j, g=gs)
    z_hat_j = model.flow(z_p_j, y_mask_j, g=gt, reverse=True)
    o_j = model.dec(z_hat_j * y_mask_j, g=gt)
    np.testing.assert_allclose(
        np.asarray(o_j)[:, :, 0], o_t.numpy()[:, 0, :], atol=2e-4)
