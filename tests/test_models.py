"""Model component tests: shapes, flow invertibility, synthesizer smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wetts_tpu.config import Config
from wetts_tpu.models.attention import Encoder, MultiHeadAttention, FFT
from wetts_tpu.models.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
)
from wetts_tpu.models.discriminators import (
    DurationDiscriminatorV1,
    DurationDiscriminatorV2,
    MultiPeriodDiscriminator,
    MultiPeriodMultiResolutionDiscriminator,
    WavLMDiscriminator,
)
from wetts_tpu.models.flows import ResidualCouplingBlock
from wetts_tpu.models.hifigan import Generator
from wetts_tpu.models.vocos import VocosGenerator
from wetts_tpu.models.encoders import PosteriorEncoder, TextEncoder
from wetts_tpu.models.synthesizer import Synthesizer
from wetts_tpu.ops.masking import sequence_mask

KEY = jax.random.PRNGKey(0)
RNGS = {"params": KEY, "noise": KEY, "dropout": KEY, "slice": KEY}


def tiny_config(**model_overrides):
    model = {
        "inter_channels": 32, "hidden_channels": 32, "filter_channels": 64,
        "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.1,
        "resblock": "1", "resblock_kernel_sizes": [3, 5],
        "resblock_dilation_sizes": [[1, 3], [1, 3]],
        "upsample_rates": [4, 4, 2, 2], "upsample_initial_channel": 64,
        "upsample_kernel_sizes": [8, 8, 4, 4], "gin_channels": 16,
    }
    model.update(model_overrides)
    return Config.from_dict({
        "train": {"segment_size": 2048},
        "data": {"filter_length": 256, "hop_length": 64, "win_length": 256},
        "model": model, "num_phones": 20, "num_speakers": 3})


def test_encoder_shapes():
    m = Encoder(32, 64, 2, 2, 3, 0.1)
    x = jnp.ones((2, 15, 32))
    mask = sequence_mask(jnp.array([15, 10]), 15)[:, :, None]
    params = m.init(RNGS, x, mask)
    y = m.apply(params, x, mask)
    assert y.shape == (2, 15, 32)
    assert np.asarray(y)[1, 10:].sum() == 0  # masked out


def test_attention_masking():
    m = MultiHeadAttention(32, 32, 2, window_size=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 32)),
                    dtype=jnp.float32)
    params = m.init(RNGS, x, x)
    full = m.apply(params, x, x)
    # with an attention mask restricting to the first 4 positions, outputs
    # of the first 4 positions must not depend on positions 4..7
    mask = np.zeros((1, 1, 8, 8), np.float32)
    mask[:, :, :, :4] = 1
    x2 = x.at[:, 4:].set(123.0)
    a = m.apply(params, x, x, jnp.asarray(mask))
    b = m.apply(params, x2, x2, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a[:, :4]), np.asarray(b[:, :4]),
                               atol=2e-5)


@pytest.mark.parametrize("flow_type", [
    None, "pre_conv", "pre_conv2", "fft",
    "mono_layer_inter_residual", "mono_layer_post_residual"])
def test_flow_invertibility(flow_type):
    m = ResidualCouplingBlock(
        32, 32, 5, 1, 2, n_flows=2, gin_channels=16,
        use_transformer_flows=flow_type is not None,
        transformer_flow_type=flow_type or "pre_conv")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    g = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    params = m.init(RNGS, x, mask, g=g)
    y = m.apply(params, x, mask, g=g)
    x_rec = m.apply(params, y, mask, g=g, reverse=True)
    if flow_type == "mono_layer_post_residual":
        # residual mono layers are only approximately invertible by design
        # (reference flows.py:274-305 halves x0 on the reverse path)
        return
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_duration_predictors():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    mask = sequence_mask(jnp.array([9, 6]), 9)[:, :, None]
    w = jnp.asarray(np.abs(rng.standard_normal((2, 9, 1))).astype(np.float32))

    dp = DurationPredictor(32, 64, 3, 0.5)
    params = dp.init(RNGS, x, mask)
    logw = dp.apply(params, x, mask)
    assert logw.shape == (2, 9, 1)

    sdp = StochasticDurationPredictor(32, 192, 3, 0.5, 4)
    params = sdp.init(RNGS, x, mask, w=w)
    nll = sdp.apply(params, x, mask, w=w, rngs={"noise": KEY})
    assert nll.shape == (2,)
    assert np.isfinite(np.asarray(nll)).all()
    logw = sdp.apply(params, x, mask, reverse=True, noise_scale=0.8,
                     rngs={"noise": KEY})
    assert logw.shape == (2, 9, 1)


def test_hifigan_generator_length():
    g = Generator(32, "1", (3, 5), ((1, 3), (1, 3)), (4, 4, 2, 2), 64,
                  (8, 8, 4, 4), gin_channels=16)
    x = jnp.ones((2, 10, 32))
    spk = jnp.ones((2, 1, 16))
    params = g.init(RNGS, x, spk)
    y = g.apply(params, x, spk)
    assert y.shape == (2, 10 * 64, 1)
    assert (np.abs(np.asarray(y)) <= 1).all()


def test_vocos_generator_length():
    g = VocosGenerator(32, 48, 96, 2 * (256 // 2 + 1), 2,
                       istft_n_fft=256, istft_hop_length=64,
                       istft_win_length=256, gin_channels=16)
    x = jnp.ones((2, 10, 32))
    spk = jnp.ones((2, 1, 16))
    params = g.init(RNGS, x, spk)
    y = g.apply(params, x, spk)
    assert y.shape == (2, 10 * 64, 1)


def test_discriminators_shapes():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 2048, 1)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 2048, 1)).astype(np.float32))
    mpd = MultiPeriodDiscriminator()
    params = mpd.init(RNGS, y, y_hat)
    rs, gs, fr, fg = mpd.apply(params, y, y_hat)
    assert len(rs) == len(gs) == 6
    # S: 6 convs + post = 7 fmaps; P: 5 convs + post = 6 fmaps
    assert len(fr[0]) == 7 and all(len(f) == 6 for f in fr[1:])

    mpmrd = MultiPeriodMultiResolutionDiscriminator(fft_sizes=(512, 256))
    params = mpmrd.init(RNGS, y, y_hat)
    rs, gs, fr, fg = mpmrd.apply(params, y, y_hat)
    assert len(rs) == 2 + 5


def test_discriminator_im2col():
    """DiscriminatorP's im2col path == the conv lowering, incl. grads.

    The gather+matmul formulation shares the exact params; kept as a
    measured-negative optimization candidate (see the im2col attribute
    docstring in models/discriminators.py)."""
    from wetts_tpu.models.discriminators import DiscriminatorP

    rnd = np.random.default_rng(0)
    x = jnp.asarray(rnd.standard_normal((2, 180, 1)).astype(np.float32))
    ref = DiscriminatorP(period=3, im2col=False)
    fast = DiscriminatorP(period=3, im2col=True)
    params = ref.init({"params": KEY}, x)
    lo, fo = ref.apply(params, x), fast.apply(params, x)
    np.testing.assert_allclose(np.asarray(lo[0]), np.asarray(fo[0]),
                               atol=1e-5)
    for a, b in zip(lo[1], fo[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    g1 = jax.grad(lambda p: jnp.sum(ref.apply(p, x)[0] ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(fast.apply(p, x)[0] ** 2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_duration_discriminators():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    mask = jnp.ones((2, 9, 1))
    dur = jnp.abs(jnp.asarray(rng.standard_normal((2, 9, 1)), jnp.float32))
    for cls in (DurationDiscriminatorV1, DurationDiscriminatorV2):
        d = cls(32, 64, 3, 0.1)
        params = d.init(RNGS, x, mask, dur, dur)
        probs = d.apply(params, x, mask, dur, dur)
        assert len(probs) == 2
        p = np.asarray(probs[0])
        assert ((p >= 0) & (p <= 1)).all()


def test_wavlm_discriminator():
    x = jnp.ones((2, 50, 768 * 13))
    d = WavLMDiscriminator()
    params = d.init(RNGS, x)
    out = d.apply(params, x)
    assert out.shape[0] == 2


def test_synthesizer_train_and_infer():
    cfg = tiny_config()
    model = Synthesizer.from_config(cfg)
    B, T_text, T_spec = 2, 11, 40
    x = jnp.ones((B, T_text), jnp.int32)
    xl = jnp.array([11, 8])
    y = jnp.zeros((B, T_spec, cfg.data.spec_channels))
    yl = jnp.array([40, 33])
    sid = jnp.array([0, 1])
    variables = model.init(RNGS, x, xl, y, yl, sid)
    out = model.apply(variables, x, xl, y, yl, sid,
                      rngs={"noise": KEY, "dropout": KEY, "slice": KEY})
    assert out["audio"].shape == (B, 2048, 1)
    assert out["attn"].shape == (B, T_spec, T_text)
    # alignment durations sum to spec lengths
    w = np.asarray(out["attn"].sum(axis=1))
    np.testing.assert_array_equal(w.sum(-1), np.asarray(yl))
    audio, ylen, attn = model.apply(
        variables, x, xl, sid, 0.667, 1.0, 0.8, 50,
        method=Synthesizer.infer, rngs={"noise": KEY})
    assert audio.shape == (B, 50 * 64, 1)


def test_synthesizer_vits2_features():
    cfg = tiny_config(
        use_transformer_flows=True, transformer_flow_type="pre_conv",
        use_noise_scaled_mas=True, use_spk_conditioned_encoder=True,
        use_mel_posterior_encoder=False, use_sdp=True)
    model = Synthesizer.from_config(cfg)
    B, T_text, T_spec = 2, 7, 30
    x = jnp.ones((B, T_text), jnp.int32)
    xl = jnp.array([7, 5])
    y = jnp.zeros((B, T_spec, cfg.data.spec_channels))
    yl = jnp.array([30, 22])
    sid = jnp.array([0, 1])
    variables = model.init(RNGS, x, xl, y, yl, sid, 0.01)
    out = model.apply(variables, x, xl, y, yl, sid, 0.01,
                      rngs={"noise": KEY, "dropout": KEY, "slice": KEY})
    assert np.isfinite(np.asarray(out["l_length"])).all()


@pytest.mark.parametrize("overrides", [
    {},
    {"use_transformer_flows": True, "transformer_flow_type": "pre_conv"},
], ids=["wn_flow", "transformer_flow"])
def test_flow_reverse_truncation_exact(overrides):
    """flow_reverse(z_p[:, :fb]) == flow_reverse(z_p)[:, :fb].

    The exactness contract behind running the flow INSIDE the lax.switch
    bucket branch (serving/engine.py:_synth_switch_fn, bench.py switch
    mode): every flow layer masks its conv inputs/outputs per y_mask, so
    truncating to any bucket covering y_lengths cannot change the valid
    region. encode_prior/flow_reverse are the split halves of
    encode_infer, so also pin their composition against it."""
    cfg = tiny_config(**overrides)
    model = Synthesizer.from_config(cfg)
    B, T_text, max_frames, fb = 2, 9, 64, 40
    x = jnp.ones((B, T_text), jnp.int32)
    xl = jnp.array([9, 6])
    y = jnp.zeros((B, 24, cfg.data.spec_channels))
    yl = jnp.array([24, 18])
    sid = jnp.array([0, 1])
    variables = model.init(RNGS, x, xl, y, yl, sid)

    z_p, y_len, y_mask, attn, g = model.apply(
        variables, x, xl, sid, 0.667, 1.2, 0.8, max_frames,
        method=Synthesizer.encode_prior, rngs={"noise": KEY})
    assert int(np.asarray(y_len).max()) <= fb  # bucket must cover lengths
    z_full, y_len2, _, _, _ = model.apply(
        variables, x, xl, sid, 0.667, 1.2, 0.8, max_frames,
        method=Synthesizer.encode_infer, rngs={"noise": KEY})
    np.testing.assert_array_equal(np.asarray(y_len), np.asarray(y_len2))
    z_trunc = model.apply(variables, z_p[:, :fb], y_mask[:, :fb], g,
                          method=Synthesizer.flow_reverse)
    np.testing.assert_allclose(
        np.asarray(z_trunc), np.asarray(z_full[:, :fb]), atol=1e-6)
    # beyond-bucket region of the full encode is masked to zero, so the
    # truncated latent loses nothing
    assert float(np.abs(np.asarray(z_full[:, fb:])).max()) == 0.0


def test_synthesizer_voice_conversion():
    cfg = tiny_config()
    model = Synthesizer.from_config(cfg)
    B, T_spec = 2, 24
    y = jnp.zeros((B, T_spec, cfg.data.spec_channels))
    yl = jnp.array([24, 18])
    variables = model.init(
        RNGS, jnp.ones((B, 5), jnp.int32), jnp.array([5, 5]), y, yl,
        jnp.array([0, 1]))
    o, mask, _ = model.apply(
        variables, y, yl, jnp.array([0, 1]), jnp.array([2, 2]),
        method=Synthesizer.voice_conversion, rngs={"noise": KEY})
    assert o.shape == (B, T_spec * 64, 1)
