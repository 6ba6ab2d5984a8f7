"""Training steps for the VITS2 feature family.

The shipped vits2_vocos_v1.json enables a feature set no other training
test executes: mel posterior encoder, transformer (pre_conv) flows,
noise-scaled MAS, duration discriminator, MRD discriminator, and the Vocos
decoder with its iSTFT inside the gradient path (reference flags
wetts/vits/train.py:82-203). These tests load that REAL config, shrink
only the sizes (XLA:CPU compile budget), and run 2 full GAN steps.

Gradient coverage: the step runs with plain SGD (update == -lr * grad
elementwise), so "this parameter moved" <=> "this parameter received a
nonzero gradient" — the analog of the reference's
DDP(find_unused_parameters=True) contract that every sub-network is
actually trained. Asserted per top-level module subtree (individual leaves
like attention key biases are mathematically zero-gradient).
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CFG = os.path.join(_REPO, "examples", "baker", "configs",
                    "vits2_vocos_v1.json")


def vits2_tiny_cfg():
    """The real vits2_vocos_v1.json with sizes shrunk, flags untouched."""
    from wetts_tpu.config import Config

    with open(_CFG) as f:
        d = json.load(f)
    d["train"].update({"segment_size": 512, "batch_size": 2})
    d["data"].update({"filter_length": 128, "hop_length": 32,
                      "win_length": 128, "sampling_rate": 8000,
                      "n_mel_channels": 20})
    d["model"].update({
        "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
        "n_layers": 1, "upsample_rates": [8, 4],
        "upsample_kernel_sizes": [16, 8], "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        "gin_channels": 8,
        "vocos_channels": 16, "vocos_h_channels": 32,
        # out = 2 * (n_fft // 2 + 1) for the iSTFT head
        "vocos_out_channels": 130, "vocos_num_layers": 2,
        "vocos_istft_config": {"n_fft": 128, "hop_length": 32,
                               "win_length": 128, "center": True},
    })
    cfg = Config.from_dict(d)
    cfg.num_phones = 8
    cfg.num_speakers = 2
    # flags must have survived untouched from the shipped config
    assert cfg.model.use_mel_posterior_encoder
    assert cfg.model.use_transformer_flows
    assert cfg.model.transformer_flow_type == "pre_conv"
    assert cfg.model.use_noise_scaled_mas
    assert cfg.model.use_duration_discriminator
    assert cfg.model.use_mrd_disc
    assert cfg.model.vocoder_type == "vocos"
    return cfg


def make_batch(cfg, b=2):
    hop = cfg.data.hop_length
    t_spec = cfg.train.segment_size // hop + 4
    rnd = np.random.default_rng(0)
    return {
        "phone_ids": jnp.asarray(rnd.integers(1, cfg.num_phones, (b, 8)),
                                 jnp.int32),
        "text_lengths": jnp.full((b,), 8, jnp.int32),
        "wav": jnp.asarray(
            rnd.standard_normal((b, t_spec * hop)).astype(np.float32) * 0.1),
        "spec_lengths": jnp.full((b,), t_spec, jnp.int32),
        "sid": jnp.asarray([0, 1], jnp.int32),
    }


def _subtree_moved(before, after):
    """{top-level module: max |delta| over its leaves}."""
    out = {}
    for key in before:
        deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              before[key], after[key])
        out[key] = max(jax.tree.leaves(deltas), default=0.0)
    return out


@pytest.mark.slow
def test_vits2_vocos_config_trains_two_steps():
    from tests.isolation import run_isolated

    if run_isolated(
            "tests/test_train_vits2.py::"
            "test_vits2_vocos_config_trains_two_steps"):
        return
    from wetts_tpu.train.state import GANTrainState
    from wetts_tpu.train.step import build_models, init_state, \
        make_train_step

    cfg = vits2_tiny_cfg()
    net_g, net_d, net_dur_d, _ = build_models(cfg)
    assert net_dur_d is not None
    # SGD => param deltas mirror gradients exactly (module docstring)
    tx = optax.sgd(1e-3)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, rng, net_g, net_d, net_dur_d, tx)
    step = jax.jit(make_train_step(cfg, net_g, net_d, net_dur_d, tx))
    batch = make_batch(cfg)

    p_g0 = jax.tree.map(jnp.copy, state.params_g)
    p_d0 = jax.tree.map(jnp.copy, state.params_d)
    p_dd0 = jax.tree.map(jnp.copy, state.params_dur_d)

    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))

    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert int(s2.step) == 2

    # noise-scaled MAS schedule decays with the (incrementing) step
    assert (float(m2["train/mas_noise_scale"])
            < float(m1["train/mas_noise_scale"])
            <= cfg.model.mas_noise_scale_initial)

    # every generator module received gradients, incl. the vocos decoder
    # through its iSTFT (dec), the pre_conv transformer flows (flow), and
    # the mel-posterior encoder (enc_q)
    moved_g = _subtree_moved(p_g0, s2.params_g)
    for mod in ("enc_p", "enc_q", "flow", "dp", "dec", "emb_g"):
        assert moved_g.get(mod, 0.0) > 0.0, (
            f"generator subtree {mod!r} received no gradient: {moved_g}")
    # every MRD sub-discriminator and the duration discriminator trained
    moved_d = _subtree_moved(p_d0, s2.params_d)
    assert all(v > 0.0 for v in moved_d.values()), moved_d
    moved_dd = _subtree_moved(p_dd0, s2.params_dur_d)
    assert any(v > 0.0 for v in moved_dd.values()), moved_dd


@pytest.mark.slow
def test_vits2_eval_step_runs():
    """The eval path under the same feature set (mel posterior reuse as
    mel target, reference train.py:624-693)."""
    from tests.isolation import run_isolated

    if run_isolated("tests/test_train_vits2.py::test_vits2_eval_step_runs"):
        return
    from wetts_tpu.train.state import make_optimizer
    from wetts_tpu.train.step import build_models, init_state, \
        make_eval_step

    cfg = vits2_tiny_cfg()
    net_g, net_d, net_dur_d, _ = build_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d, net_dur_d,
                       make_optimizer(cfg))
    eval_step = jax.jit(make_eval_step(cfg, net_g))
    metrics = eval_step(state.params_g, make_batch(cfg),
                        jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
