"""Full 4-network training step (G + MPD + duration-D + WavLM-D)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_train_step_with_slm_branch():
    sys.path.insert(0, "tests")
    from test_train import tiny_cfg

    from wetts_tpu.models.wavlm import WavLMConfig, WavLMModel, \
        make_slm_feature_fn
    from wetts_tpu.train.state import make_optimizer
    from wetts_tpu.train.step import build_models, init_state, \
        make_train_step

    cfg = tiny_cfg()
    cfg.num_phones = 8
    cfg.num_speakers = 2
    cfg.model.use_duration_discriminator = True
    cfg.model.use_wd = True
    wcfg = WavLMConfig.tiny()
    cfg.model.slm_hidden = wcfg.hidden_size
    cfg.model.slm_nlayers = wcfg.num_layers + 1
    cfg.model.slm_initial_channel = 8
    cfg.model.slm_sr = 8000  # == sampling rate -> no resample in tiny test

    net_g, net_d, net_dur_d, net_wd = build_models(cfg)
    assert net_wd is not None
    rng = jax.random.PRNGKey(0)
    wparams = WavLMModel(wcfg).init(rng, jnp.zeros((1, 400)))["params"]
    feature_fn = make_slm_feature_fn(wcfg, wparams,
                                     model_sr=cfg.data.sampling_rate,
                                     slm_sr=cfg.model.slm_sr)
    tx = make_optimizer(cfg)
    state = init_state(cfg, rng, net_g, net_d, net_dur_d, tx, net_wd,
                       feature_fn)
    assert state.params_wd is not None
    train_step = jax.jit(make_train_step(cfg, net_g, net_d, net_dur_d, tx,
                                         net_wd, feature_fn))
    hop = cfg.data.hop_length
    t_spec = cfg.train.segment_size // hop + 4
    b = 2
    batch = {
        "phone_ids": jnp.ones((b, 8), jnp.int32),
        "text_lengths": jnp.full((b,), 8, jnp.int32),
        "wav": jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, t_spec * hop)).astype(np.float32) * 0.1),
        "spec_lengths": jnp.full((b,), t_spec, jnp.int32),
        "sid": jnp.zeros((b,), jnp.int32),
    }
    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss/slm_disc", "loss/slm_feat", "loss/slm_gen",
              "loss/dur_disc", "loss/dur_gen", "loss/g_total"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # WavLM-D actually updated
    delta = jax.tree.map(lambda a, b_: float(jnp.abs(a - b_).max()),
                         state.params_wd, new_state.params_wd)
    assert max(jax.tree.leaves(delta)) > 0
