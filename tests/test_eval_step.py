"""Validation eval step: finite losses, no parameter updates involved."""

import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.train.state import make_optimizer
from wetts_tpu.train.step import build_models, init_state, make_eval_step


def test_eval_step(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_train import tiny_cfg

    cfg = tiny_cfg()
    cfg.num_phones = 8
    cfg.num_speakers = 2
    net_g, net_d, net_dur_d, _net_wd = build_models(cfg)
    tx = make_optimizer(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d, net_dur_d,
                       tx)
    eval_step = jax.jit(make_eval_step(cfg, net_g))
    seg = cfg.train.segment_size
    hop = cfg.data.hop_length
    t_spec = seg // hop + 4
    b = 2
    batch = {
        "phone_ids": jnp.ones((b, 8), jnp.int32),
        "text_lengths": jnp.full((b,), 8, jnp.int32),
        "wav": jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (b, t_spec * hop)).astype(np.float32) * 0.1),
        "spec_lengths": jnp.full((b,), t_spec, jnp.int32),
        "sid": jnp.zeros((b,), jnp.int32),
    }
    metrics = eval_step(state.params_g, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert set(metrics) == {"val/mel_l1", "val/kl", "val/dur"}
