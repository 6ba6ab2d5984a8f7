"""Mixed-precision (bf16) training step.

The reference gates fp16 AMP + GradScaler on `train.fp16_run`
(wetts/vits/train.py:310,390,436-507). Here the same flag selects bfloat16
compute with fp32 master params (no loss scaling needed on TPU); this test
checks the bf16 step runs, keeps params/opt-state fp32, updates params, and
tracks the fp32 step's losses to coarse (half-precision) tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train import tiny_cfg


def _make_batch(cfg, rng):
    d = cfg.data
    b, t_text = 2, 12
    n_samples = 60 * d.hop_length
    wav = 0.3 * rng.standard_normal((b, n_samples)).astype(np.float32)
    return {
        "phone_ids": jnp.asarray(rng.integers(0, 8, (b, t_text)), jnp.int32),
        "text_lengths": jnp.full((b,), t_text, jnp.int32),
        "wav": jnp.asarray(wav),
        "wav_lengths": jnp.full((b,), n_samples, jnp.int32),
        "spec_lengths": jnp.full((b,), 60, jnp.int32),
        "sid": jnp.zeros((b,), jnp.int32),
    }


def _run_step(cfg, batch):
    import optax

    from wetts_tpu.train.step import build_models, init_state, make_train_step

    net_g, net_d, net_dur_d, net_wd = build_models(cfg)
    tx = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)
    state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d, net_dur_d,
                       tx)
    step = jax.jit(make_train_step(cfg, net_g, net_d, net_dur_d, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    return state, new_state, jax.device_get(metrics)


def test_bf16_step_matches_fp32_coarsely():
    rng = np.random.default_rng(3)
    cfg32 = tiny_cfg()
    cfg32.num_phones, cfg32.num_speakers = 8, 2
    batch = _make_batch(cfg32, rng)
    state0, state32, m32 = _run_step(cfg32, batch)

    cfg16 = tiny_cfg()
    cfg16.num_phones, cfg16.num_speakers = 8, 2
    cfg16.train.bf16_run = True
    _, state16, m16 = _run_step(cfg16, batch)

    # params and optimizer state stay fp32 (master weights)
    leaves = jax.tree.leaves(state16.params_g)
    assert all(l.dtype == jnp.float32 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    opt_leaves = jax.tree.leaves(state16.opt_g)
    assert all(l.dtype == jnp.float32 for l in opt_leaves
               if hasattr(l, "dtype")
               and jnp.issubdtype(l.dtype, jnp.floating))

    # every loss finite, and params actually moved
    for k, v in m16.items():
        assert np.isfinite(v), (k, v)
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state0.params_g, state16.params_g)
    assert max(jax.tree.leaves(moved)) > 0

    # coarse agreement with the fp32 step on the deterministic loss terms
    # (identical PRNG draws; bf16 has ~3 decimal digits)
    for k in ("loss/disc", "loss/mel"):
        assert abs(m16[k] - m32[k]) / (abs(m32[k]) + 1e-6) < 0.15, (
            k, m16[k], m32[k])
