"""Determinism: fixed seeds reproduce synthesis and training exactly.

The reference's determinism story is fixed seeds + cudnn.benchmark=False
(train.py:33,40); XLA is deterministic by default on TPU/CPU, so here we
can assert bit-equality rather than hope.
"""

import jax
import numpy as np

from tests.test_serving import engine  # noqa: F401 (fixture)


def test_engine_same_seed_same_audio(engine):  # noqa: F811
    import copy

    from wetts_tpu.serving.engine import SynthesisEngine

    e1 = SynthesisEngine(engine.cfg, engine.params, engine.phone2id,
                         engine.speaker2id, seed=7)
    e2 = SynthesisEngine(engine.cfg, engine.params, engine.phone2id,
                         engine.speaker2id, seed=7)
    a1 = e1.synthesize("a b c a b")
    a2 = e2.synthesize("a b c a b")
    np.testing.assert_array_equal(a1, a2)
    # different seed -> different duration draws (stochastic DP)
    e3 = SynthesisEngine(engine.cfg, engine.params, engine.phone2id,
                         engine.speaker2id, seed=8)
    a3 = e3.synthesize("a b c a b")
    assert a3.shape != a1.shape or not np.array_equal(a3, a1)


def test_train_step_bitwise_reproducible():
    import jax.numpy as jnp
    import optax

    from tests.test_train import tiny_cfg
    from tests.test_train_bf16 import _make_batch
    from wetts_tpu.train.step import build_models, init_state, \
        make_train_step

    cfg = tiny_cfg()
    cfg.num_phones, cfg.num_speakers = 8, 2
    batch = _make_batch(cfg, np.random.default_rng(5))

    def run():
        net_g, net_d, net_dur_d, _ = build_models(cfg)
        tx = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)
        state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d,
                           net_dur_d, tx)
        step = jax.jit(make_train_step(cfg, net_g, net_d, net_dur_d, tx))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
        return jax.device_get(metrics)

    m1, m2 = run(), run()
    for k in m1:
        assert float(m1[k]) == float(m2[k]), (k, m1[k], m2[k])
