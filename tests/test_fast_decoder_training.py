"""Training forward with the fast decoder: identical audio, flowing grads."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.models.synthesizer import Synthesizer

KEY = jax.random.PRNGKey(0)
RNGS = {"noise": KEY, "dropout": KEY, "slice": KEY}


def test_training_forward_fast_equals_standard():
    sys.path.insert(0, "tests")
    from test_models import tiny_config

    cfg = tiny_config(upsample_initial_channel=256)  # stages 128,64,32,16
    model_std = Synthesizer.from_config(cfg)
    B, T_text, T_spec = 2, 11, 40
    x = jnp.ones((B, T_text), jnp.int32)
    xl = jnp.array([11, 8])
    y = jnp.zeros((B, T_spec, cfg.data.spec_channels))
    yl = jnp.array([40, 33])
    sid = jnp.array([0, 1])
    variables = model_std.init({"params": KEY, **RNGS}, x, xl, y, yl, sid)

    out_std = model_std.apply(variables, x, xl, y, yl, sid,
                              deterministic=True, rngs=RNGS)
    model_fast = model_std.clone(use_fast_decoder=True)
    out_fast = model_fast.apply(variables, x, xl, y, yl, sid,
                                deterministic=True, rngs=RNGS)
    np.testing.assert_allclose(np.asarray(out_fast["audio"]),
                               np.asarray(out_std["audio"]), atol=3e-5)

    # gradients flow to the decoder params through the fast path
    def loss(params):
        o = model_fast.apply({"params": params}, x, xl, y, yl, sid,
                             deterministic=True, rngs=RNGS)
        return (o["audio"] ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    dec_norm = sum(float(jnp.abs(g).sum())
                   for g in jax.tree.leaves(grads["dec"]))
    assert dec_norm > 0.0
