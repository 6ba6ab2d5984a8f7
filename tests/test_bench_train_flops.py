"""Validate the train-step FLOP assembly in tools/bench_train.py.

The train MFU is computed as XLA-counted FORWARD subgraph FLOPs times
step-structure multipliers (spec x1, G fwd x2, G bwd x2, D pair x4.5,
mel x3), because XLA's cost_analysis of the full training graph
overcounts grad-of-conv FLOPs. The multiplier logic itself is validated
here on a conv-free (matmul-only) GAN step with the same structure —
matmul gradients ARE counted correctly by XLA, so the full-step count is
a trustworthy oracle for the assembly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mlp_apply(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return x


def _mlp_init(rng, sizes):
    params = []
    for i in range(len(sizes) - 1):
        rng, k = jax.random.split(rng)
        params.append((jax.random.normal(k, (sizes[i], sizes[i + 1]))
                       * 0.1, jnp.zeros((sizes[i + 1],))))
    return params


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    flops = float(c.cost_analysis().get("flops", 0.0))
    assert flops > 0, "cost_analysis returned no flops on this backend"
    return flops


def test_gan_step_multiplier_assembly_matches_xla():
    """XLA full-step count of a matmul GAN step ~= the bench assembly
    2*F_G(fwd) + 2*F_G(bwd) + 4.5*F_D_pair."""
    rng = jax.random.PRNGKey(0)
    # big enough that the tanh/loss elementwise tail is negligible
    g_params = _mlp_init(rng, (256, 512, 512, 256))
    d_params = _mlp_init(jax.random.PRNGKey(1), (256, 512, 512, 1))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, 256)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((8, 256)).astype(np.float32))

    def d_pair(pd, real, fake):
        return _mlp_apply(pd, real), _mlp_apply(pd, fake)

    def gan_step(pg, pd, x, y):
        # mirror train/step.py: stop-grad G fwd for the D update, then a
        # separate G fwd under the G-loss grad; no optimizer (the bench
        # excludes its elementwise cost too)
        y_hat = jax.lax.stop_gradient(_mlp_apply(pg, x))

        def d_loss(pd_):
            d_r, d_g = d_pair(pd_, y, y_hat)
            return jnp.mean((d_r - 1.0) ** 2) + jnp.mean(d_g**2)

        loss_d, grads_d = jax.value_and_grad(d_loss)(pd)

        def g_loss(pg_):
            y_hat_g = _mlp_apply(pg_, x)
            d_r, d_g = d_pair(pd, y, y_hat_g)
            return jnp.mean((d_g - 1.0) ** 2) + 0.0 * jnp.sum(d_r)

        loss_g, grads_g = jax.value_and_grad(g_loss)(pg)
        return loss_d, loss_g, grads_d, grads_g

    f_g = _cost(lambda pg: _mlp_apply(pg, x), g_params)
    f_d_pair = _cost(lambda pd: d_pair(pd, y, y), d_params)
    f_step = _cost(gan_step, g_params, d_params, x, y)

    assembled = 2.0 * f_g + 2.0 * f_g + 4.5 * f_d_pair
    # matmul grads are exact in XLA's count; the residual gap is the
    # elementwise losses/tanh grads the assembly deliberately excludes
    assert assembled == pytest.approx(f_step, rel=0.12), (
        assembled, f_step)


def test_train_step_flops_positive_and_below_xla():
    """On the real (conv) train step, the analytic assembly must be
    positive and strictly below XLA's overcounting full-graph figure."""
    import optax

    from tools.bench_train import _train_step_flops
    from wetts_tpu.config import Config
    from wetts_tpu.train.step import build_models, init_state, \
        make_train_step

    cfg = Config.from_dict({
        "train": {"segment_size": 1024, "batch_size": 2, "bf16_run": False},
        "data": {"filter_length": 256, "hop_length": 64, "win_length": 256,
                 "sampling_rate": 8000},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [4, 4, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8, 4, 4], "gin_channels": 8,
        },
        "num_phones": 16, "num_speakers": 2})
    net_g, net_d, net_dur_d, _ = build_models(cfg)
    tx = optax.adamw(2e-4)
    state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d, net_dur_d,
                       tx)
    b, t_text, t_spec = 2, 12, 40
    rnd = np.random.default_rng(0)
    batch = {
        "phone_ids": jnp.asarray(rnd.integers(0, 16, (b, t_text)),
                                 jnp.int32),
        "text_lengths": jnp.full((b,), t_text, jnp.int32),
        "wav": jnp.asarray(0.1 * rnd.standard_normal(
            (b, t_spec * 64)).astype(np.float32)),
        "spec_lengths": jnp.full((b,), t_spec, jnp.int32),
        "sid": jnp.zeros((b,), jnp.int32),
    }
    analytic = _train_step_flops(cfg, net_g, net_d, state, batch,
                                 bf16=False)
    assert analytic > 0
    step = jax.jit(make_train_step(cfg, net_g, net_d, net_dur_d, tx,
                                   use_fast_decoder=False))
    xla_full = float(step.lower(state, batch, jax.random.PRNGKey(1))
                     .compile().cost_analysis().get("flops", 0.0))
    if xla_full > 0:
        # XLA overcounts grad convs; the analytic assembly must sit below
        assert analytic < xla_full * 1.05, (analytic, xla_full)
