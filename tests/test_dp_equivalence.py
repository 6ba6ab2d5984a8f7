"""Data-parallel numerical equivalence: N-device update == 1-device update.

DDP's contract is that training on N devices with a sharded global batch
produces the same update as large-batch single-device training
(wetts/vits/train.py:212-225). The multichip dryrun proves the mesh step
RUNS; this test asserts the actual correctness statement: the same global
batch + same rng through the jitted GAN step on an 8-virtual-device mesh
and on a 1-device mesh yields the same metrics and the same updated
parameters (up to fp32 reduction-order noise).

The config turns ON the duration discriminator AND the WavLM (SLM)
discriminator branch (with an injected deterministic feature extractor),
so all FOUR optimizer trees execute under sharding — the WavLM-D branch
had never run on a mesh before this test.

Adam eps is set to 1e-2 for the comparison: with eps=1e-9 the first AdamW
update is lr*sign(grad), and parameters whose gradients are mathematically
zero (softmax-shift-invariant attention key biases) flip to +-lr on psum
reduction-order noise. Same rationale as tests/test_update_parity.py.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_dp_update_equivalence():
    from tests.isolation import run_isolated

    if run_isolated("tests/test_dp_equivalence.py::test_dp_update_equivalence",
                    timeout=3000):
        return

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _dryrun_config
    from wetts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from wetts_tpu.train.state import make_optimizer
    from wetts_tpu.train.step import build_models, init_state, make_train_step

    # compile-time over step-time: one step per mesh on a 2-vCPU host
    jax.config.update("jax_optimization_level", "O0")
    jax.config.update("jax_memory_fitting_level", "O0")
    jax.config.update("jax_compilation_cache_dir", None)

    cfg = _dryrun_config()
    cfg.model.use_duration_discriminator = True
    cfg.model.use_wd = True
    cfg.model.slm_hidden = 8
    cfg.model.slm_nlayers = 2
    cfg.model.slm_initial_channel = 8
    cfg.train.eps = 1e-2  # see module docstring

    net_g, net_d, net_dur_d, net_wd = build_models(cfg)

    feat_dim = cfg.model.slm_hidden * cfg.model.slm_nlayers
    proj = jnp.asarray(
        np.sin(np.arange(64 * feat_dim, dtype=np.float32)).reshape(
            64, feat_dim) * 0.1)

    def slm_feature_fn(wav):
        """Deterministic stand-in for the frozen WavLM: frame + project."""
        b, t = wav.shape[0], wav.shape[1]
        frames = wav[:, : (t // 64) * 64, 0].reshape(b, t // 64, 64)
        return frames @ proj

    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state0 = init_state(cfg, rng, net_g, net_d, net_dur_d, tx, net_wd,
                        slm_feature_fn)
    train_step = make_train_step(cfg, net_g, net_d, net_dur_d, tx, net_wd,
                                 slm_feature_fn, use_fast_decoder=False)

    b = 8
    t_spec = cfg.train.segment_size // cfg.data.hop_length + 8
    t_wav = t_spec * cfg.data.hop_length
    rnd = np.random.default_rng(7)
    batch_np = {
        "phone_ids": rnd.integers(1, cfg.num_phones, (b, 16)).astype(np.int32),
        "text_lengths": np.array([16, 14, 16, 12, 16, 15, 13, 16], np.int32),
        "wav": (rnd.standard_normal((b, t_wav)) * 0.2).astype(np.float32),
        "spec_lengths": np.full((b,), t_spec, np.int32),
        "sid": (np.arange(b) % cfg.num_speakers).astype(np.int32),
    }
    step_rng = jax.random.PRNGKey(3)

    def run_on(n_devices):
        mesh = make_mesh(n_devices)
        state = replicate(mesh, state0)
        batch = shard_batch(mesh, {k: jnp.asarray(v)
                                   for k, v in batch_np.items()})
        repl = NamedSharding(mesh, P())
        step = jax.jit(train_step,
                       in_shardings=(repl, NamedSharding(mesh, P("data")),
                                     repl),
                       out_shardings=(repl, repl))
        new_state, metrics = step(state, batch, step_rng)
        jax.block_until_ready(new_state.params_g)
        return jax.device_get(new_state), {k: float(v)
                                           for k, v in metrics.items()}

    state8, metrics8 = run_on(8)
    state1, metrics1 = run_on(1)

    for k in metrics1:
        assert metrics8[k] == pytest.approx(metrics1[k], rel=2e-4,
                                            abs=2e-4), (
            f"metric {k}: 8-dev {metrics8[k]} vs 1-dev {metrics1[k]}")

    for tree_name in ("params_g", "params_d", "params_dur_d", "params_wd"):
        t8 = getattr(state8, tree_name)
        t1 = getattr(state1, tree_name)
        worst = (0.0, None)
        for (kp, a), (_, bb) in zip(
                jax.tree_util.tree_flatten_with_path(t8)[0],
                jax.tree_util.tree_flatten_with_path(t1)[0]):
            err = float(np.max(np.abs(np.asarray(a) - np.asarray(bb))))
            if err > worst[0]:
                worst = (err, jax.tree_util.keystr(kp))
        # updates are bounded by lr=2e-4; equivalence must hold well below
        assert worst[0] < 2e-6, (
            f"{tree_name}: 8-dev vs 1-dev diverged by {worst[0]:.2e} "
            f"at {worst[1]}")
