"""Component-wise device timing: where does a train step / switch synth go?

Times each jitted subgraph in isolation with the hard-block barrier
(utils/sync.py — block_until_ready lies through the axon tunnel) so the
sum of parts can be compared against the full graph. Used to attribute
the train-step MFU gap (VERDICT r4 item 2) and the switch-vs-fused
serving MFU gap (item 3) to specific subgraphs before optimizing them.

  --what train: spec prep | G fwd | G fwd+bwd | D pair fwd | D pair
                fwd+bwd | full step
  --what serve: encode_prior | flow@bucket | decode@bucket | full switch

Prints one JSON line: {component: seconds_per_iter, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = "/tmp/wetts_jax_cache_dev"


def _mark(msg):
    print(f"[prof {time.monotonic() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _time_compiled(compiled, args, iters, hard_block):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = compiled(*args)
        hard_block(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def profile_train(batch_size: int, iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from wetts_tpu.config import Config
    from wetts_tpu.train.step import (build_models, compute_spec, init_state,
                                      make_half_fns, make_train_step)
    from wetts_tpu.utils.sync import hard_block

    cfg = Config.from_dict({
        "train": {"segment_size": 8192, "batch_size": batch_size,
                  "bf16_run": True},
        "data": {"filter_length": 1024, "hop_length": 256,
                 "win_length": 1024, "sampling_rate": 22050},
        "model": {
            "inter_channels": 192, "hidden_channels": 192,
            "filter_channels": 768, "n_heads": 2, "n_layers": 6,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "1",
            "resblock_kernel_sizes": [3, 7, 11],
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            "upsample_rates": [8, 8, 2, 2],
            "upsample_initial_channel": 512,
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "gin_channels": 256,
        },
        "num_phones": 256, "num_speakers": 8,
    })
    net_g, net_d, net_dur_d, _ = build_models(cfg)
    tx = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)
    rng = jax.random.PRNGKey(0)
    state = jax.jit(
        lambda r: init_state(cfg, r, net_g, net_d, net_dur_d, tx))(rng)
    jax.block_until_ready(state.params_g)
    _mark("params initialized")

    b, t_text, t_spec = batch_size, 96, 400
    rnd = np.random.default_rng(0)
    batch = {
        "phone_ids": jnp.asarray(rnd.integers(0, 256, (b, t_text)),
                                 jnp.int32),
        "text_lengths": jnp.full((b,), t_text, jnp.int32),
        "wav": jnp.asarray(
            0.1 * rnd.standard_normal((b, t_spec * 256)).astype(np.float32)),
        "spec_lengths": jnp.full((b,), t_spec, jnp.int32),
        "sid": jnp.zeros((b,), jnp.int32),
    }
    cast_half, _, half_apply = make_half_fns(True)
    key = jax.random.PRNGKey(1)
    rngs = {"noise": key, "dropout": key, "slice": key}
    params_g_h = cast_half(state.params_g)
    params_d_h = cast_half(state.params_d)
    spec = jax.jit(lambda w: compute_spec(cfg, w))(batch["wav"])
    out = {}

    def timeit(name, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        hard_block(c(*args))
        dt = _time_compiled(c, args, iters, hard_block)
        out[name] = round(dt * 1000, 2)
        _mark(f"{name}: {dt * 1000:.1f} ms")

    timeit("spec_prep_ms", lambda w: compute_spec(cfg, w), batch["wav"])

    def g_fwd(pg, spec):
        return half_apply(net_g, pg, batch["phone_ids"],
                          batch["text_lengths"], spec,
                          batch["spec_lengths"], batch["sid"], 0.0,
                          rngs=rngs)

    timeit("g_fwd_ms", g_fwd, params_g_h, spec)

    def g_fwd_bwd(pg, spec):
        def loss(pg):
            o = g_fwd(pg, spec)
            return (jnp.mean(jnp.square(o["audio"].astype(jnp.float32)))
                    + jnp.mean(o["l_length"]))
        return jax.grad(loss)(pg)

    timeit("g_fwd_bwd_ms", g_fwd_bwd, params_g_h, spec)

    y0 = jnp.asarray(0.1 * rnd.standard_normal(
        (b, 8192, 1)).astype(np.float32))

    def d_pair(pd, y, y_hat):
        return half_apply(net_d, pd, y, y_hat)

    timeit("d_pair_fwd_ms", d_pair, params_d_h, y0, y0)

    def d_pair_bwd(pd, y, y_hat):
        def loss(pd):
            y_d_r, y_d_g, _, _ = d_pair(pd, y, y_hat)
            return sum(jnp.mean(jnp.square(l.astype(jnp.float32)))
                       for l in list(y_d_r) + list(y_d_g))
        return jax.grad(loss)(pd)

    timeit("d_pair_fwd_bwd_ms", d_pair_bwd, params_d_h, y0, y0)

    step = make_train_step(cfg, net_g, net_d, net_dur_d, tx)
    step_c = jax.jit(step).lower(state, batch, key).compile()
    hard_block(step_c(state, batch, key)[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, metrics = state, None
        for _ in range(iters):
            st, metrics = step_c(st, batch, key)
        hard_block(metrics)
        best = min(best, (time.perf_counter() - t0) / iters)
    out["full_step_ms"] = round(best * 1000, 2)
    _mark(f"full_step: {best * 1000:.1f} ms")
    return out


def profile_disc(batch_size: int, iters: int):
    """Per-sub-discriminator timing: which of S/P(2,3,5,7,11) eats the
    22 ms D-pair forward (13% MFU measured via --what train)?"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wetts_tpu.models.discriminators import (DiscriminatorP,
                                                 DiscriminatorS)
    from wetts_tpu.utils.sync import hard_block

    rnd = np.random.default_rng(0)
    y = jnp.asarray(
        0.1 * rnd.standard_normal((batch_size, 8192, 1)).astype(np.float32),
        jnp.bfloat16)
    out = {}

    def timeit(name, mod):
        params = mod.init(jax.random.PRNGKey(0), y)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

        def fwd(p, y):
            return mod.apply(p, y)

        c = jax.jit(fwd).lower(params, y).compile()
        hard_block(c(params, y))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = c(params, y)
            hard_block(o)
            best = min(best, (time.perf_counter() - t0) / iters)
        out[name] = round(best * 1000, 2)
        _mark(f"{name}: {best * 1000:.2f} ms")

    timeit("disc_s_ms", DiscriminatorS())
    for p in (2, 3, 5, 7, 11):
        timeit(f"disc_p{p}_ms", DiscriminatorP(period=p))
    return out


def profile_serve(batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from wetts_tpu.config import Config
    from wetts_tpu.models.hifigan_fast import fast_generator_apply
    from wetts_tpu.models.synthesizer import Synthesizer
    from wetts_tpu.utils.sync import hard_block

    cfg = Config.from_dict({
        "train": {"segment_size": 8192},
        "data": {"filter_length": 1024, "hop_length": 256,
                 "win_length": 1024, "sampling_rate": 22050},
        "model": {
            "inter_channels": 192, "hidden_channels": 192,
            "filter_channels": 768, "n_heads": 2, "n_layers": 6,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "1",
            "resblock_kernel_sizes": [3, 7, 11],
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            "upsample_rates": [8, 8, 2, 2],
            "upsample_initial_channel": 512,
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "gin_channels": 256,
        },
        "num_phones": 256, "num_speakers": 8,
    })
    model = Synthesizer.from_config(cfg)
    m = cfg.model
    B, T_TEXT, MAX_FRAMES, FB = batch, 128, 800, 352
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, T_TEXT), 0, 256)
    xl = jnp.full((B,), T_TEXT, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    rngs = {"params": rng, "noise": rng, "dropout": rng, "slice": rng}
    spec = jnp.zeros((2, 64, cfg.data.spec_channels))
    variables = jax.jit(model.init)(
        rngs, x[:2], xl[:2], spec, jnp.full((2,), 64, jnp.int32), sid[:2])
    jax.block_until_ready(variables)
    _mark("params initialized")
    out = {}

    def timeit(name, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        hard_block(c(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = c(*args)
            hard_block(o)
            best = min(best, (time.perf_counter() - t0) / iters)
        out[name] = round(best * 1000, 2)
        _mark(f"{name}: {best * 1000:.1f} ms")
        return c

    def encode_prior(x, xl, sid, key):
        z_p, y_lengths, y_mask, attn, g = model.apply(
            variables, x, xl, sid, 0.667, 1.0, 0.8, MAX_FRAMES,
            method=Synthesizer.encode_prior, rngs={"noise": key})
        return z_p, y_lengths, y_mask, g

    key = jax.random.PRNGKey(1)
    enc_c = timeit("encode_prior_ms", encode_prior, x, xl, sid, key)
    z_p, y_len, y_mask, g = enc_c(x, xl, sid, key)
    z_p, y_mask = z_p[:, :FB], y_mask[:, :FB]
    jax.block_until_ready(z_p)

    def flow_rev(z_p, y_mask, g):
        return model.apply(variables, z_p, y_mask, g,
                           method=Synthesizer.flow_reverse)

    flow_c = timeit(f"flow_{FB}_ms", flow_rev, z_p, y_mask, g)
    z = flow_c(z_p, y_mask, g)
    jax.block_until_ready(z)

    def decode(z, g):
        return fast_generator_apply(
            variables["params"]["dec"], z, g, dtype=jnp.bfloat16,
            resblock=m.resblock,
            resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in m.resblock_dilation_sizes),
            upsample_rates=tuple(m.upsample_rates),
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=tuple(m.upsample_kernel_sizes))

    timeit(f"decode_{FB}_ms", decode, z, g)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["train", "serve", "disc"],
                    default="train")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    if args.what == "train":
        out = profile_train(args.batch or 32, args.iters)
    elif args.what == "disc":
        out = profile_disc(args.batch or 32, args.iters)
    else:
        out = profile_serve(args.batch or 16, args.iters)
    out["what"] = args.what
    print(json.dumps(out))


if __name__ == "__main__":
    main()
