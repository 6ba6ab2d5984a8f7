"""Training-step throughput benchmark (VITS-base GAN step).

The reference publishes no training-throughput numbers (SURVEY §6); this
tool records utterances/s and segment-audio-seconds/s for the full GAN
update (D -> G, reference train.py:366-507 semantics) at the Baker v1
config size (batch 32/GPU, segment 8192 samples — v1.json:10,13), plus the
bf16 mixed-precision variant, so chip-to-chip comparisons are possible.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(bf16: bool, batch_size: int, iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from wetts_tpu.config import Config
    from wetts_tpu.train.step import build_models, init_state, make_train_step

    cfg = Config.from_dict({
        "train": {"segment_size": 8192, "batch_size": batch_size,
                  "bf16_run": bf16},
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
    # jitted init: eager init through a remote-attached TPU is thousands
    # of ~30-50ms RPCs; one compiled program is seconds
    state = jax.jit(
        lambda r: init_state(cfg, r, net_g, net_d, net_dur_d, tx))(rng)
    jax.block_until_ready(state.params_g)
    step = jax.jit(make_train_step(cfg, net_g, net_d, net_dur_d, tx),
                   donate_argnums=(0,))

    b, t_text, t_spec = batch_size, 96, 400  # ~4.6 s utterances
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
    # XLA-counted FLOPs of the compiled step (for the MFU line); the same
    # lowering is reused for execution so nothing compiles twice
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    try:
        step_flops = float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        step_flops = 0.0
    state, metrics = compiled(state, batch, jax.random.PRNGKey(1))  # warmup
    jax.block_until_ready(metrics)

    # best-of-3 passes: transient tunnel latency spikes can inflate a
    # single pass through a remote-attached chip (see bench.py's timed
    # loop); the minimum reflects the chip
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = compiled(state, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(metrics)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
             "v6e": 918.0, "v6 lite": 918.0}
    peak = next((v for k, v in peaks.items() if k in kind), None)
    out = {
        "steps_per_s": round(1.0 / dt, 3),
        "utts_per_s": round(batch_size / dt, 1),
        "audio_s_per_s": round(batch_size * t_spec * 256 / 22050 / dt, 1),
        "model_tflops_per_s": round(step_flops / dt / 1e12, 2),
    }
    if peak:
        mfu = 100.0 * step_flops / dt / 1e12 / peak
        if mfu <= 100.0:
            out["mfu_pct"] = round(mfu, 2)
        else:
            # XLA cost_analysis overcounts grad-of-conv FLOPs (transposed
            # convs with padding-inflated dims), producing >peak numbers
            # for training graphs; don't report a bogus utilization
            out["xla_flops_overcounted"] = True
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip_bf16", action="store_true")
    ap.add_argument("--skip_fp32", action="store_true",
                    help="bf16-only run (bench.py's driver extras use this "
                         "to avoid a second full-size train-step compile)")
    args = ap.parse_args()
    out = {"metric": "train_step_throughput_vits_base",
           "batch_size": args.batch_size}
    if not args.skip_fp32:
        out["fp32"] = run_once(False, args.batch_size, args.iters)
    if not args.skip_bf16:
        out["bf16"] = run_once(True, args.batch_size, args.iters)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
