"""Benchmark: audio-seconds synthesized per second per chip (VITS-base).

Runs the full jitted inference pipeline (text encoder -> SDP reverse ->
generate_path -> flow reverse -> HiFi-GAN decoder) at the reference's
VITS-base size (examples/baker/configs/v1.json: hidden 192, filter 768,
6 layers, upsample 8*8*2*2=256, 22.05 kHz) with static shapes
(B x max_frames), and reports synthesized-audio seconds per wall second.

Baseline: the reference's only published synthesis-speed figure is streaming
RTF 0.15 on one CPU core (runtime/cpu_triton_stream/README.md:19-31) =
6.67 audio-s/s; vs_baseline is measured against that. The north-star target
is >=500 audio-s/s per chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import contextlib
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"],
                    help="decoder compute dtype. Default bf16 — the "
                         "half-precision serving path (drift <~1e-3; "
                         "tests/test_hifigan_fast.py), an apples-to-apples "
                         "peer of the reference's published number, which "
                         "is measured on a uint8-dynamically-quantized "
                         "model (cpu_triton_stream/README.md). f32 = the "
                         "exact parity path used by the allclose tests.")
    ap.add_argument("--batch", type=int, default=16)
    cli = ap.parse_args()
    from wetts_tpu.config import Config
    from wetts_tpu.models.synthesizer import Synthesizer

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
    from wetts_tpu.models.hifigan_fast import fast_generator_apply

    model = Synthesizer.from_config(cfg)

    B, T_TEXT, MAX_FRAMES = cli.batch, 128, 800
    hop, sr = cfg.data.hop_length, cfg.data.sampling_rate

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, T_TEXT), 0, 256)
    xl = jnp.full((B,), T_TEXT, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    rngs = {"params": rng, "noise": rng, "dropout": rng, "slice": rng}
    spec = jnp.zeros((2, 64, cfg.data.spec_channels))
    variables = model.init(
        rngs, x[:2], xl[:2], spec, jnp.full((2,), 64, jnp.int32), sid[:2])
    m = cfg.model

    dec_dtype = jnp.bfloat16 if cli.dtype == "bf16" else None

    @jax.jit
    def synth(x, xl, sid, key):
        # full pipeline with the space-to-depth decoder (exact-equal to
        # Synthesizer.infer; see models/hifigan_fast.py + its tests)
        z, y_lengths, y_mask, attn, g = model.apply(
            variables, x, xl, sid, 0.667, 1.0, 0.8, MAX_FRAMES,
            method=Synthesizer.encode_infer, rngs={"noise": key})
        audio = fast_generator_apply(
            variables["params"]["dec"], z, g, dtype=dec_dtype,
            resblock=m.resblock,
            resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in m.resblock_dilation_sizes),
            upsample_rates=tuple(m.upsample_rates),
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=tuple(m.upsample_kernel_sizes))
        return audio, y_lengths

    # warmup / compile
    audio, _ = synth(x, xl, sid, jax.random.PRNGKey(1))
    jax.block_until_ready(audio)
    # XLA's own FLOP count for the compiled executable (for the MFU line)
    try:
        cost = synth.lower(
            x, xl, sid, jax.random.PRNGKey(0)).compile().cost_analysis()
        flops_per_call = float(cost.get("flops", 0.0))
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        flops_per_call = 0.0

    from wetts_tpu.utils.profiling import device_trace

    trace = (device_trace(cli.profile) if cli.profile
             else contextlib.nullcontext())
    iters = 10
    lengths = []
    with trace:
        t0 = time.perf_counter()
        for i in range(iters):
            audio, y_lengths = synth(x, xl, sid, jax.random.PRNGKey(i))
            lengths.append(y_lengths)
        jax.block_until_ready(audio)
        dt = time.perf_counter() - t0

    # honest accounting: audio seconds = sum of TRUE generated lengths
    # (sum(y_lengths), reference RTF definition inference.py:102), not the
    # padded MAX_FRAMES decode. The decoder genuinely computes all padded
    # frames, so the padded figure is reported alongside as a diagnostic.
    true_frames = float(sum(
        jnp.sum(jnp.minimum(yl, MAX_FRAMES)) for yl in lengths))
    audio_seconds = true_frames * hop / sr
    padded_seconds = iters * B * MAX_FRAMES * hop / sr
    value = audio_seconds / dt
    baseline = 1.0 / 0.15  # reference streaming RTF 0.15 -> 6.67 audio-s/s

    # MFU: XLA-counted model FLOPs / wall / chip peak. Peak is looked up
    # from device_kind (bf16 peak TFLOP/s per chip, public TPU specs);
    # override with --peak-tflops for unlisted hardware.
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
             "v6e": 918.0, "v6 lite": 918.0}
    peak = next((v for k, v in peaks.items() if k in kind), None)
    achieved_tflops = flops_per_call * iters / dt / 1e12
    out = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / baseline, 2),
        "padded_audio_s_per_s": round(padded_seconds / dt, 2),
        "dtype": cli.dtype,
        "model_tflops_per_s": round(achieved_tflops, 2),
    }
    if peak:
        out["mfu_pct"] = round(100.0 * achieved_tflops / peak, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
