"""Streaming synthesis latency benchmark (BASELINE config 5).

Measures what the reference publishes for its CPU Triton streaming stack
(runtime/cpu_triton_stream/README.md:19-31 — RTF 0.15, first-chunk 0.211 s)
and what its streaming client measures per request
(client/stream_client.py:119-140): first-chunk latency p50/p99, mean
inter-chunk latency, and streaming RTF, using the engine's chunked decoder
(same overlap math as inference_onnx.py:37-76).

The reference's published RTF 0.15 is the **vits2_vocos @ 24 kHz** config
(cpu_triton_stream/README.md:19-31); `--model vocos` benches that exact
configuration so the headline comparison is like-for-like. The default
`--model hifigan` is the VITS-base (baker v1.json) config the rest of
bench.py measures.

Runs on whatever backend jax selects (TPU under axon; JAX_PLATFORMS=cpu to
compare against the reference's CPU numbers). Random weights — latency is
architecture-, not weight-, dependent. noise_scale_w is pinned to 0 so
realized durations (and therefore every compiled shape) are a
deterministic function of the text: the warm-up pass over the measurement
texts reaches the exact steady state the timed pass replays, the state a
long-running server reaches immediately.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_requests", type=int, default=20)
    ap.add_argument("--text_len", type=int, default=64,
                    help="phones per request (~reference sentence length)")
    ap.add_argument("--block", type=int, default=40,
                    help="decoder chunk frames (vits_model.h:61)")
    ap.add_argument("--pad", type=int, default=10)
    ap.add_argument("--model", default="hifigan",
                    choices=["hifigan", "vocos"],
                    help="hifigan = VITS-base 22.05 kHz (baker v1.json); "
                         "vocos = vits2_vocos 24 kHz — the config behind "
                         "the reference's published streaming RTF 0.15 "
                         "(cpu_triton_stream/README.md:19-31)")
    ap.add_argument("--per-chunk", action="store_true",
                    help="measure the one-dispatch-per-chunk streaming "
                         "path instead of the default batched-tail "
                         "(O(1)-dispatch) path — the round-4 baseline")
    args = ap.parse_args()

    import jax
    import numpy as np

    from wetts_tpu.config import Config
    from wetts_tpu.models.synthesizer import Synthesizer
    from wetts_tpu.serving.engine import SynthesisEngine
    from wetts_tpu.utils.profiling import StageTimes

    model_cfg = {
        "inter_channels": 192, "hidden_channels": 192,
        "filter_channels": 768, "n_heads": 2, "n_layers": 6,
        "kernel_size": 3, "p_dropout": 0.1, "resblock": "1",
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "upsample_rates": [8, 8, 2, 2],
        "upsample_initial_channel": 512,
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "gin_channels": 256,
    }
    data_cfg = {"filter_length": 1024, "hop_length": 256,
                "win_length": 1024, "sampling_rate": 22050}
    if args.model == "vocos":
        # the vits2_vocos_v1 architecture (examples/baker/configs/
        # vits2_vocos_v1.json): mel posterior, transformer flow, Vocos
        # iSTFT decoder @ 24 kHz
        model_cfg.update({
            "vocoder_type": "vocos", "use_transformer_flows": True,
            "transformer_flow_type": "pre_conv",
            "use_mel_posterior_encoder": True,
            "vocos_channels": 512, "vocos_h_channels": 1536,
            "vocos_out_channels": 1026, "vocos_num_layers": 8,
        })
        data_cfg.update({"sampling_rate": 24000, "n_mel_channels": 100,
                         "use_mel_posterior_encoder": True})
    cfg = Config.from_dict({
        "train": {"segment_size": 8192},
        "data": data_cfg,
        "model": model_cfg,
        "num_phones": 64, "num_speakers": 2,
    })
    import jax.numpy as jnp

    model = Synthesizer.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "noise": rng, "dropout": rng, "slice": rng}
    # jitted init: eager init through a remote-attached TPU is thousands
    # of ~30-50ms RPCs; one compiled program is seconds
    variables = jax.jit(model.init)(
        rngs, jnp.ones((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 36, cfg.data.spec_channels)), jnp.array([36]),
        jnp.array([0]))
    jax.block_until_ready(variables)

    phones = [f"p{i}" for i in range(60)]
    phone2id = {"sil": 0, **{p: i + 1 for i, p in enumerate(phones)}}
    # noise_scale_w=0 -> deterministic durations -> deterministic shapes
    # (see module docstring); noise_scale stays at the reference default
    engine = SynthesisEngine(cfg, variables, phone2id, {"spk0": 0},
                             noise_scale_w=0.0,
                             stream_batch_tail=not args.per_chunk)

    rnd = np.random.default_rng(0)

    def req_text(n):
        return " ".join(phones[i] for i in rnd.integers(0, 60, n))

    texts = [req_text(args.text_len) for _ in range(args.n_requests)]

    # steady-state warm-up: stream every measurement text once, compiling
    # every (encode bucket, tail-stack bucket) executable the timed pass
    # will hit — the state a persistent server reaches once and keeps
    for text in texts:
        for _ in engine.stream_synthesize(text, "spk0", block=args.block,
                                          pad=args.pad):
            pass

    sr = cfg.data.sampling_rate
    first = StageTimes()
    inter = StageTimes()
    total_audio = 0.0
    total_wall = 0.0
    for text in texts:
        t0 = time.perf_counter()
        t_prev = t0
        for i, piece in enumerate(engine.stream_synthesize(
                text, "spk0", block=args.block, pad=args.pad)):
            now = time.perf_counter()
            if i == 0:
                first.add("first_chunk", now - t0)
            else:
                inter.add("chunk", now - t_prev)
            t_prev = now
            total_audio += len(piece) / sr
        total_wall += time.perf_counter() - t0

    # host<->device round-trip latency: on a remote-attached (tunneled)
    # chip this floors every dispatch+fetch pair. The batched-tail
    # streamer pays O(1) of them per utterance (the per-chunk path paid
    # O(n_chunks)); reported so the artifact self-explains.
    probe = jax.jit(lambda v: v + 1)
    x0 = jnp.zeros((16,))
    probe(x0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(probe(x0))
    rtt_ms = (time.perf_counter() - t0) / 10 * 1000

    rep = first.report()["first_chunk"]
    chunk = inter.report().get("chunk", {"mean_ms": 0.0})
    print(json.dumps({
        "metric": "streaming_first_chunk_latency",
        "model": args.model,
        "dispatch": "per_chunk" if args.per_chunk else "batched_tail",
        "p50_ms": round(rep["p50_ms"], 2),
        "p99_ms": round(rep["p99_ms"], 2),
        "mean_interchunk_ms": round(chunk["mean_ms"], 2),
        "streaming_rtf": round(total_wall / max(total_audio, 1e-9), 5),
        "host_device_rtt_ms": round(rtt_ms, 2),
        "reference_cpu": {"first_chunk_ms": 211, "rtf": 0.15,
                          "config": "vits2_vocos 24kHz"},
        "n_requests": args.n_requests,
    }))


if __name__ == "__main__":
    main()
