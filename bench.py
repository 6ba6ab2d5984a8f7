"""Benchmark: audio-seconds synthesized per second per chip (VITS-base).

Runs the full jitted inference pipeline (text encoder -> SDP reverse ->
generate_path -> flow reverse -> HiFi-GAN decoder) at the reference's
VITS-base size (examples/baker/configs/v1.json: hidden 192, filter 768,
6 layers, upsample 8*8*2*2=256, 22.05 kHz) and reports synthesized-audio
seconds per wall second, counting only TRUE generated lengths
(sum(y_lengths), the reference RTF definition, inference.py:102).

Dispatch modes (--dispatch): the default `switch` decodes at the smallest
frame bucket covering the batch's realized lengths, with the bucket chosen
ON-DEVICE by lax.switch — one dispatch, no host sync, exact output
(measured 2.2x the fused static-shape graph: 1226 vs 557 audio-s/s bf16
on v5e). `fused` is the single static-shape graph; `bucketed` is the
two-dispatch host-sync variant (serving/engine.py's strategy).

Baseline: the reference's only published synthesis-speed figure is streaming
RTF 0.15 on one CPU core (runtime/cpu_triton_stream/README.md:19-31) =
6.67 audio-s/s; vs_baseline is measured against that. The north-star target
is >=500 audio-s/s per chip (BASELINE.json).

Prints one JSON line per completed stage, the LAST being the full result
(the driver parses the last line; earlier lines are progressively-complete
safety nets against a driver timeout — see _run_current_mode's call site).
"""

import argparse
import contextlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.monotonic()

# persistent compile cache shared by the main process and every extras
# subprocess (repeat runs — including the driver's end-of-round run —
# skip the multi-minute device compiles)
_CACHE_DIR = "/tmp/wetts_jax_cache_dev"


def _mark(msg):
    """Progress marks on stderr (stdout stays machine-parseable): lets the
    driver log show WHERE a timed-out bench run spent its budget."""
    print(f"[bench {time.monotonic() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop")
    ap.add_argument("--dtype", default="bf16",
                    choices=["f32", "bf16", "int8"],
                    help="decoder compute dtype. Default bf16 — the "
                         "half-precision serving path (drift <~1e-3; "
                         "tests/test_hifigan_fast.py), a fair peer of the "
                         "reference's serving stack, which optionally "
                         "ships a uint8 quantize_dynamic export "
                         "(wetts/vits/export_onnx.py --quant). f32 = the "
                         "exact parity path used by the allclose tests.")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dispatch", default=None,
                    choices=["fused", "bucketed", "switch"],
                    help="fused: one static-shape dispatch per batch "
                         "(decodes all MAX_FRAMES — ~3x padding waste). "
                         "bucketed: two dispatches + a host scalar sync; "
                         "decode at the smallest frame bucket covering "
                         "realized lengths (serving/engine.py's strategy) "
                         "— a win on host-attached chips, a loss through "
                         "a remote TPU tunnel (~30-50ms/dispatch). "
                         "switch: ONE dispatch, bucket chosen ON-DEVICE "
                         "by lax.switch over per-bucket decoder branches "
                         "— the padding-waste saving with no host sync. "
                         "Exact: z is masked beyond y_lengths, so "
                         "decoding at the covering bucket is bit-identical "
                         "on the true region. Default: switch (a quick "
                         "fused safety line prints first).")
    ap.add_argument("--bucketed", action="store_true",
                    help="alias for --dispatch bucketed")
    ap.add_argument("--no-safety-line", action="store_true",
                    help="in switch mode, skip the quick fused pass whose "
                         "JSON line insures against a driver timeout "
                         "during the (much longer) cold switch compile")
    ap.add_argument("--model", default="hifigan",
                    choices=["hifigan", "vocos"],
                    help="hifigan = VITS-base (baker v1.json); vocos = the "
                         "vits2_vocos@24kHz configuration behind the "
                         "reference's published RTF 0.15 "
                         "(examples/baker/configs/vits2_vocos_v1.json, "
                         "cpu_triton_stream/README.md:19-31)")
    ap.add_argument("--no-extras", action="store_true",
                    help="skip the secondary benches (vocos throughput, "
                         "streaming latency, bf16 train step) that are "
                         "folded into the primary JSON line so one driver "
                         "artifact substantiates the full perf story")
    ap.add_argument("--extras-budget", type=float,
                    default=float(os.environ.get(
                        "WETTS_BENCH_EXTRAS_BUDGET", "900")),
                    help="global wall-clock budget (s) for ALL secondary "
                         "benches combined; sub-benches that don't fit are "
                         "skipped with an error note. The primary JSON "
                         "line is printed BEFORE extras run, so a driver "
                         "timeout mid-extras still leaves a parseable "
                         "last line (round-3 regression: rc=124, no "
                         "output, because extras ran before the print)")
    cli = ap.parse_args()
    if cli.bucketed and cli.dispatch not in (None, "bucketed"):
        raise SystemExit(
            f"--bucketed contradicts --dispatch {cli.dispatch}")
    if cli.dispatch is None:
        cli.dispatch = "bucketed" if cli.bucketed else "switch"
    # persistent compile cache: repeat bench runs skip the device compiles
    # (the jaxlib 0.9.0 cache crash is specific to mesh-sharded+donated
    # executables on XLA:CPU — these are plain single-device programs)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from wetts_tpu.config import Config
    from wetts_tpu.utils.sync import hard_block
    from wetts_tpu.models.synthesizer import Synthesizer

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
    if cli.model == "vocos":
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
    _mark(f"model built ({cli.model}, {cli.dtype}, {cli.dispatch}); "
          f"initializing params (jitted)")
    # jit the init: eager init through a remote-attached (tunneled) TPU is
    # thousands of tiny dispatches at ~30-50ms RPC latency each — tens of
    # minutes; one compiled init program is seconds.
    variables = jax.jit(model.init)(
        rngs, x[:2], xl[:2], spec, jnp.full((2,), 64, jnp.int32), sid[:2])
    jax.block_until_ready(variables)
    _mark("params initialized; compiling inference graph(s)")
    m = cfg.model

    # int8 = dynamic-quantized decoder convs (hifigan only; the analog of
    # the reference's optional uint8 export, export_onnx.py --quant)
    dec_dtype = jnp.bfloat16 if cli.dtype in ("bf16", "int8") else None
    dec_quant = cli.dtype == "int8"
    if dec_quant and cli.model != "hifigan":
        raise SystemExit("--dtype int8 requires --model hifigan")

    # Two-phase synthesis (mirrors serving/engine.py): encode at the static
    # MAX_FRAMES bound, then decode at the smallest frame BUCKET covering
    # the batch's realized y_lengths (+10-frame conv margin, the reference's
    # streaming pad context). The decoder is ~93% of inference time and the
    # static bound over-pads ~3x, so bucketing decode is the single biggest
    # honest-throughput lever. 64-frame quantum (realized batch maxima land
    # at 250-400 frames, so halving the quantum from 96 trims the average
    # bucket padding from ~15% to ~8% of decoded frames).
    FRAME_BUCKETS = (96, 160, 224, 288, 352, 416, 480, 544, 608, 672,
                     736, 800)

    @jax.jit
    def encode(x, xl, sid, key):
        z, y_lengths, y_mask, attn, g = model.apply(
            variables, x, xl, sid, 0.667, 1.0, 0.8, MAX_FRAMES,
            method=Synthesizer.encode_infer, rngs={"noise": key})
        return z, y_lengths, g

    @jax.jit
    def encode_prior(x, xl, sid, key):
        # the pre-flow half: switch mode runs the flow INSIDE the bucket
        # branch (flow(z_p[:, :fb]) == flow(z_p)[:, :fb] exactly — the flow
        # masks every conv input/output; models/synthesizer.py:encode_prior)
        z_p, y_lengths, y_mask, attn, g = model.apply(
            variables, x, xl, sid, 0.667, 1.0, 0.8, MAX_FRAMES,
            method=Synthesizer.encode_prior, rngs={"noise": key})
        return z_p, y_lengths, y_mask, g

    # bf16 flow under reduced-precision serving (the flow is gated-WN
    # elementwise-bound — ~9% MFU in f32, tools/profile_components.py —
    # so halving its HBM traffic is the lever; drift joins the decoder's
    # bf16 bound). Mirrors serving/engine.py:_flow_reverse. Cast EAGERLY
    # here (one jitted dispatch): a cast staged inside a traced caller
    # leaks tracers into this closure.
    if dec_dtype is not None:
        flow_variables = jax.jit(lambda v: jax.tree.map(
            lambda a: a.astype(dec_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, v))(variables)
    else:
        flow_variables = variables

    def flow_reverse(z_p, y_mask, g):
        if dec_dtype is not None:
            z_p = z_p.astype(dec_dtype)
            y_mask = y_mask.astype(dec_dtype)
            g = None if g is None else g.astype(dec_dtype)
        return model.apply(flow_variables, z_p, y_mask, g,
                           method=Synthesizer.flow_reverse)

    if cli.model == "vocos":
        from wetts_tpu.models.vocos import VocosGenerator

        voc = VocosGenerator(
            m.inter_channels, m.vocos_channels, m.vocos_h_channels,
            m.vocos_out_channels, m.vocos_num_layers,
            istft_n_fft=m.vocos_istft_config["n_fft"],
            istft_hop_length=m.vocos_istft_config["hop_length"],
            istft_win_length=m.vocos_istft_config["win_length"],
            gin_channels=m.gin_channels)
        dec_params = variables["params"]["dec"]
        if dec_dtype is not None:
            dec_params = jax.tree.map(
                lambda a: a.astype(dec_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, dec_params)

        @jax.jit
        def decode(z, g):
            audio = voc.apply(
                {"params": dec_params}, z.astype(dec_dtype or z.dtype),
                None if g is None else g.astype(dec_dtype or z.dtype))
            return audio.astype(jnp.float32)
    else:
        @jax.jit
        def decode(z, g):
            # space-to-depth decoder (exact-equal to Synthesizer.infer;
            # see models/hifigan_fast.py + its tests)
            return fast_generator_apply(
                variables["params"]["dec"], z, g, dtype=dec_dtype,
                quantize=dec_quant,
                resblock=m.resblock,
                resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
                resblock_dilation_sizes=tuple(
                    tuple(d) for d in m.resblock_dilation_sizes),
                upsample_rates=tuple(m.upsample_rates),
                upsample_initial_channel=m.upsample_initial_channel,
                upsample_kernel_sizes=tuple(m.upsample_kernel_sizes))

    def frame_bucket(max_len):
        need = max_len + 10
        for b in FRAME_BUCKETS:
            if need <= b <= MAX_FRAMES:
                return b
        return MAX_FRAMES

    def _run_current_mode():
        """Compile + time + account one dispatch mode (reads
        cli.dispatch). Called twice when the default switch mode
        runs: once for the quick fused safety line, once for the
        switch measurement."""
        # AOT-compile once and reuse the SAME executables for both the timed
        # loop and the FLOP counts (jit + a separate lower().compile() would
        # compile everything twice — minutes per graph at this size)
        def _cost_flops(compiled):
            try:
                return float(compiled.cost_analysis().get("flops", 0.0))
            except Exception:  # noqa: BLE001 - cost analysis is best-effort
                return 0.0

        @jax.jit
        def infer_fused(x, xl, sid, key):
            z, y_lengths, g = encode(x, xl, sid, key)
            return decode(z, g), y_lengths

        keys = [jax.random.PRNGKey(i) for i in range(10)]
        iters = len(keys)
        if cli.dispatch == "switch":
            # ONE dispatch; the decode bucket is chosen ON-DEVICE by lax.switch
            # (only the selected branch executes on TPU — a conditional in HLO,
            # not a select), so the ~3x padding-waste saving of bucketed decode
            # comes with no host round-trip — the TPU-idiomatic answer to the
            # reference's dynamic-length ONNX decode. Exact: z is masked beyond
            # y_lengths, so every sample inside the true region is identical
            # whatever covering bucket decodes it. The flow reverse ALSO runs
            # inside the branch at the bucket length (it masks every conv
            # input/output, so truncation is exact) — the flow is ~95% of the
            # non-decoder FLOPs and the static bound over-pads it ~2.5x.
            switch_buckets = tuple(b for b in FRAME_BUCKETS if b <= MAX_FRAMES)
            bounds = jnp.asarray(switch_buckets[:-1], jnp.int32)

            # length-sorted split decode: with one bucket per batch, the
            # bucket covers the batch MAX while audio-s counts the MEAN —
            # intra-batch length variance left true/decoded at ~0.80.
            # Sorting rows by realized length ON-DEVICE (argsort + gather)
            # and decoding the short and long halves at their own buckets
            # recovers most of that spread in the same single dispatch.
            # Exact: every row still decodes at a bucket covering its
            # length + margin.
            half = B // 2

            def mk(fb):
                def f(z_p, y_mask, g):
                    z = flow_reverse(z_p[:, :fb], y_mask[:, :fb], g)
                    audio = decode(z, g)
                    return jnp.pad(
                        audio,
                        ((0, 0), (0, (MAX_FRAMES - fb) * hop), (0, 0)))
                return f

            @jax.jit
            def infer_switch(x, xl, sid, key):
                z_p, y_lengths, y_mask, g = encode_prior(x, xl, sid, key)
                order = jnp.argsort(y_lengths)
                audio = jnp.zeros((B, MAX_FRAMES * hop, 1), jnp.float32)
                grp = ((order[:half], order[half:]) if B >= 4
                       else (order,))
                for rows in grp:
                    yl_g = y_lengths[rows]
                    need = jnp.minimum(jnp.max(yl_g) + 10, MAX_FRAMES)
                    idx = jnp.sum((need > bounds).astype(jnp.int32))
                    a = jax.lax.switch(
                        idx, [mk(fb) for fb in switch_buckets],
                        z_p[rows], y_mask[rows],
                        None if g is None else g[rows])
                    audio = audio.at[rows].set(a)
                return audio, y_lengths

            switch_c = infer_switch.lower(x, xl, sid, keys[0]).compile()
            # prior-encoder-only compile for the FLOP accounting
            # (cost_analysis of a multi-branch conditional overcounts;
            # decoder FLOPs come from the analytic conv count, and the
            # per-bucket flow FLOPs from XLA counts of the standalone flow
            # graph at each realized bucket — both exact for the executed
            # branch)
            enc_c = encode_prior.lower(x, xl, sid, keys[0]).compile()
            enc_flops = _cost_flops(enc_c)
            flow_flops_cache = {}

            def flow_flops(fb):
                if fb not in flow_flops_cache:
                    zp0 = jnp.zeros((B, fb, m.inter_channels))
                    mask0 = jnp.ones((B, fb, 1))
                    g0 = (jnp.zeros((B, 1, m.gin_channels))
                          if m.gin_channels else None)
                    flow_flops_cache[fb] = _cost_flops(
                        jax.jit(flow_reverse)
                        .lower(zp0, mask0, g0).compile())
                return flow_flops_cache[fb]

            hard_block(switch_c(x, xl, sid, keys[0]))
            _mark("switch graph compiled + warm")
        elif cli.dispatch == "bucketed":
            enc_c = encode.lower(x, xl, sid, keys[0]).compile()
            enc_flops = _cost_flops(enc_c)
            g_spec = (jnp.zeros((B, 1, m.gin_channels))
                      if cfg.num_speakers > 0 and m.gin_channels else None)
            dec_cache = {}
            dec_flops = {}

            def dec_for(fb):
                if fb not in dec_cache:
                    dec_cache[fb] = decode.lower(
                        jnp.zeros((B, fb, m.inter_channels)), g_spec).compile()
                    dec_flops[fb] = _cost_flops(dec_cache[fb])
                return dec_cache[fb]

            # NB: buckets are resolved with int(jnp.max(...)) — a scalar pull.
            # jax.device_get of an array through a remote-attached (tunneled)
            # TPU measured ~26s/transfer on this host; the scalar path ~0.1s.
            # pre-compile every bucket the run will hit so the timed loop is
            # pure execution (a server reaches this steady state immediately)
            for k in keys:
                _, yl, _ = enc_c(x, xl, sid, k)
                dec_for(frame_bucket(int(jnp.max(yl))))
            _mark("bucketed graphs compiled + warm")
        else:
            fused_c = infer_fused.lower(x, xl, sid, keys[0]).compile()
            fused_flops = _cost_flops(fused_c)
            hard_block(fused_c(x, xl, sid, keys[0]))
            _mark("fused graph compiled + warm")

        from wetts_tpu.utils.profiling import device_trace

        def timed_loop():
            t0 = time.perf_counter()
            if cli.dispatch == "switch":
                # single dispatch per batch; bucketing happens on-device
                outs = [switch_c(x, xl, sid, k) for k in keys]
                audios = [a for a, _ in outs]
                lengths = [yl for _, yl in outs]
                buckets = None  # realized buckets resolved after the loop
            elif cli.dispatch == "bucketed":
                # software pipeline (what a loaded server does): dispatch every
                # encode asynchronously, then resolve buckets (each scalar sync
                # overlaps the still-executing encode queue), then dispatch
                # every bucketed decode — one terminal block, no per-batch sync
                encs = [enc_c(x, xl, sid, k) for k in keys]
                buckets = [frame_bucket(int(jnp.max(yl))) for _, yl, _ in encs]
                audios = [dec_for(fb)(z[:, :fb], g)
                          for fb, (z, _, g) in zip(buckets, encs)]
                lengths = [yl for _, yl, _ in encs]
            else:
                # fused single-dispatch graph: one device call per batch
                outs = [fused_c(x, xl, sid, k) for k in keys]
                audios = [a for a, _ in outs]
                lengths = [yl for _, yl in outs]
                buckets = [MAX_FRAMES] * iters
            # hard sync, not block_until_ready: through the axon tunnel,
            # block_until_ready returns before the device has executed
            # the queue (measured: 8 chained 8192^3 matmuls "done" in
            # 0.09 ms = impossible 103,000 TF/s; a scalar fetch of the
            # same result took 77 ms = 86% of v5e peak). A data-dependent
            # scalar fetch is the only trustworthy barrier.
            hard_block(audios)
            return time.perf_counter() - t0, lengths, buckets

        trace = (device_trace(cli.profile) if cli.profile
                 else contextlib.nullcontext())
        with trace:
            # best-of-3: through a remote-attached chip, transient tunnel
            # latency spikes can inflate a single pass 10-20x (observed
            # 199 vs 3395 audio-s/s on the latency-bound vocos config);
            # the repeats cost <1s/pass warm and the minimum reflects the
            # chip, not the tunnel's worst moment
            dt, lengths, buckets = timed_loop()
            for _ in range(2):
                dt2, l2, b2 = timed_loop()
                if dt2 < dt:
                    dt, lengths, buckets = dt2, l2, b2
        _mark(f"timed loop done (best {dt:.2f}s for {iters} batches)")

        # honest accounting: audio seconds = sum of TRUE generated lengths
        # (sum(y_lengths), reference RTF definition inference.py:102). The
        # decoded-frame throughput (bucket frames actually computed) is the
        # compute-utilization diagnostic.
        if cli.dispatch == "switch":
            # per batch, the split decode realizes TWO buckets: the
            # sorted short half's and the long half's (rows mirror the
            # on-device argsort grouping)
            half = B // 2
            groups = []  # (rows, bucket) per group per batch
            for yl in lengths:
                s = np.sort(np.minimum(np.asarray(yl), MAX_FRAMES))
                if B >= 4:
                    groups.append((half, frame_bucket(int(s[half - 1]))))
                    groups.append((B - half, frame_bucket(int(s[-1]))))
                else:
                    groups.append((B, frame_bucket(int(s[-1]))))
        true_frames = float(sum(
            jnp.sum(jnp.minimum(yl, MAX_FRAMES)) for yl in lengths))
        audio_seconds = true_frames * hop / sr
        if cli.dispatch == "switch":
            decoded_seconds = sum(rows * fb
                                  for rows, fb in groups) * hop / sr
        else:
            decoded_seconds = sum(buckets) * B * hop / sr
        value = audio_seconds / dt
        baseline = 1.0 / 0.15  # reference streaming RTF 0.15 -> 6.67 audio-s/s

        # MFU: XLA-counted model FLOPs / wall / chip peak. Peak is looked up
        # from device_kind (bf16 peak TFLOP/s per chip, public TPU specs).
        kind = jax.devices()[0].device_kind.lower()
        peaks = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
                 "v6e": 918.0, "v6 lite": 918.0}
        peak = next((v for k, v in peaks.items() if k in kind), None)
        if cli.dispatch == "switch":
            dec_flops_fn = (_vocos_dec_flops if cli.model == "vocos"
                            else _dec_conv_flops)
            # flow_flops counts at batch B; flow cost is exactly linear
            # in rows (convs + elementwise), so scale by rows/B per group
            total_flops = enc_flops * iters + sum(
                dec_flops_fn(m, rows, fb) + flow_flops(fb) * rows / B
                for rows, fb in groups)
        elif cli.dispatch == "bucketed":
            total_flops = enc_flops * iters + sum(dec_flops[fb]
                                                  for fb in buckets)
        else:
            total_flops = fused_flops * iters
        achieved_tflops = total_flops / dt / 1e12
        # FLOP basis differs by mode: fused/bucketed report XLA-counted
        # EXECUTED FLOPs (the space-to-depth decoder executes ~1.5x the
        # algorithmic conv FLOPs to fill the 128 MXU lanes, so this measures
        # hardware utilization); switch reports ALGORITHMIC model FLOPs
        # (analytic conv count for the executed branch — the stricter MFU
        # definition, numerically lower for the same speed). Pinned in
        # tests/test_bench_flops.py.
        flop_basis = ("algorithmic" if cli.dispatch == "switch"
                      else "executed")
        out = {}
        if cli.dispatch == "switch":
            # the switch basis is mixed: the decoder term (93%+ of FLOPs)
            # is analytic-algorithmic; the prior-encoder term and the
            # per-bucket flow term are XLA HLO counts (no analytic
            # attention count exists); the stricter label "algorithmic"
            # overstates by the encoder's few percent
            out["flop_basis_note"] = ("decoder analytic-algorithmic; "
                                      "encoder/flow terms XLA-counted")
        out = {
            **out,
            "metric": "audio_seconds_per_second_per_chip",
            "value": round(value, 2),
            "unit": "audio_s/s",
            "vs_baseline": round(value / baseline, 2),
            "decoded_audio_s_per_s": round(decoded_seconds / dt, 2),
            "dtype": cli.dtype,
            "model": cli.model,
            "dispatch": cli.dispatch,
            "model_tflops_per_s": round(achieved_tflops, 2),
            "flop_basis": flop_basis,
        }
        if peak:
            out["mfu_pct"] = round(100.0 * achieved_tflops / peak, 2)
        return out

    # Print the primary line FIRST (flushed): the driver parses the last
    # stdout line, so even if it times the process out mid-extras it still
    # gets the headline metric (in round 3 extras ran before any print and
    # the driver recorded rc=124 with no parseable output). In the default
    # switch mode, a quick FUSED pass runs first and prints ITS line as a
    # cold-cache safety net: the fused graph compiles in ~2 min where the
    # 6-branch switch graph takes ~19 min cold (both near-instant via the
    # persistent cache), so a driver timeout mid-switch-compile still
    # leaves a parseable fused line.
    if cli.dispatch == "switch" and not cli.no_safety_line:
        cli.dispatch = "fused"
        safety = _run_current_mode()
        print(json.dumps(safety), flush=True)
        cli.dispatch = "switch"
        out = _run_current_mode()
        out["fused_audio_s_per_s"] = safety["value"]
    else:
        out = _run_current_mode()
    print(json.dumps(out), flush=True)
    if not cli.no_extras and cli.model == "hifigan":
        out.update(_extras(cli.extras_budget))
        print(json.dumps(out), flush=True)


def _dec_conv_flops(m, batch, frames):
    """Analytic conv FLOPs (2*MACs) of the HiFi-GAN decoder at `frames`
    input frames — exact for the dominant convs (conv_pre, transpose
    upsamples, MRF resblocks, conv_post; elementwise ops excluded). Used
    by --dispatch switch, where XLA's cost_analysis can't attribute FLOPs
    to the one executed lax.switch branch. Validated against the XLA count
    of the standalone decoder in tests/test_bench_flops.py."""
    c_in = m.inter_channels
    ch = m.upsample_initial_channel
    flops = 2 * batch * frames * c_in * ch * 7  # conv_pre, k=7
    t = frames
    for i, (u, k) in enumerate(zip(m.upsample_rates,
                                   m.upsample_kernel_sizes)):
        co = m.upsample_initial_channel // (2 ** (i + 1))
        # conv_transpose stride u: each input frame fires k taps per
        # output channel -> MACs = B * t_in * ch * co * k
        flops += 2 * batch * t * ch * co * k
        t *= u
        for ks, ds in zip(m.resblock_kernel_sizes,
                          m.resblock_dilation_sizes):
            n_convs = 2 * len(ds) if m.resblock == "1" else len(ds)
            flops += 2 * batch * t * co * co * ks * n_convs
        ch = co
    flops += 2 * batch * t * ch * 1 * 7  # conv_post, k=7
    return float(flops)


def _vocos_dec_flops(m, batch, frames):
    """Analytic FLOPs (2*MACs) of the Vocos decoder at `frames` input
    frames: in_conv/ConvNeXt/out_conv 1x1+depthwise convs plus the iSTFT
    irfft matmul (models/vocos.py; elementwise ops and the overlap-add
    excluded). Validated against XLA's count of the plain graph in
    tests/test_bench_flops.py."""
    t = frames + 1  # ReflectionPad([1, 0])
    ch, h = m.vocos_channels, m.vocos_h_channels
    out_ch = m.vocos_out_channels
    n_fft = m.vocos_istft_config["n_fft"]
    fl = 2 * batch * t * m.inter_channels * ch  # in_conv 1x1
    # per ConvNeXt layer: depthwise k=3 + two pointwise
    fl += m.vocos_num_layers * 2 * batch * t * (ch * 3 + 2 * ch * h)
    fl += 2 * batch * t * ch * out_ch  # out_conv 1x1
    fl += 2 * batch * t * out_ch * n_fft  # irfft as one matmul
    return float(fl)


def _extras(budget):
    """Secondary benches folded into the driver line, each a bounded
    subprocess of the corresponding tool (tools/bench_streaming.py,
    tools/bench_train.py, this file with --model vocos) so one
    BENCH_r{N}.json substantiates every README performance claim. A global
    wall-clock budget bounds the total; sub-benches that don't fit are
    skipped. Failures degrade to an error note instead of sinking the
    primary metric."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    deadline = time.monotonic() + budget
    # share the persistent compile cache with subprocesses so repeat bench
    # runs (and the driver's end-of-round run) skip the big compiles
    env = {**os.environ,
           "JAX_COMPILATION_CACHE_DIR": _CACHE_DIR,
           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1.0"}

    def _last_json_line(text):
        for line in reversed((text or "").strip().splitlines()):
            try:
                return json.loads(line)
            except ValueError:
                continue
        return None

    def run(name, argv):
        remaining = deadline - time.monotonic()
        if remaining < 60:
            return {"error": f"{name}: skipped (extras budget exhausted)"}
        _mark(f"extras: {name} (budget {remaining:.0f}s)")
        try:
            proc = subprocess.run([sys.executable, *argv], cwd=here,
                                  capture_output=True, text=True, env=env,
                                  timeout=remaining)
            return _last_json_line(proc.stdout) or {
                "error": f"{name}: no JSON output"}
        except subprocess.TimeoutExpired as e:
            # salvage any progressively-printed safety line (the vocos
            # sub-bench prints a fused measurement before its long switch
            # compile — a timeout mid-compile still measured something)
            partial = _last_json_line(
                e.stdout.decode() if isinstance(e.stdout, bytes)
                else e.stdout)
            if partial is not None:
                partial["partial"] = "timeout mid-run"
                return partial
            return {"error": f"{name}: TimeoutExpired"}
        except Exception as e:  # noqa: BLE001 - extras are best-effort
            return {"error": f"{name}: {type(e).__name__}"}

    out = {}
    stream = run("stream", ["tools/bench_streaming.py", "--n_requests", "12"])
    out["stream_first_chunk_ms_p50"] = stream.get(
        "p50_ms", stream.get("error", "unavailable"))
    out["stream_first_chunk_ms_p99"] = stream.get("p99_ms")
    out["stream_rtf"] = stream.get("streaming_rtf")
    out["host_device_rtt_ms"] = stream.get("host_device_rtt_ms")
    # the reference's published RTF 0.15 is measured on the vits2_vocos
    # 24 kHz config (cpu_triton_stream/README.md:19-31); bench that exact
    # configuration so the baseline row compares like-for-like
    vs = run("stream_vocos", ["tools/bench_streaming.py",
                              "--n_requests", "8", "--model", "vocos"])
    out["vocos_stream_rtf"] = vs.get(
        "streaming_rtf", vs.get("error", "unavailable"))
    out["vocos_stream_first_chunk_ms_p50"] = vs.get("p50_ms")
    train = run("train", ["tools/bench_train.py", "--iters", "5",
                          "--skip_fp32"])
    bf16 = train.get("bf16", {})
    out["train_steps_per_s_bf16"] = bf16.get(
        "steps_per_s", train.get("error", "unavailable"))
    if "mfu_pct" in bf16:
        out["train_mfu_pct_bf16"] = bf16["mfu_pct"]
    # vocos last: it prints its own fused safety line, so even a budget
    # timeout mid-switch-compile salvages a measurement
    voc = run("vocos", ["bench.py", "--model", "vocos", "--no-extras",
                        "--dtype", "bf16"])
    out["vocos_audio_s_per_s"] = voc.get(
        "value", voc.get("error", "unavailable"))
    # a salvaged partial line may be the quick fused safety measurement —
    # keep its markers so the artifact can't pass a fused number off as a
    # full switch-mode measurement
    if "partial" in voc:
        out["vocos_partial"] = voc["partial"]
    if voc.get("dispatch") not in (None, "switch"):
        out["vocos_dispatch"] = voc["dispatch"]
    return out


if __name__ == "__main__":
    main()
