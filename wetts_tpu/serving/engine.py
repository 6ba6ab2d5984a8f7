"""Synthesis engine: persistent-compiled TTS orchestrator.

Behavioral parity target: the C++ TTS class (runtime/core/model/tts.cc):
- Synthesis: sentence segmentation -> per-sentence TN -> G2P/prosody ->
  phone-id mapping with a `sil` head, skipping OOV phones with a log
  (tts.cc:47-89) -> VITS -> concatenated audio,
- StreamSynthesis: per-sentence encoder pass + chunked decoder with the
  reference overlap math, skipping sentences whose conversion fails
  (tts.cc:91-128),
- speaker-name -> sid with first-speaker fallback (tts.cc:130-138).

TPU-first design: phone sequences are bucketed to a fixed set of
(text_len, max_frames) shapes so the whole pipeline compiles once per
bucket; compiled executables are cached on the instance.
"""

from __future__ import annotations

import logging
import threading
from functools import partial
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.config import Config
from wetts_tpu.models.synthesizer import Synthesizer
from wetts_tpu.serving.streaming import (
    DEFAULT_BLOCK,
    DEFAULT_PAD,
    chunk_schedule,
    depad_audio,
)
from wetts_tpu.text.segmenter import sentence_segment
from wetts_tpu.utils.profiling import StageTimes

logger = logging.getLogger("wetts_tpu.serving")

# (text_pad, max_frames) buckets: compile once per bucket
TEXT_BUCKETS = (32, 64, 128, 192)
FRAMES_PER_TEXT = 12  # generous upper bound on frames per phone
# forced clause split length, in characters (sentence_break.h:27 default);
# keeps any single clause's phone count well inside TEXT_BUCKETS[-1]
MAX_CLAUSE_LEN = 32
# decode-frame buckets: batched decode runs at the smallest bucket covering
# the batch's realized y_lengths instead of the FRAMES_PER_TEXT worst case.
# 64-frame granularity up to 768 (typical clause lengths land at 150-400
# frames, so halving the quantum from 96 recovers ~8-10% decode compute —
# decode time is linear in the bucket); coarse above (long clauses are rare
# and the per-bucket executables aren't free to compile)
FRAME_BUCKETS = (96, 160, 224, 288, 352, 416, 480, 544, 608, 672, 736,
                 768, 1152, 1536, 2304)
# frames of conv context beyond the longest utterance so the decode
# boundary never touches real audio (reference streaming pad, vits_model.h)
DECODE_MARGIN = 10
# batch buckets for the streaming tail decode: all chunks after the first
# are stacked on the batch axis into one dispatch; the stack is padded to
# one of these sizes so at most len(STREAM_TAIL_BUCKETS) executables compile
STREAM_TAIL_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
# host<->device round-trip threshold above which the engine auto-enables
# the single-dispatch lax.switch path: a host-attached chip round-trips in
# tens of microseconds, a remote-attached (tunneled) chip in tens of ms
AUTO_RTT_THRESHOLD_MS = 1.0
_RTT_CACHE: Dict[str, float] = {}


def probe_host_device_rtt_ms(n: int = 5) -> float:
    """Measured host<->device round-trip latency (ms), cached per backend.

    The reference makes its batching strategy a deploy-time config
    (gpu_triton config.pbtxt dynamic_batching); here the deploy-time fact
    that matters is whether the chip is host-attached (RTT ~ tens of us;
    per-dispatch host syncs are free) or tunnel-attached (RTT ~ tens of
    ms; every sync costs more than the decode). Probed once per process.
    """
    import time

    backend = jax.default_backend()
    if backend not in _RTT_CACHE:
        probe = jax.jit(lambda v: v + 1)
        x = jnp.zeros((16,))
        np.asarray(probe(x))  # compile + first transfer
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(probe(x))
        _RTT_CACHE[backend] = (time.perf_counter() - t0) / n * 1000.0
    return _RTT_CACHE[backend]


def _tail_bucket(n: int) -> int:
    for b in STREAM_TAIL_BUCKETS:
        if n <= b:
            return b
    return STREAM_TAIL_BUCKETS[-1]


class SynthesisEngine:
    def __init__(
        self,
        cfg: Config,
        params,
        phone2id: Dict[str, int],
        speaker2id: Optional[Dict[str, int]] = None,
        frontend=None,  # object with .normalize(text) and .compute(text)
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        seed: int = 0,
        use_fast_decoder: bool = True,
        half: bool = False,
        quantize: bool = False,
        on_device_bucketing="auto",
        stream_batch_tail: bool = True,
    ):
        self.cfg = cfg
        self.model = Synthesizer.from_config(cfg)
        self.params = params
        self.phone2id = phone2id
        self.speaker2id = speaker2id or {}
        self.frontend = frontend
        self.scales = (noise_scale, length_scale, noise_scale_w)
        self.hop = int(np.prod(cfg.model.upsample_rates))
        self.sample_rate = cfg.data.sampling_rate
        self._rng = jax.random.PRNGKey(seed)
        self._encode_cache = {}
        self._decode_cache = {}
        self._flow_vars_half = None  # built on first use (_flow_variables)
        # engine-level lock: one synthesis at a time per chip, and a single
        # guard for the shared mutable state (_rng, jit caches, stage_times,
        # frontend) now that the server's DynamicBatcher dispatcher thread
        # and /stream handler threads can call in concurrently. Reentrant so
        # synthesize -> synthesize_ids_batch nests.
        self.lock = threading.RLock()
        # per-stage latency accumulator (reference logs synth time via a
        # C++ Timer, http_server.cc:87-94; per-stage prints models.py:242-279)
        self.stage_times = StageTimes()
        # space-to-depth decoder (models/hifigan_fast.py): exact-equal,
        # ~1.8x decoder throughput on TPU (lane-padding elimination)
        self.use_fast_decoder = (use_fast_decoder
                                 and cfg.model.vocoder_type == "hifigan")
        # bf16 decoder (reduced-precision serving, the analog of the
        # reference's optional uint8 quantize_dynamic export,
        # wetts/vits/export_onnx.py --quant): ~1.2x, waveform drift <~1e-3
        self.half = half and self.use_fast_decoder
        # int8 dynamic quantization of the decoder convs (per-out-channel
        # int8 weights constant-folded at compile time, per-batch-row
        # dynamic activation scales, int32 MXU accumulation) — the analog of
        # the reference's optional uint8-quantized export. Drift bounds:
        # tests/test_hifigan_fast.py::test_fast_int8_close_to_fp32
        self.quantize = quantize and self.use_fast_decoder
        # single-dispatch batch synthesis: the decode-frame bucket is
        # chosen ON-DEVICE by lax.switch instead of by a host scalar sync
        # between the encode and decode dispatches. Exact (z is masked
        # beyond y_lengths, so any covering bucket decodes the true region
        # identically; tests/test_serving.py::test_on_device_bucketing).
        # Worth ~30-50ms/request on remote-attached (tunneled) chips —
        # bench.py --dispatch switch measured 2.2x — at the cost of one
        # larger compile per text bucket (every frame-bucket branch in one
        # executable). Default "auto": probe the host<->device RTT once and
        # enable the switch path exactly when the sync it removes is
        # expensive (tunnel-attached chips), keeping the cheap-compile
        # two-phase path on host-attached/CPU backends.
        if on_device_bucketing == "auto":
            rtt = probe_host_device_rtt_ms()
            on_device_bucketing = rtt > AUTO_RTT_THRESHOLD_MS
            logger.info(
                "host<->device RTT %.3f ms -> on_device_bucketing=%s",
                rtt, on_device_bucketing)
        self.on_device_bucketing = bool(on_device_bucketing)
        # streaming: stack every chunk after the first on the batch axis
        # into ONE decode dispatch + ONE device->host fetch (the chunks are
        # independent by construction). O(1) dispatches per utterance
        # instead of O(n_chunks) — the difference between RTF ~0.38 and
        # ~0.05 through a tunnel-attached chip where each round-trip is
        # ~30 ms. The first chunk still decodes alone, preserving
        # first-chunk latency.
        self.stream_batch_tail = stream_batch_tail
        if (half or quantize) and not self.use_fast_decoder:
            # bench.py raises for this combination; the serving path keeps
            # running but must not let the user believe they measured a
            # reduced-precision decoder when they got the f32 one
            logger.warning(
                "half/quantize requested but the fast decoder is "
                "unavailable (vocoder_type=%s, use_fast_decoder=%s); "
                "serving the f32 decoder instead",
                cfg.model.vocoder_type, use_fast_decoder)

    def _fast_decode(self, z, g):
        from wetts_tpu.models.hifigan_fast import fast_generator_apply

        m = self.cfg.model
        return fast_generator_apply(
            self.params["params"]["dec"], z, g,
            dtype=jnp.bfloat16 if (self.half or self.quantize) else None,
            quantize=self.quantize,
            resblock=m.resblock,
            resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in m.resblock_dilation_sizes),
            upsample_rates=tuple(m.upsample_rates),
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=tuple(m.upsample_kernel_sizes))

    def _flow_variables(self):
        """Variables for the flow reverse; bf16-cast under reduced
        precision. The flow is gated-WN elementwise-bound (measured ~9%
        MFU in f32 — tools/profile_components.py), so halving its HBM
        traffic is the lever; drift joins the decoder's bf16 drift bound
        (tests/test_serving.py::test_half_precision_drift_bounded).
        Truncation exactness is unaffected: bf16 rounding is positionwise
        deterministic, so the masked-conv argument still gives
        flow(z_p[:, :fb]) == flow(z_p)[:, :fb] bit-exactly."""
        if not (self.half or self.quantize):
            return self.params
        if self._flow_vars_half is None:
            # materialize OUTSIDE any jit trace (under omnistaging a cast
            # staged mid-trace yields tracers, and caching those leaks
            # them out of the transformation); one jitted dispatch instead
            # of ~1k eager per-leaf casts (each an RPC on a tunnel-attached
            # chip)
            with jax.ensure_compile_time_eval():
                self._flow_vars_half = jax.jit(lambda v: jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    v))(self.params)
        return self._flow_vars_half

    def _flow_reverse(self, z_p, y_mask, g):
        """Flow reverse at the caller's length (bf16 under half/int8)."""
        if self.half or self.quantize:
            z_p = z_p.astype(jnp.bfloat16)
            y_mask = y_mask.astype(jnp.bfloat16)
            g = None if g is None else g.astype(jnp.bfloat16)
        return self.model.apply(self._flow_variables(), z_p, y_mask, g,
                                method=Synthesizer.flow_reverse)

    # -- text -----------------------------------------------------------

    def speaker_id(self, name: Optional[str]) -> int:
        """Speaker-name lookup with default fallback (tts.cc:130-138)."""
        if not self.speaker2id:
            return 0
        if name in self.speaker2id:
            return self.speaker2id[name]
        default = next(iter(self.speaker2id))
        if name:
            logger.info("invalid speaker %r, fallback to %r", name, default)
        return self.speaker2id[default]

    def text_to_phone_ids(self, text: str) -> List[int]:
        """TN -> G2P -> ids with `sil` head; OOV phones skipped (tts.cc:47-73)."""
        if self.frontend is None:
            # raw phone-sequence input (already space-separated phones)
            phonemes = text.split()
        else:
            with self.lock:  # frontend thread-safety is not guaranteed
                norm = self.frontend.normalize(text)
                phonemes = self.frontend.compute(norm)
        if not phonemes:
            return []
        ids = [self.phone2id["sil"]] if "sil" in self.phone2id else []
        for ph in phonemes:
            if ph not in self.phone2id:
                logger.error("can't find %r in phone2id", ph)
                continue
            ids.append(self.phone2id[ph])
        return ids

    # -- compiled synthesis ---------------------------------------------

    def _bucket(self, n: int) -> Tuple[int, int]:
        for b in TEXT_BUCKETS:
            if n <= b:
                return b, b * FRAMES_PER_TEXT
        b = TEXT_BUCKETS[-1]
        return b, b * FRAMES_PER_TEXT

    def _frame_bucket(self, max_len: int, cap: int) -> int:
        """Smallest decode-frame bucket covering max_len (+ conv margin)."""
        need = max_len + DECODE_MARGIN
        for b in FRAME_BUCKETS:
            if need <= b <= cap:
                return b
        return cap

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _synthesize_ids(self, ids: List[int], sid: int) -> np.ndarray:
        return self.synthesize_ids_batch([ids], [sid])[0]

    def synthesize_ids_batch(self, ids_list: List[List[int]],
                             sids: List[int]) -> List[np.ndarray]:
        """Batched synthesis of padded phone-id sequences.

        Pads the batch dim to a bucket (serving/batcher.py BATCH_BUCKETS)
        and the text dim to TEXT_BUCKETS so cross-request dynamic batching
        reuses a small, fixed set of compiled executables — the role
        Triton's dynamic batcher plays for the reference
        (gpu_triton config.pbtxt).
        """
        from wetts_tpu.serving.batcher import BATCH_BUCKETS, batch_bucket

        with self.lock:
            n = len(ids_list)
            if n > BATCH_BUCKETS[-1]:
                # split oversized batches into bucket-sized sub-batches
                out: List[np.ndarray] = []
                for lo in range(0, n, BATCH_BUCKETS[-1]):
                    out.extend(self.synthesize_ids_batch(
                        ids_list[lo: lo + BATCH_BUCKETS[-1]],
                        sids[lo: lo + BATCH_BUCKETS[-1]]))
                return out
            # a clause whose phone count overflows the largest text bucket
            # (possible with frontend-less raw-phone input) is synthesized
            # in TEXT_BUCKETS[-1]-sized pieces and concatenated rather than
            # raising (the normal text path never gets here: clauses are
            # force-split at MAX_CLAUSE_LEN characters upstream)
            cap = TEXT_BUCKETS[-1]
            if max(len(i) for i in ids_list) > cap:
                out = []
                for ids, sid in zip(ids_list, sids):
                    if len(ids) <= cap:
                        out.append(self.synthesize_ids_batch([ids],
                                                             [sid])[0])
                    else:
                        parts = [ids[lo: lo + cap]
                                 for lo in range(0, len(ids), cap)]
                        pieces = self.synthesize_ids_batch(
                            parts, [sid] * len(parts))
                        out.append(np.concatenate(pieces))
                return out
            b_pad = batch_bucket(n)
            text_pad, max_frames = self._bucket(
                max(len(i) for i in ids_list))
            x = np.zeros((b_pad, text_pad), np.int32)
            xl = np.ones((b_pad,), np.int32)
            sid_arr = np.zeros((b_pad,), np.int32)
            for row, (ids, sid) in enumerate(zip(ids_list, sids)):
                x[row, : len(ids)] = ids
                xl[row] = len(ids)
                sid_arr[row] = sid
            if self.on_device_bucketing:
                # single dispatch; the frame bucket is resolved on-device
                run = self._synth_switch_fn(text_pad, max_frames)
                with self.stage_times.stage("synth"):
                    audio, y_len = run(
                        jnp.asarray(x), jnp.asarray(xl),
                        jnp.asarray(sid_arr), self._next_rng())
                    # async d2h: a plain np.asarray fetch through a
                    # tunnel-attached chip degrades to chunked synchronous
                    # RPCs (measured ~8s for 245KB vs ~40ms after
                    # copy_to_host_async)
                    y_len.copy_to_host_async()
                    y_len = np.asarray(y_len)
                    # transfer only the realized bucket, not the
                    # max_frames padding (the device-side slice is a tiny
                    # shape-cached dispatch; the padding is ~3x the bytes)
                    fb = self._frame_bucket(int(y_len.max()), max_frames)
                    audio = audio[:, : fb * self.hop]
                    audio.copy_to_host_async()
                    audio = np.asarray(audio)
                return [audio[i, : int(y_len[i]) * self.hop, 0]
                        for i in range(n)]
            # two-phase synthesis: encode at the (text, frames) bucket,
            # then decode at the smallest FRAME bucket covering the batch's
            # true lengths. The decoder is ~93% of inference time and the
            # frames-per-phone upper bound (FRAMES_PER_TEXT) over-pads by
            # ~3x on typical text, so bucketing decode by realized length
            # recovers most of that compute. +DECODE_MARGIN frames keeps
            # the conv boundary outside real audio (the reference tolerates
            # a 10-frame context in streaming, vits_model.h:62).
            run_enc = self._encode_fn(text_pad, max_frames)
            with self.stage_times.stage("encode"):
                z, y_len, g = run_enc(
                    jnp.asarray(x), jnp.asarray(xl), jnp.asarray(sid_arr),
                    self._next_rng())
                y_len.copy_to_host_async()
                y_len = np.asarray(y_len)
            fb = self._frame_bucket(int(y_len.max()), max_frames)
            dec = self._decode_fn(fb)
            with self.stage_times.stage("decode"):
                audio = dec(z[:, :fb], g)
                audio.copy_to_host_async()  # see switch-path note above
                audio = np.asarray(audio)
            return [audio[i, : int(y_len[i]) * self.hop, 0]
                    for i in range(n)]

    def synthesize(self, text: str, speaker: Optional[str] = None
                   ) -> np.ndarray:
        """Full text -> float32 waveform (tts.cc Synthesis semantics)."""
        sid = self.speaker_id(speaker)
        pieces = []
        for sentence in sentence_segment(text, MAX_CLAUSE_LEN) or [text]:
            with self.stage_times.stage("frontend"):
                ids = self.text_to_phone_ids(sentence)
            if not ids:
                continue
            with self.stage_times.stage("vits"):
                pieces.append(self._synthesize_ids(ids, sid))
        if not pieces:
            return np.zeros((0,), np.float32)
        audio = np.concatenate(pieces)
        if logger.isEnabledFor(logging.DEBUG):
            logger.debug("synthesize: %s", self.stage_times.summary())
        return audio

    # -- streaming ------------------------------------------------------

    def _encode_fn(self, text_pad: int, max_frames: int):
        key = (text_pad, max_frames)
        if key not in self._encode_cache:
            ns, ls, nsw = self.scales

            @jax.jit
            def run(x, xl, sid, rng):
                z_p, y_len, y_mask, attn, g = self.model.apply(
                    self.params, x, xl, sid, ns, ls, nsw, max_frames,
                    method=Synthesizer.encode_prior, rngs={"noise": rng})
                # bf16 flow under half/int8 (see _flow_reverse); the text
                # encoder/duration side stays f32 so realized lengths are
                # precision-independent
                z = self._flow_reverse(z_p, y_mask, g)
                return z, y_len, g

            self._encode_cache[key] = run
        return self._encode_cache[key]

    def _synth_switch_fn(self, text_pad: int, max_frames: int):
        """Jitted single-dispatch synthesis: encode + on-device bucketed
        decode (lax.switch over every FRAME_BUCKETS branch <= max_frames).
        Returns (audio [B, max_frames*hop, 1], y_lengths).

        The flow reverse runs INSIDE the switch branch at the bucket
        length, not at max_frames: the flow masks every conv input/output
        (flows.py, wavenet.py), so flow(z_p[:, :fb]) == flow(z_p)[:, :fb]
        exactly for any covering bucket — same masking argument as the
        bucketed decode itself. The flow is ~95% of the encoder-side
        FLOPs, so running it at the realized bucket instead of the static
        bound trims the whole non-decoder side by the same ~2-3x factor
        bucketing buys the decoder."""
        key = ("switch", text_pad, max_frames)
        if key not in self._encode_cache:
            ns, ls, nsw = self.scales
            branches = tuple(
                b for b in FRAME_BUCKETS if b <= max_frames)
            if not branches or branches[-1] != max_frames:
                branches = branches + (max_frames,)
            bounds = jnp.asarray(branches[:-1], jnp.int32)
            decode_body = (self._fast_decode if self.use_fast_decoder
                           else lambda z, g: self.model.apply(
                               self.params, z, g,
                               method=Synthesizer.decode))
            hop = self.hop

            @jax.jit
            def run(x, xl, sid, rng):
                z_p, y_len, y_mask, attn, g = self.model.apply(
                    self.params, x, xl, sid, ns, ls, nsw, max_frames,
                    method=Synthesizer.encode_prior, rngs={"noise": rng})

                def mk(fb):
                    def f(z_p, y_mask, g):
                        z = self._flow_reverse(z_p[:, :fb], y_mask[:, :fb],
                                               g)
                        audio = decode_body(z, g)
                        return jnp.pad(
                            audio,
                            ((0, 0), (0, (max_frames - fb) * hop), (0, 0)))
                    return f

                # length-sorted split decode (batch >= 4): one bucket per
                # batch covers the batch MAX while the short rows (incl.
                # batcher padding rows) pay for it — sorting on-device
                # and decoding the short/long halves at their own buckets
                # recovers the intra-batch spread in the same single
                # dispatch. Exact: each row's bucket still covers its
                # length + margin.
                b = z_p.shape[0]
                order = jnp.argsort(y_len)
                grp = ((order[: b // 2], order[b // 2:]) if b >= 4
                       else (order,))
                audio = jnp.zeros((b, max_frames * hop, 1), jnp.float32)
                for rows in grp:
                    need = jnp.minimum(
                        jnp.max(y_len[rows]) + DECODE_MARGIN, max_frames)
                    idx = jnp.sum((need > bounds).astype(jnp.int32))
                    a = jax.lax.switch(
                        idx, [mk(fb) for fb in branches], z_p[rows],
                        y_mask[rows], None if g is None else g[rows])
                    audio = audio.at[rows].set(a)
                return audio, y_len

            self._encode_cache[key] = run
        return self._encode_cache[key]

    def _decode_fn(self, n_frames: int):
        if n_frames not in self._decode_cache:
            if self.use_fast_decoder:
                @jax.jit
                def run(z, g):
                    return self._fast_decode(z, g)
            else:
                @jax.jit
                def run(z, g):
                    return self.model.apply(
                        self.params, z, g, method=Synthesizer.decode)

            self._decode_cache[n_frames] = run
        return self._decode_cache[n_frames]

    def _decode_gather_fn(self, full: int):
        """Jitted chunk decode that gathers its fixed-shape input from the
        on-device z by absolute frame indices (overlap + reflect tail
        baked into the indices; streaming.chunk_schedule). Keeps the
        latent device-resident — the only per-chunk host transfer is the
        audio itself."""
        key = ("gather", full)
        if key not in self._decode_cache:
            if self.use_fast_decoder:
                @jax.jit
                def run(z, g, idx):
                    return self._fast_decode(jnp.take(z, idx, axis=1), g)
            else:
                @jax.jit
                def run(z, g, idx):
                    return self.model.apply(
                        self.params, jnp.take(z, idx, axis=1), g,
                        method=Synthesizer.decode)

            self._decode_cache[key] = run
        return self._decode_cache[key]

    def _decode_rows_fn(self):
        """Jitted batched chunk decode: row r of the output decodes the
        fixed-shape window z[rows[r], idx[r]] — the whole streaming tail
        (all chunks of all clauses after the first) in ONE dispatch and
        ONE device->host fetch. jax.jit caches per input shape, so padding
        the stack to STREAM_TAIL_BUCKETS bounds the executable count."""
        key = "rows"
        if key not in self._decode_cache:
            if self.use_fast_decoder:
                def decode_body(z, g):
                    return self._fast_decode(z, g)
            else:
                def decode_body(z, g):
                    return self.model.apply(
                        self.params, z, g, method=Synthesizer.decode)

            @jax.jit
            def run(z, g, rows, idx):
                zc = z[rows[:, None], idx]  # [NT, full, C]
                gc = None if g is None else g[rows]
                return decode_body(zc, gc)

            self._decode_cache[key] = run
        return self._decode_cache[key]

    def stream_synthesize(
        self,
        text: str,
        speaker: Optional[str] = None,
        block: int = DEFAULT_BLOCK,
        pad: int = DEFAULT_PAD,
    ) -> Iterator[np.ndarray]:
        """Yield audio chunks incrementally (StreamSynthesis semantics).

        Holds the engine lock for the lifetime of the generator (one
        streaming synthesis at a time per chip, matching the previous
        server-level serialization)."""
        with self.lock:
            yield from self._stream_synthesize(text, speaker, block, pad)

    def _stream_synthesize(self, text, speaker, block, pad):
        sid = self.speaker_id(speaker)
        sentences = sentence_segment(text, MAX_CLAUSE_LEN) or [text]
        if self.stream_batch_tail:
            from wetts_tpu.serving.batcher import BATCH_BUCKETS

            ids_list = []
            for sentence in sentences:
                with self.stage_times.stage("frontend"):
                    ids = self.text_to_phone_ids(sentence)
                if not ids:
                    continue  # skip failed segments (tts.cc:104-120)
                ids_list.append(ids[: TEXT_BUCKETS[-1]])
            for lo in range(0, len(ids_list), BATCH_BUCKETS[-1]):
                yield from self._stream_group(
                    ids_list[lo: lo + BATCH_BUCKETS[-1]], sid, block, pad)
            return
        yield from self._stream_per_chunk(sentences, sid, block, pad)

    def _stream_group(self, ids_list: List[List[int]], sid: int,
                      block: int, pad: int) -> Iterator[np.ndarray]:
        """O(1)-dispatch streaming of one clause group.

        One batched encode over every clause; the global first chunk
        decodes alone (first-chunk latency = encode + one chunk decode +
        one fetch); every remaining chunk of every clause is stacked on
        the BATCH axis into one decode dispatch and one async
        device->host fetch. The chunks are independent by construction
        (the reference decodes them in separate ONNX calls,
        inference_onnx.py:139-158), so stacking is exact up to conv batch
        math; tests/test_serving.py::test_stream_batch_tail_*."""
        from wetts_tpu.serving.batcher import batch_bucket

        n = len(ids_list)
        if n == 0:
            return
        b_pad = batch_bucket(n)
        text_pad, max_frames = self._bucket(max(len(i) for i in ids_list))
        x = np.zeros((b_pad, text_pad), np.int32)
        xl = np.ones((b_pad,), np.int32)
        sid_arr = np.full((b_pad,), sid, np.int32)
        for row, ids in enumerate(ids_list):
            x[row, : len(ids)] = ids
            xl[row] = len(ids)
        encode = self._encode_fn(text_pad, max_frames)
        with self.stage_times.stage("encode"):
            z, y_len, g = encode(
                jnp.asarray(x), jnp.asarray(xl), jnp.asarray(sid_arr),
                self._next_rng())
            y_len.copy_to_host_async()
            y_len = np.asarray(y_len)  # the single scalar host sync
        entries = []  # flat (row, Chunk, gather indices) over all clauses
        for row in range(n):
            t = int(y_len[row])
            if t <= 0:
                continue
            for chunk, idx in chunk_schedule(t, block, pad):
                entries.append((row, chunk, idx))
        if not entries:
            return
        decode = self._decode_rows_fn()
        # group 0 = the global first chunk alone; the rest in
        # STREAM_TAIL_BUCKETS-sized stacks (typically one)
        groups = [entries[:1]]
        tail = entries[1:]
        while tail:
            take = min(len(tail), STREAM_TAIL_BUCKETS[-1])
            groups.append(tail[:take])
            tail = tail[take:]
        dispatched = []
        for grp in groups:
            nt = _tail_bucket(len(grp))
            rows = np.fromiter((r for r, _, _ in grp), np.int32, len(grp))
            rows = np.concatenate(
                [rows, np.full(nt - len(grp), rows[-1], np.int32)])
            idxm = np.stack([i for _, _, i in grp]
                            + [grp[-1][2]] * (nt - len(grp)))
            dispatched.append(
                (grp, decode(z, g, jnp.asarray(rows), jnp.asarray(idxm))))
        # start every device->host copy now: the transfers pipeline with
        # the still-executing decode queue and with each other
        for _, audio in dispatched:
            audio.copy_to_host_async()
        for grp, audio in dispatched:
            with self.stage_times.stage("decode_chunk"):
                host = np.asarray(audio)[:, :, 0]  # [NT, full*hop]
            for k, (_, meta, _) in enumerate(grp):
                yield depad_audio(host[k: k + 1], meta, block, pad,
                                  self.hop)[0]

    def _stream_per_chunk(self, sentences, sid, block, pad):
        """One decode dispatch per chunk (the pre-batched-tail path; kept
        as the exactness oracle and for `stream_batch_tail=False`)."""
        for sentence in sentences:
            with self.stage_times.stage("frontend"):
                ids = self.text_to_phone_ids(sentence)
            if not ids:
                continue  # skip failed segments (tts.cc:104-120)
            ids = ids[: TEXT_BUCKETS[-1]]  # overflow guard (raw-phone input)
            text_pad, max_frames = self._bucket(len(ids))
            x = np.zeros((1, text_pad), np.int32)
            x[0, : len(ids)] = ids
            encode = self._encode_fn(text_pad, max_frames)
            with self.stage_times.stage("encode"):
                z, y_len, g = encode(
                    jnp.asarray(x), jnp.asarray([len(ids)], jnp.int32),
                    jnp.asarray([sid], jnp.int32), self._next_rng())
                t = int(y_len[0])  # the single scalar host round-trip
            if t <= 0:
                continue
            decode = self._decode_gather_fn(block + 2 * pad)
            # dispatch every chunk decode up front (dispatch is async);
            # the fetch loop below then overlaps device compute with the
            # host transfer of earlier chunks
            pending = []
            for chunk, idx in chunk_schedule(t, block, pad):
                audio = decode(z, g, jnp.asarray(idx))
                pending.append((chunk, audio))
            # start every device->host copy now: transfers pipeline with
            # the still-executing decode queue and with each other, so the
            # fetch loop below pays ~one round-trip total instead of one
            # per chunk (a ~60ms RTT on a tunnel-attached chip)
            for _, audio in pending:
                audio.copy_to_host_async()
            for chunk, audio in pending:
                with self.stage_times.stage("decode_chunk"):
                    host = np.asarray(audio)[:, :, 0]
                yield depad_audio(host, chunk, block, pad, self.hop)[0]
