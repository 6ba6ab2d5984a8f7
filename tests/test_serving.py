"""End-to-end serving: engine synthesis, streaming, HTTP server."""

import base64
import json
import urllib.parse
import urllib.request

import jax
import numpy as np
import pytest

from wetts_tpu.config import Config
from wetts_tpu.serving.engine import SynthesisEngine


@pytest.fixture(scope="module")
def engine():
    cfg = Config.from_dict({
        "train": {"segment_size": 2048},
        "data": {"filter_length": 256, "hop_length": 64, "win_length": 256,
                 "sampling_rate": 8000},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "2",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [4, 4, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8, 4, 4], "gin_channels": 8,
        },
        "num_phones": 16, "num_speakers": 2})
    from wetts_tpu.models.synthesizer import Synthesizer
    import jax.numpy as jnp

    model = Synthesizer.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng, "slice": rng},
        jnp.ones((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 36, cfg.data.spec_channels)), jnp.array([36]),
        jnp.array([0]))
    phone2id = {"sil": 0, "a": 1, "b": 2, "c": 3}
    return SynthesisEngine(cfg, variables, phone2id, {"spk0": 0, "spk1": 1})


def test_engine_synthesize_raw_phones(engine):
    audio = engine.synthesize("a b c a b")
    assert audio.ndim == 1 and audio.size > 0
    assert np.isfinite(audio).all()


def test_engine_speaker_fallback(engine):
    assert engine.speaker_id("spk1") == 1
    assert engine.speaker_id("nope") == 0  # fallback to first


def test_engine_oov_phones_skipped(engine):
    audio = engine.synthesize("a zz b")  # zz is OOV -> skipped with a log
    assert audio.size > 0


def test_engine_streaming_matches_total_length(engine):
    pieces = list(engine.stream_synthesize("a b c a b c a b"))
    assert len(pieces) >= 1
    total = np.concatenate(pieces)
    assert total.size % engine.hop == 0


def test_long_clause_synthesis(engine):
    # a long comma-free clause must not overflow the text buckets
    # (reference forces splits at 32 chars, sentence_break.h:27); with
    # raw-phone input the ids themselves are split instead of raising
    long_text = "a b c " * 200  # 600 phones, no clause delimiters
    audio = engine.synthesize(long_text)
    assert audio.size > 0 and np.isfinite(audio).all()
    # oversized batches are split into bucket-sized sub-batches
    audios = engine.synthesize_ids_batch([[1, 2, 3]] * 10, [0] * 10)
    assert len(audios) == 10


def test_on_device_bucketing_matches_two_phase(engine):
    """Single-dispatch lax.switch synthesis == two-phase host-sync path.

    The switch engine picks the decode-frame bucket on-device; z is masked
    beyond y_lengths, so the covering-bucket decode must reproduce the
    two-phase path's waveform per request (same seed -> same encode rng).
    """
    switch_eng = SynthesisEngine(
        engine.cfg, engine.params, engine.phone2id, engine.speaker2id,
        on_device_bucketing=True)
    batch = [[1, 2, 3, 1], [2, 3], [1, 1, 2, 3, 1, 2]]
    sids = [0, 1, 0]
    # align the noise stream: the module-scoped engine's rng has advanced.
    # Restore it afterwards so later tests' noise streams don't depend on
    # execution order.
    saved_rng = engine._rng
    try:
        engine._rng = jax.random.PRNGKey(123)
        switch_eng._rng = jax.random.PRNGKey(123)
        want = engine.synthesize_ids_batch(batch, sids)
        got = switch_eng.synthesize_ids_batch(batch, sids)
    finally:
        engine._rng = saved_rng
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-5)


def test_on_device_bucketing_speakerless():
    """lax.switch branches accept g=None (speakerless, gin_channels=0 —
    the LJSpeech-style single-speaker bundle shape)."""
    import jax.numpy as jnp

    from wetts_tpu.config import Config
    from wetts_tpu.models.synthesizer import Synthesizer

    cfg = Config.from_dict({
        "train": {"segment_size": 2048},
        "data": {"filter_length": 256, "hop_length": 64, "win_length": 256,
                 "sampling_rate": 8000},
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "kernel_size": 3, "p_dropout": 0.1, "resblock": "1",
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [4, 4, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8, 4, 4], "gin_channels": 0,
        },
        "num_phones": 16, "num_speakers": 0})
    model = Synthesizer.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng, "slice": rng},
        jnp.ones((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 36, cfg.data.spec_channels)), jnp.array([36]), None)
    eng = SynthesisEngine(cfg, variables, {"sil": 0, "a": 1, "b": 2}, None,
                          on_device_bucketing=True)
    out = eng.synthesize_ids_batch([[1, 2, 1]], [0])
    assert out[0].size > 0 and np.isfinite(out[0]).all()


def test_on_device_bucketing_with_int8(engine):
    """lax.switch branches compile and run with the dynamically-quantized
    decoder inside (per-branch jnp.max activation scales under a
    conditional)."""
    eng = SynthesisEngine(
        engine.cfg, engine.params, engine.phone2id, engine.speaker2id,
        quantize=True, on_device_bucketing=True)
    out = eng.synthesize_ids_batch([[1, 2, 3]], [0])
    assert out[0].size > 0 and np.isfinite(out[0]).all()


def test_half_precision_drift_bounded(engine):
    """bf16 serving path (bf16 flow + bf16 decoder) tracks the f32 engine.

    The flow now also runs bf16 under half/int8 (engine._flow_reverse —
    it is elementwise-bound, so halving its HBM traffic is the serving
    win); this bounds the composed flow+decoder drift at the engine level
    the way tests/test_hifigan_fast.py bounds the decoder alone."""
    half_eng = SynthesisEngine(
        engine.cfg, engine.params, engine.phone2id, engine.speaker2id,
        half=True, use_fast_decoder=True)
    batch = [[1, 2, 3, 1, 2], [3, 2, 1]]
    saved_rng = engine._rng
    try:
        engine._rng = jax.random.PRNGKey(7)
        half_eng._rng = jax.random.PRNGKey(7)
        want = engine.synthesize_ids_batch(batch, [0, 1])
        got = half_eng.synthesize_ids_batch(batch, [0, 1])
    finally:
        engine._rng = saved_rng
    for g, w in zip(got, want):
        assert g.shape == w.shape  # identical realized lengths (f32 dp)
        assert np.abs(g - w).max() < 5e-2
        # untrained weights give near-zero waveforms; correlation at this
        # scale is far tighter at trained-signal magnitudes
        assert np.corrcoef(g, w)[0, 1] > 0.99


def test_auto_bucketing_resolves_false_on_host_attached(engine):
    """`on_device_bucketing="auto"` probes the host<->device RTT; on a
    host-attached backend (CPU here, microsecond round-trips) the probe
    must pick the cheap-compile two-phase path."""
    assert engine.on_device_bucketing is False


def _noise_free_engine(engine, **kw):
    """Engine with noise_scale=noise_scale_w=0: synthesis is a
    deterministic function of the text, so differently-batched paths can
    be compared sample-for-sample."""
    return SynthesisEngine(
        engine.cfg, engine.params, engine.phone2id, engine.speaker2id,
        noise_scale=0.0, noise_scale_w=0.0, **kw)


def test_stream_batch_tail_matches_per_chunk(engine):
    """Batched-tail streaming (O(1) decode dispatches + fetches per
    utterance) yields the same chunks as the one-dispatch-per-chunk path:
    same chunk boundaries, same samples (the tail stack decodes the same
    gathered windows, just stacked on the batch axis)."""
    per_chunk = _noise_free_engine(engine, stream_batch_tail=False)
    batched = _noise_free_engine(engine, stream_batch_tail=True)
    # 3 clauses -> one batched encode + first-chunk + one tail stack
    text = "a b c a. c b a c. b b c a b."
    pa = list(per_chunk.stream_synthesize(text, "spk0", block=8, pad=2))
    pb = list(batched.stream_synthesize(text, "spk0", block=8, pad=2))
    assert len(pa) == len(pb)
    assert len(pb) >= 3  # multiple chunks actually streamed
    for want, got in zip(pa, pb):
        assert want.shape == got.shape
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_stream_batch_tail_single_clause(engine):
    """Single-clause utterances (tail possibly empty) stream correctly."""
    eng = _noise_free_engine(engine, stream_batch_tail=True)
    ref = _noise_free_engine(engine, stream_batch_tail=False)
    for text in ("a", "a b c a b c a b"):
        got = list(eng.stream_synthesize(text, "spk0", block=8, pad=2))
        want = list(ref.stream_synthesize(text, "spk0", block=8, pad=2))
        assert len(got) == len(want)
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=2e-5)


def test_batcher_composes_with_on_device_bucketing(engine):
    """DynamicBatcher dispatch through the lax.switch single-dispatch
    engine (the auto-enabled serving configuration on tunnel-attached
    chips)."""
    from wetts_tpu.serving.batcher import DynamicBatcher

    eng = SynthesisEngine(
        engine.cfg, engine.params, engine.phone2id, engine.speaker2id,
        on_device_bucketing=True)
    batcher = DynamicBatcher(eng, max_delay_s=0.02)
    try:
        futs = [batcher.submit(ids, sid) for ids, sid in
                [([1, 2, 3], 0), ([2, 3], 1), ([1, 1, 2, 3], 0)]]
        outs = [f.result(timeout=300) for f in futs]
        for audio in outs:
            assert audio.size > 0 and np.isfinite(audio).all()
    finally:
        batcher.shutdown()


def test_long_clause_through_server(engine):
    from wetts_tpu.serving.server import TtsServer

    server = TtsServer(engine, host="127.0.0.1", port=18125)
    server.start_background()
    try:
        text = urllib.parse.quote("a b c " * 170)  # >1000 chars, no commas
        url = f"http://127.0.0.1:18125/?text={text}"
        with urllib.request.urlopen(url, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert payload["status"] == "ok"
        assert base64.b64decode(payload["audio"])[:4] == b"RIFF"
    finally:
        server.shutdown()


def test_http_server(engine):
    from wetts_tpu.serving.server import TtsServer

    server = TtsServer(engine, host="127.0.0.1", port=18123)
    server.start_background()
    try:
        url = "http://127.0.0.1:18123/?text=a+b+c&name=spk0"
        with urllib.request.urlopen(url, timeout=60) as resp:
            payload = json.loads(resp.read())
        assert payload["status"] == "ok"
        wav = base64.b64decode(payload["audio"])
        assert wav[:4] == b"RIFF"
        # missing text -> 400
        try:
            urllib.request.urlopen("http://127.0.0.1:18123/", timeout=60)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
