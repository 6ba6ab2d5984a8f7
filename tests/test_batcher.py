"""Dynamic request batching (Triton dynamic_batching analog)."""

import threading

import numpy as np
import pytest

from tests.test_serving import engine  # noqa: F401 (fixture)


def test_batched_equals_individual_shapes(engine):  # noqa: F811
    ids_a = engine.text_to_phone_ids("a b c a b")
    ids_b = engine.text_to_phone_ids("c b a")
    outs = engine.synthesize_ids_batch([ids_a, ids_b], [0, 1])
    assert len(outs) == 2
    for ids, audio in zip((ids_a, ids_b), outs):
        assert audio.ndim == 1 and audio.size > 0
        assert np.isfinite(audio).all()
    # per-item lengths differ with text length (durations are per-item)
    solo = engine._synthesize_ids(ids_b, 1)
    assert solo.shape == outs[1].shape or abs(
        solo.size - outs[1].size) % engine.hop == 0


def test_batch_bucket_padding(engine):  # noqa: F811
    from wetts_tpu.serving.batcher import batch_bucket

    assert [batch_bucket(n) for n in (1, 2, 3, 5, 8, 20)] == \
        [1, 2, 4, 8, 8, 8]


def test_dynamic_batcher_concurrent_requests(engine):  # noqa: F811
    from wetts_tpu.serving.batcher import DynamicBatcher

    batcher = DynamicBatcher(engine, max_batch=4, max_delay_s=0.05)
    try:
        results = {}
        errors = []

        def req(i, text):
            try:
                results[i] = batcher.synthesize(text, "spk0")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        texts = ["a b c", "b c a b", "c c", "a b c a b c a"]
        threads = [threading.Thread(target=req, args=(i, t))
                   for i, t in enumerate(texts)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert sorted(results) == [0, 1, 2, 3]
        for i in range(4):
            assert results[i].size > 0 and np.isfinite(results[i]).all()
    finally:
        batcher.shutdown()


def test_batcher_propagates_errors(engine):  # noqa: F811
    from wetts_tpu.serving.batcher import DynamicBatcher

    class Boom:
        def speaker_id(self, name):
            return 0

        def text_to_phone_ids(self, text):
            return [1, 2]

        def synthesize_ids_batch(self, ids, sids):
            raise RuntimeError("boom")

    batcher = DynamicBatcher(Boom(), max_delay_s=0.001)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            batcher.synthesize("a b")
    finally:
        batcher.shutdown()
