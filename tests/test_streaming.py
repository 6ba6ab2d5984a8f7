"""Streaming chunk/depad math vs the reference's published semantics."""

import math

import numpy as np

from wetts_tpu.serving.streaming import (
    Chunk,
    depad_audio,
    get_chunks,
    stream_decode,
)


def ref_get_chunks(mel, block_size, pad_size):
    """Oracle: the reference's chunking loop (inference_onnx.py:37-56)."""
    mel_len = mel.shape[1]
    chunks = []
    n = math.ceil(mel_len / block_size)
    for i in range(n):
        start = max(0, i * block_size - pad_size)
        end = min((i + 1) * block_size + pad_size, mel_len)
        chunks.append(mel[:, start:end, :])
    return chunks


def ref_depadding(audio, chunk_num, chunk_id, block, pad, upsample):
    """Oracle: reference depadding (inference_onnx.py:59-76)."""
    front_pad = min(chunk_id * block, pad)
    if chunk_id == 0:
        return audio[:, : block * upsample]
    if chunk_id == chunk_num - 1:
        return audio[:, front_pad * upsample :]
    return audio[:, front_pad * upsample : (front_pad + block) * upsample]


def test_chunks_match_reference():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 173, 8)).astype(np.float32)
    for block, pad in [(40, 10), (70, 10), (32, 8)]:
        ours = get_chunks(z, block, pad)
        want = ref_get_chunks(z, block, pad)
        assert len(ours) == len(want)
        for c, w in zip(ours, want):
            np.testing.assert_array_equal(c.data, w)


def test_depad_matches_reference():
    rng = np.random.default_rng(1)
    block, pad, upsample = 40, 10, 4
    z = rng.standard_normal((1, 173, 8)).astype(np.float32)
    chunks = get_chunks(z, block, pad)
    for c in chunks:
        audio = rng.standard_normal(
            (1, c.data.shape[1] * upsample)).astype(np.float32)
        got = depad_audio(audio, c, block, pad, upsample)
        want = ref_depadding(audio, c.chunk_num, c.chunk_id, block, pad,
                             upsample)
        np.testing.assert_array_equal(got, want)


def test_stream_reassembles_exactly_with_linear_decoder():
    """With a frame-local decoder, streaming must be bit-exact."""
    rng = np.random.default_rng(2)
    upsample = 4
    z = rng.standard_normal((1, 157, 6)).astype(np.float32)

    def decode_fn(z_chunk):
        # frame-local "decoder": repeat each frame's sum upsample times
        s = z_chunk.sum(-1)  # [B, T]
        return np.repeat(s, upsample, axis=1)

    full = decode_fn(z)
    pieces = list(stream_decode(z, decode_fn, block=40, pad=10,
                                upsample=upsample, fixed_shape=False))
    np.testing.assert_allclose(np.concatenate(pieces, axis=1), full)
    # fixed-shape mode (single compiled decoder shape) also reassembles
    pieces2 = list(stream_decode(z, decode_fn, block=40, pad=10,
                                 upsample=upsample, fixed_shape=True))
    np.testing.assert_allclose(np.concatenate(pieces2, axis=1), full)
    shapes = {p.shape for p in
              (c.data for c in get_chunks(z, 40, 10, fixed_shape=True))}
    assert len(shapes) == 1  # one compiled shape


def test_total_length_preserved():
    rng = np.random.default_rng(3)
    for t in [1, 39, 40, 41, 100, 173, 200]:
        z = rng.standard_normal((1, t, 4)).astype(np.float32)
        upsample = 8
        pieces = list(stream_decode(
            z, lambda c: np.zeros((1, c.shape[1] * upsample)),
            block=40, pad=10, upsample=upsample))
        assert sum(p.shape[1] for p in pieces) == t * upsample


def test_chunk_schedule_matches_get_chunks():
    """Device-gather plan == host chunk math (incl. reflect tail)."""
    import numpy as np

    from wetts_tpu.serving.streaming import chunk_schedule, get_chunks

    rng = np.random.default_rng(0)
    for t in (7, 40, 95, 120, 121, 399):
        z = rng.standard_normal((2, t, 5)).astype(np.float32)
        chunks = get_chunks(z, block=40, pad=10, fixed_shape=True)
        plan = chunk_schedule(t, block=40, pad=10)
        assert len(plan) == len(chunks)
        for (meta, idx), chunk in zip(plan, chunks):
            assert meta.chunk_id == chunk.chunk_id
            assert meta.chunk_num == chunk.chunk_num
            assert meta.valid_frames == chunk.valid_frames
            gathered = z[:, idx]
            np.testing.assert_array_equal(gathered, chunk.data)
