import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.ops import (
    sequence_mask,
    slice_segments,
    rand_slice_segments,
    generate_path,
    subsequent_mask,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 5, 0]), 5)
    expect = np.array([
        [1, 1, 0, 0, 0],
        [1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0],
    ], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_subsequent_mask():
    m = subsequent_mask(3)
    assert m.shape == (1, 1, 3, 3)
    np.testing.assert_array_equal(
        np.asarray(m[0, 0]), np.tril(np.ones((3, 3), np.float32)))


def test_slice_segments():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    out = slice_segments(x, jnp.array([0, 4]), 4)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 0:4]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 4:8]))


def test_rand_slice_segments_in_bounds():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 50, 2))
    lengths = jnp.array([50, 32, 33, 40])
    for i in range(5):
        seg, ids = rand_slice_segments(x, lengths, 32, jax.random.fold_in(rng, i))
        assert seg.shape == (4, 32, 2)
        ids = np.asarray(ids)
        assert (ids >= 0).all()
        assert (ids + 32 <= np.asarray(lengths)).all()


def test_generate_path():
    # durations [2, 1, 3] over 6 frames
    dur = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    path = np.asarray(generate_path(dur, mask))
    expect = np.array([
        [1, 1, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0],
        [0, 0, 0, 1, 1, 1],
    ], dtype=np.float32)
    np.testing.assert_array_equal(path[0], expect)
    # each frame assigned to exactly one text position
    np.testing.assert_array_equal(path[0].sum(0), np.ones(6))
