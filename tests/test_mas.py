"""MAS vs an independent numpy oracle implementing the published DP.

The oracle reproduces the reference algorithm's semantics
(wetts/vits/utils/monotonic_align.py:26-57): banded forward DP then greedy
backtracking with the `value[y-1, x] < value[y-1, x-1]` tie rule.
"""

import numpy as np
import jax.numpy as jnp

from wetts_tpu.ops import maximum_path


def mas_oracle(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    """neg_cent: [B, T_spec, T_text] -> 0/1 path, per-item lengths t_ys/t_xs."""
    b = neg_cent.shape[0]
    paths = np.zeros(neg_cent.shape, dtype=np.int32)
    neg_inf = -1e9
    for i in range(b):
        value = neg_cent[i].copy().astype(np.float64)
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = neg_inf if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else neg_inf
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, y, index] = 1
            if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths


def _run_case(rng, b, t_spec, t_text, ragged=True):
    neg_cent = rng.standard_normal((b, t_spec, t_text)).astype(np.float32) * 3
    if ragged:
        t_ys = rng.integers(t_text, t_spec + 1, size=b)
        t_xs = np.minimum(rng.integers(1, t_text + 1, size=b), t_ys)
    else:
        t_ys = np.full(b, t_spec)
        t_xs = np.full(b, t_text)
    mask = np.zeros((b, t_spec, t_text), np.float32)
    for i in range(b):
        mask[i, : t_ys[i], : t_xs[i]] = 1
    got = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    want = mas_oracle(neg_cent, t_ys, t_xs).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_mas_full_lengths():
    _run_case(np.random.default_rng(0), b=3, t_spec=40, t_text=17, ragged=False)


def test_mas_ragged_lengths():
    _run_case(np.random.default_rng(1), b=6, t_spec=64, t_text=23, ragged=True)


def test_mas_square_and_tiny():
    _run_case(np.random.default_rng(2), b=2, t_spec=9, t_text=9, ragged=False)
    _run_case(np.random.default_rng(3), b=2, t_spec=1, t_text=1, ragged=False)


def test_mas_path_properties():
    rng = np.random.default_rng(4)
    b, t_spec, t_text = 4, 50, 20
    neg_cent = rng.standard_normal((b, t_spec, t_text)).astype(np.float32)
    mask = np.ones((b, t_spec, t_text), np.float32)
    path = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    # exactly one text position per frame; durations sum to t_spec;
    # monotonic non-decreasing assignment
    assert (path.sum(-1) == 1).all()
    assert (path.sum(1).sum(-1) == t_spec).all()
    arg = path.argmax(-1)
    assert (np.diff(arg, axis=1) >= 0).all()
    assert (arg[:, 0] == 0).all() and (arg[:, -1] == t_text - 1).all()
