"""Monotonic Alignment Search (MAS) — TPU-native.

The reference escapes to the CPU for this op (numba DP over each batch item,
wetts/vits/utils/monotonic_align.py:6-57), costing a device->host->device
round-trip every training step. Here the same Viterbi-style DP runs entirely
on-device:

- forward pass: one `lax.scan` over spec frames; each step is a vectorized
  [B, T_text] max/shift/add on the VPU (no data-dependent control flow),
- backtracking: a reverse `lax.scan` carrying the per-batch text index,
  emitting one-hot path rows.

Semantics match the reference exactly (same band constraints, same tie
handling `value[y-1, index] < value[y-1, index-1]`, same start cell
(0, 0) / end cell (t_y-1, t_x-1)); verified against a numpy oracle in
tests/test_mas.py. A fused Pallas kernel lives in ops/mas_pallas.py and is
used when the input is large enough to amortize kernel launch.

Shapes: neg_cent [B, T_spec, T_text]; mask [B, T_spec, T_text];
returns float path [B, T_spec, T_text].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def _forward_table(neg_cent: jax.Array, t_text: jax.Array) -> jax.Array:
    """DP table value[b, y, x] via scan over y. neg_cent pre-masked."""
    b, t_spec, t_x = neg_cent.shape
    xs = jnp.arange(t_x)

    def step(v_prev, inp):
        y, row = inp  # row: [B, T_text]
        left_fill = jnp.where(y == 0, 0.0, _NEG)
        v_left = jnp.concatenate(
            [jnp.full((b, 1), left_fill), v_prev[:, :-1]], axis=1)
        v_up = jnp.where(xs[None, :] == y, _NEG, v_prev)
        v = row + jnp.maximum(v_left, v_up)
        return v, v

    init = jnp.full((b, t_x), _NEG)
    _, table = jax.lax.scan(
        step, init, (jnp.arange(t_spec), jnp.swapaxes(neg_cent, 0, 1)))
    return jnp.swapaxes(table, 0, 1)  # [B, T_spec, T_text]


def _backtrack(value: jax.Array, t_text: jax.Array, t_spec_len: jax.Array) -> jax.Array:
    """Reverse scan recovering the argmax path as one-hot rows."""
    b, t_spec, t_x = value.shape
    xs = jnp.arange(t_x)

    def step(index, inp):
        y, v_prev_row = inp  # v_prev_row = value[:, y-1, :] (row y=0: junk)
        # (Re)initialize at each sequence's last valid row.
        index = jnp.where(y == t_spec_len - 1, t_text - 1, index)
        active = y < t_spec_len
        path_row = (xs[None, :] == index[:, None]).astype(jnp.float32)
        path_row = path_row * active[:, None].astype(jnp.float32)
        v_at = jnp.take_along_axis(v_prev_row, index[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            v_prev_row, jnp.maximum(index - 1, 0)[:, None], axis=1)[:, 0]
        dec = (index == y) | (v_at < v_left)
        dec = dec & (index > 0) & active
        index = index - dec.astype(index.dtype)
        return index, path_row

    ys = jnp.arange(t_spec - 1, -1, -1)
    # value[y-1] rows aligned with ys; y=0 row is never used (active row 0
    # writes but no decrement matters afterwards).
    prev_rows = value[:, jnp.maximum(ys - 1, 0), :]  # [B, T_spec, T_text]
    init = jnp.zeros((b,), dtype=jnp.int32)
    _, path_rows = jax.lax.scan(
        step, init, (ys, jnp.swapaxes(prev_rows, 0, 1)))
    path = jnp.swapaxes(path_rows, 0, 1)  # rows in reverse y order
    return jnp.flip(path, axis=1)


def maximum_path(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """Best monotonic alignment path maximizing sum of neg_cent.

    Dispatches to the fused Pallas kernel on TPU (ops/mas_pallas.py) and the
    lax.scan implementation elsewhere; both are exact-equal (tests/test_mas).

    neg_cent: [B, T_spec, T_text] log-likelihood scores.
    mask: [B, T_spec, T_text] validity mask (outer product of spec/text masks).
    Returns float path in {0, 1} of the same shape, zero outside the mask.
    """
    if jax.default_backend() == "tpu":
        from wetts_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(neg_cent, mask)
    return maximum_path_scan(neg_cent, mask)


def maximum_path_scan(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """Pure-XLA implementation (scan forward + reverse backtrack)."""
    neg_cent = neg_cent.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    t_text = jnp.maximum(jnp.sum(mask_f[:, 0, :], axis=1).astype(jnp.int32), 1)
    t_spec_len = jnp.maximum(jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32), 1)
    masked = neg_cent * mask_f + (1.0 - mask_f) * _NEG
    value = _forward_table(masked, t_text)
    path = _backtrack(value, t_text, t_spec_len)
    return path * mask_f
