"""Monotonic Alignment Search as a fused Pallas TPU kernel.

Replaces the reference's CPU numba escape (wetts/vits/utils/
monotonic_align.py:11-19) and improves on the XLA-scan version (ops/mas.py)
by keeping the whole DP table in VMEM and fusing the forward recursion with
backtracking into ONE kernel launch:

- grid over batch blocks of BLOCK_B items; each step's row update is a
  [BLOCK_B, T_text] VPU op (full sublane utilization),
- forward: fori_loop over spec frames; v[y, x] = neg_cent[y, x] +
  max(v[y-1, x-1], v[y-1, x]) with the reference's band semantics
  (x == y forbidden from above, x == 0 reachable only at y == 0),
- backtracking: reverse fori_loop carrying a per-item text index, emitting
  one-hot path rows; index gathers use one-hot reductions (no scatters).

Numerics match ops/mas.py / the numpy oracle exactly (same -1e9 masking and
`value[y-1, x] < value[y-1, x-1]` tie rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
BLOCK_B = 8


def _mas_kernel(neg_cent_ref, t_text_ref, t_spec_ref, path_ref, value_ref):
    """One batch block: neg_cent [B, S, X] -> path [B, S, X].

    value_ref: VMEM scratch [B, S, X] holding the DP table.
    t_text_ref/t_spec_ref: [B, 1] int32 valid lengths (VMEM).
    """
    b, t_spec, t_x = neg_cent_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), 1)
    t_text = t_text_ref[:, 0]  # [B]
    t_spec_len = t_spec_ref[:, 0]

    # ---- forward DP --------------------------------------------------
    def fwd_body(y, v_prev):
        row = neg_cent_ref[:, y, :]
        # v_left[x] = v_prev[x-1]; x==0 gets 0 at y==0 else -inf
        rolled = pltpu.roll(v_prev, 1, axis=1)
        left_fill = jnp.where(y == 0, 0.0, _NEG)
        v_left = jnp.where(xs == 0, left_fill, rolled)
        v_up = jnp.where(xs == y, _NEG, v_prev)
        v = row + jnp.maximum(v_left, v_up)
        value_ref[:, y, :] = v
        return v

    v0 = jnp.full((b, t_x), _NEG, jnp.float32)
    jax.lax.fori_loop(0, t_spec, fwd_body, v0)

    # ---- backtracking ------------------------------------------------
    def bwd_body(i, index):
        y = t_spec - 1 - i
        # (re)initialize at each item's last valid row
        index = jnp.where(y == t_spec_len - 1, t_text - 1, index)
        active = y < t_spec_len
        onehot = (xs == index[:, None]).astype(jnp.float32)
        path_ref[:, y, :] = onehot * active[:, None].astype(jnp.float32)
        v_prev_row = value_ref[:, jnp.maximum(y - 1, 0), :]
        v_at = jnp.sum(jnp.where(xs == index[:, None], v_prev_row, 0.0),
                       axis=1)
        left_idx = jnp.maximum(index - 1, 0)
        v_left = jnp.sum(jnp.where(xs == left_idx[:, None], v_prev_row, 0.0),
                         axis=1)
        dec = (index == y) | (v_at < v_left)
        dec = dec & (index > 0) & active
        return index - dec.astype(jnp.int32)

    jax.lax.fori_loop(0, t_spec, bwd_body, jnp.zeros((b,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(neg_cent: jax.Array, mask: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Drop-in for ops.mas.maximum_path, Pallas TPU implementation.

    neg_cent/mask: [B, T_spec, T_text] -> float 0/1 path of the same shape.
    """
    b, t_spec, t_x = neg_cent.shape
    neg_cent = neg_cent.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    t_text = jnp.maximum(
        jnp.sum(mask_f[:, 0, :], axis=1).astype(jnp.int32), 1)
    t_spec_len = jnp.maximum(
        jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32), 1)
    masked = neg_cent * mask_f + (1.0 - mask_f) * _NEG

    # adaptive batch block: input + scratch + output blocks must fit VMEM
    block_b = BLOCK_B
    while block_b > 1 and 3 * block_b * t_spec * t_x * 4 > 12 * 2**20:
        block_b //= 2

    pad_b = (-b) % block_b
    if pad_b:
        masked = jnp.pad(masked, ((0, pad_b), (0, 0), (0, 0)),
                         constant_values=_NEG)
        t_text = jnp.pad(t_text, (0, pad_b), constant_values=1)
        t_spec_len = jnp.pad(t_spec_len, (0, pad_b), constant_values=1)
    bb = masked.shape[0]

    grid = (bb // block_b,)
    path = pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((bb, t_spec, t_x), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, t_spec, t_x), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, t_spec, t_x), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, t_spec, t_x), jnp.float32)],
        interpret=interpret,
    )(masked, t_text[:, None], t_spec_len[:, None])

    return path[:b] * mask_f
