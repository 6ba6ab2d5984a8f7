"""Fused multi-receptive-field (MRF) stage as a Pallas TPU kernel.

The HiFi-GAN decoder's hot loop (reference wetts/vits/model/decoders.py:
63-82) runs, per upsample stage, 3 resblock branches x 3 layers x 2 convs
with leaky-relu and residual adds between every conv. Under XLA each conv
and each elementwise op is its own HBM round trip — profiling the v5e
serving path shows ~1/3 of decoder time in `add/compare_select` fusions
(pure HBM bandwidth).

This kernel executes one *entire* blocked-domain MRF stage
(models/hifigan_fast.py space-to-depth layout, lanes = r*C = 128) per grid
step with every intermediate resident in VMEM:

  for each branch:  x -> [lrelu -> conv -> lrelu -> conv -> +x] x layers
  output = mean(branches)

Convs use the same block-Toeplitz kernels as the XLA fast path
(hifigan_fast.blocked_conv_kernel), so results match that path bit-for-bit
(max diff 0.0 on v5e; tests/test_mrf_pallas.py). Time is tiled with a halo
wide enough for the whole conv chain's receptive field, assembled from the
neighboring auto-pipelined tile blocks.

Measured on v5e (B=16, Tb=51200, VITS-base stage sizes, TILE=1024):
stage4 (r=4) 1.4-1.5x faster than the XLA blocked path in f32 and ~1.1x in
bf16; stage3 (r=2) ~1.1x f32 / ~parity bf16. END-TO-END, however, the
pallas_call boundary stops XLA from fusing the surrounding
upsample/bias/lrelu ops and the halo re-pad adds an HBM pass per stage, so
full-pipeline throughput REGRESSES (bench.py: 1570 vs 1860 audio-s/s
bf16). The kernel is therefore opt-in
(fast_generator_apply(use_pallas_mrf=True)); the XLA blocked path is the
production default. No VJP is defined — training uses the XLA path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.models.hifigan_fast import (
    LRELU_SLOPE,
    _fold_kernel,
    _get_padding,
    blocked_conv_kernel,
)

# time-blocks per grid step: 1024 measured best on v5e (256/512 pay more
# grid overhead; 2048 exceeds the 16M VMEM scoped limit with the halo)
TILE = 1024


def build_stage_spec(
    stage_params: Sequence,  # [branch] -> resblock param dict
    resblock_kind: str,
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    r: int,
    dtype,
):
    """Pack one stage's conv weights into (W_all, bias_all, static plan).

    Returns (W_all [sum_KB, rC, rC], B_all [n_conv, rC], branches) where
    branches is a list of conv descriptors: each branch is a list of
    (tap_offset, KB, pad_left, bias_index, residual_marker) tuples laid
    out in execution order; residual adds happen after every
    2 convs (ResBlock1) / 1 conv (ResBlock2).
    """
    w_list: List[np.ndarray] = []
    b_list: List[np.ndarray] = []
    branches = []
    off = 0

    def add_conv(p, ksz, d):
        nonlocal off
        w = _fold_kernel(p)
        wb, pl_, _pr = blocked_conv_kernel(w, d, _get_padding(ksz, d), r)
        wb = jnp.asarray(wb, dtype)
        bias = jnp.tile(jnp.asarray(p["bias"]), r).astype(dtype)
        w_list.append(wb)
        b_list.append(bias)
        desc = (off, int(wb.shape[0]), int(pl_), len(b_list) - 1)
        off += int(wb.shape[0])
        return desc

    for j, (ksz, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        rp = stage_params[j]
        convs = []
        for idx, d in enumerate(dils):
            if resblock_kind == "1":
                convs.append((add_conv(rp[f"conv1_{idx}"], ksz, d),
                              add_conv(rp[f"conv2_{idx}"], ksz, 1)))
            else:
                convs.append((add_conv(rp[f"conv_{idx}"], ksz, d),))
        branches.append(convs)

    w_all = jnp.concatenate(w_list, axis=0)
    b_all = jnp.stack(b_list, axis=0)
    return w_all, b_all, branches


def _halo(branches) -> int:
    """Blocks of garbage each conv chain can spread from the tile edge."""
    h = 0
    for convs in branches:
        hb = 0
        for group in convs:
            for (_off, kb, _pl, _bi) in group:
                hb += kb - 1
        h = max(h, hb)
    return h


def _lrelu(x, slope):
    """leaky_relu with the comparison in f32 (Mosaic has no bf16 cmpf)."""
    return jnp.where(x.astype(jnp.float32) >= 0, x, x * slope)


def _mrf_kernel(prev_ref, cur_ref, next_ref, w_ref, b_ref, out_ref, *,
                branches, halo, dtype, tb):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    size = TILE + 2 * halo
    # halo assembly from the neighboring tiles (the three refs are
    # consecutive TILE-blocks of the same padded array — Mosaic pipelines
    # them automatically; no manual DMA, which the PJRT runtime here
    # does not support from kernel bodies)
    x0 = jnp.concatenate(
        [prev_ref[0, TILE - halo :], cur_ref[0], next_ref[0, :halo]], axis=0)
    n_lanes = x0.shape[-1]
    # rows outside the true sequence [0, tb): every conv in the XLA path
    # zero-pads ITS OWN input at the sequence boundary, so conv outputs
    # there must be zeroed (bias would otherwise leak through the chain)
    row = (jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
           + i * TILE - halo)
    in_seq = (row >= 0) & (row < tb)

    def sconv(cur, left, desc):
        """Valid (shrinking) conv: no pads/shifts, output row 0 aligns
        with xin row `left + pad_left`."""
        off, kb, pl_, bi = desc
        n = cur.shape[0] - (kb - 1)
        out = jnp.dot(cur[:n], w_ref[off], preferred_element_type=jnp.float32)
        for q in range(1, kb):
            out = out + jnp.dot(cur[q : q + n], w_ref[off + q],
                                preferred_element_type=jnp.float32)
        out = out + b_ref[bi].astype(jnp.float32)
        left = left + pl_
        out = jnp.where(in_seq[left : left + n], out, 0.0)
        return out.astype(dtype), left

    acc = jnp.zeros((TILE, n_lanes), jnp.float32)
    for convs in branches:
        cur, left = x0, 0
        for group in convs:
            xt = _lrelu(cur, LRELU_SLOPE)
            xt, lt = sconv(xt, left, group[0])
            if len(group) == 2:  # ResBlock1: second conv
                xt = _lrelu(xt, LRELU_SLOPE)
                xt, lt = sconv(xt, lt, group[1])
            # residual add: crop cur to xt's alignment
            cur = cur[lt - left : lt - left + xt.shape[0]] + xt
            left = lt
        acc = acc + cur[halo - left : halo - left + TILE].astype(jnp.float32)

    out_ref[0] = (acc / len(branches)).astype(dtype)


def mrf_stage_pallas(
    h: jax.Array,  # [B, Tb, 128] blocked-domain stage input
    stage_params: Sequence,
    resblock_kind: str,
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    r: int,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = h.dtype
    w_all, b_all, branches = build_stage_spec(
        stage_params, resblock_kind, kernel_sizes, dilation_sizes, r, dtype)
    halo = _halo(branches)
    assert halo <= TILE, (halo, TILE)

    bsz, tb, lanes = h.shape
    n_tiles = -(-tb // TILE)
    pad_t = n_tiles * TILE - tb
    # one leading + one trailing TILE so every tile has both neighbors
    x_pad = jnp.pad(h, ((0, 0), (TILE, TILE + pad_t), (0, 0)))

    kernel = functools.partial(_mrf_kernel, branches=branches, halo=halo,
                               dtype=dtype, tb=tb)
    tile_spec = lambda shift: pl.BlockSpec(  # noqa: E731
        (1, TILE, lanes), lambda b, i, s=shift: (b, i + s, 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles * TILE, lanes), dtype),
        grid=(bsz, n_tiles),
        in_specs=[
            tile_spec(0),  # previous tile (of the TILE-padded array)
            tile_spec(1),  # current
            tile_spec(2),  # next
            pl.BlockSpec(w_all.shape, lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_all.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, lanes), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(x_pad, x_pad, x_pad, w_all, b_all)
    return out[:, :tb]
