"""Space-to-depth HiFi-GAN decoder (inference fast path).

Motivation (measured on TPU v5e): the tail stages of the reference-sized
generator run convs on [B, T, 32]/[B, T, 64] activations. TPU lane width is
128, so XLA pads the channel dim 4x/2x — 4x the HBM footprint and bandwidth
for the largest tensors in the whole pipeline (e.g. f32[32, 204800, 32]
padding-expands 800M -> 3.1G).

Fix: once a stage's channel count drops below 128, re-lay activations as
[B, T/r, C*r] with C*r a multiple of 128 ("space-to-depth") and run every
conv in the blocked domain with an equivalent block-Toeplitz kernel built
from the ORIGINAL parameters:

- stride-1 dilated conv  w[k, Ci, Co] -> Wb[KB, r*Ci, r*Co] where entry
  (qb, s*Ci+ci, i*Co+co) accumulates w[j, ci, co] for
  o = i + j*d - p, q = floor(o/r), s = o mod r, qb = q - q_min;
- transposed conv (stride u) with input blocked r_i and output blocked
  r_o = r_i * u becomes a plain blocked conv with
  j = -(r_o * m) + io + pd - u * ii;
- elementwise ops (leaky_relu, residual adds, MRF averaging, tanh) are
  layout-invariant, so the rest of the graph is unchanged.

The function consumes the standard `Generator` param tree (weight norm is
folded on the fly), so training checkpoints work unmodified. Exactness vs
`Generator.apply` is tested in tests/test_hifigan_fast.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
LANES = 128
LRELU_SLOPE = 0.1


def _fold_kernel(p: Dict) -> jnp.ndarray:
    """{v, g} weight-norm pair or {kernel} -> conv kernel [K, I, O]."""
    if "kernel" in p:
        return jnp.asarray(p["kernel"])
    v = jnp.asarray(p["v"])
    g = jnp.asarray(p["g"])
    norm = jnp.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / jnp.maximum(norm, 1e-12))


def _fold_kernel_transpose(p: Dict) -> jnp.ndarray:
    """ConvTranspose params (torch layout [I, O, K]) -> folded [I, O, K]."""
    if "kernel" in p:
        return jnp.asarray(p["kernel"])
    v = jnp.asarray(p["v"])
    g = jnp.asarray(p["g"])
    norm = jnp.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
    return v * (g[:, None, None] / jnp.maximum(norm, 1e-12))


@functools.lru_cache(maxsize=None)
def _conv_block_indices(k: int, d: int, p: int, r: int):
    """Static scatter plan for the stride-1 blocked kernel."""
    entries = []  # (qb, s, i, j)
    offsets = [(i, j, i + j * d - p) for i in range(r) for j in range(k)]
    qs = [o // r for (_, _, o) in offsets]
    q_min, q_max = min(qs), max(qs)
    for (i, j, o) in offsets:
        entries.append((o // r - q_min, o % r, i, j))
    return tuple(entries), q_min, q_max


def blocked_conv_kernel(w: Array, d: int, p: int, r: int):
    """w [k, Ci, Co] -> (Wb [KB, r*Ci, r*Co], pad_left, pad_right)."""
    k, ci, co = w.shape
    entries, q_min, q_max = _conv_block_indices(k, d, p, r)
    kb = q_max - q_min + 1
    wb = jnp.zeros((kb, r * ci, r * co), w.dtype)
    for (qb, s, i, j) in entries:
        wb = wb.at[qb, s * ci : (s + 1) * ci, i * co : (i + 1) * co].add(w[j])
    return wb, -q_min, q_max


@functools.lru_cache(maxsize=None)
def _tconv_block_indices(k: int, u: int, pd: int, r_i: int, r_o: int):
    assert r_o == r_i * u, "blocked transpose conv needs r_out = r_in * u"
    entries = []  # (m_idx, ii, io, j)
    raw = []
    for m in range(-k // r_o - 2, k // r_o + 3):
        for io in range(r_o):
            for ii in range(r_i):
                j = -(r_o * m) + io + pd - u * ii
                if 0 <= j < k:
                    raw.append((m, ii, io, j))
    ms = [m for (m, _, _, _) in raw]
    m_min, m_max = min(ms), max(ms)
    for (m, ii, io, j) in raw:
        entries.append((m - m_min, ii, io, j))
    return tuple(entries), m_min, m_max


def blocked_tconv_kernel(wt: Array, u: int, pd: int, r_i: int, r_o: int):
    """wt [Ci, Co, k] (torch) -> (Wb [KB, r_i*Ci, r_o*Co], pads)."""
    ci, co, k = wt.shape
    entries, m_min, m_max = _tconv_block_indices(k, u, pd, r_i, r_o)
    kb = m_max - m_min + 1
    wb = jnp.zeros((kb, r_i * ci, r_o * co), wt.dtype)
    for (mi, ii, io, j) in entries:
        wb = wb.at[mi, ii * ci : (ii + 1) * ci,
                   io * co : (io + 1) * co].add(wt[:, :, j])
    return wb, -m_min, m_max


def _quantize_kernel(w: Array):
    """[K, Ci, Co] float kernel -> (int8 kernel, per-Co float32 scale).

    Symmetric per-output-channel weight quantization. The kernel is a
    trace-time constant (folded from the param tree), so XLA constant-folds
    this into an int8 weight constant — quantization costs nothing at run
    time. The analog of ONNX Runtime's dynamic-quantization weight prep,
    the reference's optional quantized-export path
    (wetts/vits/export_onnx.py --quant: QUInt8 quantize_dynamic).
    """
    w32 = w.astype(jnp.float32)
    swc = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / swc), -127, 127).astype(jnp.int8)
    return wq, swc


def _conv(x: Array, kernel: Array, pad_l: int, pad_r: int,
          q8: bool = False, rhs_dilation=None, lhs_dilation=None) -> Array:
    if q8:
        # dynamic activation quantization: scale from the live activation
        # max (ORT DynamicQuantizeLinear analog, but per BATCH ROW rather
        # than per tensor — in batched serving a per-tensor scale would let
        # one loud utterance raise the quantization noise floor for every
        # quiet batch-mate; the [B,1,1] broadcast costs nothing), int8 x
        # int8 conv with int32 accumulation — then dequantize by
        # (row act scale * per-channel weight scale).
        sx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True)
            .astype(jnp.float32), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        wq, swc = _quantize_kernel(kernel)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1,), [(pad_l, pad_r)],
            rhs_dilation=rhs_dilation, lhs_dilation=lhs_dilation,
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * swc)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,), [(pad_l, pad_r)],
        rhs_dilation=rhs_dilation, lhs_dilation=lhs_dilation,
        dimension_numbers=("NWC", "WIO", "NWC"))


def _plain_conv(x, p, padding, dilation=1, q8=False):
    kernel = _fold_kernel(p)
    y = _conv(x, kernel, padding, padding, q8=q8,
              rhs_dilation=(dilation,))
    if "bias" in p:
        y = y + jnp.asarray(p["bias"]).astype(y.dtype)
    return y


def _plain_tconv(x, p, stride, padding, q8=False):
    w = _fold_kernel_transpose(p)  # [I, O, K]
    kernel = jnp.transpose(jnp.flip(w, axis=2), (2, 0, 1))
    k = kernel.shape[0]
    pad = k - 1 - padding
    y = _conv(x, kernel, pad, pad, q8=q8, lhs_dilation=(stride,))
    if "bias" in p:
        y = y + jnp.asarray(p["bias"]).astype(y.dtype)
    return y


def _get_padding(k, d=1):
    return (k * d - d) // 2


def _blocked_resblock(x, params, kernel_size, dilations, r, resblock_kind,
                      q8=False):
    if resblock_kind == "1":
        for idx, d in enumerate(dilations):
            w1 = _fold_kernel(params[f"conv1_{idx}"])
            b1 = jnp.asarray(params[f"conv1_{idx}"]["bias"])
            w2 = _fold_kernel(params[f"conv2_{idx}"])
            b2 = jnp.asarray(params[f"conv2_{idx}"]["bias"])
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            wb, pl, pr = blocked_conv_kernel(w1, d, _get_padding(kernel_size, d), r)
            xt = _conv(xt, wb, pl, pr, q8=q8) + jnp.tile(b1, r).astype(x.dtype)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            wb, pl, pr = blocked_conv_kernel(w2, 1, _get_padding(kernel_size, 1), r)
            xt = _conv(xt, wb, pl, pr, q8=q8) + jnp.tile(b2, r).astype(x.dtype)
            x = x + xt
    else:
        for idx, d in enumerate(dilations):
            w = _fold_kernel(params[f"conv_{idx}"])
            b = jnp.asarray(params[f"conv_{idx}"]["bias"])
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            wb, pl, pr = blocked_conv_kernel(w, d, _get_padding(kernel_size, d), r)
            xt = _conv(xt, wb, pl, pr, q8=q8) + jnp.tile(b, r).astype(x.dtype)
            x = x + xt
    return x


def fast_generator_apply(
    dec_params: Dict,
    x: Array,
    g: Optional[Array],
    resblock: str,
    resblock_kernel_sizes: Sequence[int],
    resblock_dilation_sizes: Sequence[Sequence[int]],
    upsample_rates: Sequence[int],
    upsample_initial_channel: int,
    upsample_kernel_sizes: Sequence[int],
    dtype=None,
    use_pallas_mrf: Optional[bool] = None,
    quantize: bool = False,
) -> Array:
    """Same function as models.hifigan.Generator, space-to-depth tail.

    dec_params: the Generator's param subtree ('dec' in the synthesizer).
    x: [B, T, C_inter]; g: [B, 1, gin] or None. Returns [B, T*prod(u), 1].
    dtype: compute dtype for the decoder (e.g. jnp.bfloat16 — halves the
    HBM traffic of the elementwise-bound MRF tail; the output is cast back
    to float32). None keeps the input dtype (exact fp32 path). Weight-norm
    folding always happens in the params' own precision before the cast.
    quantize: int8 dynamic quantization of the heavy convs (upsamples +
    MRF resblocks): per-output-channel int8 weights (constant-folded at
    compile time), per-batch-row dynamic activation scales, int32 MXU
    accumulation. The TPU analog of the reference's optional
    uint8-dynamically-quantized ONNX export
    (wetts/vits/export_onnx.py --quant). conv_pre/cond/conv_post stay in
    `dtype` (negligible FLOPs; the waveform projection stays clean).
    Drift vs fp32 is bounded in tests/test_hifigan_fast.py.
    """
    num_kernels = len(resblock_kernel_sizes)
    if use_pallas_mrf is None:
        # Opt-in: the fused Pallas MRF stage wins measured in isolation on
        # v5e (stage4 1.4-1.5x f32, ~1.1x bf16) but loses end-to-end
        # (bench.py: 1570 vs 1860 audio-s/s bf16) — the pallas_call
        # boundary blocks XLA from fusing the surrounding upsample/bias/
        # lrelu ops, and the halo re-pad adds an HBM pass per stage. Kept
        # as an exactness-verified alternative (models/mrf_pallas.py);
        # the XLA blocked path stays the default.
        use_pallas_mrf = False
    if quantize and dtype is None:
        dtype = jnp.bfloat16  # int8 path keeps its elementwise glue in bf16
    if dtype is not None:
        x = x.astype(dtype)
        g = g.astype(dtype) if g is not None else None
    h = _plain_conv(x, dec_params["conv_pre"], padding=3)
    if g is not None and "cond" in dec_params:
        h = h + _plain_conv(g, dec_params["cond"], padding=0)

    r = 1
    for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        ch = upsample_initial_channel // (2 ** (i + 1))
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        up = dec_params[f"up_{i}"]
        if r > 1:
            # stay in the blocked domain: r grows by the upsample factor
            wt = _fold_kernel_transpose(up)
            wb, pl, pr = blocked_tconv_kernel(wt, u, (k - u) // 2, r, r * u)
            r = r * u
            h = _conv(h, wb, pl, pr, q8=quantize) + jnp.tile(
                jnp.asarray(up["bias"]), r).astype(h.dtype)
        elif ch < LANES and LANES % ch == 0 and (
                u == LANES // ch
                or (h.shape[1] * u) % (LANES // ch) == 0):
            # enter the blocked domain at this upsample (r_in == 1)
            r_o = LANES // ch
            if u == r_o:
                wt = _fold_kernel_transpose(up)
                wb, pl, pr = blocked_tconv_kernel(wt, u, (k - u) // 2, 1, u)
                h = _conv(h, wb, pl, pr, q8=quantize) + jnp.tile(
                    jnp.asarray(up["bias"]), u).astype(h.dtype)
            else:
                h = _plain_tconv(h, up, u, (k - u) // 2, q8=quantize)
                b, t, c = h.shape
                h = h.reshape(b, t // r_o, c * r_o)
            r = r_o
        else:
            h = _plain_tconv(h, up, u, (k - u) // 2, q8=quantize)

        if r > 1 and use_pallas_mrf:
            from wetts_tpu.models.mrf_pallas import mrf_stage_pallas

            h = mrf_stage_pallas(
                h, [dec_params[f"resblock_{i}_{j}"]
                    for j in range(num_kernels)],
                resblock, tuple(resblock_kernel_sizes),
                tuple(tuple(d) for d in resblock_dilation_sizes), r,
                interpret=jax.default_backend() != "tpu")
        else:
            acc = None
            for j, (rk, rd) in enumerate(
                    zip(resblock_kernel_sizes, resblock_dilation_sizes)):
                rp = dec_params[f"resblock_{i}_{j}"]
                if r > 1:
                    out = _blocked_resblock(h, rp, rk, rd, r, resblock,
                                            q8=quantize)
                else:
                    out = _std_resblock(h, rp, rk, rd, resblock,
                                        q8=quantize)
                acc = out if acc is None else acc + out
            h = acc / num_kernels

    h = jax.nn.leaky_relu(h, 0.01)  # torch default slope (decoders.py:78)
    post = dec_params["conv_post"]
    w = _fold_kernel(post)  # [7, C, 1]
    if r > 1:
        wb, pl, pr = blocked_conv_kernel(w, 1, 3, r)
        h = _conv(h, wb, pl, pr)  # [B, T/r, r]
        b, tb, rr = h.shape
        h = h.reshape(b, tb * rr, 1)
    else:
        h = _conv(h, w, 3, 3)
    out = jnp.tanh(h)
    return out.astype(jnp.float32) if dtype is not None else out


def _std_resblock(x, params, kernel_size, dilations, resblock_kind,
                  q8=False):
    if resblock_kind == "1":
        for idx, d in enumerate(dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _plain_conv(xt, params[f"conv1_{idx}"],
                             _get_padding(kernel_size, d), d, q8=q8)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _plain_conv(xt, params[f"conv2_{idx}"],
                             _get_padding(kernel_size, 1), 1, q8=q8)
            x = x + xt
    else:
        for idx, d in enumerate(dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _plain_conv(xt, params[f"conv_{idx}"],
                             _get_padding(kernel_size, d), d, q8=q8)
            x = x + xt
    return x
