"""On-device polyphase resampling (kaiser-windowed sinc).

Replaces torchaudio.transforms.Resample in the WavLM loss path (reference
losses.py:68: model_sr -> 16 kHz before the frozen WavLM). Implemented as a
single input-dilated strided convolution: y = (x upsampled by L) * h,
decimated by M — one lax.conv_general_dilated call, no host DSP. Filter
design matches scipy.signal.resample_poly's default kaiser(5.0) low-pass
(validated in tests/test_resample.py).
"""

from __future__ import annotations

import functools
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin


@functools.lru_cache(maxsize=None)
def _poly_filter(up: int, down: int) -> np.ndarray:
    """scipy resample_poly default filter: kaiser(5.0), half-len 10*max."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    taps = firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (taps * up).astype(np.float32)


def resample(x: jax.Array, orig_rate: int, target_rate: int) -> jax.Array:
    """x: [B, T] -> [B, ceil(T * target / orig)] (resample_poly semantics)."""
    if orig_rate == target_rate:
        return x
    g = gcd(orig_rate, target_rate)
    up, down = target_rate // g, orig_rate // g
    taps = jnp.asarray(_poly_filter(up, down))
    n_taps = taps.shape[0]
    half = (n_taps - 1) // 2
    t = x.shape[-1]
    out_len = -(-t * up // down)  # ceil

    # y[m] = sum_k h[k] * x_up[m*down - half + k], x_up = zero-stuffed by up.
    # As a conv: dilate input by `up`, pad `half` on the left, stride `down`.
    kernel = jnp.flip(taps)[:, None, None]  # [K, 1, 1] 'WIO'
    y = jax.lax.conv_general_dilated(
        x[:, :, None],
        kernel,
        window_strides=(down,),
        padding=[(half, half + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, :, 0]
    return y[:, :out_len]
