"""Sequence masking / slicing / alignment-expansion ops.

Behavioral parity targets (reference: wetts/vits/utils/commons.py):
- ``sequence_mask``   <- commons.py:113-117
- ``slice_segments``  <- commons.py:41-47 (gather-based here: no python loop)
- ``rand_slice_segments`` <- commons.py:50-58
- ``generate_path``   <- commons.py:120-136 (cumsum + mask-diff trick)
- ``subsequent_mask`` <- commons.py:93-95

All ops are channel-last ([B, T, C]) and shape-static, so they trace cleanly
under jit. Masks are float (1.0 inside the sequence) to allow multiplicative
masking that fuses into neighbouring elementwise ops on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] lengths -> [B, max_length] float mask (1.0 where t < length)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(jnp.float32)


def subsequent_mask(length: int) -> jax.Array:
    """[1, 1, T, T] lower-triangular causal mask."""
    return jnp.tril(jnp.ones((length, length), dtype=jnp.float32))[None, None]


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size time segments.

    x: [B, T, C]; ids_str: [B] int start indices -> [B, segment_size, C].

    The reference loops over the batch in python (commons.py:41-47); here we
    build a [B, segment_size] index grid and use one vectorized take, which
    lowers to a single XLA gather.
    """
    idx = ids_str[:, None] + jnp.arange(segment_size)[None, :]  # [B, S]
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def rand_slice_segments(
    x: jax.Array,
    x_lengths: jax.Array,
    segment_size: int,
    rng: jax.Array,
):
    """Random per-utterance segment slice for decoder training.

    Returns (segments [B, S, C], ids_str [B]). Start indices are uniform in
    [0, length - segment_size] (clamped at 0 like the reference's
    `ids_str_max` clamp, commons.py:50-58).
    """
    b = x.shape[0]
    ids_str_max = jnp.maximum(x_lengths - segment_size, 0)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * (ids_str_max + 1).astype(jnp.float32)).astype(jnp.int32)
    ids_str = jnp.minimum(ids_str, ids_str_max.astype(jnp.int32))
    return slice_segments(x, ids_str, segment_size), ids_str


def generate_path(duration: jax.Array, mask: jax.Array) -> jax.Array:
    """Expand integer durations into a monotonic alignment path.

    duration: [B, T_text] (non-negative ints or floats), mask: [B, T_text, T_spec]
    -> path [B, T_text, T_spec] with path[b, i, t] = 1 iff frame t is assigned
    to text position i.

    Same cumsum trick as the reference (commons.py:120-136): a frame t belongs
    to position i iff cum_dur[i-1] <= t < cum_dur[i]; computed as
    mask_of(t < cum_dur[i]) minus itself shifted by one text position.
    """
    t_spec = mask.shape[-1]
    cum_duration = jnp.cumsum(duration, axis=-1)  # [B, T_text]
    pos = jnp.arange(t_spec, dtype=cum_duration.dtype)
    # [B, T_text, T_spec]: 1 where t < cum_dur[i]
    path = (pos[None, None, :] < cum_duration[:, :, None]).astype(jnp.float32)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask
