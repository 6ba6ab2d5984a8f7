"""Polyphase resampler vs scipy.signal.resample_poly."""

import numpy as np
import jax.numpy as jnp
from scipy.signal import resample_poly

from wetts_tpu.ops.resample import resample


def test_resample_matches_scipy():
    rng = np.random.default_rng(0)
    for orig, target in [(22050, 16000), (24000, 16000), (16000, 16000),
                         (8000, 16000)]:
        x = rng.standard_normal((2, 4410)).astype(np.float32)
        got = np.asarray(resample(jnp.asarray(x), orig, target))
        if orig == target:
            np.testing.assert_array_equal(got, x)
            continue
        want = resample_poly(x, target, orig, axis=-1).astype(np.float32)
        assert got.shape == want.shape, (orig, target, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4)
