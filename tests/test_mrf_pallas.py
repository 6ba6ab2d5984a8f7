"""Fused Pallas MRF stage must equal the XLA blocked-resblock composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wetts_tpu.models.hifigan import Generator
from wetts_tpu.models.hifigan_fast import _blocked_resblock
from wetts_tpu.models.mrf_pallas import mrf_stage_pallas

KEY = jax.random.PRNGKey(0)


def _stage_params(resblock, kernel_sizes, dilations, ch, gin=8):
    """Init a Generator and pull one stage's resblock param subtrees."""
    g = Generator(
        initial_channel=ch * 2, resblock=resblock,
        resblock_kernel_sizes=kernel_sizes,
        resblock_dilation_sizes=dilations,
        upsample_rates=(2,), upsample_initial_channel=ch * 2,
        upsample_kernel_sizes=(4,), gin_channels=gin)
    x = jnp.zeros((1, 8, ch * 2))
    spk = jnp.zeros((1, 1, gin))
    params = g.init({"params": KEY}, x, spk)["params"]
    return [params[f"resblock_0_{j}"] for j in range(len(kernel_sizes))]


def _xla_reference(h, stage, resblock, kernel_sizes, dilations, r):
    acc = None
    for j, (rk, rd) in enumerate(zip(kernel_sizes, dilations)):
        out = _blocked_resblock(h, stage[j], rk, rd, r, resblock)
        acc = out if acc is None else acc + out
    return acc / len(kernel_sizes)


@pytest.mark.parametrize("resblock,kernel_sizes,dilations,ch,r", [
    ("1", (3, 7, 11), ((1, 3, 5),) * 3, 32, 4),   # reference v1 tail stage
    ("1", (3, 7), ((1, 3, 5),) * 2, 64, 2),
    ("2", (3, 5), ((1, 2), (2, 6)), 32, 4),       # v3 topology
])
def test_pallas_mrf_matches_xla(resblock, kernel_sizes, dilations, ch, r):
    stage = _stage_params(resblock, kernel_sizes, dilations, ch)
    rng = np.random.default_rng(0)
    tb = 700  # not a multiple of the kernel TILE -> exercises padding
    h = jnp.asarray(rng.standard_normal((2, tb, r * ch)).astype(np.float32))

    want = _xla_reference(h, stage, resblock, kernel_sizes, dilations, r)
    got = mrf_stage_pallas(h, stage, resblock, kernel_sizes, dilations, r,
                           interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_pallas_mrf_bf16_runs():
    stage = _stage_params("1", (3,), ((1, 3),), 32)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((1, 130, 128)).astype(np.float32))
    exact = mrf_stage_pallas(h, stage, "1", (3,), ((1, 3),), 4,
                             interpret=True)
    half = mrf_stage_pallas(h.astype(jnp.bfloat16), stage, "1", (3,),
                            ((1, 3),), 4, interpret=True)
    assert half.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(half, np.float32),
                               np.asarray(exact), atol=5e-2)
