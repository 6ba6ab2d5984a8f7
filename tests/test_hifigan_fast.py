"""Space-to-depth decoder must equal the standard Generator exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wetts_tpu.models.hifigan import Generator
from wetts_tpu.models.hifigan_fast import fast_generator_apply

KEY = jax.random.PRNGKey(0)


def _compare(cfg_kwargs, t=20, gin=16):
    g = Generator(gin_channels=gin, **cfg_kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (2, t, cfg_kwargs["initial_channel"])).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((2, 1, gin)).astype(np.float32))
    params = g.init({"params": KEY}, x, spk)
    want = g.apply(params, x, spk)
    got = fast_generator_apply(
        params["params"], x, spk,
        resblock=cfg_kwargs["resblock"],
        resblock_kernel_sizes=cfg_kwargs["resblock_kernel_sizes"],
        resblock_dilation_sizes=cfg_kwargs["resblock_dilation_sizes"],
        upsample_rates=cfg_kwargs["upsample_rates"],
        upsample_initial_channel=cfg_kwargs["upsample_initial_channel"],
        upsample_kernel_sizes=cfg_kwargs["upsample_kernel_sizes"])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fast_matches_standard_v1_shape():
    # reference v1 topology scaled down: stages 128, 64, 32, 16 channels
    _compare(dict(
        initial_channel=48, resblock="1",
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5),) * 2,
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 16, 4, 4)))


def test_fast_matches_standard_v3_shape():
    # v3 topology: rates (8, 8, 4), ResBlock2
    _compare(dict(
        initial_channel=48, resblock="2",
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 2), (2, 6)),
        upsample_rates=(8, 8, 4), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 16, 8)))


def test_fast_no_blocking_when_channels_large():
    # all stages >= 128 channels -> falls through to the standard path
    _compare(dict(
        initial_channel=48, resblock="2",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 2), upsample_initial_channel=512,
        upsample_kernel_sizes=(8, 4)), t=12)


def test_fast_bf16_close_to_fp32():
    """bf16 decoder path (serving half-precision option) tracks fp32.

    The analog of the reference's quantized-model cosine verification
    (frontend export_onnx.py:93-112): half precision may drift, but must
    stay audibly identical (tight absolute error on a tanh-bounded wave).
    """
    cfg_kwargs = dict(
        initial_channel=48, resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5),) * 2,
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 16, 4, 4))
    g = Generator(gin_channels=16, **cfg_kwargs)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 20, 48)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    params = g.init({"params": KEY}, x, spk)

    def run(dtype):
        return np.asarray(fast_generator_apply(
            params["params"], x, spk, dtype=dtype,
            resblock=cfg_kwargs["resblock"],
            resblock_kernel_sizes=cfg_kwargs["resblock_kernel_sizes"],
            resblock_dilation_sizes=cfg_kwargs["resblock_dilation_sizes"],
            upsample_rates=cfg_kwargs["upsample_rates"],
            upsample_initial_channel=cfg_kwargs["upsample_initial_channel"],
            upsample_kernel_sizes=cfg_kwargs["upsample_kernel_sizes"]))

    exact = run(None)
    half = run(jnp.bfloat16)
    assert half.dtype == np.float32
    err = np.abs(half - exact).max()
    assert err < 3e-2, err
    corr = np.corrcoef(half.ravel(), exact.ravel())[0, 1]
    # random (untrained) weights produce a near-zero waveform, which
    # amplifies relative drift; 0.995 here corresponds to far tighter
    # correlation at trained-signal magnitudes
    assert corr > 0.995, corr


def test_fast_int8_close_to_fp32():
    """int8 dynamically-quantized decoder tracks fp32.

    The analog of the reference's optional uint8-dynamically-quantized
    export (wetts/vits/export_onnx.py --quant, QUInt8 quantize_dynamic):
    per-out-channel int8 weights, per-batch-row dynamic activation
    scales, int32 accumulation. Quantization noise must stay at the same
    order as the bf16 path on a tanh-bounded waveform.
    """
    cfg_kwargs = dict(
        initial_channel=48, resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5),) * 2,
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 16, 4, 4))
    g = Generator(gin_channels=16, **cfg_kwargs)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 20, 48)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((2, 1, 16)).astype(np.float32))
    params = g.init({"params": KEY}, x, spk)

    def run(**kw):
        return np.asarray(fast_generator_apply(
            params["params"], x, spk,
            resblock=cfg_kwargs["resblock"],
            resblock_kernel_sizes=cfg_kwargs["resblock_kernel_sizes"],
            resblock_dilation_sizes=cfg_kwargs["resblock_dilation_sizes"],
            upsample_rates=cfg_kwargs["upsample_rates"],
            upsample_initial_channel=cfg_kwargs["upsample_initial_channel"],
            upsample_kernel_sizes=cfg_kwargs["upsample_kernel_sizes"], **kw))

    exact = run()
    q8 = run(quantize=True)
    assert q8.dtype == np.float32
    assert np.isfinite(q8).all()
    err = np.abs(q8 - exact).max()
    assert err < 3e-2, err
    corr = np.corrcoef(q8.ravel(), exact.ravel())[0, 1]
    assert corr > 0.99, corr


def test_fast_int8_batch_isolation():
    """A loud batch-mate must not change a quiet row's int8 output.

    Activation scales are per batch row (not per tensor, ORT's choice), so
    in batched serving one loud utterance cannot raise the quantization
    noise floor for every quiet request sharing the batch. The quiet row,
    batched next to a 100x-louder one, must decode identically to the
    quiet row alone.
    """
    cfg_kwargs = dict(
        initial_channel=48, resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5),) * 2,
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 16, 4, 4))
    g = Generator(gin_channels=16, **cfg_kwargs)
    rng = np.random.default_rng(3)
    quiet = rng.standard_normal((1, 20, 48)).astype(np.float32)
    loud = 100.0 * rng.standard_normal((1, 20, 48)).astype(np.float32)
    spk = jnp.asarray(rng.standard_normal((1, 1, 16)).astype(np.float32))
    params = g.init({"params": KEY}, jnp.asarray(quiet), spk)

    def run(x, spk_b):
        return np.asarray(fast_generator_apply(
            params["params"], jnp.asarray(x), spk_b, quantize=True,
            resblock=cfg_kwargs["resblock"],
            resblock_kernel_sizes=cfg_kwargs["resblock_kernel_sizes"],
            resblock_dilation_sizes=cfg_kwargs["resblock_dilation_sizes"],
            upsample_rates=cfg_kwargs["upsample_rates"],
            upsample_initial_channel=cfg_kwargs["upsample_initial_channel"],
            upsample_kernel_sizes=cfg_kwargs["upsample_kernel_sizes"]))

    alone = run(quiet, spk)
    batched = run(np.concatenate([quiet, loud]),
                  jnp.concatenate([spk, spk]))[:1]
    np.testing.assert_allclose(batched, alone, atol=1e-6)


def test_fast_pallas_mrf_path_matches():
    """Full generator with the fused Pallas MRF stages (interpret mode on
    CPU) equals the XLA blocked path."""
    cfg_kwargs = dict(
        initial_channel=48, resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5),) * 2,
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=256,
        upsample_kernel_sizes=(16, 16, 4, 4))
    g = Generator(gin_channels=16, **cfg_kwargs)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 12, 48)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((1, 1, 16)).astype(np.float32))
    params = g.init({"params": KEY}, x, spk)

    def run(use_pallas):
        return np.asarray(fast_generator_apply(
            params["params"], x, spk, use_pallas_mrf=use_pallas,
            resblock=cfg_kwargs["resblock"],
            resblock_kernel_sizes=cfg_kwargs["resblock_kernel_sizes"],
            resblock_dilation_sizes=cfg_kwargs["resblock_dilation_sizes"],
            upsample_rates=cfg_kwargs["upsample_rates"],
            upsample_initial_channel=cfg_kwargs["upsample_initial_channel"],
            upsample_kernel_sizes=cfg_kwargs["upsample_kernel_sizes"]))

    np.testing.assert_allclose(run(True), run(False), atol=2e-5)
