"""bench.py's analytic decoder FLOP count must track XLA's own count.

--dispatch switch reports MFU from `_dec_conv_flops` (XLA's cost_analysis
cannot attribute FLOPs to the one executed lax.switch branch), so the
analytic count is only honest if it matches what XLA counts for the
PLAIN decoder graph — the algorithmic FLOPs of the model. (The
space-to-depth fast decoder executes ~1.5x that (measured 1.495 at the
v1 config): it blocks time into the
channel dim to fill the 128 MXU lanes, trading redundant FLOPs for
layout efficiency — so its XLA count measures hardware utilization, not
model FLOPs; bench.py documents which basis each dispatch mode reports.)
Elementwise ops are excluded from the analytic count, so XLA's figure is
an upper bound that should sit within a few percent of it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wetts_tpu.models.hifigan import Generator
from wetts_tpu.models.hifigan_fast import fast_generator_apply


class _M:
    inter_channels = 48
    upsample_initial_channel = 256
    upsample_rates = (8, 8, 2, 2)
    upsample_kernel_sizes = (16, 16, 4, 4)
    resblock = "1"
    resblock_kernel_sizes = (3, 7)
    resblock_dilation_sizes = ((1, 3, 5), (1, 3, 5))


@pytest.mark.parametrize("frames", [32, 64])
def test_dec_conv_flops_matches_xla(frames):
    from bench import _dec_conv_flops

    m = _M()
    batch = 2
    g = Generator(
        initial_channel=m.inter_channels, resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, frames, m.inter_channels)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((batch, 1, 16)).astype(np.float32))
    params = g.init({"params": jax.random.PRNGKey(0)}, x, spk)

    @jax.jit
    def dec(z, g_):
        return g.apply(params, z, g_)

    compiled = dec.lower(x, spk).compile()
    xla_flops = float(compiled.cost_analysis().get("flops", 0.0))
    assert xla_flops > 0, "cost_analysis returned no flops on this backend"
    analytic = _dec_conv_flops(m, batch, frames)
    # analytic excludes elementwise ops -> must not exceed XLA by more
    # than rounding; XLA adds the elementwise tail (a few percent)
    assert analytic <= xla_flops * 1.02, (analytic, xla_flops)
    assert xla_flops <= analytic * 1.10, (analytic, xla_flops)


def test_vocos_dec_flops_matches_xla():
    from bench import _vocos_dec_flops

    from wetts_tpu.models.vocos import VocosGenerator

    class M:
        inter_channels = 48
        vocos_channels = 64
        vocos_h_channels = 192
        vocos_out_channels = 130  # 2 * (128 // 2 + 1)
        vocos_num_layers = 3
        vocos_istft_config = {"n_fft": 128, "hop_length": 32,
                              "win_length": 128}

    m = M()
    batch, frames = 2, 64
    voc = VocosGenerator(
        m.inter_channels, m.vocos_channels, m.vocos_h_channels,
        m.vocos_out_channels, m.vocos_num_layers,
        istft_n_fft=128, istft_hop_length=32, istft_win_length=128,
        gin_channels=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, frames, m.inter_channels)).astype(np.float32))
    params = voc.init({"params": jax.random.PRNGKey(0)}, x, None)

    @jax.jit
    def dec(z):
        return voc.apply(params, z, None)

    compiled = dec.lower(x).compile()
    xla_flops = float(compiled.cost_analysis().get("flops", 0.0))
    assert xla_flops > 0
    analytic = _vocos_dec_flops(m, batch, frames)
    # elementwise tail + overlap-add adds are excluded from the analytic
    # count; they are a larger share of this thin decoder than of
    # HiFi-GAN's, so the band is wider
    assert analytic <= xla_flops * 1.02, (analytic, xla_flops)
    assert xla_flops <= analytic * 1.25, (analytic, xla_flops)


def test_fast_decoder_executes_more_flops_than_algorithmic():
    """Pin the design fact the MFU bases rest on: the space-to-depth
    decoder EXECUTES more FLOPs than the algorithmic count (it pays
    redundant compute to fill MXU lanes). If a future rewrite changes
    that, the mfu_basis documentation in bench.py must be revisited."""
    from bench import _dec_conv_flops

    m = _M()
    batch, frames = 2, 32
    g = Generator(
        initial_channel=m.inter_channels, resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, frames, m.inter_channels)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((batch, 1, 16)).astype(np.float32))
    params = g.init({"params": jax.random.PRNGKey(0)}, x, spk)

    @jax.jit
    def fast(z, g_):
        return fast_generator_apply(
            params["params"], z, g_,
            resblock=m.resblock,
            resblock_kernel_sizes=m.resblock_kernel_sizes,
            resblock_dilation_sizes=m.resblock_dilation_sizes,
            upsample_rates=m.upsample_rates,
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=m.upsample_kernel_sizes)

    executed = float(fast.lower(x, spk).compile()
                     .cost_analysis().get("flops", 0.0))
    assert executed > _dec_conv_flops(m, batch, frames)
