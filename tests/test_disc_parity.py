"""Discriminator torch-oracle parity: converted reference weights must
reproduce reference logits + feature maps, and the GAN loss values computed
from them must match (reference wetts/vits/model/discriminators.py:21-498,
losses.py:6-60 — the quantities that drive every training update).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from reference_oracle import load_reference_vits
from wetts_tpu.models.discriminators import (
    DurationDiscriminatorV1,
    DurationDiscriminatorV2,
    MultiPeriodDiscriminator,
    MultiPeriodMultiResolutionDiscriminator,
    WavLMDiscriminator,
)
from wetts_tpu.utils.convert import (
    convert_discriminator,
    convert_duration_discriminator,
    convert_wavlm_discriminator,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def _ref_discriminators():
    load_reference_vits()  # installs stubs + sys.path
    import model.discriminators as ref_disc  # noqa

    return ref_disc


def _np(t):
    return t.detach().numpy()


def _to_nhwc(t):
    """torch fmap -> our layout: [B,C,T] -> [B,T,C]; [B,C,H,W] -> [B,H,W,C]."""
    a = _np(t)
    if a.ndim == 3:
        return np.transpose(a, (0, 2, 1))
    return np.transpose(a, (0, 2, 3, 1))


@pytest.mark.parametrize("use_mrd", [False, True], ids=["mpd", "mpmrd"])
def test_waveform_discriminator_parity(use_mrd):
    ref_disc = _ref_discriminators()
    torch.manual_seed(0)
    if use_mrd:
        tmodel = ref_disc.MultiPeriodMultiResolutionDiscriminator()
        jmodel = MultiPeriodMultiResolutionDiscriminator()
    else:
        tmodel = ref_disc.MultiPeriodDiscriminator()
        jmodel = MultiPeriodDiscriminator()
    tmodel.eval()
    params = convert_discriminator(
        {k: _np(v) for k, v in tmodel.state_dict().items()}, use_mrd=use_mrd)

    rng = np.random.default_rng(1)
    b, t = 2, 4096 if use_mrd else 1024
    y = rng.standard_normal((b, t)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((b, t)).astype(np.float32) * 0.3

    with torch.no_grad():
        t_r, t_g, t_fr, t_fg = tmodel(
            torch.from_numpy(y)[:, None, :], torch.from_numpy(y_hat)[:, None, :])
    j_r, j_g, j_fr, j_fg = jax.jit(
        lambda yy, yh: jmodel.apply({"params": params}, yy, yh))(
        jnp.asarray(y)[:, :, None], jnp.asarray(y_hat)[:, :, None])

    assert len(t_r) == len(j_r)
    # reference DiscriminatorR returns unflattened [B,1,T,F'] logits
    # (discriminators.py:225 has no flatten); flattening commutes with the
    # elementwise/mean losses, so compare flat
    for tr, jr in zip(t_r, j_r):
        np.testing.assert_allclose(
            np.asarray(jr), _np(tr).reshape(tr.shape[0], -1), **TOL)
    for tg, jg in zip(t_g, j_g):
        np.testing.assert_allclose(
            np.asarray(jg), _np(tg).reshape(tg.shape[0], -1), **TOL)
    for t_maps, j_maps in zip(t_fr, j_fr):
        assert len(t_maps) == len(j_maps)
        for tm, jm in zip(t_maps, j_maps):
            np.testing.assert_allclose(np.asarray(jm), _to_nhwc(tm), **TOL)

    # ---- loss-value parity on the same logits/fmaps (losses.py:6-44) ----
    import losses as ref_losses  # from /root/reference/wetts/vits

    from wetts_tpu.train.losses import (
        discriminator_loss,
        feature_loss,
        generator_loss,
    )

    t_ld, _, _ = ref_losses.discriminator_loss(t_r, t_g)
    j_ld, _, _ = discriminator_loss(j_r, j_g)
    np.testing.assert_allclose(float(j_ld), float(t_ld), rtol=1e-4)
    t_lg, _ = ref_losses.generator_loss(t_g)
    j_lg, _ = generator_loss(j_g)
    np.testing.assert_allclose(float(j_lg), float(t_lg), rtol=1e-4)
    t_fm = ref_losses.feature_loss(t_fr, t_fg)
    j_fm = feature_loss(j_fr, j_fg)
    np.testing.assert_allclose(float(j_fm), float(t_fm), rtol=1e-4)


@pytest.mark.parametrize("dtype", ["dur_disc_1", "dur_disc_2"])
def test_duration_discriminator_parity(dtype):
    ref_disc = _ref_discriminators()
    torch.manual_seed(0)
    hidden, filt = 24, 24
    cls_t = (ref_disc.DurationDiscriminatorV1 if dtype == "dur_disc_1"
             else ref_disc.DurationDiscriminatorV2)
    cls_j = (DurationDiscriminatorV1 if dtype == "dur_disc_1"
             else DurationDiscriminatorV2)
    tmodel = cls_t(hidden, filt, 3, 0.1)
    tmodel.eval()
    jmodel = cls_j(hidden, filt, 3, 0.1)
    params = convert_duration_discriminator(
        {k: _np(v) for k, v in tmodel.state_dict().items()}, dtype)

    rng = np.random.default_rng(2)
    b, t = 2, 11
    x = rng.standard_normal((b, hidden, t)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)
    mask[1, :, 8:] = 0.0
    dur_r = rng.random((b, 1, t)).astype(np.float32)
    dur_hat = rng.random((b, 1, t)).astype(np.float32)

    with torch.no_grad():
        t_probs = tmodel(torch.from_numpy(x), torch.from_numpy(mask),
                         torch.from_numpy(dur_r), torch.from_numpy(dur_hat))
    j_probs = jmodel.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(dur_r.transpose(0, 2, 1)),
        jnp.asarray(dur_hat.transpose(0, 2, 1)))
    for tp, jp in zip(t_probs, j_probs):
        if isinstance(tp, list):  # V2 wraps each prob in a list (:445)
            tp = tp[0]
        np.testing.assert_allclose(
            np.asarray(jp), _np(tp), **TOL)


def test_wavlm_discriminator_parity():
    ref_disc = _ref_discriminators()
    torch.manual_seed(0)
    hidden, layers, ic = 16, 3, 8
    tmodel = ref_disc.WavLMDiscriminator(hidden, layers, ic)
    tmodel.eval()
    jmodel = WavLMDiscriminator(hidden, layers, ic)
    params = convert_wavlm_discriminator(
        {k: _np(v) for k, v in tmodel.state_dict().items()})
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((2, hidden * layers, 17)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(feat))
    j_out = jmodel.apply({"params": params},
                         jnp.asarray(feat.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), **TOL)
