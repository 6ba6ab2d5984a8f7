"""Multi-step optimizer-update parity vs the reference torch training loop.

The strongest training-correctness statement short of a full run: starting
from identical (converted) weights, with identical injected stochastic
draws on both sides, two reference AdamW D->G updates
(wetts/vits/train.py:434-507, optimizers :228-257) must produce the same
per-step loss values and the same updated parameters as two calls of our
jitted-step function `make_train_step`.

This catches sign flips in GAN terms, wrong detach placement, optimizer
hyperparameter drift (wd/betas/eps), and update-order bugs (the reference
steps optim_d BEFORE the generator's adversarial pass) that per-forward
parity tests cannot see. Because the ConvFlow spline projections are
given nonzero weights here (the reference zero-inits them, making every
SDP spline an exact identity), this is also the only test that exercises
the LIVE neural-spline path end-to-end through gradients.

Noise injection: the SDP's 2-channel draws (duration_predictors.py:229,257)
get a shared deterministic pattern; every other stochastic site (posterior
sample encoders.py:98, random segment slice commons.py:50-58) is forced to
zero; dropout is disabled on both sides (config p_dropout=0 plus eval()/a
flax Dropout no-op, since the SDP hardcodes p_dropout=0.5). The step runs
UN-jitted so the patched jax.random hooks are honored.

Adam eps: the test config sets eps=1e-2 (consumed from the SAME config
field by both optimizers, so eps-handling bugs still surface). With the
production eps=1e-9, the first AdamW update is lr*sign(grad) elementwise,
and parameters whose gradients are mathematically zero (attention key
biases — softmax is shift-invariant) flip to +-lr on float noise in either
framework. A large eps makes updates smooth in the gradient, which both
removes that degeneracy and makes the comparison stronger: param deltas
become proportional to gradient VALUES, not just their signs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from reference_oracle import load_reference_vits
from test_torch_parity import build_pair, small_cfg
from wetts_tpu.train.state import GANTrainState, make_optimizer
from wetts_tpu.train.step import make_train_step
from wetts_tpu.utils.convert import convert_discriminator, convert_synthesizer


def _sdp_pattern(b, t):
    """Deterministic stand-in for the SDP's 2-channel noise, [B, 2, T].

    Nonzero on purpose: with all-zero noise the zero-initialized ConvFlow
    spline (duration_predictors.py:60-122) is evaluated exactly AT a knot,
    where torch and XLA route the subgradient to different (equally valid)
    bins and the proj-kernel updates diverge by 2*lr. A smooth O(0.4)
    pattern with an irrational-ish phase keeps every spline input strictly
    inside a bin (phase 0: sin(0)=0 put one element back on the knot)."""
    i = np.arange(2, dtype=np.float32)[None, :, None]
    bb = np.arange(b, dtype=np.float32)[:, None, None]
    tt = np.arange(t, dtype=np.float32)[None, None, :]
    return (0.4 * np.sin(0.7 * tt + 1.3 * i + 0.5 * bb + 0.37)).astype(
        np.float32)


@pytest.fixture
def injected_noise(monkeypatch):
    """Identical deterministic draws in torch AND jax.

    The SDP's [B, 2, T] draws (duration_predictors.py:229,257 /
    models/duration.py e_q + reverse z, which store time last vs channels
    last) get the shared `_sdp_pattern`; every other normal/uniform draw
    (posterior sample, segment-slice offset) is forced to zero."""
    monkeypatch.setattr(
        torch, "randn_like", lambda x, **kw: torch.zeros_like(x))

    def trandn(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        kw = {k: v for k, v in kw.items() if k in ("dtype", "device")}
        if len(size) == 3 and size[1] == 2:
            return torch.from_numpy(_sdp_pattern(size[0], size[2]))
        return torch.zeros(*size, **kw)

    monkeypatch.setattr(torch, "randn", trandn)
    monkeypatch.setattr(
        torch, "rand",
        lambda *size, **kw: torch.zeros(
            *(tuple(size[0]) if len(size) == 1
              and isinstance(size[0], (tuple, list)) else size)))

    def jnormal(key, shape=(), dtype=jnp.float32):
        if len(shape) == 3 and shape[2] == 2:
            return jnp.asarray(
                _sdp_pattern(shape[0], shape[1]).transpose(0, 2, 1), dtype)
        return jnp.zeros(shape, dtype)

    def juniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
        return jnp.zeros(shape, dtype)

    monkeypatch.setattr(jax.random, "normal", jnormal)
    monkeypatch.setattr(jax.random, "uniform", juniform)

    # The SDP hardcodes p_dropout=0.5 (reference models.py:147), so config
    # p_dropout=0 does not reach it; its train-mode dropout masks are the
    # only remaining uncontrolled randomness. Disable flax dropout here and
    # put the torch nets in eval() in the test (same effect: no BN in VITS).
    from flax import linen as fnn

    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)
    yield


def make_batch(cfg, seed=3):
    rng = np.random.default_rng(seed)
    b, t_text, frames = 2, 9, 20
    hop = cfg.data.hop_length
    x = rng.integers(1, cfg.num_phones, size=(b, t_text)).astype(np.int64)
    xl = np.array([t_text, t_text - 2], np.int64)
    # full-length waveforms for both utterances so the reference's per-utt
    # reflect-padded STFT equals ours on the batch-padded wav; masking
    # coverage comes from unequal TEXT and SPEC lengths instead
    wav = (rng.standard_normal((b, frames * hop)) * 0.3).astype(np.float32)
    yl = np.array([frames, frames - 2], np.int64)
    sid = np.array([0, 1], np.int64)
    return x, xl, wav, yl, sid


def torch_steps(cfg, tmodel, tdisc, batch, n_steps):
    """The reference per-batch loop (train.py:366-507), MPD-only config."""
    import losses as ref_losses  # noqa: reference module (oracle)
    import utils.commons as ref_commons
    import utils.mel_processing as ref_mel

    d, t = cfg.data, cfg.train
    hop = d.hop_length
    seg_frames = t.segment_size // hop
    x, xl, wav, yl, sid = [torch.from_numpy(v) for v in batch]
    spec = ref_mel.spectrogram_torch(
        wav, d.filter_length, d.sampling_rate, hop, d.win_length,
        center=False)

    optim_g = torch.optim.AdamW(tmodel.parameters(), t.learning_rate,
                                betas=tuple(t.betas), eps=t.eps)
    optim_d = torch.optim.AdamW(tdisc.parameters(), t.learning_rate,
                                betas=tuple(t.betas), eps=t.eps)
    per_step = []
    for _ in range(n_steps):
        (y_hat, l_length, attn, ids_slice, x_mask, z_mask,
         (z, z_p, m_p, logs_p, m_q, logs_q),
         (hidden_x, logw, logw_)) = tmodel(x, xl, spec, yl, sid)
        mel = ref_mel.spec_to_mel_torch(spec, d.filter_length,
                                        d.n_mel_channels, d.sampling_rate,
                                        d.mel_fmin, d.mel_fmax)
        y_mel = ref_commons.slice_segments(mel, ids_slice, seg_frames)
        y_hat_mel = ref_mel.mel_spectrogram_torch(
            y_hat.squeeze(1), d.filter_length, d.n_mel_channels,
            d.sampling_rate, hop, d.win_length, d.mel_fmin, d.mel_fmax)
        y = ref_commons.slice_segments(
            wav.unsqueeze(1), ids_slice * hop, t.segment_size)

        y_d_hat_r, y_d_hat_g, _, _ = tdisc(y, y_hat.detach())
        loss_disc, _, _ = ref_losses.discriminator_loss(y_d_hat_r, y_d_hat_g)
        optim_d.zero_grad()
        loss_disc.backward()
        optim_d.step()

        y_d_hat_r, y_d_hat_g, fmap_r, fmap_g = tdisc(y, y_hat)
        loss_dur = torch.sum(l_length.float())
        loss_mel = F.l1_loss(y_mel, y_hat_mel) * t.c_mel
        loss_kl = ref_losses.kl_loss(z_p, logs_q, m_p, logs_p,
                                     z_mask) * t.c_kl
        loss_fm = ref_losses.feature_loss(fmap_r, fmap_g)
        loss_gen, _ = ref_losses.generator_loss(y_d_hat_g)
        loss_gen_all = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
        optim_g.zero_grad()
        loss_gen_all.backward()
        optim_g.step()
        per_step.append({
            "loss/disc": float(loss_disc), "loss/gen": float(loss_gen),
            "loss/fm": float(loss_fm), "loss/mel": float(loss_mel),
            "loss/dur": float(loss_dur), "loss/kl": float(loss_kl),
            "loss/g_total": float(loss_gen_all),
        })
    return per_step


def jax_steps(cfg, jmodel, params_g, params_d, batch, n_steps):
    """n_steps of the real `make_train_step`, un-jitted (patched rngs)."""
    from wetts_tpu.models.discriminators import MultiPeriodDiscriminator

    x, xl, wav, yl, sid = batch
    feed = {
        "phone_ids": jnp.asarray(x, jnp.int32),
        "text_lengths": jnp.asarray(xl, jnp.int32),
        "wav": jnp.asarray(wav),
        "spec_lengths": jnp.asarray(yl, jnp.int32),
        "sid": jnp.asarray(sid, jnp.int32),
    }
    net_d = MultiPeriodDiscriminator()
    tx = make_optimizer(cfg)
    step_fn = make_train_step(cfg, jmodel, net_d, None, tx,
                              use_fast_decoder=False)
    state = GANTrainState.create(tx, params_g, params_d)
    per_step = []
    rng = jax.random.PRNGKey(0)  # all draws are patched to zero anyway
    for _ in range(n_steps):
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, feed, step_rng)
        per_step.append({k: float(v) for k, v in metrics.items()})
    return state, per_step


def _tree_compare(got_tree, want_tree, atol, label):
    got_flat = jax.tree_util.tree_flatten_with_path(got_tree)[0]
    want_flat = jax.tree_util.tree_flatten_with_path(want_tree)[0]
    assert len(got_flat) == len(want_flat)
    worst = (0.0, None)
    for (kp, g), (_, w) in zip(got_flat, want_flat):
        err = float(np.max(np.abs(np.asarray(g) - np.asarray(w))))
        if err > worst[0]:
            worst = (err, jax.tree_util.keystr(kp))
    assert worst[0] < atol, (
        f"{label}: max param error {worst[0]:.3e} at {worst[1]}")


@pytest.mark.slow
def test_two_step_update_parity(injected_noise):
    """2 reference AdamW D->G updates == 2 make_train_step calls."""
    cfg = small_cfg()
    cfg.model.p_dropout = 0.0
    cfg.data.n_mel_channels = 20
    cfg.train.segment_size = 256
    cfg.train.eps = 1e-2  # see module docstring (degenerate-grad sign flips)
    ref_models = load_reference_vits()
    import model.discriminators as ref_disc  # noqa: oracle module

    tmodel, jmodel, variables = build_pair(cfg, seed=0)
    # dropout off on both sides (see injected_noise docstring); no BN in
    # VITS, so eval() changes nothing else
    tmodel.eval()
    # The reference zero-initializes every ConvFlow spline projection
    # (duration_predictors.py:118-119), which makes all 8 SDP splines exact
    # identities: the whole spline-parameter path would be dead in this
    # test (and the zero point is degenerate — torch's own autograd
    # disagrees with its own finite differences there). Give them small
    # nonzero weights so the update parity covers live splines too.
    torch.manual_seed(2)
    with torch.no_grad():
        for fl in list(tmodel.dp.flows) + list(tmodel.dp.post_flows):
            if hasattr(fl, "proj"):
                fl.proj.weight.uniform_(-0.1, 0.1)
                fl.proj.bias.uniform_(-0.02, 0.02)
    params_g0 = convert_synthesizer(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}, cfg)
    torch.manual_seed(1)
    tdisc = ref_disc.MultiPeriodDiscriminator()
    tdisc.eval()
    params_d = convert_discriminator(
        {k: v.detach().numpy() for k, v in tdisc.state_dict().items()})
    # tensor.numpy() shares storage with the live torch parameters, and
    # torch_steps updates them in place — deep-copy the converted trees so
    # the jax run starts from the true initial weights
    params_g0 = jax.tree.map(np.array, params_g0)
    params_d = jax.tree.map(np.array, params_d)

    batch = make_batch(cfg)
    n_steps = 2
    t_metrics = torch_steps(cfg, tmodel, tdisc, batch, n_steps)
    state, j_metrics = jax_steps(cfg, jmodel, params_g0, params_d,
                                 batch, n_steps)

    # per-step loss values (step 2 runs on once-updated params, so it also
    # validates the step-1 updates end-to-end)
    for i in range(n_steps):
        for key, want in t_metrics[i].items():
            got = j_metrics[i][key]
            assert got == pytest.approx(want, abs=5e-4, rel=5e-4), (
                f"step {i + 1} {key}: jax {got} vs torch {want}")

    # updated parameters after n_steps (both optimizer trees)
    sd_g = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    sd_d = {k: v.detach().numpy() for k, v in tdisc.state_dict().items()}
    want_g = convert_synthesizer(sd_g, cfg)
    want_d = convert_discriminator(sd_d)
    # updates are bounded by ~lr * |g|/eps per element; errors must sit well
    # under the lr=2e-4 scale for the comparison to mean anything
    _tree_compare(state.params_g, want_g, atol=2e-5, label="params_g")
    _tree_compare(state.params_d, want_d, atol=2e-5, label="params_d")
