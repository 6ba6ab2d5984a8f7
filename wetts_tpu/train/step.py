"""The jitted GAN training step (single- and multi-chip via shardings).

Reproduces the reference's per-batch update semantics
(wetts/vits/train.py:366-507):
1. generator forward (one set of PRNG draws, reused identically for the
   generator's own gradient pass),
2. discriminator update on (y_slice, stop_grad(y_hat)),
3. optional duration-discriminator update on detached (logw_, logw),
4. generator update where the adversarial terms see the *updated*
   discriminators (reference steps optim_d before the G pass, :465 vs :480),
   with loss = gen + fm + c_mel * L1(mel) + sum(l_length) + c_kl * KL
   (+ duration-GAN term).

TPU-first deltas:
- linear/mel spectrograms are computed on-device inside the step (the
  reference computes linear spec in DataLoader workers on CPU),
- data parallelism comes from sharding the batch over the mesh's 'data'
  axis; gradients are implicitly psum'd by XLA when the replicated params
  meet sharded batches (no DDP machinery),
- the noise-scaled MAS schedule value is computed from state.step inside the
  step (reference train.py:375-380).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from wetts_tpu.config import Config
from wetts_tpu.models.discriminators import (
    DurationDiscriminatorV1,
    DurationDiscriminatorV2,
    MultiPeriodDiscriminator,
    MultiPeriodMultiResolutionDiscriminator,
)
from wetts_tpu.models.synthesizer import Synthesizer
from wetts_tpu.ops.masking import slice_segments
from wetts_tpu.ops.spectral import mel_spectrogram, spec_to_mel, spectrogram
from wetts_tpu.train.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from wetts_tpu.train.state import GANTrainState


def build_models(cfg: Config):
    """Construct the model set from a config (reference train.py:82-211)."""
    m = cfg.model
    net_g = Synthesizer.from_config(cfg)
    if m.use_mrd_disc:
        net_d = MultiPeriodMultiResolutionDiscriminator()
    else:
        net_d = MultiPeriodDiscriminator()
    net_dur_d = None
    if m.use_duration_discriminator:
        cls = (DurationDiscriminatorV1
               if m.duration_discriminator_type == "dur_disc_1"
               else DurationDiscriminatorV2)
        net_dur_d = cls(m.hidden_channels, m.hidden_channels, 3, 0.1,
                        gin_channels=m.gin_channels)
    net_wd = None
    if m.use_wd:
        from wetts_tpu.models.discriminators import WavLMDiscriminator

        net_wd = WavLMDiscriminator(m.slm_hidden, m.slm_nlayers,
                                    m.slm_initial_channel)
    return net_g, net_d, net_dur_d, net_wd


def compute_spec(cfg: Config, wav: jax.Array) -> jax.Array:
    """On-device posterior input: linear spectrogram or log-mel [B, F, C]."""
    d = cfg.data
    if d.use_mel_posterior_encoder or cfg.model.use_mel_posterior_encoder:
        return mel_spectrogram(wav, d.filter_length, d.n_mel_channels,
                               d.sampling_rate, d.hop_length, d.win_length,
                               d.mel_fmin, d.mel_fmax)
    return spectrogram(wav, d.filter_length, d.hop_length, d.win_length)


def _cast_floats(tree, dtype):
    """Cast floating leaves of a pytree to `dtype` (ints/bools untouched)."""
    def cast(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                       jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def make_half_fns(enabled: bool):
    """Mixed-precision helpers (reference AMP, train.py:310,390,436-507).

    TPU-first delta: the reference uses fp16 autocast + GradScaler; on TPU
    the native half type is bfloat16, whose fp32-sized exponent makes loss
    scaling unnecessary.

    Design (round 2): each param tree is cast to bf16 ONCE per step,
    OUTSIDE the grad closures; gradients are taken with respect to the
    bf16 trees and converted back to fp32 for the (fp32 master-param)
    optimizer update. The round-1 version re-cast the full param tree
    inside every `apply` — the generator is applied twice per step and
    the casts were differentiated through in the G pass, making bf16
    measurably SLOWER than fp32 (cast-bound).

    Returns (cast_half, to_f32, half_apply):
    - cast_half(tree): float leaves -> bf16 (identity when disabled),
    - to_f32(tree):    float leaves -> fp32 (identity when disabled),
    - half_apply(module, params, *args, **kw): apply with bf16 inputs and
      fp32 outputs; `params` must already be cast (so matmuls/convs hit
      the MXU at 2x rate while losses accumulate in fp32).
    """
    if not enabled:
        def apply(module, params, *args, **kwargs):
            return module.apply({"params": params}, *args, **kwargs)
        return (lambda t: t), (lambda t: t), apply

    def cast_half(tree):
        return _cast_floats(tree, jnp.bfloat16)

    def to_f32(tree):
        return _cast_floats(tree, jnp.float32)

    def apply(module, params, *args, **kwargs):
        out = module.apply({"params": params},
                           *_cast_floats(args, jnp.bfloat16), **kwargs)
        return _cast_floats(out, jnp.float32)

    return cast_half, to_f32, apply


def make_train_step(cfg: Config, net_g, net_d, net_dur_d, tx,
                    net_wd=None, slm_feature_fn=None,
                    use_fast_decoder: Optional[bool] = None):
    """Returns train_step(state, batch_dict, rng) -> (state, metrics).

    net_wd / slm_feature_fn: the WavLM (SLM) discriminator branch
    (reference train.py:467-476, 496-500). slm_feature_fn maps waveforms
    [B, T, 1] -> stacked hidden features [B, T', slm_hidden * slm_layers]
    (a frozen WavLM; injectable so precomputed/ported extractors both work).
    The branch is skipped when either is None.

    use_fast_decoder: None (default) uses the space-to-depth decoder for
    hifigan configs (fastest on TPU); False forces the plain decoder —
    useful where XLA:CPU compile time matters more than step time
    (virtual-device dryruns, CI).
    """
    d = cfg.data
    t = cfg.train
    m = cfg.model
    seg_frames = t.segment_size // d.hop_length
    use_mel_post = d.use_mel_posterior_encoder or m.use_mel_posterior_encoder
    use_wd = net_wd is not None and slm_feature_fn is not None
    if m.vocoder_type == "hifigan":
        # space-to-depth decoder (exact-equal; models/hifigan_fast.py)
        net_g = net_g.clone(use_fast_decoder=(
            True if use_fast_decoder is None else use_fast_decoder))
    cast_half, to_f32, half_apply = make_half_fns(t.fp16_run or t.bf16_run)

    def g_forward(params_g, batch, rngs, mas_noise_scale):
        return half_apply(
            net_g, params_g,
            batch["phone_ids"], batch["text_lengths"],
            batch["spec"], batch["spec_lengths"], batch["sid"],
            mas_noise_scale, rngs=rngs)

    def train_step(state: GANTrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        wav = batch["wav"]  # [B, T_samples]
        spec = compute_spec(cfg, wav)
        batch = dict(batch, spec=spec)

        noise_rng, dropout_rng, slice_rng, mas_rng = jax.random.split(rng, 4)
        rngs = {"noise": noise_rng, "dropout": dropout_rng,
                "slice": slice_rng}

        metrics = {}
        if m.use_noise_scaled_mas:
            mas_noise_scale = jnp.maximum(
                m.mas_noise_scale_initial
                - m.noise_scale_delta * state.step.astype(jnp.float32), 0.0)
            # logged like the reference's current_mas_noise_scale
            # (train.py:375-380) so the schedule is observable
            metrics["train/mas_noise_scale"] = mas_noise_scale
        else:
            mas_noise_scale = 0.0

        # bf16 trees are derived ONCE per step here, outside the grad
        # closures; grads come out bf16 and are converted for the fp32
        # master-param optimizer updates (make_half_fns docstring)
        params_g_h = cast_half(state.params_g)

        # ---- generator forward (no grad) for the discriminator updates ----
        out = jax.lax.stop_gradient(
            g_forward(params_g_h, batch, rngs, mas_noise_scale))
        y_hat = out["audio"]  # [B, seg_samples, 1]
        ids_slice = out["ids_slice"]
        y_slice = slice_segments(
            wav[:, :, None], ids_slice * d.hop_length, t.segment_size)

        # ---- discriminator update ----
        def d_loss_fn(params_d_h):
            y_d_r, y_d_g, _, _ = half_apply(net_d, params_d_h, y_slice,
                                            y_hat)
            loss_disc, _, _ = discriminator_loss(y_d_r, y_d_g)
            return loss_disc

        loss_disc, grads_d = jax.value_and_grad(d_loss_fn)(
            cast_half(state.params_d))
        grads_d = to_f32(grads_d)
        updates_d, opt_d = tx.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # ---- duration discriminator update ----
        params_dur_d, opt_dur_d = state.params_dur_d, state.opt_dur_d
        if net_dur_d is not None:
            def dur_d_loss_fn(p_h):
                probs = half_apply(
                    net_dur_d, p_h, out["x_hidden"], out["x_mask"],
                    out["logw_"], out["logw"])
                loss, _, _ = discriminator_loss([probs[0]], [probs[1]])
                return loss

            loss_dur_disc, grads_dd = jax.value_and_grad(dur_d_loss_fn)(
                cast_half(state.params_dur_d))
            updates_dd, opt_dur_d = tx.update(
                to_f32(grads_dd), state.opt_dur_d, state.params_dur_d)
            params_dur_d = optax.apply_updates(state.params_dur_d, updates_dd)
            metrics["loss/dur_disc"] = loss_dur_disc

        # ---- WavLM (SLM) discriminator update (reference :467-476) ----
        params_wd, opt_wd = state.params_wd, state.opt_wd
        if use_wd:
            feat_real = jax.lax.stop_gradient(slm_feature_fn(y_slice))
            feat_fake = jax.lax.stop_gradient(slm_feature_fn(y_hat))

            def wd_loss_fn(p_h):
                d_r = half_apply(net_wd, p_h, feat_real)
                d_g = half_apply(net_wd, p_h, feat_fake)
                loss, _, _ = discriminator_loss([d_r], [d_g])
                return loss

            loss_slm, grads_wd = jax.value_and_grad(wd_loss_fn)(
                cast_half(state.params_wd))
            updates_wd, opt_wd = tx.update(to_f32(grads_wd), state.opt_wd,
                                           state.params_wd)
            params_wd = optax.apply_updates(state.params_wd, updates_wd)
            metrics["loss/slm_disc"] = loss_slm

        # ---- generator update (same rngs -> identical stochastic draws) ----
        if use_mel_post:
            mel = spec
        else:
            mel = spec_to_mel(spec, d.filter_length, d.n_mel_channels,
                              d.sampling_rate, d.mel_fmin, d.mel_fmax)

        # updated discriminators as seen by the G pass (reference steps
        # optim_d before the G pass); cast once outside the closure — no
        # grads flow to them here
        params_d_h = cast_half(params_d)
        params_dur_d_h = cast_half(params_dur_d)
        params_wd_h = cast_half(params_wd) if use_wd else None

        def g_loss_fn(params_g):
            o = g_forward(params_g, batch, rngs, mas_noise_scale)
            y_hat_g = o["audio"]
            y_mel = slice_segments(mel, o["ids_slice"], seg_frames)
            y_hat_mel = mel_spectrogram(
                y_hat_g[:, :, 0], d.filter_length, d.n_mel_channels,
                d.sampling_rate, d.hop_length, d.win_length,
                d.mel_fmin, d.mel_fmax)
            y_r_slice = slice_segments(
                wav[:, :, None], o["ids_slice"] * d.hop_length,
                t.segment_size)

            y_d_r, y_d_g, fmap_r, fmap_g = half_apply(
                net_d, params_d_h, y_r_slice, y_hat_g)
            loss_dur = jnp.sum(o["l_length"].astype(jnp.float32))
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * t.c_mel
            loss_kl = kl_loss(o["z_p"], o["logs_q"], o["m_p"], o["logs_p"],
                              o["y_mask"]) * t.c_kl
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, _ = generator_loss(y_d_g)
            total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
            aux = {"loss/gen": loss_gen, "loss/fm": loss_fm,
                   "loss/mel": loss_mel, "loss/dur": loss_dur,
                   "loss/kl": loss_kl}
            if net_dur_d is not None:
                probs = half_apply(
                    net_dur_d, params_dur_d_h, o["x_hidden"], o["x_mask"],
                    o["logw_"], o["logw"])
                loss_dur_gen, _ = generator_loss([probs[1]])
                total = total + loss_dur_gen
                aux["loss/dur_gen"] = loss_dur_gen
            if use_wd:
                # feature loss + SLM adversarial term (reference :496-500)
                f_real = jax.lax.stop_gradient(slm_feature_fn(y_r_slice))
                f_fake = slm_feature_fn(y_hat_g)
                loss_lm = jnp.mean(jnp.abs(f_real - f_fake))
                d_g = half_apply(net_wd, params_wd_h, f_fake)
                loss_lm_gen, _ = generator_loss([d_g])
                total = total + loss_lm + loss_lm_gen
                aux["loss/slm_feat"] = loss_lm
                aux["loss/slm_gen"] = loss_lm_gen
            return total, aux

        (loss_gen_all, aux), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True)(params_g_h)
        grads_g = to_f32(grads_g)
        updates_g, opt_g = tx.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        metrics.update(aux)
        metrics["loss/disc"] = loss_disc
        metrics["loss/g_total"] = loss_gen_all
        metrics["grad_norm/g"] = optax.global_norm(grads_g)
        metrics["grad_norm/d"] = optax.global_norm(grads_d)

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g, opt_g=opt_g,
            params_d=params_d, opt_d=opt_d,
            params_dur_d=params_dur_d, opt_dur_d=opt_dur_d,
            params_wd=params_wd, opt_wd=opt_wd,
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, net_g):
    """Validation pass: generator losses only, no updates (reference
    train.py:624-693 evaluates with the generator in eval mode)."""
    d = cfg.data
    t = cfg.train
    m = cfg.model
    seg_frames = t.segment_size // d.hop_length
    use_mel_post = d.use_mel_posterior_encoder or m.use_mel_posterior_encoder

    def eval_step(params_g, batch, rng):
        wav = batch["wav"]
        spec = compute_spec(cfg, wav)
        rngs = dict(zip(("noise", "dropout", "slice"),
                        jax.random.split(rng, 3)))
        o = net_g.apply(
            {"params": params_g}, batch["phone_ids"], batch["text_lengths"],
            spec, batch["spec_lengths"], batch["sid"], 0.0,
            deterministic=True, rngs=rngs)
        mel = spec if use_mel_post else spec_to_mel(
            spec, d.filter_length, d.n_mel_channels, d.sampling_rate,
            d.mel_fmin, d.mel_fmax)
        y_mel = slice_segments(mel, o["ids_slice"], seg_frames)
        y_hat_mel = mel_spectrogram(
            o["audio"][:, :, 0], d.filter_length, d.n_mel_channels,
            d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin,
            d.mel_fmax)
        return {
            "val/mel_l1": jnp.mean(jnp.abs(y_mel - y_hat_mel)),
            "val/kl": kl_loss(o["z_p"], o["logs_q"], o["m_p"], o["logs_p"],
                              o["y_mask"]),
            "val/dur": jnp.sum(o["l_length"].astype(jnp.float32)),
        }

    return eval_step


def init_state(cfg: Config, rng: jax.Array, net_g, net_d, net_dur_d,
               tx, net_wd=None, slm_feature_fn=None) -> GANTrainState:
    """Initialize all parameter trees with dummy static-shaped inputs."""
    d = cfg.data
    t = cfg.train
    b = 2
    t_text, t_spec = 16, max(t.segment_size // d.hop_length + 2, 36)
    rngs = {"params": rng, "noise": rng, "dropout": rng, "slice": rng}
    x = jnp.ones((b, t_text), jnp.int32)
    xl = jnp.full((b,), t_text, jnp.int32)
    spec = jnp.zeros((b, t_spec, d.spec_channels))
    yl = jnp.full((b,), t_spec, jnp.int32)
    sid = jnp.zeros((b,), jnp.int32)
    params_g = net_g.init(rngs, x, xl, spec, yl, sid)["params"]
    wav = jnp.zeros((b, t.segment_size, 1))
    params_d = net_d.init(rngs, wav, wav)["params"]
    params_dur_d = None
    if net_dur_d is not None:
        h = jnp.zeros((b, t_text, cfg.model.hidden_channels))
        mask = jnp.ones((b, t_text, 1))
        dur = jnp.ones((b, t_text, 1))
        params_dur_d = net_dur_d.init(rngs, h, mask, dur, dur)["params"]
    params_wd = None
    if net_wd is not None and slm_feature_fn is not None:
        feat = slm_feature_fn(wav)
        params_wd = net_wd.init(rngs, feat)["params"]
    return GANTrainState.create(tx, params_g, params_d, params_dur_d,
                                params_wd)
