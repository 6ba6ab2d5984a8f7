"""Top-level VITS synthesizer (training forward + inference + streaming split).

Behavioral parity target: wetts/vits/model/models.py:14-377 (SynthesizerTrn).
- training forward (:161-226): text enc -> posterior enc -> flow -> MAS
  (no-grad, optional noise-scaled) -> duration loss -> prior expansion ->
  random segment slice -> decoder,
- infer (:228-280): duration sampling -> generate_path -> flow reverse ->
  decoder, with noise_scale / length_scale / noise_scale_w semantics,
- infer_encoder / decode split at z for streaming (:282-363),
- voice_conversion (:369-376).

TPU-first deltas from the reference:
- MAS runs on-device (ops/mas.py) instead of a CPU round-trip,
- inference runs with a static `max_frames` bound + masks (XLA static shapes);
  true lengths are returned so callers trim,
- all stochastic sites draw from the flax 'noise' rng collection,
- the noise-scaled MAS schedule value is an explicit argument rather than
  module state.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wetts_tpu.config import Config
from wetts_tpu.models.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
)
from wetts_tpu.models.encoders import PosteriorEncoder, TextEncoder
from wetts_tpu.models.flows import ResidualCouplingBlock
from wetts_tpu.models.hifigan import Generator
from wetts_tpu.models.vocos import VocosGenerator
from wetts_tpu.ops.masking import (
    generate_path,
    rand_slice_segments,
    sequence_mask,
)
from wetts_tpu.ops.mas import maximum_path

Array = jax.Array


class Synthesizer(nn.Module):
    n_vocab: int
    spec_channels: int
    segment_size: int  # in frames
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: tuple
    resblock_dilation_sizes: tuple
    upsample_rates: tuple
    upsample_initial_channel: int
    upsample_kernel_sizes: tuple
    n_speakers: int = 0
    gin_channels: int = 0
    use_sdp: bool = True
    use_spk_conditioned_encoder: bool = False
    use_transformer_flows: bool = False
    transformer_flow_type: str = "mono_layer_post_residual"
    use_noise_scaled_mas: bool = False
    vocoder_type: str = "hifigan"
    vocos_channels: int = 512
    vocos_h_channels: int = 1536
    vocos_out_channels: int = 1026
    vocos_num_layers: int = 8
    vocos_istft: tuple = (1024, 256, 1024)
    # space-to-depth decoder (models/hifigan_fast.py): exact-equal fast path
    # reading self.dec's params; init the module with this False so the
    # standard path materializes the decoder params, then clone(True)
    use_fast_decoder: bool = False

    @classmethod
    def from_config(cls, cfg: Config) -> "Synthesizer":
        m = cfg.model
        istft = m.vocos_istft_config
        return cls(
            n_vocab=cfg.num_phones,
            spec_channels=cfg.data.spec_channels,
            segment_size=cfg.train.segment_size // cfg.data.hop_length,
            inter_channels=m.inter_channels,
            hidden_channels=m.hidden_channels,
            filter_channels=m.filter_channels,
            n_heads=m.n_heads,
            n_layers=m.n_layers,
            kernel_size=m.kernel_size,
            p_dropout=m.p_dropout,
            resblock=m.resblock,
            resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in m.resblock_dilation_sizes),
            upsample_rates=tuple(m.upsample_rates),
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=tuple(m.upsample_kernel_sizes),
            n_speakers=cfg.num_speakers,
            gin_channels=m.gin_channels,
            use_sdp=m.use_sdp,
            use_spk_conditioned_encoder=m.use_spk_conditioned_encoder,
            use_transformer_flows=m.use_transformer_flows,
            transformer_flow_type=m.transformer_flow_type,
            use_noise_scaled_mas=m.use_noise_scaled_mas,
            vocoder_type=m.vocoder_type,
            vocos_channels=m.vocos_channels,
            vocos_h_channels=m.vocos_h_channels,
            vocos_out_channels=m.vocos_out_channels,
            vocos_num_layers=m.vocos_num_layers,
            vocos_istft=(istft.get("n_fft", 1024),
                         istft.get("hop_length", 256),
                         istft.get("win_length", 1024)),
        )

    def setup(self):
        enc_gin = (self.gin_channels
                   if (self.use_spk_conditioned_encoder
                       and self.gin_channels > 0) else 0)
        self.enc_p = TextEncoder(
            self.n_vocab, self.inter_channels, self.hidden_channels,
            self.filter_channels, self.n_heads, self.n_layers,
            self.kernel_size, self.p_dropout, gin_channels=enc_gin,
            name="enc_p")
        if self.vocoder_type == "vocos":
            self.dec = VocosGenerator(
                self.inter_channels, self.vocos_channels,
                self.vocos_h_channels, self.vocos_out_channels,
                self.vocos_num_layers, istft_n_fft=self.vocos_istft[0],
                istft_hop_length=self.vocos_istft[1],
                istft_win_length=self.vocos_istft[2],
                gin_channels=self.gin_channels, name="dec")
        else:
            self.dec = Generator(
                self.inter_channels, self.resblock,
                self.resblock_kernel_sizes, self.resblock_dilation_sizes,
                self.upsample_rates, self.upsample_initial_channel,
                self.upsample_kernel_sizes, gin_channels=self.gin_channels,
                name="dec")
        self.enc_q = PosteriorEncoder(
            self.spec_channels, self.inter_channels, self.hidden_channels,
            5, 1, 16, gin_channels=self.gin_channels, name="enc_q")
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, 4,
            gin_channels=self.gin_channels,
            use_transformer_flows=self.use_transformer_flows,
            transformer_flow_type=self.transformer_flow_type, name="flow")
        if self.use_sdp:
            self.dp = StochasticDurationPredictor(
                self.hidden_channels, 192, 3, 0.5, 4,
                gin_channels=self.gin_channels, name="dp")
        else:
            self.dp = DurationPredictor(
                self.hidden_channels, 256, 3, 0.5,
                gin_channels=self.gin_channels, name="dp")
        if self.n_speakers > 0:
            self.emb_g = nn.Embed(
                self.n_speakers, self.gin_channels,
                embedding_init=nn.initializers.normal(1.0), name="emb_g")

    def _speaker(self, sid: Optional[Array]) -> Optional[Array]:
        if self.n_speakers > 0 and sid is not None:
            return self.emb_g(sid)[:, None, :]  # [B, 1, gin]
        return None

    def _decode_latent(self, z: Array, g: Optional[Array]) -> Array:
        """dec(z) with the optional space-to-depth fast path."""
        if self.use_fast_decoder and self.vocoder_type == "hifigan":
            from wetts_tpu.models.hifigan_fast import fast_generator_apply

            return fast_generator_apply(
                self.dec.variables["params"], z, g,
                # the fused Pallas MRF stage defines no VJP; this helper
                # sits on the training path (train/step.py slices decode
                # under value_and_grad), so pin the differentiable XLA
                # blocked path regardless of any future default.
                use_pallas_mrf=False,
                resblock=self.resblock,
                resblock_kernel_sizes=self.resblock_kernel_sizes,
                resblock_dilation_sizes=self.resblock_dilation_sizes,
                upsample_rates=self.upsample_rates,
                upsample_initial_channel=self.upsample_initial_channel,
                upsample_kernel_sizes=self.upsample_kernel_sizes)
        return self.dec(z, g=g)

    def __call__(self, x, x_lengths, y, y_lengths, sid=None,
                 mas_noise_scale: float = 0.0, deterministic: bool = False
                 ) -> Dict[str, Any]:
        """Training forward.

        x: [B, T_text] phone ids; y: [B, T_spec, spec_channels];
        returns a dict with the decoder slice, duration loss, alignment,
        masks and flow statistics (reference :161-226).
        """
        g = self._speaker(sid)
        x_h, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, g=g, deterministic=deterministic)
        z, m_q, logs_q, y_mask = self.enc_q(
            y, y_lengths, g=g, deterministic=deterministic)
        z_p = self.flow(z, y_mask, g=g, deterministic=deterministic)

        # --- MAS (no gradients, reference :171-194) ---
        sg = jax.lax.stop_gradient
        zp_sg, mp_sg, lp_sg = sg(z_p), sg(m_p), sg(logs_p)
        s_p_sq_r = jnp.exp(-2.0 * lp_sg)  # [B, T_text, C]
        neg_cent1 = jnp.sum(-0.5 * math.log(2 * math.pi) - lp_sg,
                            axis=-1)[:, None, :]  # [B, 1, T_text]
        neg_cent2 = jnp.einsum(
            "btc,bsc->bts", -0.5 * zp_sg**2, s_p_sq_r,
            preferred_element_type=jnp.float32)
        neg_cent3 = jnp.einsum(
            "btc,bsc->bts", zp_sg, mp_sg * s_p_sq_r,
            preferred_element_type=jnp.float32)
        neg_cent4 = jnp.sum(-0.5 * mp_sg**2 * s_p_sq_r,
                            axis=-1)[:, None, :]
        neg_cent = neg_cent1 + neg_cent2 + neg_cent3 + neg_cent4

        if self.use_noise_scaled_mas:
            eps = (jnp.std(neg_cent)
                   * jax.random.normal(self.make_rng("noise"), neg_cent.shape)
                   * mas_noise_scale)
            neg_cent = neg_cent + eps

        attn_mask = y_mask * x_mask[:, None, :, 0]  # [B, T_spec, T_text]
        attn = sg(maximum_path(neg_cent, attn_mask))  # [B, T_spec, T_text]

        w = jnp.sum(attn, axis=1)[:, :, None]  # [B, T_text, 1]
        if self.use_sdp:
            l_length = self.dp(x_h, x_mask, w, g=g,
                               deterministic=deterministic)
            l_length = l_length / jnp.sum(x_mask)
            logw = self.dp(x_h, x_mask, g=g, reverse=True, noise_scale=1.0,
                           deterministic=deterministic)
            logw_ = jnp.log(w + 1e-6) * x_mask
        else:
            logw_ = jnp.log(w + 1e-6) * x_mask
            logw = self.dp(x_h, x_mask, g=g, deterministic=deterministic)
            l_length = jnp.sum((logw - logw_) ** 2,
                               axis=(1, 2)) / jnp.sum(x_mask)

        # expand prior over spec frames (reference :209-212)
        m_p_e = jnp.einsum("bts,bsc->btc", attn, m_p,
                           preferred_element_type=jnp.float32)
        logs_p_e = jnp.einsum("bts,bsc->btc", attn, logs_p,
                              preferred_element_type=jnp.float32)

        z_slice, ids_slice = rand_slice_segments(
            z, y_lengths, self.segment_size, self.make_rng("slice"))
        o = self._decode_latent(z_slice, g)
        return {
            "audio": o,
            "l_length": l_length,
            "attn": attn,
            "ids_slice": ids_slice,
            "x_mask": x_mask,
            "y_mask": y_mask,
            "z": z, "z_p": z_p, "m_p": m_p_e, "logs_p": logs_p_e,
            "m_q": m_q, "logs_q": logs_q,
            "x_hidden": x_h, "logw": logw, "logw_": logw_,
            "g": g,
        }

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------

    def encode_prior(self, x, x_lengths, sid=None, noise_scale=1.0,
                     length_scale=1.0, noise_scale_w=1.0,
                     max_frames: int = 1000):
        """Text -> prior latent z_p, BEFORE the flow reverse.

        Returns (z_p [B, max_frames, C], y_lengths [B], y_mask, attn, g).

        Split out of encode_infer so length-bucketed callers (the on-device
        lax.switch dispatch, serving/engine.py) can run the flow reverse at
        the decode bucket instead of max_frames: the flow masks every conv
        input/output per y_mask (flows.py, wavenet.py), so
        flow_reverse(z_p[:, :fb]) equals flow_reverse(z_p)[:, :fb] exactly
        for any bucket fb covering y_lengths — the same masking argument
        that makes bucketed decode exact.
        """
        g = self._speaker(sid)
        x_h, m_p, logs_p, x_mask = self.enc_p(x, x_lengths, g=g)
        if self.use_sdp:
            logw = self.dp(x_h, x_mask, g=g, reverse=True,
                           noise_scale=noise_scale_w)
        else:
            logw = self.dp(x_h, x_mask, g=g)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0]  # [B, T_text]
        # cap durations at the static bound (masked frames are zeroed anyway)
        y_lengths = jnp.clip(
            jnp.sum(w_ceil, axis=-1), 1, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_frames)[:, :, None]
        path_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, None, :, 0]
        attn = generate_path(w_ceil, path_mask)  # [B, T_text, T_spec]

        m_p_e = jnp.einsum("bst,bsc->btc", attn, m_p,
                           preferred_element_type=jnp.float32)
        logs_p_e = jnp.einsum("bst,bsc->btc", attn, logs_p,
                              preferred_element_type=jnp.float32)
        noise = jax.random.normal(self.make_rng("noise"), m_p_e.shape)
        z_p = m_p_e + noise * jnp.exp(logs_p_e) * noise_scale
        return z_p, y_lengths, y_mask, attn, g

    def flow_reverse(self, z_p, y_mask, g=None):
        """Prior latent -> posterior latent z (flow reversed, masked)."""
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        return z * y_mask

    def encode_infer(self, x, x_lengths, sid=None, noise_scale=1.0,
                     length_scale=1.0, noise_scale_w=1.0,
                     max_frames: int = 1000):
        """Text -> latent z (the streaming encoder half, reference :282-331).

        Returns (z [B, max_frames, C], y_lengths [B], y_mask, attn, g).
        """
        z_p, y_lengths, y_mask, attn, g = self.encode_prior(
            x, x_lengths, sid, noise_scale, length_scale, noise_scale_w,
            max_frames)
        z = self.flow_reverse(z_p, y_mask, g=g)
        return z, y_lengths, y_mask, attn, g

    def decode(self, z, g=None, sid=None):
        """Latent z [B, T, C] -> waveform (streaming decoder half, :360-363)."""
        if g is None:
            g = self._speaker(sid)
        return self._decode_latent(z, g)

    def infer(self, x, x_lengths, sid=None, noise_scale=1.0,
              length_scale=1.0, noise_scale_w=1.0, max_frames: int = 1000):
        """Full synthesis. Returns (audio [B, max_frames*hop, 1], y_lengths)."""
        z, y_lengths, y_mask, attn, g = self.encode_infer(
            x, x_lengths, sid, noise_scale, length_scale, noise_scale_w,
            max_frames)
        o = self._decode_latent(z, g)
        return o, y_lengths, attn

    def voice_conversion(self, y, y_lengths, sid_src, sid_tgt):
        g_src = self._speaker(sid_src)
        g_tgt = self._speaker(sid_tgt)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g_src)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        o_hat = self.dec(z_hat * y_mask, g=g_tgt)
        return o_hat, y_mask, (z, z_p, z_hat)
