"""Host-side training loop.

Behavioral parity target: wetts/vits/train.py:37-346 (main + epoch loop):
- epoch-seeded bucketed batches, per-epoch exponential LR decay,
- resume-from-latest checkpoint, global_step = (epoch-1) * len(loader),
- periodic eval + checkpoint every eval_interval steps, scalar logging.

TPU-first deltas: one jitted train step with mesh data parallelism; metrics
stream to `train.log` + `metrics.jsonl` (TensorBoard-free, greppable); a
single Orbax checkpoint per save.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wetts_tpu.config import Config
from wetts_tpu.data.dataset import TTSDataset, read_table
from wetts_tpu.data.sampler import BucketBatcher
from wetts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from wetts_tpu.train import checkpoint as ckpt
from wetts_tpu.train.state import (
    GANTrainState,
    epoch_lr,
    make_optimizer,
)
from wetts_tpu.train.step import (
    build_models,
    init_state,
    make_eval_step,
    make_train_step,
)


def get_logger(model_dir: str) -> logging.Logger:
    logger = logging.getLogger("wetts_tpu")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        os.makedirs(model_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(model_dir, "train.log"))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
        logger.addHandler(logging.StreamHandler())
    return logger


class Trainer:
    def __init__(
        self,
        cfg: Config,
        model_dir: str,
        train_manifest: str,
        phone_table_path: str,
        speaker_table_path: Optional[str] = None,
        val_manifest: Optional[str] = None,
        n_devices: Optional[int] = None,
        slm_model_dir: Optional[str] = None,
        donate: bool = True,
        use_fast_decoder: Optional[bool] = None,
    ):
        phone_table = read_table(phone_table_path)
        speaker_table = (read_table(speaker_table_path)
                         if speaker_table_path else None)
        cfg.num_phones = max(cfg.num_phones, max(phone_table.values()) + 1)
        if speaker_table:
            cfg.num_speakers = max(cfg.num_speakers,
                                   max(speaker_table.values()) + 1)
        self.cfg = cfg
        self.model_dir = model_dir
        self.logger = get_logger(model_dir)
        self.metrics_path = os.path.join(model_dir, "metrics.jsonl")
        # TensorBoard scalars/images/audio on rank 0 (reference
        # train.py:509-581; SummaryWriter(log_dir=hps.model_dir))
        self.summary = None
        if jax.process_index() == 0:
            try:
                from wetts_tpu.utils.summary import Summary

                self.summary = Summary(os.path.join(model_dir, "tb"))
            except Exception as e:  # noqa: BLE001 - TB is best-effort
                self.logger.warning("tensorboard writer unavailable: %s", e)

        self.dataset = TTSDataset(train_manifest, phone_table, speaker_table,
                                  cfg.data)
        rank, world = jax.process_index(), jax.process_count()
        self.batcher = BucketBatcher(
            self.dataset, cfg.train.batch_size, num_replicas=world, rank=rank,
            seed=cfg.train.seed)
        self.val_dataset = (
            TTSDataset(val_manifest, phone_table, speaker_table, cfg.data)
            if val_manifest else None)

        self.net_g, self.net_d, self.net_dur_d, self.net_wd = \
            build_models(cfg)
        self.slm_feature_fn = None
        if self.net_wd is not None and slm_model_dir:
            self.slm_feature_fn = self._load_slm(slm_model_dir)
        elif self.net_wd is not None:
            self.logger.warning(
                "use_wd is set but no --slm_model dir given; the WavLM "
                "discriminator branch is disabled for this run")
            self.net_wd = None
        self.tx = make_optimizer(cfg)
        self.mesh = make_mesh(n_devices)
        rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng = rng
        state = init_state(cfg, rng, self.net_g, self.net_d, self.net_dur_d,
                           self.tx, self.net_wd, self.slm_feature_fn)
        state = ckpt.load_checkpoint(model_dir, state)
        self.start_step = int(state.step)
        self.state = replicate(self.mesh, state)
        repl = NamedSharding(self.mesh, P())
        # donate=False is an escape hatch for jaxlib 0.9.0's XLA:CPU
        # compiler, which intermittently crashes compiling the donated
        # mesh-sharded step (tests/isolation.py); donation stays on for
        # real (TPU) training, where it halves peak param+opt memory.
        self.train_step = jax.jit(
            make_train_step(cfg, self.net_g, self.net_d, self.net_dur_d,
                            self.tx, self.net_wd, self.slm_feature_fn,
                            use_fast_decoder=use_fast_decoder),
            in_shardings=(repl, NamedSharding(self.mesh, P("data")), repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )

    def _load_slm(self, slm_model_dir: str):
        """Frozen WavLM feature extractor from a local HF model dir."""
        import json as _json

        import torch

        from wetts_tpu.models.wavlm import (
            WavLMConfig,
            convert_hf_wavlm,
            make_slm_feature_fn,
        )

        with open(os.path.join(slm_model_dir, "config.json")) as f:
            hf = _json.load(f)
        wcfg = WavLMConfig(
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            conv_dim=tuple(hf["conv_dim"]),
            conv_kernel=tuple(hf["conv_kernel"]),
            conv_stride=tuple(hf["conv_stride"]),
            conv_bias=hf.get("conv_bias", False),
            num_conv_pos_embeddings=hf["num_conv_pos_embeddings"],
            num_conv_pos_embedding_groups=hf[
                "num_conv_pos_embedding_groups"],
            num_buckets=hf.get("num_buckets", 320),
            max_distance=hf.get("max_bucket_distance", 800))
        for name in ("pytorch_model.bin", "model.safetensors"):
            path = os.path.join(slm_model_dir, name)
            if os.path.exists(path):
                if name.endswith(".bin"):
                    sd = torch.load(path, map_location="cpu",
                                    weights_only=False)
                else:
                    from safetensors.torch import load_file

                    sd = load_file(path)
                break
        else:
            raise FileNotFoundError(f"no weights under {slm_model_dir}")
        sd = {k.replace("wavlm.", "", 1): v.numpy() for k, v in sd.items()
              if "masked_spec_embed" not in k}
        params = convert_hf_wavlm(sd, wcfg)
        return make_slm_feature_fn(
            params=params, cfg=wcfg, model_sr=self.cfg.data.sampling_rate,
            slm_sr=self.cfg.model.slm_sr)

    # ------------------------------------------------------------------

    def _set_lr(self, epoch: int):
        state = self.state
        for name in ("opt_g", "opt_d", "opt_dur_d", "opt_wd"):
            opt = getattr(state, name)
            if opt is not None:
                # NB: a fresh array per optimizer — sharing one buffer across
                # opt states breaks donation (same buffer donated twice)
                opt.hyperparams["learning_rate"] = jnp.asarray(
                    epoch_lr(self.cfg, epoch), jnp.float32)
        self.state = state

    def _log_metrics(self, step: int, metrics: Dict, epoch: int, sps: float):
        if jax.process_index() != 0:  # rank-0 logging (reference train.py:509)
            return
        rec = {"step": step, "epoch": epoch, "steps_per_s": round(sps, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.summary is not None:
            self.summary.scalars(
                step, {k: v for k, v in rec.items()
                       if k not in ("step", "epoch")})
        self.logger.info(
            "step %d epoch %d g=%.3f d=%.3f mel=%.3f %.2f steps/s",
            step, epoch, rec.get("loss/g_total", -1),
            rec.get("loss/disc", -1), rec.get("loss/mel", -1), sps)

    def train(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        step = self.start_step
        steps_per_epoch = max(len(self.batcher), 1)
        start_epoch = step // steps_per_epoch + 1
        t_last = time.perf_counter()
        for epoch in range(start_epoch, cfg.train.epochs + 1):
            self._set_lr(epoch)
            for batch in self.batcher(epoch):
                feed = {
                    "phone_ids": batch.phone_ids,
                    "text_lengths": batch.text_lengths,
                    "wav": batch.wav,
                    "spec_lengths": batch.spec_lengths,
                    "sid": batch.sid,
                }
                feed = shard_batch(self.mesh, feed)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self.train_step(
                    self.state, feed, step_rng)
                step += 1
                if step % cfg.train.log_interval == 0:
                    jax.block_until_ready(metrics)
                    now = time.perf_counter()
                    sps = cfg.train.log_interval / (now - t_last)
                    t_last = now
                    self._log_metrics(step, metrics, epoch, sps)
                if step % cfg.train.eval_interval == 0:
                    self.evaluate(step, epoch)
                    self.save(step)
                if max_steps is not None and step >= max_steps:
                    self.save(step)
                    return step
        self.save(step)
        return step

    def evaluate(self, step: int, epoch: int, max_batches: int = 8):
        """Validation losses on the val manifest (reference train.py:624-693)."""
        if self.val_dataset is None or len(self.val_dataset) == 0:
            return
        if not hasattr(self, "_eval_step"):
            self._eval_step = jax.jit(make_eval_step(self.cfg, self.net_g))
            self._val_batcher = BucketBatcher(
                self.val_dataset, self.cfg.train.batch_size,
                seed=self.cfg.train.seed)
        totals: Dict[str, float] = {}
        n = 0
        for batch in self._val_batcher(epoch=0):
            feed = {
                "phone_ids": batch.phone_ids,
                "text_lengths": batch.text_lengths,
                "wav": batch.wav,
                "spec_lengths": batch.spec_lengths,
                "sid": batch.sid,
            }
            metrics = self._eval_step(self.state.params_g, feed,
                                      jax.random.PRNGKey(0))
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
            if n >= max_batches:
                break
        if n:
            self._log_metrics(step, {k: v / n for k, v in totals.items()},
                              epoch, 0.0)
        if self.summary is not None:
            self._log_eval_media(step)

    def _log_eval_media(self, step: int):
        """Eval audio + generated-mel + alignment images (reference
        evaluate(), train.py:624-693 + summarize images/audios)."""
        try:
            from wetts_tpu.ops.spectral import mel_spectrogram
            from wetts_tpu.utils.summary import (
                plot_alignment_to_numpy,
                plot_spectrogram_to_numpy,
            )

            item = self.val_dataset.items[0]
            d = self.cfg.data
            x = jnp.asarray(item.phone_ids, jnp.int32)[None, :]
            xl = jnp.asarray([x.shape[1]], jnp.int32)
            sid = jnp.asarray(
                [self.val_dataset.speaker_id(item.speaker)], jnp.int32)
            max_frames = 16 * max(
                1, self.cfg.train.segment_size // d.hop_length)
            audio, y_len, attn = self.net_g.apply(
                {"params": jax.device_get(self.state.params_g)},
                x, xl, sid, 0.667, 1.0, 0.8, max_frames,
                method=type(self.net_g).infer,
                rngs={"noise": jax.random.PRNGKey(0)})
            n_samples = int(y_len[0]) * d.hop_length
            wav = np.asarray(audio[0, :n_samples, 0])
            if wav.size:
                self.summary.audio(step, "gen/audio", wav, d.sampling_rate)
                mel = mel_spectrogram(
                    jnp.asarray(wav)[None, :], d.filter_length,
                    d.n_mel_channels, d.sampling_rate, d.hop_length,
                    d.win_length, d.mel_fmin, d.mel_fmax)
                self.summary.image(
                    step, "gen/mel",
                    plot_spectrogram_to_numpy(np.asarray(mel[0]).T))
                self.summary.image(
                    step, "gen/alignment",
                    plot_alignment_to_numpy(
                        np.asarray(attn[0, : int(y_len[0]), : x.shape[1]])))
            self.summary.flush()
        except Exception as e:  # noqa: BLE001 - media logging best-effort
            self.logger.warning("eval media logging failed: %s", e)

    def save(self, step: int):
        # ALL processes enter the save: Orbax's CheckpointManager runs
        # cross-process barriers in multiprocess mode (single-writer
        # semantics internally) — a rank-0-only call deadlocks the
        # shutdown barrier on pods
        state = jax.device_get(self.state)
        ckpt.save_checkpoint(self.model_dir, state, step)
        if jax.process_index() == 0:
            self.logger.info("saved checkpoint at step %d", step)
