"""CLI model bundle: frontend + acoustic model -> waveform.

Behavioral parity target: wetts/cli/model.py:24-68 — loads the frontend
model + VITS model + tables from a directory, `synthesis(text, speaker)`
returns (phones, int16 audio) at fixed scales [0.667, 1.0, 0.8].

Model directory layout (replacing the reference's ONNX artifacts with this
framework's natives):
    config.json            - training config (reference JSON schema)
    checkpoint/ | G.pth    - Orbax checkpoint dir, .npz params, or a
                             converted WeTTS torch checkpoint
    phones.txt             - phone -> id
    speaker.txt            - speaker -> id (optional)
    frontend/              - frontend model dir (optional; raw-phone input
                             mode when absent)
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from wetts_tpu.config import Config
from wetts_tpu.data.dataset import read_table
from wetts_tpu.serving.engine import SynthesisEngine


def _latest_g_pth(model_dir: str) -> Optional[str]:
    """`G.pth` or the highest-step `G_<step>.pth` (the released checkpoint
    bundles ship the training dir's numbered checkpoints — reference
    latest_checkpoint_path glob-sort semantics, utils/task.py:98-102)."""
    import glob
    import re

    plain = os.path.join(model_dir, "G.pth")
    if os.path.exists(plain):
        return plain
    numbered = glob.glob(os.path.join(model_dir, "G_*.pth"))
    if not numbered:
        return None

    def step(p):
        m = re.search(r"G_(\d+)\.pth$", p)
        return int(m.group(1)) if m else -1

    return max(numbered, key=step)


def load_params(model_dir: str, cfg: Config):
    """Load acoustic-model params from any supported artifact."""
    import jax.numpy as jnp

    pth = _latest_g_pth(model_dir)
    if pth is not None:
        import torch

        from wetts_tpu.utils.convert import convert_synthesizer

        import jax

        ckpt = torch.load(pth, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
        return {"params": jax.tree_util.tree_map(
            jnp.asarray, convert_synthesizer(sd, cfg))}
    onnx_path = os.path.join(model_dir, "final.onnx")
    if os.path.exists(onnx_path):
        return {"params": load_params_from_onnx(onnx_path, cfg)}
    npz = os.path.join(model_dir, "params.npz")
    if os.path.exists(npz):
        import jax

        from wetts_tpu.utils.params_io import load_params_npz

        # device arrays, not numpy: indexing a host numpy array with a
        # traced id array inside jit is a TracerArrayConversionError
        return {"params": jax.tree_util.tree_map(jnp.asarray,
                                                 load_params_npz(npz))}
    # Orbax checkpoints: either a bundle's checkpoint/ subdir or a
    # Trainer run dir itself (the Trainer writes step dirs directly under
    # model_dir, so `infer_vits --model_dir exp/v1` loads training output)
    from wetts_tpu.train import checkpoint as ckpt_mod

    for ckpt_dir in (os.path.join(model_dir, "checkpoint"), model_dir):
        if not os.path.isdir(ckpt_dir):
            continue
        try:
            step = ckpt_mod.latest_step(ckpt_dir)
        except Exception:  # noqa: BLE001 - not an orbax dir
            continue
        if step is None:
            continue
        from wetts_tpu.train.state import make_optimizer
        from wetts_tpu.train.step import build_models, init_state

        import jax

        net_g, net_d, net_dur_d, _net_wd = build_models(cfg)
        tx = make_optimizer(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d,
                           net_dur_d, tx)
        state = ckpt_mod.load_checkpoint(ckpt_dir, state, step)
        return {"params": state.params_g}
    raise FileNotFoundError(f"no model artifact found under {model_dir}")


def load_params_from_onnx(onnx_path: str, cfg: Config):
    """Params from a released `final.onnx` (the reference runtime bundle,
    wetts/cli/model.py:28). The exported graph names every initializer by
    its state-dict key with weight norm folded (export_onnx.py:80-82); the
    modules the inference trace never touches (enc_q, the dropped SDP
    ConvFlow) stay at their fresh initialization — none of them runs at
    inference, so synthesis is exact."""
    import jax
    import jax.numpy as jnp

    from wetts_tpu.train.state import make_optimizer
    from wetts_tpu.train.step import build_models, init_state
    from wetts_tpu.utils.convert import convert_synthesizer
    from wetts_tpu.utils.onnx_import import read_onnx_initializers

    sd = read_onnx_initializers(onnx_path)
    if not any(k.startswith("enc_p.") for k in sd):
        raise ValueError(
            f"{onnx_path}: no recognizable SynthesizerTrn initializers "
            "(constant folding may have renamed them); convert the "
            "checkpoint release (G_*.pth) instead")
    partial = convert_synthesizer(sd, cfg, subset=True)

    net_g, net_d, net_dur_d, _ = build_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), net_g, net_d, net_dur_d,
                       make_optimizer(cfg))

    def merge(init, conv):
        if isinstance(conv, dict):
            return {k: (merge(init[k], conv[k]) if k in conv else init[k])
                    for k in init}
        return jnp.asarray(conv)

    return merge(state.params_g, partial)


class Model:
    def __init__(self, model_dir: str, precision: str = "f32",
                 on_device_bucketing="auto"):
        if precision not in ("f32", "bf16", "int8"):
            # an unrecognized value would silently fall through to the f32
            # decoder below; an operator who typed "int-8" must find out
            raise ValueError(
                f"precision must be one of f32/bf16/int8, got {precision!r}")
        cfg_path = os.path.join(model_dir, "config.json")
        if (not os.path.exists(cfg_path)
                and os.path.exists(os.path.join(model_dir, "final.onnx"))):
            # the released runtime bundles carry no config.json (only
            # final.onnx + tables — wetts/cli/model.py:24-41 never needs
            # one; the ONNX graph bakes the architecture in). The released
            # VITS runtime model is multilingual_vits_v3, so fall back to
            # its training config, vendored under assets/.
            from wetts_tpu.assets import asset_path

            cfg_path = asset_path("configs", "multilingual_v3.json")
        cfg = Config.from_json(cfg_path)
        phone2id = read_table(os.path.join(model_dir, "phones.txt"))
        speaker_path = os.path.join(model_dir, "speaker.txt")
        speaker2id = (read_table(speaker_path)
                      if os.path.exists(speaker_path) else None)
        cfg.num_phones = max(cfg.num_phones, max(phone2id.values()) + 1)
        if speaker2id:
            cfg.num_speakers = max(cfg.num_speakers,
                                   max(speaker2id.values()) + 1)
        params = load_params(model_dir, cfg)
        frontend = None
        fe_dir = os.path.join(model_dir, "frontend")
        if os.path.isdir(fe_dir):
            try:
                frontend = _load_frontend(fe_dir)
            except (OSError, KeyError, ValueError) as e:
                # degrade to raw-phone input instead of failing the whole
                # bundle (the engine's failure-detection policy; the
                # reference hard-requires its frontend, cli/model.py:25)
                import warnings

                warnings.warn(f"frontend bundle unusable ({e}); "
                              "running in raw-phone input mode",
                              stacklevel=2)
        # precision: "f32" exact | "bf16" half | "int8" dynamic-quantized
        # decoder convs (the analog of the reference's optional uint8
        # quantize_dynamic export, wetts/vits/export_onnx.py --quant)
        self.engine = SynthesisEngine(
            cfg, params, phone2id, speaker2id, frontend,
            noise_scale=0.667, length_scale=1.0, noise_scale_w=0.8,
            half=precision == "bf16", quantize=precision == "int8",
            on_device_bucketing=on_device_bucketing)

    @property
    def sample_rate(self) -> int:
        return self.engine.sample_rate

    def synthesis(self, text: str, speaker: Optional[str] = None
                  ) -> np.ndarray:
        """-> int16 audio, reference scaling (inference.py:102-110)."""
        audio = self.engine.synthesize(text, speaker)
        if audio.size == 0:
            return audio.astype(np.int16)
        peak = max(0.01, float(np.abs(audio).max()))
        return (audio * 32767.0 / peak * 0.6).astype(np.int16)


def _load_frontend(fe_dir: str):
    """Build the char frontend from a frontend model dir.

    Two layouts: this framework's export (config.json + params.npz,
    bin/export_frontend.py) and the reference's released runtime bundle
    (final.onnx + vocab.txt + lexicon/, e.g. baker_bert_onnx.tar.gz —
    wetts/cli/frontend.py:22-32), whose initializers are imported directly.
    """
    import json

    from wetts_tpu.cli.frontend import CharFrontend
    from wetts_tpu.frontend.scorer import FrontendScorer
    from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel

    cfg_path = os.path.join(fe_dir, "config.json")
    if os.path.exists(cfg_path):
        from wetts_tpu.utils.params_io import load_params_npz

        with open(cfg_path) as f:
            d = json.load(f)
        bert = BertConfig(**d["bert"])
        model = FrontendModel(d["num_polyphones"], d["num_prosody"], bert,
                              d.get("transform_heads", 8),
                              d.get("transform_ffn", 2048))
        params = load_params_npz(os.path.join(fe_dir, "params.npz"))
    else:
        from wetts_tpu.models.bert_frontend import convert_frontend_torch
        from wetts_tpu.utils.onnx_import import read_onnx_initializers

        sd = read_onnx_initializers(os.path.join(fe_dir, "final.onnx"))
        params, meta = convert_frontend_torch(sd)
        model = FrontendModel(meta["num_polyphones"], meta["num_prosody"],
                              meta["bert"], meta["transform_heads"],
                              meta["transform_ffn"])
    scorer = FrontendScorer(model, params)
    return CharFrontend.from_dir(scorer, fe_dir)
