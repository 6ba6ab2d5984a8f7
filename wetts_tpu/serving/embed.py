"""Embedded-engine bootstrap for the native serving binaries.

The reference's native runtime executes models through an embedded
inference library (ONNX Runtime sessions owned by C++ —
runtime/core/model/onnx_model.cc:29-96). The TPU-native equivalent embeds
CPython and drives the XLA/PJRT runtime through this module: C++ owns flag
parsing, orchestration, WAV I/O, and the HTTP server
(native/src/{tts_main,http_server_main}.cc) and calls the functions below
via the CPython C API (native/src/embed_engine.cc).

All return values crossing the ABI are plain bytes/ints so the C++ side
never needs numpy headers.
"""

from __future__ import annotations

import os

import numpy as np

_MODEL = None


def _apply_platform_env() -> None:
    """Honor JAX_PLATFORMS for the embedded interpreter.

    Managed TPU images may force-register their backend through
    `jax.config` in sitecustomize, which overrides the env var; serving
    binaries must still be steerable to CPU (e.g. in tests or on hosts
    whose chip is owned by a trainer), so re-apply the env var on top.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def init(model_dir: str) -> int:
    """Load a model bundle directory; returns the sample rate.

    Env steering (the native binaries own only flag files, so serving
    options cross the ABI as environment variables):
    WETTS_PRECISION={f32,bf16,int8} and
    WETTS_ON_DEVICE_BUCKETING={auto,1,0} map to the same options as the
    Python CLI's --precision / --on-device-bucketing (Model validates the
    precision value; a typo raises instead of silently serving f32).
    """
    global _MODEL
    _apply_platform_env()
    from wetts_tpu.cli.model import Model

    odb_env = os.environ.get("WETTS_ON_DEVICE_BUCKETING", "auto").lower()
    if odb_env in ("auto", ""):
        odb = "auto"  # engine probes the host<->device RTT
    else:
        odb = odb_env not in ("0", "false")
    _MODEL = Model(
        model_dir,
        precision=os.environ.get("WETTS_PRECISION", "f32"),
        on_device_bucketing=odb)
    return int(_MODEL.sample_rate)


def synthesize(text: str, name: str = "") -> bytes:
    """Full synthesis -> little-endian int16 PCM bytes.

    Same int16 scaling as the PyTorch inference script
    (wetts/vits/inference.py:102-110, mirrored by cli/model.py).
    """
    if _MODEL is None:
        raise RuntimeError("embed.init(model_dir) must be called first")
    audio = _MODEL.synthesis(text, name or None)
    return audio.astype("<i2").tobytes()


def stream_synthesize(text: str, name: str = ""):
    """Streaming synthesis -> iterator of int16 PCM byte chunks.

    Chunked-decoder semantics of TTS::StreamSynthesis
    (runtime/core/model/tts.cc:91-128).
    """
    if _MODEL is None:
        raise RuntimeError("embed.init(model_dir) must be called first")
    for piece in _MODEL.engine.stream_synthesize(text, name or None):
        pcm = np.clip(piece, -1.0, 1.0) * 32767.0
        yield pcm.astype("<i2").tobytes()
