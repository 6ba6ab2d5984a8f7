"""Per-utterance inference from a test manifest, with RTF reporting.

Equivalent of wetts/vits/inference.py:46-114: loads checkpoint + tables,
synthesizes each `wav|speaker|phones` line at noise_scale 0.667 /
noise_scale_w 0.8 / length_scale 1, prints RTF, writes int16-scaled wavs
(audio * 32767 / max(0.01, |a|max) * 0.6).
"""

from __future__ import annotations

import argparse
import os
import time


def get_args():
    p = argparse.ArgumentParser(description="VITS inference (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--model_dir", required=True,
                   help="training dir holding the Orbax checkpoint")
    p.add_argument("--phone_table", required=True)
    p.add_argument("--speaker_table", default=None)
    p.add_argument("--test_file", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--precision", default="f32",
                   choices=["f32", "bf16", "int8"],
                   help="decoder precision (int8 = dynamic-quantized convs)")
    p.add_argument("--noise_scale", type=float, default=0.667)
    p.add_argument("--noise_scale_w", type=float, default=0.8)
    p.add_argument("--length_scale", type=float, default=1.0)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler (TensorBoard/Perfetto) "
                        "trace of the synthesis loop")
    p.add_argument("--on_device_bucketing", default="auto",
                   choices=["auto", "on", "off"],
                   help="single-dispatch synthesis: decode-frame bucket "
                        "chosen on-device by lax.switch (no host sync "
                        "between encode and decode; see serving engine). "
                        "auto probes the host<->device RTT and enables it "
                        "on remote-attached chips")
    return p.parse_args()


def main():
    args = get_args()
    import numpy as np

    from wetts_tpu.cli.model import load_params
    from wetts_tpu.config import Config
    from wetts_tpu.data.dataset import read_table
    from wetts_tpu.serving.engine import SynthesisEngine
    from wetts_tpu.utils.wav import write_wav

    cfg = Config.from_json(args.cfg)
    phone2id = read_table(args.phone_table)
    speaker2id = read_table(args.speaker_table) if args.speaker_table else None
    cfg.num_phones = max(cfg.num_phones, max(phone2id.values()) + 1)
    if speaker2id:
        cfg.num_speakers = max(cfg.num_speakers,
                               max(speaker2id.values()) + 1)
    params = load_params(args.model_dir, cfg)
    engine = SynthesisEngine(
        cfg, params, phone2id, speaker2id, frontend=None,
        noise_scale=args.noise_scale, length_scale=args.length_scale,
        noise_scale_w=args.noise_scale_w,
        half=args.precision == "bf16", quantize=args.precision == "int8",
        on_device_bucketing=("auto" if args.on_device_bucketing == "auto"
                             else args.on_device_bucketing == "on"))

    os.makedirs(args.outdir, exist_ok=True)
    sr = cfg.data.sampling_rate
    total_audio_s = 0.0
    total_wall = 0.0
    import contextlib

    if args.profile:
        from wetts_tpu.utils.profiling import device_trace

        trace = device_trace(args.profile)
    else:
        trace = contextlib.nullcontext()
    with trace, open(args.test_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 3:
                continue
            wav_path, speaker, phones = parts[0], parts[1], parts[2]
            name = os.path.splitext(os.path.basename(wav_path))[0]
            t0 = time.perf_counter()
            audio = engine.synthesize(phones, speaker)
            dt = time.perf_counter() - t0
            audio_s = len(audio) / sr
            total_audio_s += audio_s
            total_wall += dt
            rtf = dt / max(audio_s, 1e-6)
            print(f"{name}: {audio_s:.2f}s audio in {dt:.3f}s, RTF {rtf:.4f}")
            peak = max(0.01, float(np.abs(audio).max())) if audio.size else 1.0
            write_wav(os.path.join(args.outdir, name + ".wav"),
                      (audio * 0.6 / peak), sr)
    if total_audio_s > 0:
        print(f"TOTAL: {total_audio_s:.1f}s audio, overall RTF "
              f"{total_wall / total_audio_s:.4f} "
              f"({total_audio_s / max(total_wall, 1e-9):.1f}x realtime)")
        # per-stage breakdown (reference prints per-stage wall times inside
        # infer, models.py:242-279)
        print(f"stages: {engine.stage_times.summary()}")


if __name__ == "__main__":
    main()
