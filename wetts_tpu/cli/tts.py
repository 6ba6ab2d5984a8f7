"""Console entry: `python -m wetts_tpu.cli.tts --text ... --wav out.wav`.

Behavioral parity target: wetts/cli/tts.py:30-36 + setup.py:13-15 console
script — synthesize `--text` to `--wav` with optional `--speaker`.
"""

from __future__ import annotations

import argparse


def get_args():
    parser = argparse.ArgumentParser(description="TTS synthesis (TPU-native)")
    parser.add_argument("--text", required=True, help="text to synthesize")
    parser.add_argument("--wav", required=True, help="output wav path")
    parser.add_argument("--model-dir", default=None,
                        help="model bundle directory (see cli/model.py); "
                             "when omitted, the pretrained multilingual "
                             "bundle is fetched from the hub "
                             "(wetts/cli/tts.py:30-36 zero-config path)")
    parser.add_argument("--speaker", default=None, help="speaker name")
    parser.add_argument("--precision", default="f32",
                        choices=["f32", "bf16", "int8"],
                        help="decoder serving precision: f32 exact, bf16 "
                             "half, int8 dynamically-quantized convs (the "
                             "analog of the reference's optional uint8 "
                             "quantized export, export_onnx.py --quant)")
    parser.add_argument("--on-device-bucketing", default="auto",
                        choices=["auto", "on", "off"],
                        help="single-dispatch synthesis: the decode-frame "
                             "bucket is chosen on-device (lax.switch) "
                             "instead of via a host sync between encode "
                             "and decode — worth ~30-50ms/request on "
                             "remote-attached chips, at the cost of a "
                             "larger one-time compile per text bucket. "
                             "auto (default) probes the host<->device RTT "
                             "and enables it on remote-attached chips")
    return parser.parse_args()


def _odb(value: str):
    return "auto" if value == "auto" else value == "on"


def main():
    args = get_args()
    from wetts_tpu.cli.model import Model
    from wetts_tpu.utils.wav import write_wav

    model_dir = args.model_dir
    if model_dir is None:
        from wetts_tpu.cli.hub import get_default_model_dir

        model_dir = get_default_model_dir()
    model = Model(model_dir, precision=args.precision,
                  on_device_bucketing=_odb(args.on_device_bucketing))
    audio = model.synthesis(args.text, args.speaker)
    write_wav(args.wav, audio, model.sample_rate)
    print(f"wrote {args.wav} ({audio.shape[0] / model.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
