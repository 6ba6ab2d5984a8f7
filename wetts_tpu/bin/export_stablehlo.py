"""Export serialized StableHLO inference graphs (framework-independent).

The reference ships ONNX graphs any runtime can serve
(wetts/vits/export_onnx.py:54-189: full graph + streaming encoder/decoder
split with weights embedded). The TPU-native analog is jax.export: each
graph is lowered to StableHLO with the parameters baked in as constants and
serialized to a portable artifact that any StableHLO consumer (PJRT
runtimes, IREE, XLA AOT) — or jax.export.deserialize — can load without
this framework or its Python model code.

Artifacts (into --out_dir):
- encoder_t{T}.stablehlo  : (x[i32 1,T], x_len[i32 1], sid[i32 1],
                             seed[i32]) -> (z[1,F,C], y_length[i32 1])
  per text bucket T (noise is derived from the seed input, making the
  graph a pure function — the reference's ONNX export threads noise the
  same way via the `scales` input convention).
- decoder_f{F}.stablehlo  : (z[1,F,C], sid[i32 1]) -> audio[1, F*hop, 1]
  per frame bucket F (the streaming z-split boundary, models.py:333-363).
- manifest.json           : bucket tables, sample rate, hop, io docs.

Buckets mirror serving/engine.py; the encoder/decoder split point at z is
exactly the reference's streaming ONNX boundary, so chunked streaming works
on the exported pair with the same chunk/pad math.
"""

from __future__ import annotations

import argparse
import json
import os


def get_args():
    p = argparse.ArgumentParser(description="export StableHLO graphs")
    p.add_argument("--cfg", required=True)
    p.add_argument("--model_dir", required=True,
                   help="orbax/npz/pth checkpoint or bundle dir")
    p.add_argument("--phone_table", required=True)
    p.add_argument("--speaker_table", default=None)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--text_buckets", default="32,64,128",
                   help="comma-separated text-length buckets")
    p.add_argument("--frame_buckets", default="96,192,384",
                   help="comma-separated decoder frame buckets")
    p.add_argument("--noise_scale", type=float, default=0.667)
    p.add_argument("--length_scale", type=float, default=1.0)
    p.add_argument("--noise_scale_w", type=float, default=0.8)
    return p.parse_args()


def export_graphs(cfg, variables, text_buckets, frame_buckets,
                  scales=(0.667, 1.0, 0.8), frames_per_text=12):
    """Returns {name: (serialized_bytes, io_doc)} for every bucket."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from wetts_tpu.models.synthesizer import Synthesizer

    model = Synthesizer.from_config(cfg)
    ns, ls, nsw = scales
    out = {}

    for t in text_buckets:
        max_frames = t * frames_per_text

        def encode(x, xl, sid, seed, _mf=max_frames):
            z, y_len, y_mask, attn, g = model.apply(
                variables, x, xl, sid, ns, ls, nsw, _mf,
                method=Synthesizer.encode_infer,
                rngs={"noise": jax.random.PRNGKey(seed)})
            return z, y_len

        args = (jnp.zeros((1, t), jnp.int32), jnp.ones((1,), jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.int32(0))
        exp = jexport.export(jax.jit(encode))(*args)
        out[f"encoder_t{t}"] = (exp.serialize(), {
            "in": ["x i32[1,%d]" % t, "x_length i32[1]", "sid i32[1]",
                   "seed i32[]"],
            "out": ["z f32[1,%d,%d]" % (max_frames, cfg.model.inter_channels),
                    "y_length i32[1]"],
        })

    hop = 1
    for r in cfg.model.upsample_rates:
        hop *= r
    if cfg.model.vocoder_type == "vocos":
        hop = cfg.model.vocos_istft_config["hop_length"]
    for f in frame_buckets:
        def decode(z, sid):
            return model.apply(variables, z, None, sid,
                               method=Synthesizer.decode)

        args = (jnp.zeros((1, f, cfg.model.inter_channels)),
                jnp.zeros((1,), jnp.int32))
        exp = jexport.export(jax.jit(decode))(*args)
        out[f"decoder_f{f}"] = (exp.serialize(), {
            "in": ["z f32[1,%d,%d]" % (f, cfg.model.inter_channels),
                   "sid i32[1]"],
            "out": ["audio f32[1,%d,1]" % (f * hop)],
        })
    return out


def main():
    args = get_args()
    from wetts_tpu.cli.model import load_params
    from wetts_tpu.config import Config
    from wetts_tpu.data.dataset import read_table

    cfg = Config.from_json(args.cfg)
    phone2id = read_table(args.phone_table)
    cfg.num_phones = max(cfg.num_phones, max(phone2id.values()) + 1)
    if args.speaker_table:
        sp = read_table(args.speaker_table)
        cfg.num_speakers = max(cfg.num_speakers, max(sp.values()) + 1)
    variables = load_params(args.model_dir, cfg)

    text_buckets = [int(x) for x in args.text_buckets.split(",")]
    frame_buckets = [int(x) for x in args.frame_buckets.split(",")]
    graphs = export_graphs(
        cfg, variables, text_buckets, frame_buckets,
        scales=(args.noise_scale, args.length_scale, args.noise_scale_w))

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = {
        "format": "stablehlo (jax.export serialization)",
        "sample_rate": cfg.data.sampling_rate,
        "hop_length": cfg.data.hop_length,
        "text_buckets": text_buckets,
        "frame_buckets": frame_buckets,
        "scales": [args.noise_scale, args.length_scale,
                   args.noise_scale_w],
        "graphs": {},
    }
    for name, (blob, io_doc) in graphs.items():
        path = os.path.join(args.out_dir, name + ".stablehlo")
        with open(path, "wb") as fh:
            fh.write(blob)
        manifest["graphs"][name] = dict(io_doc, bytes=len(blob))
        print(f"wrote {path} ({len(blob)} bytes)")
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    print(f"exported StableHLO graphs to {args.out_dir}")


if __name__ == "__main__":
    main()
