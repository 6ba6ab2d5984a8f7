"""Voice conversion: re-speak a reference waveform as another speaker.

Equivalent of SynthesizerTrn.voice_conversion (reference models.py:369-376):
posterior-encode the source audio with the source speaker, flow to the prior,
flow back with the target speaker, decode.
"""

from __future__ import annotations

import argparse


def get_args():
    p = argparse.ArgumentParser(description="VITS voice conversion (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--phone_table", required=True)
    p.add_argument("--speaker_table", required=True)
    p.add_argument("--wav", required=True, help="source waveform")
    p.add_argument("--source_speaker", required=True)
    p.add_argument("--target_speaker", required=True)
    p.add_argument("--out", required=True)
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wetts_tpu.cli.model import load_params
    from wetts_tpu.config import Config
    from wetts_tpu.data.dataset import read_table
    from wetts_tpu.models.synthesizer import Synthesizer
    from wetts_tpu.train.step import compute_spec
    from wetts_tpu.utils.wav import read_wav, resample_poly, write_wav

    cfg = Config.from_json(args.cfg)
    phone2id = read_table(args.phone_table)
    speaker2id = read_table(args.speaker_table)
    cfg.num_phones = max(cfg.num_phones, max(phone2id.values()) + 1)
    cfg.num_speakers = max(cfg.num_speakers, max(speaker2id.values()) + 1)
    params = load_params(args.model_dir, cfg)
    model = Synthesizer.from_config(cfg)

    wav, rate = read_wav(args.wav)
    if wav.ndim > 1:
        wav = wav[0]
    if rate != cfg.data.sampling_rate:
        wav = resample_poly(wav, rate, cfg.data.sampling_rate)
    hop = cfg.data.hop_length
    n = (len(wav) // hop) * hop
    wav = wav[:n]
    spec = compute_spec(cfg, jnp.asarray(wav[None, :]))
    t_spec = spec.shape[1]

    sid_src = jnp.asarray([speaker2id[args.source_speaker]], jnp.int32)
    sid_tgt = jnp.asarray([speaker2id[args.target_speaker]], jnp.int32)
    o, _, _ = model.apply(
        params, spec, jnp.asarray([t_spec], jnp.int32), sid_src, sid_tgt,
        method=Synthesizer.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(0)})
    audio = np.asarray(o[0, :, 0])
    peak = max(0.01, float(np.abs(audio).max()))
    write_wav(args.out, audio * 0.6 / peak, cfg.data.sampling_rate)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
