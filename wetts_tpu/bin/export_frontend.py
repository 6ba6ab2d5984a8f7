"""Export a deployable frontend bundle, with numerics verification.

Equivalent of wetts/frontend/export_onnx.py:55-113: the reference exports
the `export_forward` ONNX graph (+ optional uint8 dynamic quantization) and
verifies torch-vs-ONNX cosine similarity on random inputs. The TPU-native
artifact is a bundle dir {config.json, params.npz, vocab.txt, lexicon/}
consumed by cli/model.py:_load_frontend; the quantization analog is a
bfloat16-cast params bundle (half HBM footprint, 2x MXU rate), and the
verification compares softmax posteriors of the exported (and bf16) bundle
against the source params by cosine similarity on random token ids.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def get_args():
    p = argparse.ArgumentParser(description="export frontend bundle")
    p.add_argument("--model_dir", required=True,
                   help="training dir with config.json + params.npz")
    p.add_argument("--vocab", required=True)
    p.add_argument("--lexicon_dir", default=None,
                   help="dir with polyphone.txt/pinyin_dict.txt/lexicon.txt")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--bf16", action="store_true",
                   help="store params as bfloat16 (the uint8-dynamic-"
                        "quantization analog; reference export_onnx.py:100)")
    p.add_argument("--verify", action="store_true",
                   help="cosine-similarity check vs source params "
                        "(reference verify_export, export_onnx.py:93-112)")
    return p.parse_args()


def cosine_verify(model, params_a, params_b, vocab_size: int,
                  seed: int = 0, n: int = 4, t: int = 48) -> float:
    """Min cosine similarity between the two param sets' posteriors."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    worst = 1.0
    for _ in range(n):
        ids = jnp.asarray(rng.integers(1, vocab_size, (1, t)), jnp.int32)
        mask = jnp.ones((1, t), jnp.int32)
        outs = []
        for p in (params_a, params_b):
            phone, prosody = model.apply({"params": p}, ids, mask)
            outs.append((jax.nn.softmax(phone, -1),
                         jax.nn.softmax(prosody, -1)))
        for a, b in zip(*outs):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            worst = min(worst, cos)
    return worst


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel
    from wetts_tpu.utils.params_io import load_params_npz, save_params_npz

    with open(os.path.join(args.model_dir, "config.json")) as f:
        mc = json.load(f)
    model = FrontendModel(mc["num_polyphones"], mc["num_prosody"],
                          BertConfig(**mc["bert"]),
                          mc.get("transform_heads", 8),
                          mc.get("transform_ffn", 2048))
    params = load_params_npz(os.path.join(args.model_dir, "params.npz"))
    out_params = params
    if args.bf16:
        out_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if np.issubdtype(x.dtype, np.floating) else x, params)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        json.dump(mc, f, indent=2)
    save_params_npz(os.path.join(args.out_dir, "params.npz"), out_params)
    shutil.copyfile(args.vocab, os.path.join(args.out_dir, "vocab.txt"))
    if args.lexicon_dir:
        dst = os.path.join(args.out_dir, "lexicon")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(args.lexicon_dir, dst)

    if args.verify:
        reloaded = load_params_npz(os.path.join(args.out_dir, "params.npz"))
        cos = cosine_verify(model, params, reloaded,
                            mc["bert"]["vocab_size"])
        print(f"verify: min cosine similarity = {cos:.6f}")
        assert cos > (0.95 if args.bf16 else 0.9999), cos
    print(f"exported frontend bundle to {args.out_dir}")


if __name__ == "__main__":
    main()
