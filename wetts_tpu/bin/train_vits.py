"""VITS training entry.

Equivalent of wetts/vits/train.py's CLI (reference utils/task.py:172-237
argument schema): JSON config + manifests + phone/speaker tables; multi-host
TPU pods initialize via jax.distributed (replacing torchrun+NCCL).

Usage:
    python -m wetts_tpu.bin.train_vits -c config.json -m exp/v1 \
        --train_data data/train.txt --val_data data/val.txt \
        --phone_table data/phones.txt --speaker_table data/speaker.txt
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def get_args():
    p = argparse.ArgumentParser(description="train VITS (TPU)")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-m", "--model_dir", required=True)
    p.add_argument("--train_data", required=True)
    p.add_argument("--val_data", default=None)
    p.add_argument("--phone_table", required=True)
    p.add_argument("--speaker_table", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--slm_model", default=None,
                   help="local HF WavLM dir for the SLM discriminator")
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference-CLI compatibility")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for TPU pods")
    return p.parse_args()


def main():
    args = get_args()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from wetts_tpu.config import Config
    from wetts_tpu.train.trainer import Trainer

    cfg = Config.from_json(args.config)
    os.makedirs(args.model_dir, exist_ok=True)
    # copy config into the run dir for reproducibility (task.py:211-216)
    shutil.copyfile(args.config,
                    os.path.join(args.model_dir, "config.json"))
    trainer = Trainer(cfg, args.model_dir, args.train_data,
                      args.phone_table, args.speaker_table, args.val_data,
                      slm_model_dir=args.slm_model)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
