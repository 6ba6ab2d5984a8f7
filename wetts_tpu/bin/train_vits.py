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
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (multihost; "
                        "auto-detected on TPU pods when omitted)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--no_donate", action="store_true",
                   help="disable buffer donation (XLA:CPU smoke runs; "
                        "jaxlib 0.9.0 crash, tests/isolation.py)")
    p.add_argument("--plain_decoder", action="store_true",
                   help="skip the space-to-depth decoder rewrite "
                        "(compile-time over step-time, CI smoke runs)")
    return p.parse_args()


def main():
    args = get_args()
    if args.multihost:
        import jax

        # NB: must not touch jax.default_backend() here — backend init
        # before distributed.initialize() breaks process discovery
        if args.coordinator or os.environ.get("JAX_PLATFORMS",
                                              "").startswith("cpu"):
            # CPU cross-process collectives need the gloo transport
            # (two-local-process smoke tests; TPU pods use ICI/DCN)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()  # TPU-pod auto detection

    from wetts_tpu.config import Config
    from wetts_tpu.train.trainer import Trainer

    cfg = Config.from_json(args.config)
    os.makedirs(args.model_dir, exist_ok=True)
    # copy config into the run dir for reproducibility (task.py:211-216)
    shutil.copyfile(args.config,
                    os.path.join(args.model_dir, "config.json"))
    trainer = Trainer(cfg, args.model_dir, args.train_data,
                      args.phone_table, args.speaker_table, args.val_data,
                      slm_model_dir=args.slm_model,
                      donate=not args.no_donate,
                      use_fast_decoder=False if args.plain_decoder else None)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
