#!/usr/bin/env python
"""Training entry point.

Usage (identical UX to the reference, reference: starter.py:12-45 +
Readme.md:26-30):

    python starter.py exp.config_dir=configs/ exp.config=dcgan.yaml \
        exp.name=my_run [gen.batch=64 any.dotted.override=value ...]

One SPMD process drives the whole device mesh — there is no
torch.multiprocessing.spawn equivalent; multi-host runs launch this script
once per host (jax.distributed handles rendezvous).
"""

import os
import sys

from style_big_gan_tpu import registries
from style_big_gan_tpu.arguments import load_config


def main(argv=None):
    # Multi-host rendezvous (replaces the reference's NCCL file rendezvous,
    # trainers.py:479-496): launch this script once per host with
    # SBG_DIST=1 and the standard JAX coordinator env vars set.
    if os.environ.get("SBG_DIST") == "1":
        import jax
        jax.distributed.initialize()
    config = load_config(argv)
    registries._import_all()
    trainer_cls = registries.trainers[str(config.exp.trainer)]
    trainer = trainer_cls()
    trainer.run(config)


if __name__ == "__main__":
    main()
