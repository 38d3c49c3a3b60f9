"""Training entry point (installed as the ``sbg-train`` console script).

Usage (identical UX to the reference, reference: starter.py:12-45 +
Readme.md:26-30):

    sbg-train exp.config_dir=configs/ exp.config=dcgan.yaml \
        exp.name=my_run [gen.batch=64 any.dotted.override=value ...]

``exp.config_dir`` defaults to the configs/ directory shipped beside the
package (utils/paths.py), so the shipped recipes work from any CWD after
``pip install -e .``.

One SPMD process drives the whole device mesh — there is no
torch.multiprocessing.spawn equivalent; multi-host runs launch this script
once per host (jax.distributed handles rendezvous).
"""

import os


def main(argv=None):
    from style_big_gan_tpu import registries
    from style_big_gan_tpu.arguments import load_config

    # Some PJRT plugins (e.g. the axon TPU tunnel) ignore JAX_PLATFORMS;
    # SBG_PLATFORM=cpu forces the platform via jax.config before first
    # backend use, so CPU smoke runs work even with such a plugin installed.
    plat = os.environ.get("SBG_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
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
