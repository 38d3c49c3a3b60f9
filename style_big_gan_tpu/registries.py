"""Central plug-in registries.

One place defines every extension point of the framework (reference: the
per-file registries in train_parts/*.py).  Defining them centrally avoids
import cycles between models, losses and trainers.
"""

from style_big_gan_tpu.utils.registry import ClassRegistry

generators = ClassRegistry()          # name -> flax Module class   (G)
discriminators = ClassRegistry()      # name -> flax Module class   (D)
losses = ClassRegistry()              # name -> adversarial loss fn
losses_arch = ClassRegistry()         # name -> loss architecture
generator_regs = ClassRegistry()      # name -> generator regularizer
discriminator_regs = ClassRegistry()  # name -> discriminator regularizer
augmentations = ClassRegistry()       # name -> augmentation pipeline
datasets = ClassRegistry()            # name -> dataset class
dataloaders = ClassRegistry()         # name -> dataloader class
optimizers = ClassRegistry()          # name -> optax factory
trainers = ClassRegistry()            # name -> trainer class
metrics = ClassRegistry()             # name -> metric fn


def _import_all() -> None:
    """Import every module that registers components (idempotent)."""
    import importlib
    for mod in [
        "style_big_gan_tpu.models.dcgan",
        "style_big_gan_tpu.models.resnet_gan",
        "style_big_gan_tpu.models.stylegan2",
        "style_big_gan_tpu.models.biggan",
        "style_big_gan_tpu.train.losses",
        "style_big_gan_tpu.train.loss_arch",
        "style_big_gan_tpu.train.regularizers",
        "style_big_gan_tpu.train.optim",
        "style_big_gan_tpu.train.trainer",
        "style_big_gan_tpu.augment.ada",
        "style_big_gan_tpu.data.dataset",
        "style_big_gan_tpu.data.dataloader",
        "style_big_gan_tpu.metrics.metric_main",
    ]:
        importlib.import_module(mod)
