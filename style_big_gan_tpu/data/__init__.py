"""Data layer: datasets, host-side sharded loaders, native (C++) pipeline.

TPU-native counterpart of the reference data stack
(reference: train_parts/datasets.py, train_parts/dataloaders.py,
stylegan2ada/torch_utils/misc.py:109-140).  Images are HWC uint8 on the
host (NHWC is the TPU-friendly layout; the reference uses CHW for cuDNN).
"""

from style_big_gan_tpu.data.dataset import Dataset, ImageFolderDataset
from style_big_gan_tpu.data.dataloader import (BasicDataloader,
                                               infinite_sampler,
                                               normalize_images)

__all__ = [
    "Dataset", "ImageFolderDataset", "BasicDataloader", "infinite_sampler",
    "normalize_images",
]
