"""LPIPS-VGG16 TorchScript wrapper (exact reference numerics path).

The reference PPL/PR/projector download the NVlabs ``vgg16.pt`` TorchScript
pickle (reference: perceptual_path_length.py:88-90, metric_utils.py:41-52)
whose contract is ``model(uint8/float [0,255] NCHW, resize_images=...,
return_lpips=True) -> LPIPS embedding`` with squared-L2 distance == LPIPS.
This wrapper loads such a file and exposes the same detector protocol the
native JAX port (metrics/vgg16_jax.py) implements, so the two can be
cross-checked number-for-number (tests/test_metric_number_parity.py).

The projector needs a *differentiable* embedding and therefore uses the
native JAX detector only.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class VGG16LPIPSTorchDetector:
    name = "vgg16_lpips_torch"

    def __init__(self, path: Optional[str] = None):
        if path is None or not os.path.isfile(path):
            raise FileNotFoundError(
                "vgg16 TorchScript weights not found; pass the NVlabs "
                "vgg16.pt path via detector_path.")
        import torch
        self._torch = torch
        self.model = torch.jit.load(path).eval()

    def _nchw(self, images) -> np.ndarray:
        x = np.asarray(images, np.float32)
        if x.shape[-1] in (1, 3):                  # NHWC -> NCHW
            x = np.transpose(x, (0, 3, 1, 2))
        if x.shape[1] == 1:
            x = np.repeat(x, 3, axis=1)
        return np.ascontiguousarray(x)

    def __call__(self, images_u8, return_logits: bool = False) -> np.ndarray:
        """Resized-256 LPIPS embedding — the generic feature path, matching
        VGG16LPIPSJaxDetector.features_device."""
        del return_logits   # vgg16 has no logits head here
        torch = self._torch
        with torch.no_grad():
            t = torch.from_numpy(self._nchw(images_u8))
            return self.model(t, resize_images=True,
                              return_lpips=True).numpy()

    def lpips_embed(self, images) -> np.ndarray:
        """Native-resolution embedding (the PPL contract; reference feeds
        vgg16 with resize_images=False, perceptual_path_length.py:90)."""
        torch = self._torch
        with torch.no_grad():
            t = torch.from_numpy(self._nchw(images))
            return self.model(t, resize_images=False,
                              return_lpips=True).numpy()
