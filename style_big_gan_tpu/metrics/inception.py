"""InceptionV3 feature detector.

The reference downloads the NVlabs TorchScript `inception-2015-12-05.pt`
(reference: frechet_inception_distance.py:23-24).  This environment has no
egress, so the detector resolves from a *local* weights file:

* if `path` points at the NVlabs TorchScript pickle, it is loaded with
  torch (CPU) and wrapped — exact feature parity with the reference;
* a native JAX port fed by converted weights is the intended fast path
  (tracked for a later round; the wrapper below establishes the contract).

Tests and smoke benchmarks use the 'fake_v1' detector instead
(metric_utils.py), which needs no weights.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class InceptionV3Detector:
    name = "inception_v3"
    feature_dim = 2048
    logits_dim = 1008

    def __init__(self, path: Optional[str] = None):
        if path is None or not os.path.isfile(path):
            raise FileNotFoundError(
                "InceptionV3 weights not found. Download "
                "inception-2015-12-05.pt on a machine with network access and "
                "pass its path via metric options (detector_path=...).")
        import torch
        self._torch = torch
        self.model = torch.jit.load(path).eval()

    def __call__(self, images_u8, return_logits: bool = False) -> np.ndarray:
        torch = self._torch
        x = np.asarray(images_u8)
        if x.shape[-1] in (1, 3):                 # NHWC -> NCHW
            x = np.transpose(x, (0, 3, 1, 2))
        if x.shape[1] == 1:
            x = np.repeat(x, 3, axis=1)
        with torch.no_grad():
            t = torch.from_numpy(np.ascontiguousarray(x))
            feats = self.model(t, return_features=not return_logits)
        return feats.numpy()
