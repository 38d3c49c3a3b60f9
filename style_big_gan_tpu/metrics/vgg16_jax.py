"""Native JAX VGG16 + LPIPS embedding detector.

The reference's PPL metric and projector use the NVlabs TorchScript
`vgg16.pt`, which returns an "LPIPS embedding": per-layer unit-normalized
VGG features, scaled by the learned LPIPS linear weights and by
1/sqrt(H*W), concatenated — so the squared L2 between two embeddings IS the
LPIPS-VGG distance (reference: perceptual_path_length.py:54-60,
projector.py:60-68).  `metrics/metric_main.py::_compute_ppl` and
`tools/projector.py` consume exactly that contract.

This module is the standard LPIPS-VGG pipeline as flax: uint8 -> [-1,1] ->
LPIPS scaling layer -> VGG16 conv trunk -> taps (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3) -> channel-unit-normalize -> 1x1 linear weights ->
flatten/concat.  Weights load from an .npz converted from a torch LPIPS
('vgg' net) or torchvision VGG16 checkpoint via `convert_torch_vgg16()`;
`random_params()` supplies shaped random weights for tests.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# conv plan: (name, out_ch); 'M' = 2x2 maxpool.  Taps marked by layer name.
_VGG_PLAN = [("conv1_1", 64), ("conv1_2", 64), "M",
             ("conv2_1", 128), ("conv2_2", 128), "M",
             ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
             ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
             ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)]
_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")
_TAP_CH = (64, 128, 256, 512, 512)

# LPIPS ScalingLayer constants (richzhang/PerceptualSimilarity), applied to
# [-1, 1] inputs.
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16LPIPS(nn.Module):
    """Returns the LPIPS embedding [N, sum_l C_l*H_l*W_l reduced] such that
    ||e0 - e1||^2 == LPIPS-VGG distance."""

    @nn.compact
    def __call__(self, x):
        # x: float NHWC in [-1, 1].
        x = (x - _SHIFT) / _SCALE
        taps = []
        for item in _VGG_PLAN:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                continue
            name, ch = item
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=name)(x))
            if name in _TAPS:
                taps.append(x)
        pieces = []
        for i, t in enumerate(taps):
            n, h, w, c = t.shape
            t = t / jnp.sqrt(jnp.sum(jnp.square(t), axis=-1,
                                     keepdims=True) + 1e-10)
            # lin is stored in sqrt-space: richzhang LPIPS multiplies SQUARED
            # feature diffs by learned weights w, so the embedding must scale
            # normalized features by sqrt(w) for ||e0-e1||^2 == LPIPS
            # (convert_torch_vgg16 stores np.sqrt(|w|)).
            lin = self.param(f"lin{i}", nn.initializers.ones, (c,))
            t = t * jnp.abs(lin) / np.sqrt(h * w)
            pieces.append(t.reshape(n, -1))
        return jnp.concatenate(pieces, axis=1)


def preprocess(images_u8: jax.Array, size: int = 256) -> jax.Array:
    """uint8 NHWC -> [-1,1] float at `size` (the reference feeds 256px to
    vgg16, projector.py:63-66)."""
    x = images_u8.astype(jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        # Non-antialiased bilinear: the reference detector resizes with
        # F.interpolate(align_corners=False) semantics, no antialias filter.
        x = jax.image.resize(x, (n, size, size, c), method="bilinear",
                             antialias=False)
    return x / 127.5 - 1.0


def random_params(seed: int = 0, res: int = 64):
    model = VGG16LPIPS()
    return model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, res, res, 3), jnp.float32))


def convert_torch_vgg16(path: str, out_path: Optional[str] = None):
    """Convert a torch LPIPS ('vgg') checkpoint — richzhang naming
    (net.slice*.N.weight, lin*.model.1.weight) or plain torchvision
    features.N.weight + optional lins — into this module's params."""
    import torch
    try:
        mod = torch.jit.load(path, map_location="cpu")
        sd = mod.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else dict(obj)
    sd = {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()
          if isinstance(v, torch.Tensor)}

    # Collect conv (weight, bias) pairs in trunk order.
    convs = []
    if any(k.startswith("features.") for k in sd):
        idxs = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("features.") and
                       k.endswith(".weight")})
        for i in idxs:
            convs.append((sd[f"features.{i}.weight"],
                          sd.get(f"features.{i}.bias")))
    else:
        # richzhang naming: [net.]slice<g>.<idx>.weight — order by (g, idx).
        def slice_key(k):
            parts = k.split(".")
            g = next(p for p in parts if p.startswith("slice"))
            return (int(g[len("slice"):]), int(parts[parts.index(g) + 1]))
        slice_keys = sorted(
            (k for k in sd if k.endswith(".weight") and sd[k].ndim == 4
             and any(p.startswith("slice") for p in k.split("."))),
            key=slice_key)
        for k in slice_keys:
            convs.append((sd[k], sd.get(k.replace(".weight", ".bias"))))
    conv_names = [it[0] for it in _VGG_PLAN if it != "M"]
    if len(convs) < len(conv_names):
        # Generic fallback (TorchScript files with neither torchvision nor
        # richzhang naming): take the spatial conv weights in state_dict
        # (module) order — VGG16's trunk is 13 3x3 convs; LPIPS lin heads
        # are 1x1 and excluded by the spatial filter.
        convs = [(sd[k], sd.get(k[:-len(".weight")] + ".bias"))
                 for k in sd if k.endswith(".weight") and sd[k].ndim == 4
                 and sd[k].shape[2] > 1 and sd[k].shape[3] > 1]
    assert len(convs) >= len(conv_names), \
        f"found {len(convs)} convs, need {len(conv_names)}"

    params: dict = {}
    for (w, b), name in zip(convs, conv_names):
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b if b is not None
                                else np.zeros(w.shape[0], np.float32))}

    import re as _re
    lin_keys = sorted(k for k in sd if "lin" in k and k.endswith(".weight")
                      and sd[k].ndim == 4)
    if not lin_keys:
        # Buffer-style lin heads ("lin0".."lin4", 1-D per-channel weights).
        lin_keys = sorted((k for k in sd if _re.search(r"lin\d+$", k)
                           and sd[k].ndim == 1),
                          key=lambda k: int(_re.search(r"(\d+)$", k).group(1)))
    for i, c in enumerate(_TAP_CH):
        if i < len(lin_keys):
            # Torch LPIPS lin weights multiply SQUARED diffs; the embedding
            # needs their square root (see VGG16LPIPS.__call__).
            lin = np.sqrt(np.abs(sd[lin_keys[i]]).reshape(-1))
        else:
            lin = np.ones(c, np.float32) / np.sqrt(len(_TAP_CH))
        params[f"lin{i}"] = jnp.asarray(lin.astype(np.float32))

    out = {"params": params}
    if out_path:
        flat = {}

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                else:
                    flat["/".join(path + (k,))] = np.asarray(v)
        walk(out, ())
        np.savez(out_path, **flat)
    return out


def load_params_npz(path: str):
    flat = np.load(path)
    params: dict = {}
    for name in flat.files:
        parts = name.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[name])
    return params


class VGG16LPIPSJaxDetector:
    """Detector-protocol wrapper: uint8 NHWC -> np LPIPS embedding."""

    name = "vgg16_lpips_jax"

    def __init__(self, path: Optional[str] = None, params=None,
                 size: int = 256):
        if params is None:
            if path is None:
                raise FileNotFoundError(
                    "vgg16_lpips_jax needs converted weights (.npz from "
                    "tools/convert_detector.py) or explicit params.")
            params = load_params_npz(path)
        self.params = params
        self.size = size
        model = VGG16LPIPS()

        @jax.jit
        def run(params, x):
            return model.apply(params, preprocess(x, size))

        @jax.jit
        def run_native(params, x):
            # No resize: the reference PPL feeds native-resolution images
            # (vgg16(..., resize_images=False), perceptual_path_length.py:90).
            x = x.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            return model.apply(params, x / 127.5 - 1.0)

        self._run = run
        self._run_native = run_native
        # Differentiable feature fn for the projector (float [-1,1] input).
        self.embed = lambda x: model.apply(self.params, x)

    def __call__(self, images_u8, return_logits: bool = False) -> np.ndarray:
        return np.asarray(self.features_device(images_u8, return_logits))

    def features_device(self, images_u8, return_logits: bool = False):
        del return_logits   # vgg16 has no logits head here
        return self._run(self.params, jnp.asarray(images_u8))

    def lpips_embed_device(self, images):
        """Native-resolution embedding for PPL (uint8 or float [0,255])."""
        return self._run_native(self.params, jnp.asarray(images))
