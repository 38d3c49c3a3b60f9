"""Native JAX/TPU InceptionV3 feature detector (FID 2015 variant).

The reference evaluates FID/KID/IS through the NVlabs TorchScript
`inception-2015-12-05.pt` (reference: frechet_inception_distance.py:23-24,
inception_score.py:20-21) — the TF "inception v3 2015" graph whose public
architecture is the FID-community port (torchvision InceptionV3 with the
2015 quirks: `count_include_pad=False` average pools in the A/C/E blocks, a
max-pool in Mixed_7c's pool branch, and a 1008-way logits head).

This module is that architecture as a flax model running natively on TPU:
no torch in the eval loop, features come straight off the device.  BatchNorm
is folded into the conv weights at conversion time (inference only), so
every unit is conv+bias+relu.

Weights: this image has no egress, so parameters load from a local `.npz`
produced by `convert_torch_inception()` from a user-supplied torch FID
inception file (torchscript or state_dict).  `random_params()` gives
correctly-shaped random weights for tests and smoke runs.  Numeric parity
with the NVlabs detector must be validated against the TorchScript file
where available (tools/convert_detector.py prints a cross-check when torch
can execute the source model).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv(nn.Module):
    """conv + folded-BN bias + relu (torchvision BasicConv2d, BN folded)."""
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=(pad if isinstance(pad, str) else
                             [(pad[0], pad[0]), (pad[1], pad[1])]),
                    use_bias=True, name="conv")(x)
        return nn.relu(x)


def _avg_pool3(x, count_include_pad: bool):
    """3x3 stride-1 pad-1 average pool; count_include_pad=False divides by
    the true window size at borders (the FID-variant behavior)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


def _max_pool(x, window: int, stride: int, padding=(0, 0)):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool3(x, count_include_pad=False)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool3(x, count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"   # Mixed_7c uses max (the 2015 TF-port quirk)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, padding=(1, 1))
        else:
            bp = _avg_pool3(x, count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Feature trunk + 1008-way logits of the FID inception."""

    @nn.compact
    def __call__(self, x, return_logits: bool = False):
        # x: float NHWC in [-1, 1] at 299x299.
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max", name="Mixed_7c")(x)
        feat = jnp.mean(x, axis=(1, 2))                      # [N, 2048]
        if not return_logits:
            return feat
        logits = nn.Dense(1008, name="fc")(feat)
        return feat, logits


def preprocess(images_u8: jax.Array) -> jax.Array:
    """uint8 NHWC any-size -> [-1,1] float 299x299 (bilinear, half-pixel
    centers — the F.interpolate(align_corners=False) convention of the FID
    ports)."""
    x = images_u8.astype(jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    n, h, w, c = x.shape
    if (h, w) != (299, 299):
        # antialias=False: F.interpolate's bilinear applies no antialias
        # filter; with the default antialias=True, downscales from >299px
        # datasets would systematically drift from the reference detector.
        x = jax.image.resize(x, (n, 299, 299, c), method="bilinear",
                             antialias=False)
    return x / 127.5 - 1.0


def random_params(seed: int = 0):
    """Correctly-shaped random parameters (tests / smoke benchmarks)."""
    model = InceptionV3FID()
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy, return_logits=True)


def convert_torch_inception(path: str, out_path: Optional[str] = None):
    """Convert a torch FID-inception checkpoint (torchscript module or
    state_dict, torchvision naming: `Mixed_5b.branch1x1.conv.weight`, BN
    stats alongside) into this module's flax params, folding BatchNorm
    (eps 1e-3) into conv weight+bias.  Returns the params pytree; with
    `out_path` also writes an .npz of flat name->array."""
    import torch
    try:
        mod = torch.jit.load(path, map_location="cpu")
        sd = {k: v for k, v in mod.state_dict().items()}
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else dict(obj)
    sd = {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()
          if isinstance(v, torch.Tensor)}

    eps = 1e-3
    params: dict = {}

    def put(flat_name, w, b):
        # flax path: params / <block> [/ <branch>] / conv / {kernel, bias}
        parts = flat_name.split(".")
        node = params
        for p in parts:
            node = node.setdefault(p, {})
        node["conv"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                       for k in sd if k.endswith(".conv.weight")})
    if not prefixes:   # flat naming: <block>.weight + bn fields
        prefixes = sorted({k.rsplit(".weight", 1)[0] for k in sd
                           if k.endswith(".weight") and k.rsplit(
                               ".weight", 1)[0] + ".running_mean" in sd})
    for pre in prefixes:
        if pre + ".conv.weight" in sd:
            w = sd[pre + ".conv.weight"]
            gamma = sd.get(pre + ".bn.weight",
                           np.ones(w.shape[0], np.float32))
            beta = sd.get(pre + ".bn.bias", np.zeros(w.shape[0], np.float32))
            mean = sd[pre + ".bn.running_mean"]
            var = sd[pre + ".bn.running_var"]
        else:
            w = sd[pre + ".weight"]
            gamma = np.ones(w.shape[0], np.float32)
            beta = sd.get(pre + ".bias", np.zeros(w.shape[0], np.float32))
            mean = sd[pre + ".running_mean"]
            var = sd[pre + ".running_var"]
        scale = gamma / np.sqrt(var + eps)
        w = np.transpose(w * scale[:, None, None, None], (2, 3, 1, 0))  # HWIO
        b = beta - mean * scale
        put(pre, w, b)

    if "fc.weight" in sd:
        params["fc"] = {"kernel": jnp.asarray(sd["fc.weight"].T),
                        "bias": jnp.asarray(sd["fc.bias"])}
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
    """Load params written by convert_torch_inception(out_path=...)."""
    flat = np.load(path)
    params: dict = {}
    for name in flat.files:
        parts = name.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[name])
    return params


class InceptionV3JaxDetector:
    """Detector-protocol wrapper (metric_utils contract): uint8 NHWC ->
    np features [N, 2048] (or logits [N, 1008]), computed on device."""

    name = "inception_v3_jax"
    feature_dim = 2048
    logits_dim = 1008

    def __init__(self, path: Optional[str] = None, params=None):
        if params is None:
            if path is None:
                raise FileNotFoundError(
                    "inception_v3_jax needs converted weights (.npz from "
                    "tools/convert_detector.py) or explicit params.")
            params = load_params_npz(path)
        self.params = params
        model = InceptionV3FID()

        @jax.jit
        def run(params, x):
            return model.apply(params, preprocess(x), return_logits=True)

        self._run = run

    def __call__(self, images_u8, return_logits: bool = False) -> np.ndarray:
        return np.asarray(self.features_device(images_u8, return_logits))

    def features_device(self, images_u8, return_logits: bool = False):
        """Device-resident features (no host sync) — used by the metric
        loops to pipeline rollout + detector dispatches."""
        feat, logits = self._run(self.params, jnp.asarray(images_u8))
        return logits if return_logits else feat
