"""Convert torch metric-detector weights to native JAX .npz.

The reference downloads TorchScript detectors (inception, vgg16/LPIPS) and
runs them through torch (reference: metric_utils.py:41-52).  This CLI
converts a locally-supplied torch checkpoint into the weight format of the
native JAX detectors (metrics/inception_jax.py), so metric evaluation runs
on TPU with no torch in the loop:

    python -m style_big_gan_tpu.tools.convert_detector \
        --kind inception --src inception-2015-12-05.pt --out inception.npz

When the torch source model is executable on this machine, a numeric
cross-check (JAX vs torch on random images) is printed; conversion aborts if
features disagree beyond --rtol.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["inception", "vgg16"],
                   default="inception")
    p.add_argument("--src", required=True, help="torch .pt/.pth file")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--check-batch", type=int, default=4,
                   help="images for the numeric cross-check (0 = skip)")
    p.add_argument("--rtol", type=float, default=1e-2)
    args = p.parse_args(argv)

    if args.kind == "vgg16":
        from style_big_gan_tpu.metrics.vgg16_jax import convert_torch_vgg16
        params = convert_torch_vgg16(args.src, out_path=args.out)
        print(f"converted {sum(1 for _ in _walk(params))} arrays "
              f"-> {args.out}")
        return

    from style_big_gan_tpu.metrics.inception_jax import (
        InceptionV3JaxDetector, convert_torch_inception)

    params = convert_torch_inception(args.src, out_path=args.out)
    n_arr = sum(1 for _ in _walk(params))
    print(f"converted {n_arr} arrays -> {args.out}")

    if args.check_batch > 0:
        try:
            import torch
            mod = torch.jit.load(args.src, map_location="cpu").eval()
        except Exception as e:                      # noqa: BLE001
            print(f"cross-check skipped (torch source not executable: {e})")
            return
        rnd = np.random.RandomState(0)
        imgs = (rnd.rand(args.check_batch, 299, 299, 3) * 255).astype(
            np.uint8)
        det = InceptionV3JaxDetector(params=params)
        feat_jax = det(imgs)
        with torch.no_grad():
            t = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)).copy())
            feat_torch = mod(t, return_features=True).numpy()
        err = np.abs(feat_jax - feat_torch).max() / (
            np.abs(feat_torch).max() + 1e-8)
        print(f"cross-check rel err: {err:.2e}")
        assert err < args.rtol, (
            f"JAX/torch feature mismatch {err:.2e} > rtol {args.rtol}")


def _walk(node):
    for v in node.values():
        if isinstance(v, dict):
            yield from _walk(v)
        else:
            yield v


if __name__ == "__main__":
    main()
