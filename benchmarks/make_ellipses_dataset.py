#!/usr/bin/env python
"""Generate the structured synthetic 'ellipses' dataset (learning sanity
fixture): 32x32 images of one colored ellipse (class = color) over a
vertical gradient background, with dataset.json labels.

Used to verify training dynamics end-to-end without external data (no
egress in this environment): DCGAN reaches fake-FID ~0.9 in 400 kimg and
SG2-ADA produces clean class-conditional samples (see BASELINE.md).

    python benchmarks/make_ellipses_dataset.py [--out data/ellipses32.zip]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile

import numpy as np
import PIL.Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/ellipses32.zip")
    p.add_argument("--num", type=int, default=2000)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--res", type=int, default=32)
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rnd = np.random.RandomState(args.seed)
    r = args.res
    with zipfile.ZipFile(args.out, "w") as z:
        labels = []
        yy, xx = np.mgrid[0:r, 0:r]
        for i in range(args.num):
            img = np.zeros((r, r, 3), np.uint8)
            base = rnd.randint(0, 80, 3)
            grad = (yy * (64.0 / r)).astype(np.int64)   # 0..63 over height
            img[:] = np.clip(base[None, None, :] + grad[:, :, None], 0, 255)
            cls = i % 4
            cy, cx = rnd.randint(r // 4, 3 * r // 4, 2)
            ry, rx = rnd.randint(r // 8, r * 5 // 16, 2)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            col = np.array([0, 0, 0])
            col[cls % 3] = 200 + rnd.randint(0, 55)
            img[mask] = col
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            fname = f"img{i:05d}.png"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, cls])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    print(f"wrote {args.out} ({args.num} images, 4 classes)")


if __name__ == "__main__":
    main()
