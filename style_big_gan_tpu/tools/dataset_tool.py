"""Dataset conversion CLI: folder / zip / CIFAR-10 tarball / MNIST ->
canonical zip of PNGs + dataset.json.

Rebuild of reference stylegan2ada/dataset_tool.py:52-444 (same canonical
format; LMDB source gated on the lmdb package being present).

    python -m style_big_gan_tpu.tools.dataset_tool \
        --source cifar-10-python.tar.gz --dest data/cifar10.zip
    python -m style_big_gan_tpu.tools.dataset_tool \
        --source images_dir/ --dest data/mydata.zip --resolution 256x256
"""

from __future__ import annotations

import argparse
import functools
import gzip
import io
import json
import os
import pickle
import re
import sys
import tarfile
import zipfile
from typing import Callable, Iterator, Optional, Tuple

import numpy as np


def error(msg):
    print(f"Error: {msg}")
    sys.exit(1)


def maybe_min(a: int, b: Optional[int]) -> int:
    return min(a, b) if b is not None else a


def open_image_folder(source: str, *, max_images=None):
    import PIL.Image
    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    fnames = sorted(os.path.relpath(os.path.join(root, f), source)
                    for root, _d, files in os.walk(source) for f in files
                    if os.path.splitext(f)[1].lower() in exts)
    labels = {}
    meta = os.path.join(source, "dataset.json")
    if os.path.isfile(meta):
        with open(meta) as f:
            data = json.load(f)["labels"]
            if data is not None:
                labels = dict(data)
    max_idx = maybe_min(len(fnames), max_images)

    def iterate():
        for idx, fname in enumerate(fnames[:max_idx]):
            img = np.array(PIL.Image.open(os.path.join(source, fname)))
            yield dict(img=img, label=labels.get(fname.replace("\\", "/")))
    return max_idx, iterate()


def open_image_zip(source: str, *, max_images=None):
    import PIL.Image
    with zipfile.ZipFile(source) as z:
        exts = {".png", ".jpg", ".jpeg", ".bmp"}
        fnames = sorted(f for f in z.namelist()
                        if os.path.splitext(f)[1].lower() in exts)
        labels = {}
        if "dataset.json" in z.namelist():
            with z.open("dataset.json") as f:
                data = json.load(f)["labels"]
                if data is not None:
                    labels = dict(data)
    max_idx = maybe_min(len(fnames), max_images)

    def iterate():
        with zipfile.ZipFile(source) as z:
            for fname in fnames[:max_idx]:
                with z.open(fname) as f:
                    img = np.array(PIL.Image.open(f))
                yield dict(img=img, label=labels.get(fname))
    return max_idx, iterate()


def open_cifar10(tarball: str, *, max_images=None):
    """reference: dataset_tool.py:105-133."""
    images, labels = [], []
    with tarfile.open(tarball, "r:gz") as tar:
        for batch in range(1, 6):
            member = tar.getmember(f"cifar-10-batches-py/data_batch_{batch}")
            with tar.extractfile(member) as f:
                data = pickle.load(f, encoding="latin1")
            images.append(data["data"].reshape(-1, 3, 32, 32))
            labels.append(data["labels"])
    images = np.concatenate(images).transpose(0, 2, 3, 1)   # NHWC
    labels = np.concatenate([np.asarray(l) for l in labels])
    max_idx = maybe_min(len(images), max_images)

    def iterate():
        for idx in range(max_idx):
            yield dict(img=images[idx], label=int(labels[idx]))
    return max_idx, iterate()


def open_mnist(images_gz: str, *, max_images=None):
    """reference: dataset_tool.py:136-159."""
    labels_gz = images_gz.replace("-images-idx3", "-labels-idx1")
    with gzip.open(images_gz, "rb") as f:
        images = np.frombuffer(f.read(), np.uint8, offset=16)
    with gzip.open(labels_gz, "rb") as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    images = images.reshape(-1, 28, 28)
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)], "constant")
    max_idx = maybe_min(len(images), max_images)

    def iterate():
        for idx in range(max_idx):
            yield dict(img=images[idx], label=int(labels[idx]))
    return max_idx, iterate()


def open_lmdb(source: str, *, max_images=None):
    """reference: dataset_tool.py:84-102 (gated on lmdb availability)."""
    try:
        import cv2
        import lmdb
    except ImportError:
        error("LMDB conversion requires the lmdb and cv2 packages")
    with lmdb.open(source, readonly=True, lock=False).begin(write=False) as txn:
        max_idx = maybe_min(txn.stat()["entries"], max_images)

    def iterate():
        with lmdb.open(source, readonly=True, lock=False).begin(
                write=False) as txn:
            for _key, value in txn.cursor():
                img = cv2.imdecode(np.frombuffer(value, np.uint8), 1)
                yield dict(img=img[:, :, ::-1], label=None)
    return max_idx, iterate()


def make_transform(transform: Optional[str], output_width, output_height):
    """center-crop / center-crop-wide / scale (reference:
    dataset_tool.py:199-250)."""
    import PIL.Image

    def scale(w, h, img):
        if w is None or h is None:
            return img
        im = PIL.Image.fromarray(img)
        return np.array(im.resize((w, h), PIL.Image.LANCZOS))

    def center_crop(w, h, img):
        crop = np.min(img.shape[:2])
        ih, iw = img.shape[:2]
        img = img[(ih - crop) // 2:(ih + crop) // 2,
                  (iw - crop) // 2:(iw + crop) // 2]
        im = PIL.Image.fromarray(img, "RGB" if img.ndim == 3 else "L")
        return np.array(im.resize((w, h), PIL.Image.LANCZOS))

    def center_crop_wide(w, h, img):
        ih, iw = img.shape[:2]
        if iw < w or ih < h:
            return None
        img = img[(ih - h) // 2:(ih + h) // 2, (iw - w) // 2:(iw + w) // 2]
        return img

    if transform is None:
        return functools.partial(scale, output_width, output_height)
    if transform == "center-crop":
        if output_width is None or output_height is None:
            error("center-crop requires --resolution")
        return functools.partial(center_crop, output_width, output_height)
    if transform == "center-crop-wide":
        if output_width is None or output_height is None:
            error("center-crop-wide requires --resolution")
        return functools.partial(center_crop_wide, output_width,
                                 output_height)
    error(f"unknown transform {transform}")


def open_dataset(source, *, max_images):
    if os.path.isdir(source):
        return open_image_folder(source, max_images=max_images)
    ext = os.path.splitext(source)[1].lower()
    if os.path.basename(source) == "data.mdb" or ext == ".mdb":
        return open_lmdb(os.path.dirname(source) or source,
                         max_images=max_images)
    if ext == ".zip":
        return open_image_zip(source, max_images=max_images)
    if source.endswith("cifar-10-python.tar.gz") or ext == ".gz" and \
            "cifar" in source:
        return open_cifar10(source, max_images=max_images)
    if source.endswith("train-images-idx3-ubyte.gz"):
        return open_mnist(source, max_images=max_images)
    if ext == ".gz" and "tar" in source:
        return open_cifar10(source, max_images=max_images)
    error(f"unknown source format: {source}")


def convert_dataset(source: str, dest: str, max_images=None,
                    transform=None, resolution=None):
    """reference: dataset_tool.py:313-444."""
    import PIL.Image
    width = height = None
    if resolution:
        m = re.match(r"^(\d+)x(\d+)$", resolution)
        if not m:
            error("--resolution must be WxH, e.g. 256x256")
        width, height = int(m.group(1)), int(m.group(2))

    num_files, input_iter = open_dataset(source, max_images=max_images)
    tf = make_transform(transform, width, height)

    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    zf = zipfile.ZipFile(dest, "w", compression=zipfile.ZIP_STORED)
    labels = []
    dataset_attrs = None
    idx = 0
    for image in input_iter:
        img = tf(image["img"])
        if img is None:
            continue
        if img.ndim == 2:
            img = img[:, :, None]
        channels = img.shape[2]
        cur_attrs = dict(width=img.shape[1], height=img.shape[0],
                         channels=channels)
        if dataset_attrs is None:
            dataset_attrs = cur_attrs
            w, h = cur_attrs["width"], cur_attrs["height"]
            if w != h:
                error(f"images must be square, got {w}x{h}")
            if w & (w - 1) != 0:
                error(f"image size must be a power of two, got {w}")
        elif cur_attrs != dataset_attrs:
            error(f"inconsistent image attributes: {cur_attrs} vs "
                  f"{dataset_attrs}")

        fname = f"{idx // 1000:05d}/img{idx:08d}.png"
        buf = io.BytesIO()
        PIL.Image.fromarray(img[:, :, 0] if channels == 1 else img,
                            "L" if channels == 1 else "RGB").save(
            buf, format="png", compress_level=0)
        zf.writestr(fname, buf.getbuffer())
        labels.append([fname, image["label"]]
                      if image["label"] is not None else None)
        idx += 1
        if idx % 1000 == 0:
            print(f"{idx}/{num_files}")
    metadata = {"labels": labels if all(l is not None for l in labels) and
                len(labels) > 0 else None}
    zf.writestr("dataset.json", json.dumps(metadata))
    zf.close()
    print(f"wrote {idx} images to {dest}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--transform", default=None,
                   choices=[None, "center-crop", "center-crop-wide"])
    p.add_argument("--resolution", default=None)
    a = p.parse_args(argv)
    convert_dataset(a.source, a.dest, a.max_images, a.transform, a.resolution)


if __name__ == "__main__":
    main()
