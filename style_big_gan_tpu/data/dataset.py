"""Datasets: seeded max_size subsetting, xflip doubling, one-hot labels.

Rebuild of the reference dataset layer (reference: train_parts/datasets.py:
29-155 base class, 159-248 ImageFolderDataset) with one deliberate layout
change: images are **HWC** uint8 (NHWC batches feed the TPU directly; the
reference's CHW is a cuDNN convention).  Semantics are otherwise identical:

  * ``max_size`` takes a seeded-shuffled subset, then re-sorts (applied
    before xflip, reference datasets.py:45-48),
  * ``xflip`` doubles the dataset with horizontally flipped views
    (reference datasets.py:50-54),
  * int64 labels expose ``label_dim = max+1`` and one-hot ``get_label``
    (reference datasets.py:100-107, 135-144).
"""

from __future__ import annotations

import json
import os
import threading
import zipfile
from typing import List, Optional

import numpy as np

from style_big_gan_tpu.registries import datasets
from style_big_gan_tpu.utils.misc import EasyDict


class Dataset:
    """Index-view base class (reference: train_parts/datasets.py:29-155)."""

    def __init__(self, name: str, raw_shape: List[int],
                 max_size: Optional[int] = None, use_labels: bool = False,
                 xflip: bool = False, random_seed: int = 0):
        self._name = name
        self._raw_shape = list(raw_shape)  # [N, H, W, C]
        self._use_labels = bool(use_labels)
        self._raw_labels = None
        self._label_shape = None

        # max_size: seeded shuffle, keep first max_size, re-sort
        # (reference datasets.py:45-48).
        self._raw_idx = np.arange(self._raw_shape[0], dtype=np.int64)
        if (max_size is not None) and int(max_size) > 0 and \
                (self._raw_idx.size > int(max_size)):
            np.random.RandomState(random_seed).shuffle(self._raw_idx)
            self._raw_idx = np.sort(self._raw_idx[:int(max_size)])

        # xflip doubling (reference datasets.py:50-54).
        self._xflip = np.zeros(self._raw_idx.size, dtype=np.uint8)
        if xflip:
            self._raw_idx = np.tile(self._raw_idx, 2)
            self._xflip = np.concatenate(
                [self._xflip, np.ones_like(self._xflip)])

    # ------------------------------------------------------------- labels

    def _get_raw_labels(self) -> np.ndarray:
        if self._raw_labels is None:
            self._raw_labels = (self._load_raw_labels()
                                if self._use_labels else None)
            if self._raw_labels is None:
                self._raw_labels = np.zeros([self._raw_shape[0], 0],
                                            dtype=np.float32)
            assert isinstance(self._raw_labels, np.ndarray)
            assert self._raw_labels.shape[0] == self._raw_shape[0]
            assert self._raw_labels.dtype in [np.float32, np.int64]
        return self._raw_labels

    def get_label(self, idx: int) -> np.ndarray:
        """One-hot for int64 labels (reference datasets.py:100-107)."""
        label = self._get_raw_labels()[self._raw_idx[idx]]
        if label.dtype == np.int64:
            onehot = np.zeros(self.label_shape, dtype=np.float32)
            onehot[int(label)] = 1.0
            label = onehot
        return label.copy()

    def get_details(self, idx: int) -> EasyDict:
        """raw_idx / xflip / raw_label (reference datasets.py:109-114)."""
        d = EasyDict()
        d.raw_idx = int(self._raw_idx[idx])
        d.xflip = (int(self._xflip[idx]) != 0)
        d.raw_label = self._get_raw_labels()[d.raw_idx].copy()
        return d

    # ------------------------------------------------------------- access

    def close(self) -> None:  # overridden by subclasses
        pass

    def _load_raw_image(self, raw_idx: int) -> np.ndarray:
        raise NotImplementedError

    def _load_raw_labels(self) -> Optional[np.ndarray]:
        raise NotImplementedError

    def __len__(self) -> int:
        return int(self._raw_idx.size)

    def __getitem__(self, idx: int):
        image = self._load_raw_image(int(self._raw_idx[idx]))
        assert isinstance(image, np.ndarray) and image.dtype == np.uint8
        assert list(image.shape) == self.image_shape
        if self._xflip[idx]:
            image = image[:, ::-1, :]  # flip width axis (HWC)
        return image.copy(), self.get_label(idx)

    def __getstate__(self):
        return dict(self.__dict__, _raw_labels=None)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # ---------------------------------------------------------- properties

    @property
    def name(self) -> str:
        return self._name

    @property
    def image_shape(self) -> List[int]:
        """[H, W, C] (HWC; reference uses CHW, datasets.py:120-122)."""
        return list(self._raw_shape[1:])

    @property
    def num_channels(self) -> int:
        assert len(self.image_shape) == 3
        return self.image_shape[2]

    @property
    def resolution(self) -> int:
        assert len(self.image_shape) == 3
        assert self.image_shape[0] == self.image_shape[1]
        return self.image_shape[0]

    @property
    def label_shape(self) -> List[int]:
        if self._label_shape is None:
            raw_labels = self._get_raw_labels()
            if raw_labels.dtype == np.int64:
                self._label_shape = [int(np.max(raw_labels)) + 1]
            else:
                self._label_shape = list(raw_labels.shape[1:])
        return list(self._label_shape)

    @property
    def label_dim(self) -> int:
        assert len(self.label_shape) == 1
        return self.label_shape[0]

    @property
    def has_labels(self) -> bool:
        return any(x != 0 for x in self.label_shape)

    @property
    def has_onehot_labels(self) -> bool:
        return self._get_raw_labels().dtype == np.int64


_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


@datasets.add_to_registry("image_folder")
class ImageFolderDataset(Dataset):
    """Directory-or-zip image dataset with ``dataset.json`` labels
    (reference: train_parts/datasets.py:159-248).

    Zip handles are thread-local so loader worker threads can read
    concurrently (the reference relies on torch worker *processes* for the
    same isolation).
    """

    def __init__(self, path: str = "", resolution: Optional[int] = None,
                 use_labels: bool = False, max_size: Optional[int] = None,
                 xflip: bool = False, random_seed: int = 0):
        self._path = str(path)
        self._tls = threading.local()
        # Every zip handle ever opened (one per loader worker thread) —
        # close() must release them all, not just the calling thread's.
        self._zip_handles = []
        self._zip_lock = threading.Lock()

        if os.path.isdir(self._path):
            self._type = "dir"
            self._all_fnames = {
                os.path.relpath(os.path.join(root, f), start=self._path)
                for root, _dirs, files in os.walk(self._path) for f in files}
        elif os.path.splitext(self._path)[1].lower() == ".zip":
            self._type = "zip"
            self._all_fnames = set(self._get_zipfile().namelist())
        else:
            raise IOError("Path must point to a directory or zip: "
                          f"{self._path!r}")

        self._image_fnames = sorted(
            f for f in self._all_fnames
            if os.path.splitext(f)[1].lower() in _IMAGE_EXTS)
        if not self._image_fnames:
            raise IOError(f"No image files found in {self._path!r}")

        name = os.path.splitext(os.path.basename(self._path))[0]
        raw_shape = [len(self._image_fnames)] + \
            list(self._load_raw_image(0).shape)
        if resolution is not None and (raw_shape[1] != resolution or
                                       raw_shape[2] != resolution):
            raise IOError("Image files do not match the specified resolution")
        super().__init__(name=name, raw_shape=raw_shape,
                         max_size=max_size, use_labels=use_labels,
                         xflip=xflip, random_seed=random_seed)

    # ----------------------------------------------------------------- io

    def _get_zipfile(self) -> zipfile.ZipFile:
        assert self._type == "zip"
        zf = getattr(self._tls, "zipfile", None)
        if zf is None:
            zf = zipfile.ZipFile(self._path)
            self._tls.zipfile = zf
            with self._zip_lock:
                self._zip_handles.append(zf)
        return zf

    def _open_file(self, fname: str):
        if self._type == "dir":
            return open(os.path.join(self._path, fname), "rb")
        return self._get_zipfile().open(fname, "r")

    def close(self) -> None:
        # Close every worker thread's handle, not just this thread's.
        with self._zip_lock:
            handles, self._zip_handles = self._zip_handles, []
        for zf in handles:
            try:
                zf.close()
            except Exception:
                pass
        self._tls.zipfile = None

    def __getstate__(self):
        state = dict(super().__getstate__())
        state["_tls"] = None
        state["_zip_handles"] = None
        state["_zip_lock"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._tls = threading.local()
        self._zip_handles = []
        self._zip_lock = threading.Lock()

    def _load_raw_image(self, raw_idx: int) -> np.ndarray:
        import PIL.Image
        fname = self._image_fnames[raw_idx]
        with self._open_file(fname) as f:
            image = np.array(PIL.Image.open(f).convert(
                "RGB" if self._guess_channels() == 3 else "L"))
        if image.ndim == 2:
            image = image[:, :, np.newaxis]
        return image  # HWC uint8

    def _guess_channels(self) -> int:
        # Probe once; cached.  Grayscale datasets stay 1-channel.
        ch = getattr(self, "_channels", None)
        if ch is None:
            import PIL.Image
            with self._open_file(self._image_fnames[0]) as f:
                img = PIL.Image.open(f)
                ch = 1 if img.mode in ("L", "I", "1", "I;16") else 3
            self._channels = ch
        return ch

    def _load_raw_labels(self) -> Optional[np.ndarray]:
        if "dataset.json" not in self._all_fnames:
            return None
        with self._open_file("dataset.json") as f:
            labels = json.load(f).get("labels")
        if labels is None:
            return None
        labels = dict(labels)
        labels = [labels[f.replace("\\", "/")] for f in self._image_fnames]
        labels = np.array(labels)
        labels = labels.astype({1: np.int64, 2: np.float32}[labels.ndim])
        return labels
