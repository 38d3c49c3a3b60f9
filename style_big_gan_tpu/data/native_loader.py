"""ctypes bindings for the native (C++) data pipeline (native/dataio.cpp).

TPU-native counterpart of the reference's torch DataLoader worker processes
(reference: train_parts/dataloaders.py:8-12): a C++ thread pool parses the
zip, decodes PNG/JPEG, runs the windowed-shuffle sampler, and hands ready
NHWC uint8 batches to Python with zero per-item Python overhead — keeping
the TPU step loop fed at full HBM ingest rate.

Build: ``make -C native`` produces ``native/libsbgdataio.so``.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from style_big_gan_tpu.registries import dataloaders

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libsbgdataio.so"),
    os.environ.get("SBG_DATAIO_LIB", ""),
]

_lib = None
_lib_err: Optional[str] = None


def _load_lib():
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError as e:  # missing libpng/libjpeg etc.
                _lib_err = str(e)
                return None
            lib.dataio_open.restype = ctypes.c_void_p
            lib.dataio_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.dataio_num_images.restype = ctypes.c_longlong
            lib.dataio_num_images.argtypes = [ctypes.c_void_p]
            lib.dataio_image_info.restype = None
            lib.dataio_image_info.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dataio_image_name.restype = ctypes.c_char_p
            lib.dataio_image_name.argtypes = [ctypes.c_void_p,
                                              ctypes.c_longlong]
            lib.dataio_read_image.restype = ctypes.c_int
            lib.dataio_read_image.argtypes = [
                ctypes.c_void_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_ubyte)]
            lib.dataio_start.restype = ctypes.c_int
            lib.dataio_start.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int,
                ctypes.c_longlong]
            lib.dataio_next.restype = ctypes.c_int
            lib.dataio_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_longlong)]
            lib.dataio_last_error.restype = ctypes.c_char_p
            lib.dataio_last_error.argtypes = [ctypes.c_void_p]
            lib.dataio_close.restype = None
            lib.dataio_close.argtypes = [ctypes.c_void_p]
            _lib = lib
            return _lib
    _lib_err = "libsbgdataio.so not found (run: make -C native)"
    return None


def native_available() -> bool:
    return _load_lib() is not None


class NativeZipReader:
    """Handle on one zip dataset: sync reads + threaded batch pipeline."""

    def __init__(self, path: str, channels: int = 3):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(f"native dataio unavailable: {_lib_err}")
        self._lib = lib
        self._h = lib.dataio_open(path.encode(), int(channels))
        if not self._h or lib.dataio_num_images(self._h) <= 0:
            err = lib.dataio_last_error(self._h).decode() if self._h else "?"
            if self._h:
                lib.dataio_close(self._h)
                self._h = None
            raise RuntimeError(f"cannot open {path!r}: {err}")
        hh = ctypes.c_int()
        ww = ctypes.c_int()
        cc = ctypes.c_int()
        lib.dataio_image_info(self._h, ctypes.byref(hh), ctypes.byref(ww),
                              ctypes.byref(cc))
        self.height, self.width, self.channels = hh.value, ww.value, cc.value
        if self.height == 0 or self.width == 0:
            raise RuntimeError(
                f"cannot probe image size: "
                f"{lib.dataio_last_error(self._h).decode()}")
        self.batch = 0
        self._started = False

    @property
    def num_images(self) -> int:
        return int(self._lib.dataio_num_images(self._h))

    def image_name(self, idx: int) -> str:
        return self._lib.dataio_image_name(self._h, int(idx)).decode()

    def read_image(self, idx: int) -> np.ndarray:
        """Synchronous single-image decode -> HWC uint8."""
        out = np.empty((self.height, self.width, self.channels), np.uint8)
        rc = self._lib.dataio_read_image(
            self._h, int(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if rc != 0:
            raise RuntimeError(
                f"decode failed for image {idx}: "
                f"{self._lib.dataio_last_error(self._h).decode()}")
        return out

    def start(self, batch: int, shard: int = 0, num_shards: int = 1,
              num_threads: int = 3, prefetch: int = 2, seed: int = 0,
              shuffle: bool = True, start_item: int = 0) -> None:
        rc = self._lib.dataio_start(self._h, int(batch), int(shard),
                                    int(num_shards), int(num_threads),
                                    int(prefetch), int(seed),
                                    1 if shuffle else 0, int(start_item))
        if rc != 0:
            raise RuntimeError("cannot start native pipeline: "
                               f"{self._lib.dataio_last_error(self._h).decode()}")
        self.batch = int(batch)
        self._started = True

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking: next ready batch -> (images [B,H,W,C] u8, indices [B])."""
        assert self._started, "call start() first"
        imgs = np.empty((self.batch, self.height, self.width, self.channels),
                        np.uint8)
        idxs = np.empty((self.batch,), np.int64)
        rc = self._lib.dataio_next(
            self._h, imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
        if rc != 0:
            raise RuntimeError("native pipeline stopped")
        return imgs, idxs

    def close(self) -> None:
        if self._h:
            self._lib.dataio_close(self._h)
            self._h = None
            self._started = False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _NativePipelineIterator:
    """Wraps the C++ pipeline; maps raw indices -> labels host-side."""

    def __init__(self, reader: NativeZipReader, dataset):
        self.reader = reader
        self.dataset = dataset

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        imgs, idxs = self.reader.next_batch()
        labels = np.stack([self.dataset.get_label(int(i)) for i in idxs]) \
            .astype(np.float32)
        return imgs, labels

    def close(self) -> None:
        self.reader.close()


class _NativeViewIterator:
    """Non-trivial dataset views (max_size subset / xflip): Python threads
    sample view indices and use the native *decoder* synchronously.
    Ticketed in-order delivery, same as _PrefetchIterator / the C++
    pipeline (exact resume needs a deterministic batch sequence)."""

    def __init__(self, reader: NativeZipReader, dataset, batch_size: int,
                 sampler, num_workers: int, prefetch: int):
        import queue
        self.reader = reader
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.sampler = sampler
        self.lock = threading.Lock()
        self.q: "queue.Queue" = queue.Queue(maxsize=max(1, int(prefetch)))
        self.stop = threading.Event()
        self._next_ticket = 0
        self._next_push = 0
        self._push_cond = threading.Condition()
        self.threads = [threading.Thread(target=self._worker, daemon=True)
                        for _ in range(max(1, int(num_workers)))]
        for t in self.threads:
            t.start()

    def _worker(self) -> None:
        import queue
        while not self.stop.is_set():
            with self.lock:
                idxs = [next(self.sampler) for _ in range(self.batch_size)]
                ticket = self._next_ticket
                self._next_ticket += 1
            try:
                imgs = []
                labels = []
                for i in idxs:
                    d = self.dataset.get_details(i)
                    img = self.reader.read_image(d.raw_idx)
                    if d.xflip:
                        img = img[:, ::-1, :].copy()
                    imgs.append(img)
                    labels.append(self.dataset.get_label(i))
                batch = (np.stack(imgs),
                         np.stack(labels).astype(np.float32))
            except Exception as e:
                # Still claim the ticket below, or the other workers block
                # forever on the dead ticket (advisor r4 finding); the
                # consumer re-raises on receipt of the sentinel.
                from style_big_gan_tpu.data.dataloader import _WorkerError
                batch = _WorkerError(e)
            with self._push_cond:
                while not self.stop.is_set() and self._next_push != ticket:
                    self._push_cond.wait(timeout=0.2)
            if self.stop.is_set():
                return
            while not self.stop.is_set():
                try:
                    self.q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue
            with self._push_cond:
                self._next_push += 1
                self._push_cond.notify_all()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        from style_big_gan_tpu.data.dataloader import _WorkerError
        if isinstance(item, _WorkerError):
            raise RuntimeError("native-view dataloader worker failed while "
                               "decoding a batch") from item.exc
        return item

    def close(self) -> None:
        import queue
        self.stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        for t in self.threads:
            t.join(timeout=2.0)
        self.reader.close()


@dataloaders.add_to_registry("native")
class NativeDataloader:
    """C++-backed loader; falls back to pure-Python decode paths only for
    non-zip datasets.  Same call signature as ``BasicDataloader``."""

    def __init__(self, num_workers: int = 3, prefetch: int = 2,
                 window_size: float = 0.5):
        self.num_workers = int(num_workers)
        self.prefetch = int(prefetch)
        self.window_size = float(window_size)

    @staticmethod
    def _index_spaces_match(reader: NativeZipReader, dataset) -> bool:
        fnames = getattr(dataset, "_image_fnames", None)
        if fnames is None or reader.num_images != len(fnames):
            return False
        n = len(fnames)
        probe = sorted({0, n // 2, n - 1} | set(range(min(n, 8))))
        return all(reader.image_name(i) == fnames[i] for i in probe)

    def __call__(self, dataset, batch_size: int, shard: int = 0,
                 num_shards: int = 1, seed: int = 0,
                 shuffle: bool = True,
                 start_item: int = 0) -> Iterator[Tuple[np.ndarray,
                                                        np.ndarray]]:
        path = getattr(dataset, "_path", None)
        is_zip = (getattr(dataset, "_type", None) == "zip" and path and
                  native_available())
        if not is_zip:
            # Directory datasets / no native lib: python threads + PIL.
            from style_big_gan_tpu.data.dataloader import BasicDataloader
            return BasicDataloader(self.num_workers, self.prefetch,
                                   self.window_size)(
                dataset, batch_size, shard=shard, num_shards=num_shards,
                seed=seed, shuffle=shuffle, start_item=start_item)
        reader = NativeZipReader(path, channels=dataset.num_channels)
        # The C++ reader indexes only lowercase .png/.jpg/.jpeg entries; the
        # Python dataset also accepts .bmp/.webp and uppercase extensions.
        # If the two index spaces diverge, raw indices would silently pair
        # images with wrong labels/xflips — verify count + spot-check names
        # and fall back to the pure-Python loader on any mismatch.
        if not self._index_spaces_match(reader, dataset):
            reader.close()
            from style_big_gan_tpu.data.dataloader import BasicDataloader
            return BasicDataloader(self.num_workers, self.prefetch,
                                   self.window_size)(
                dataset, batch_size, shard=shard, num_shards=num_shards,
                seed=seed, shuffle=shuffle, start_item=start_item)
        trivial = (len(dataset) == reader.num_images and
                   not np.any(dataset._xflip))
        if trivial:
            reader.start(batch=int(batch_size), shard=int(shard),
                         num_shards=int(num_shards),
                         num_threads=self.num_workers,
                         prefetch=self.prefetch, seed=int(seed),
                         shuffle=shuffle, start_item=int(start_item))
            return _NativePipelineIterator(reader, dataset)
        from style_big_gan_tpu.data.dataloader import infinite_sampler
        sampler = infinite_sampler(len(dataset), shard=shard,
                                   num_shards=num_shards, shuffle=shuffle,
                                   seed=seed, window_size=self.window_size,
                                   start_item=start_item)
        return _NativeViewIterator(reader, dataset, batch_size, sampler,
                                   self.num_workers, self.prefetch)
