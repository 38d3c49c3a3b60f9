"""Native (C++) data loader tests: decode parity with PIL, pipeline output."""

import io
import json
import zipfile

import numpy as np
import pytest

from style_big_gan_tpu.data.dataset import ImageFolderDataset

native = pytest.importorskip("style_big_gan_tpu.data.native_loader")

if not native.native_available():
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def tiny_zip(tmp_path_factory):
    import PIL.Image
    path = tmp_path_factory.mktemp("data") / "tiny.zip"
    rnd = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        labels = []
        for i in range(24):
            img = (rnd.rand(16, 16, 3) * 255).astype("uint8")
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            fname = f"img{i:03d}.png"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, i % 4])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    return str(path)


def test_native_reader_decode_parity(tiny_zip):
    reader = native.NativeZipReader(tiny_zip)
    ds = ImageFolderDataset(path=tiny_zip, use_labels=False)
    assert reader.num_images == len(ds)
    assert (reader.height, reader.width, reader.channels) == (16, 16, 3)
    for i in [0, 7, 23]:
        img_native = reader.read_image(i)
        img_pil, _ = ds[i]
        np.testing.assert_array_equal(img_native, img_pil)
    reader.close()


def test_native_pipeline_batches(tiny_zip):
    reader = native.NativeZipReader(tiny_zip)
    reader.start(batch=8, shard=0, num_shards=1, num_threads=2, prefetch=2,
                 seed=0, shuffle=True)
    seen = set()
    for _ in range(15):
        imgs, idxs = reader.next_batch()
        assert imgs.shape == (8, 16, 16, 3) and imgs.dtype == np.uint8
        seen.update(int(i) for i in idxs)
    # Windowed reshuffle may delay individual indices; 5 epochs must still
    # reach (nearly) everything.
    assert len(seen) >= 23
    reader.close()


def test_native_dataloader_with_labels(tiny_zip):
    from style_big_gan_tpu.registries import dataloaders
    ds = ImageFolderDataset(path=tiny_zip, use_labels=True)
    loader = dataloaders["native"](num_workers=2, prefetch=2)
    it = loader(ds, batch_size=6)
    imgs, labels = next(it)
    assert imgs.shape == (6, 16, 16, 3)
    assert labels.shape == (6, 4)
    assert np.all(labels.sum(axis=1) == 1.0)


def test_native_dataloader_falls_back_on_index_mismatch(tmp_path):
    """A zip with extensions only the Python dataset accepts (.bmp,
    uppercase .PNG) diverges the native/Python index spaces — the loader
    must detect it and fall back to the pure-Python path with correct
    image/label pairing (ADVICE r1: silent wrong-label risk)."""
    import io
    import PIL.Image
    path = tmp_path / "mixed.zip"
    rnd = np.random.RandomState(1)
    with zipfile.ZipFile(path, "w") as z:
        labels = []
        for i, ext in enumerate(["png", "bmp", "PNG", "png", "bmp", "png"]):
            img = (rnd.rand(16, 16, 3) * 255).astype("uint8")
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format=ext.upper()
                                          if ext.lower() == "bmp" else "PNG")
            fname = f"img{i:03d}.{ext}"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, i % 2])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    from style_big_gan_tpu.registries import dataloaders
    ds = ImageFolderDataset(path=str(path), use_labels=True)
    loader = dataloaders["native"](num_workers=1, prefetch=1)
    it = loader(ds, batch_size=4, shuffle=False)
    # The fallback is the python BasicDataloader iterator, not a native one.
    assert not isinstance(it, (native._NativePipelineIterator,
                               native._NativeViewIterator))
    imgs, lab = next(it)
    assert imgs.shape == (4, 16, 16, 3) and lab.shape == (4, 2)
    it.close()


def test_dataset_close_releases_worker_handles(tiny_zip):
    """close() must release zip handles opened by loader worker threads,
    not only the calling thread's (ADVICE r1: fd leak)."""
    import threading
    ds = ImageFolderDataset(path=tiny_zip, use_labels=False)

    def worker():
        ds[0]   # opens a thread-local zip handle

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ds[1]   # main-thread handle too
    assert len(ds._zip_handles) >= 2
    ds.close()
    assert ds._zip_handles == []


def test_native_dataloader_nontrivial_view(tiny_zip):
    from style_big_gan_tpu.registries import dataloaders
    ds = ImageFolderDataset(path=tiny_zip, use_labels=True, max_size=10,
                            xflip=True)
    loader = dataloaders["native"](num_workers=1, prefetch=1)
    it = loader(ds, batch_size=4)
    imgs, labels = next(it)
    assert imgs.shape == (4, 16, 16, 3)
    assert labels.shape == (4, 4)


def test_native_pipeline_order_deterministic_and_start_item(tiny_zip):
    """Ticketed delivery: the C++ pipeline's index sequence is identical
    for 1 and 4 decode threads, and dataio_start(start_item=N) resumes the
    same stream N items in (exact-resume support)."""
    def seq(threads, start_item=0, batches=60):
        reader = native.NativeZipReader(tiny_zip)
        reader.start(batch=4, num_threads=threads, prefetch=2, seed=11,
                     shuffle=True, start_item=start_item)
        out = [reader.next_batch()[1].copy() for _ in range(batches)]
        reader.close()
        return np.concatenate(out)

    # 60 batches through a prefetch-2 queue with 4 decode threads also
    # stresses the ticketed hand-off for lost-wakeup deadlocks (the
    # notify_one consumer bug hung the first TPU drive).
    a = seq(1)
    b = seq(4)
    np.testing.assert_array_equal(a, b)
    # fast-forward by 2 batches of 4 -> the tail of the full stream
    c = seq(4, start_item=8, batches=58)
    np.testing.assert_array_equal(c, a[8:])
