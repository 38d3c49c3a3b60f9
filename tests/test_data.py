"""Dataset + infinite sharded sampler tests."""

import io
import json
import os
import zipfile

import numpy as np
import pytest

from style_big_gan_tpu.data.dataloader import (BasicDataloader,
                                               infinite_sampler,
                                               normalize_images)
from style_big_gan_tpu.data.dataset import ImageFolderDataset


@pytest.fixture(scope="module")
def tiny_zip(tmp_path_factory):
    import PIL.Image
    path = tmp_path_factory.mktemp("data") / "tiny.zip"
    rnd = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as z:
        labels = []
        for i in range(20):
            img = (rnd.rand(16, 16, 3) * 255).astype("uint8")
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            fname = f"img{i:03d}.png"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, i % 4])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    return str(path)


def test_dataset_zip_basics(tiny_zip):
    ds = ImageFolderDataset(path=tiny_zip, use_labels=True)
    assert len(ds) == 20
    assert ds.resolution == 16
    assert ds.num_channels == 3
    assert ds.label_dim == 4
    img, label = ds[0]
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert label.shape == (4,) and label.sum() == 1.0


def test_dataset_max_size_and_xflip(tiny_zip):
    ds = ImageFolderDataset(path=tiny_zip, use_labels=False, max_size=10,
                            xflip=True)
    assert len(ds) == 20          # 10 * 2 (xflip doubling)
    img0, _ = ds[0]
    imgf, _ = ds[10]
    d0 = ds.get_details(0)
    df = ds.get_details(10)
    assert d0.raw_idx == df.raw_idx and not d0.xflip and df.xflip
    np.testing.assert_array_equal(img0[:, ::-1, :], imgf)


def test_dataset_dir_source(tiny_zip, tmp_path):
    import PIL.Image
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        PIL.Image.fromarray(
            (np.random.rand(8, 8, 3) * 255).astype("uint8")).save(
            d / f"{i}.png")
    ds = ImageFolderDataset(path=str(d))
    assert len(ds) == 4 and ds.resolution == 8
    assert not ds.has_labels


def test_infinite_sampler_sharding():
    n = 12
    shards = [list(), list(), list(), list()]
    for s in range(4):
        it = infinite_sampler(n, shard=s, num_shards=4, shuffle=False)
        shards[s] = [next(it) for _ in range(6)]
    # Disjoint round-robin coverage of the index stream.
    seen = set()
    for s in shards:
        seen.update(s)
    assert seen == set(range(n))


def test_infinite_sampler_shuffle_covers():
    it = infinite_sampler(10, shuffle=True, seed=1)
    idxs = [next(it) for _ in range(100)]
    assert set(idxs) == set(range(10))


def test_infinite_sampler_start_item_replays_stream():
    """Fast-forwarding by N yields continues the exact index sequence the
    uninterrupted stream would have produced (exact-resume support)."""
    it_full = infinite_sampler(13, num_shards=2, shard=1, shuffle=True,
                               seed=3)
    seq = [next(it_full) for _ in range(50)]
    it_ff = infinite_sampler(13, num_shards=2, shard=1, shuffle=True,
                             seed=3, start_item=20)
    assert [next(it_ff) for _ in range(30)] == seq[20:]


def test_basic_dataloader(tiny_zip):
    ds = ImageFolderDataset(path=tiny_zip, use_labels=True)
    loader = BasicDataloader(num_workers=2, prefetch=2)
    it = loader(ds, batch_size=8)
    imgs, labels = next(it)
    assert imgs.shape == (8, 16, 16, 3) and imgs.dtype == np.uint8
    assert labels.shape == (8, 4)
    imgs2, _ = next(it)
    assert imgs2.shape == (8, 16, 16, 3)


def test_normalize_images():
    x = np.array([[0, 127.5, 255]], dtype=np.uint8).reshape(1, 1, 3, 1)
    y = normalize_images(np.array([[[[0], [128], [255]]]], dtype=np.uint8))
    assert y.min() >= -1.0 and y.max() <= 1.0
    np.testing.assert_allclose(y.flat[0], -1.0)
    np.testing.assert_allclose(y.flat[2], 1.0)


def test_prefetch_iterator_order_deterministic_across_workers(tiny_zip):
    """Ticketed delivery: the batch sequence is identical for 1 and 4
    workers (exact resume depends on a deterministic batch order)."""
    ds = ImageFolderDataset(path=tiny_zip, use_labels=True)

    def seq(workers):
        loader = BasicDataloader(num_workers=workers, prefetch=2)
        it = loader(ds, batch_size=4, seed=7)
        out = [next(it) for _ in range(6)]
        it.close()
        return out

    a, b = seq(1), seq(4)
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)

def test_prefetch_iterator_survives_decode_failure(tiny_zip):
    """A worker whose decode raises must still advance the delivery ticket
    (otherwise every other worker blocks forever on its slot — advisor r4
    finding) and the error must surface on the consumer side."""
    ds = ImageFolderDataset(path=tiny_zip, use_labels=True)

    class FlakyDataset:
        """Raises exactly once, on the first item of the second batch."""

        def __init__(self, inner):
            self.inner = inner
            self.calls = 0

        def __len__(self):
            return len(self.inner)

        def __getitem__(self, i):
            self.calls += 1
            if self.calls == 5:  # first item of batch #2 (batch_size=4)
                raise ValueError("corrupt image")
            return self.inner[i]

    loader = BasicDataloader(num_workers=3, prefetch=2)
    it = loader(FlakyDataset(ds), batch_size=4, seed=7, shuffle=False)
    got_error = False
    batches = 0
    for _ in range(4):
        try:
            imgs, labels = next(it)
            assert imgs.shape == (4, 16, 16, 3)
            batches += 1
        except RuntimeError as e:
            assert "worker failed" in str(e)
            got_error = True
    it.close()
    # The failed ticket surfaced as an error AND later tickets kept flowing.
    assert got_error and batches == 3
