"""Metric math + infrastructure tests with the deterministic fake detector."""

import io
import json
import zipfile

import numpy as np
import pytest

from style_big_gan_tpu.metrics import metric_main, metric_utils
from style_big_gan_tpu.metrics.metric_utils import (FeatureStats,
                                                    MetricOptions,
                                                    get_feature_detector)


class ArrayDataset:
    """Minimal dataset for metric loops."""

    def __init__(self, images):
        self.images = images

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], np.zeros(0)


def make_images(n, seed=0, res=32):
    return (np.random.RandomState(seed).rand(n, res, res, 3) * 255
            ).astype(np.uint8)


def make_sampler(seed):
    imgs = make_images(512, seed=seed)

    def g(batch_size, rng, **kw):
        idx = rng.randint(len(imgs), size=batch_size)
        return imgs[idx]
    return g


def test_feature_stats_mean_cov():
    stats = FeatureStats(capture_mean_cov=True, max_items=100)
    x = np.random.RandomState(0).randn(100, 8).astype(np.float32)
    stats.append(x[:60])
    stats.append(x[60:])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-3,
                               atol=1e-4)


def test_feature_stats_max_items_truncation():
    stats = FeatureStats(capture_all=True, max_items=10)
    stats.append(np.ones((8, 4)))
    stats.append(np.ones((8, 4)))
    assert stats.num_items == 10
    assert stats.get_all().shape == (10, 4)
    assert stats.is_full()


def test_fake_detector_deterministic():
    det = get_feature_detector("fake_v1")
    imgs = make_images(4)
    f1 = det(imgs)
    f2 = det(imgs)
    np.testing.assert_allclose(f1, f2)
    assert f1.shape == (4, 256)
    logits = det(imgs, return_logits=True)
    assert logits.shape == (4, 64)


def _opts(dataset, sampler, **kw):
    return dict(G=sampler, dataset=dataset, num_items=128,
                batch_size=32, **kw)


def test_fid_identical_distributions_near_zero():
    imgs = make_images(512, seed=1)
    ds = ArrayDataset(imgs)
    res = metric_main.calc_metric("fid50k", **_opts(ds, make_sampler(1)))
    # Same distribution -> small FID; different seed -> larger.
    fid_same = res.results.fid50k
    res2 = metric_main.calc_metric("fid50k", **_opts(ds, make_sampler(99)))
    assert fid_same < res2.results.fid50k or fid_same < 1e-3


def test_kid_and_is_run():
    ds = ArrayDataset(make_images(256, seed=2))
    kid = metric_main.calc_metric("kid50k", **_opts(ds, make_sampler(2)))
    assert np.isfinite(kid.results.kid50k)
    is_res = metric_main.calc_metric("is50k", **_opts(ds, make_sampler(2)))
    assert is_res.results.is50k_mean > 0


def test_pr_runs():
    ds = ArrayDataset(make_images(128, seed=3))
    res = metric_main.calc_metric("pr50k3", **_opts(ds, make_sampler(3)))
    assert 0.0 <= res.results.pr50k3_precision <= 1.0
    assert 0.0 <= res.results.pr50k3_recall <= 1.0


def test_metric_registry_complete():
    for name in ["fid50k_full", "kid50k_full", "pr50k3_full", "ppl2_wend",
                 "is50k", "fid50k", "kid50k", "pr50k3", "ppl_zfull",
                 "ppl_wfull", "ppl_zend", "ppl_wend"]:
        assert metric_main.is_valid_metric(name), name


def test_dataset_feature_cache(tmp_path):
    ds = ArrayDataset(make_images(64, seed=4))
    det = get_feature_detector("fake_v1")
    opts = MetricOptions(dataset=ds, cache_dir=str(tmp_path), batch_size=32,
                         dataset_kwargs={"path": "x"})
    s1 = metric_utils.compute_feature_stats_for_dataset(
        opts, det, capture_mean_cov=True)
    assert len(list(tmp_path.glob("feats-*.pkl"))) == 1
    s2 = metric_utils.compute_feature_stats_for_dataset(
        opts, det, capture_mean_cov=True)
    np.testing.assert_allclose(s1.get_mean_cov()[0], s2.get_mean_cov()[0])


def test_report_metric_writes_jsonl(tmp_path):
    ds = ArrayDataset(make_images(64, seed=5))
    res = metric_main.calc_metric("fid50k", **_opts(ds, make_sampler(5)))
    metric_main.report_metric(res, run_dir=str(tmp_path))
    lines = (tmp_path / "metric-fid50k.jsonl").read_text().strip().split("\n")
    rec = json.loads(lines[0])
    assert "results" in rec and "total_time" in rec
