"""Metric infrastructure: feature detectors, streaming stats, cached loops.

Rebuild of reference stylegan2ada/metrics/metric_utils.py for the TPU stack:

* detectors are jitted JAX models (or any callable `uint8 NHWC -> [N, D]`),
  registered by name.  The reference downloads TorchScript detectors; this
  image has no egress, so detectors resolve from *local* weight files
  (configurable path) and tests use a deterministic random-conv detector.
* FeatureStats: identical streaming (mean, cov) + capture-all semantics
  (reference: metric_utils.py:56-132).
* dataset/generator feature loops with an md5-keyed on-disk cache
  (reference: metric_utils.py:181-276).  shard/num_shards stride the items
  per process exactly like the reference's rank interleaving (:205-207);
  under `jax.distributed` multi-host runs each batch's features are
  all-gathered so every process ends with full stats, and single-process
  shards return partial stats for FeatureStats.merge.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu.utils.misc import EasyDict


class MetricOptions:
    """reference: metric_utils.py:22-32."""

    def __init__(self, G=None, G_kwargs=None, dataset=None,
                 dataset_kwargs=None, num_items: Optional[int] = None,
                 shard: int = 0, num_shards: int = 1, rng_seed: int = 0,
                 cache_dir: Optional[str] = None, progress=None,
                 detector: str = "fake_v1", detector_path: Optional[str] = None,
                 batch_size: int = 64):
        self.G = G                       # callable (z, c) -> uint8 NHWC images
        self.G_kwargs = G_kwargs or {}
        self.dataset = dataset
        self.dataset_kwargs = dataset_kwargs or {}
        self.num_items = num_items
        self.shard = shard
        self.num_shards = num_shards
        self.rng_seed = rng_seed
        self.cache_dir = cache_dir
        self.progress = progress
        self.detector = detector
        self.detector_path = detector_path
        self.batch_size = batch_size


# --------------------------------------------------------------------------
# Detectors.

_DETECTORS: Dict[str, Callable] = {}

# Detectors that are NOT perceptual networks: metric results computed with
# them get an explicit @<name> key suffix (metric_main.calc_metric) so they
# can never be misread as real FID/KID/IS numbers.
STAND_IN_DETECTORS = {"fake_v1"}


def register_detector(name: str):
    def deco(fn):
        _DETECTORS[name] = fn
        return fn
    return deco


def get_feature_detector(name: str, path: Optional[str] = None):
    """Build detector by name (reference: metric_utils.py:41-52, local-only)."""
    if name not in _DETECTORS:
        raise KeyError(f"Unknown detector '{name}'. Known: {sorted(_DETECTORS)}")
    return _DETECTORS[name](path)


@register_detector("fake_v1")
def _fake_detector(path=None):
    """Deterministic random-conv detector for tests and smoke runs: fixed
    random strided convs + global pooling -> 256-D features + 64-way 'logits'.
    Not a perceptual metric — a stand-in with the right API/shapes."""
    key = jax.random.PRNGKey(1234)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (5, 5, 3, 32)) * 0.1
    w2 = jax.random.normal(k2, (3, 3, 32, 256)) * 0.1
    w3 = jax.random.normal(k3, (256, 64)) * 0.1

    @jax.jit
    def apply(images_u8):
        x = images_u8.astype(jnp.float32) / 127.5 - 1.0
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        dn = ("NHWC", "HWIO", "NHWC")
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w1, (4, 4), "SAME", dimension_numbers=dn))
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w2, (4, 4), "SAME", dimension_numbers=dn))
        feat = jnp.mean(x, axis=(1, 2))
        logits = feat @ w3
        return feat, logits

    class _Det:
        name = "fake_v1"
        feature_dim = 256
        logits_dim = 64

        def __call__(self, images_u8, return_logits=False):
            return np.asarray(self.features_device(images_u8, return_logits))

        def features_device(self, images_u8, return_logits=False):
            feat, logits = apply(jnp.asarray(images_u8))
            return logits if return_logits else feat

    return _Det()


@register_detector("inception_v3")
def _inception_detector(path=None):
    """NVlabs TorchScript wrapper (exact reference numerics) when handed a
    .pt; the native JAX port when handed converted .npz weights."""
    if path and str(path).endswith(".npz"):
        from style_big_gan_tpu.metrics.inception_jax import \
            InceptionV3JaxDetector
        return InceptionV3JaxDetector(path)
    from style_big_gan_tpu.metrics.inception import InceptionV3Detector
    return InceptionV3Detector(path)


@register_detector("inception_v3_jax")
def _inception_jax_detector(path=None):
    """Native JAX/TPU FID inception (metrics/inception_jax.py); `path` is an
    .npz from tools/convert_detector.py."""
    from style_big_gan_tpu.metrics.inception_jax import InceptionV3JaxDetector
    return InceptionV3JaxDetector(path)


@register_detector("vgg16_lpips")
def _vgg16_lpips_detector(path=None):
    """Native JAX LPIPS-VGG embedding (metrics/vgg16_jax.py): squared L2
    between embeddings == LPIPS distance, the contract _compute_ppl and the
    projector consume.  `path` is an .npz from tools/convert_detector.py,
    or the NVlabs vgg16.pt TorchScript pickle (exact reference numerics,
    host-side — metrics/vgg16_torch.py)."""
    if path and str(path).endswith(".pt"):
        from style_big_gan_tpu.metrics.vgg16_torch import \
            VGG16LPIPSTorchDetector
        return VGG16LPIPSTorchDetector(path)
    from style_big_gan_tpu.metrics.vgg16_jax import VGG16LPIPSJaxDetector
    return VGG16LPIPSJaxDetector(path)


# --------------------------------------------------------------------------


class FeatureStats:
    """Streaming mean/cov and optional full capture
    (reference: metric_utils.py:56-132)."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = None
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int):
        if self.num_features is not None:
            assert num_features == self.num_features
        else:
            self.num_features = num_features
            self.all_features = []
            self.raw_mean = np.zeros([num_features], np.float64)
            self.raw_cov = np.zeros([num_features, num_features], np.float64)

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            if self.num_items + x.shape[0] > self.max_items:
                x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def merge(self, *others: "FeatureStats") -> "FeatureStats":
        """Combine shard-partial stats into full stats (the local-process
        counterpart of the reference's per-batch rank gather,
        metric_utils.py:96-106).  Feature ORDER follows argument order;
        mean/cov/PR consumers are order-free."""
        for o in others:
            if o.num_features is None:
                continue
            self.set_num_features(o.num_features)
            self.num_items += o.num_items
            if self.capture_all:
                self.all_features.extend(o.all_features)
            if self.capture_mean_cov:
                self.raw_mean += o.raw_mean
                self.raw_cov += o.raw_cov
        return self

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.__dict__, f)

    @staticmethod
    def load(path: str) -> "FeatureStats":
        with open(path, "rb") as f:
            state = pickle.load(f)
        obj = FeatureStats()
        obj.__dict__.update(state)
        return obj


class ProgressMonitor:
    """reference: metric_utils.py:136-177 (console-only)."""

    def __init__(self, tag=None, num_items=None, verbose=False):
        self.tag = tag
        self.num_items = num_items
        self.verbose = verbose

    def update(self, cur_items):
        if self.verbose and self.tag is not None:
            print(f"{self.tag:<20s} {cur_items}/{self.num_items}")

    def sub(self, tag=None, num_items=None):
        return ProgressMonitor(tag=tag, num_items=num_items,
                               verbose=self.verbose)


# --------------------------------------------------------------------------


def _cache_key(tag: str, opts: MetricOptions, detector) -> str:
    # detector_path is part of the identity: the same detector name can be
    # fed different weight files (e.g. parity harnesses).
    ident = repr([tag, sorted(opts.dataset_kwargs.items()), detector.name,
                  opts.detector_path, opts.num_items])
    return hashlib.md5(ident.encode()).hexdigest()


def _shard_gather(opts: MetricOptions):
    """Per-batch cross-process feature gather, the SPMD counterpart of the
    reference's rank-interleaved all-gather (metric_utils.py:96-106).
    Returns a gather fn (or None) — non-None means every process ends up
    with the FULL stats.  Active only under `jax.distributed` multi-host
    runs with one shard per process."""
    if opts.num_shards <= 1 or jax.process_count() <= 1:
        return None
    if opts.num_shards != jax.process_count():
        return None
    from jax.experimental import multihost_utils

    def gather(feats) -> np.ndarray:
        g = multihost_utils.process_allgather(jnp.asarray(feats))
        return np.asarray(g).reshape(-1, g.shape[-1])   # rank-major concat

    return gather


def compute_feature_stats_for_dataset(opts: MetricOptions, detector,
                                      max_items: Optional[int] = None,
                                      return_logits: bool = False,
                                      **stats_kwargs) -> FeatureStats:
    """reference: metric_utils.py:181-230.  Shard semantics match the
    reference's rank striding: shard s processes items {i*num_shards+s mod N}
    (equal counts per shard via modulo wrap, :205-207); under multi-host the
    per-batch gather makes every process's stats full, single-process shards
    return partials for FeatureStats.merge."""
    dataset = opts.dataset
    num_items = len(dataset)
    if max_items is not None:
        num_items = min(num_items, max_items)
    gather = _shard_gather(opts)
    full = opts.num_shards <= 1 or gather is not None

    cache_file = None
    if opts.cache_dir is not None and full:
        key = _cache_key(f"dataset-{sorted(stats_kwargs.items())}"
                         f"-{return_logits}", opts, detector)
        cache_file = os.path.join(opts.cache_dir, f"feats-{key}.pkl")
        if os.path.isfile(cache_file):
            return FeatureStats.load(cache_file)

    stats = FeatureStats(max_items=num_items if full else None,
                         **stats_kwargs)
    bs = opts.batch_size
    if gather is not None:
        # Modulo wrap keeps per-shard counts equal so multi-host gathers
        # stay rectangular; max_items truncates the wrapped excess.
        per_shard = (num_items - 1) // opts.num_shards + 1
        subset = [(i * opts.num_shards + opts.shard) % num_items
                  for i in range(per_shard)]
    else:
        # Partial-stats mode (merged later): no wrap, no duplicates.
        subset = list(range(opts.shard, num_items, opts.num_shards))
    for start in range(0, len(subset), bs):
        if stats.is_full():
            break
        idxs = subset[start:start + bs]
        images = np.stack([dataset[i][0] for i in idxs])
        feats = detector(images, return_logits=return_logits)
        if gather is not None:
            feats = gather(feats)
        stats.append(feats)
    if cache_file is not None:
        os.makedirs(opts.cache_dir, exist_ok=True)
        stats.save(cache_file)
    return stats


def compute_feature_stats_for_generator(opts: MetricOptions, detector,
                                        max_items: int = 50000,
                                        return_logits: bool = False,
                                        **stats_kwargs) -> FeatureStats:
    """reference: metric_utils.py:234-276 — G_ema rollouts through detector.

    When the sampler returns device arrays and the detector exposes
    `features_device`, batches stay on device and UNSYNCED until one final
    host fetch: rollout and detector dispatches pipeline freely instead of
    blocking on a per-batch np.asarray (per-batch host syncs dominate
    metric time on tunneled TPUs, benchmarks/bench_metrics.py).

    Sharding: shard s generates ceil(max_items/num_shards) of the rollouts
    (seeded per shard); multi-host runs gather per batch so every process
    ends with full stats, single-process shards return partials for
    FeatureStats.merge."""
    gather = _shard_gather(opts)
    full = opts.num_shards <= 1 or gather is not None
    local_target = (max_items - 1) // opts.num_shards + 1
    stats = FeatureStats(max_items=max_items if full else local_target,
                         **stats_kwargs)
    bs = opts.batch_size
    rng = np.random.RandomState(opts.rng_seed + opts.shard)
    dev_fn = getattr(detector, "features_device", None)
    dev_batches = []
    count = 0
    while count < local_target:
        images = opts.G(batch_size=bs, rng=rng, **opts.G_kwargs)
        assert images.dtype == np.uint8
        if gather is not None:
            feats = dev_fn(images, return_logits=return_logits) \
                if dev_fn is not None else \
                detector(images, return_logits=return_logits)
            stats.append(gather(feats))
            count += int(images.shape[0])
        elif dev_fn is not None and not isinstance(images, np.ndarray):
            dev_batches.append(dev_fn(images, return_logits=return_logits))
            count += int(images.shape[0])
        else:
            stats.append(detector(images, return_logits=return_logits))
            count = stats.num_items
    if dev_batches:
        stats.append(np.asarray(jnp.concatenate(dev_batches, axis=0)))
    return stats
