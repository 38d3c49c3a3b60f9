"""Metric registry + the 12 reference metrics.

Rebuild of reference stylegan2ada/metrics/metric_main.py:24-150 and the five
metric modules (frechet_inception_distance.py, kernel_inception_distance.py,
inception_score.py, precision_recall.py, perceptual_path_length.py).  The
metric *math* is identical; feature extraction runs through jitted JAX
detectors (metric_utils.py).  Results are reported to
`metric-<name>.jsonl` with the reference's field names.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np
import scipy.linalg

from style_big_gan_tpu.metrics import metric_utils
from style_big_gan_tpu.metrics.metric_utils import (STAND_IN_DETECTORS,
                                                    MetricOptions,
                                                    get_feature_detector)
from style_big_gan_tpu.registries import metrics as metric_registry
from style_big_gan_tpu.utils.misc import EasyDict

_metric_dict: Dict[str, Any] = {}


def register_metric(fn):
    """reference: metric_main.py:24-30."""
    _metric_dict[fn.__name__] = fn
    metric_registry.classes[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return sorted(_metric_dict.keys())


_warned_stand_in = set()


def calc_metric(metric: str, **kwargs) -> EasyDict:
    """reference: metric_main.py:39-63 (timing kept; result broadcast is moot
    in single-process SPMD).

    When the feature detector is a stand-in (e.g. the deterministic
    random-conv ``fake_v1`` used for smoke runs), every result key is
    suffixed with ``@<detector>`` — a number named ``fid50k_full`` computed
    by a random-conv network must never be mistaken for a real FID."""
    assert is_valid_metric(metric), metric
    opts = MetricOptions(**kwargs)
    start_time = time.time()
    results = _metric_dict[metric](opts)
    total_time = time.time() - start_time
    if opts.detector in STAND_IN_DETECTORS:
        results = {f"{k}@{opts.detector}": v for k, v in results.items()}
        if opts.detector not in _warned_stand_in:
            _warned_stand_in.add(opts.detector)
            print(f"WARNING: metric '{metric}' computed with the "
                  f"'{opts.detector}' STAND-IN detector — values track "
                  "distribution drift only and are NOT comparable to "
                  "published FID/KID/IS/PPL numbers. Result keys carry the "
                  f"@{opts.detector} suffix; set log.detector to a real "
                  "detector (inception_v3 / inception_v3_jax + weights) for "
                  "perceptual metrics.")
    return EasyDict(
        results=EasyDict(results),
        metric=metric,
        detector=opts.detector,
        total_time=total_time,
        total_time_str=f"{total_time:.1f}s",
        num_gpus=opts.num_shards,
    )


def report_metric(result_dict, run_dir: Optional[str] = None,
                  snapshot_path: Optional[str] = None):
    """reference: metric_main.py:67-77 — metric-<name>.jsonl lines."""
    metric = result_dict["metric"]
    jsonl_line = json.dumps(dict(result_dict, snapshot_pkl=snapshot_path,
                                 timestamp=time.time()))
    print(jsonl_line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "at") as f:
            f.write(jsonl_line + "\n")
    return result_dict


# ---------------------------------------------------------------- FID / KID


def _budget(opts: MetricOptions, max_real, num_gen):
    """opts.num_items overrides the metric's sample budget (smoke/test use;
    the reference sizes are the defaults)."""
    if opts.num_items:
        num_gen = min(num_gen, opts.num_items)
        max_real = min(max_real, opts.num_items) if max_real else opts.num_items
    return max_real, num_gen


def _compute_fid(opts: MetricOptions, max_real: Optional[int],
                 num_gen: int) -> float:
    """reference: frechet_inception_distance.py:21-45."""
    max_real, num_gen = _budget(opts, max_real, num_gen)
    detector = get_feature_detector(opts.detector, opts.detector_path)
    stats_real = metric_utils.compute_feature_stats_for_dataset(
        opts, detector, max_items=max_real, capture_mean_cov=True)
    stats_gen = metric_utils.compute_feature_stats_for_generator(
        opts, detector, max_items=num_gen, capture_mean_cov=True)
    mu_real, sigma_real = stats_real.get_mean_cov()
    mu_gen, sigma_gen = stats_gen.get_mean_cov()
    m = np.square(mu_gen - mu_real).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_real), disp=False)
    fid = np.real(m + np.trace(sigma_gen + sigma_real - s * 2))
    return float(fid)


def _compute_kid(opts: MetricOptions, max_real: Optional[int], num_gen: int,
                 num_subsets: int = 100, max_subset_size: int = 1000) -> float:
    """reference: kernel_inception_distance.py:18-44."""
    max_real, num_gen = _budget(opts, max_real, num_gen)
    detector = get_feature_detector(opts.detector, opts.detector_path)
    real = metric_utils.compute_feature_stats_for_dataset(
        opts, detector, max_items=max_real, capture_all=True).get_all()
    gen = metric_utils.compute_feature_stats_for_generator(
        opts, detector, max_items=num_gen, capture_all=True).get_all()
    n = real.shape[1]
    m = min(min(real.shape[0], gen.shape[0]), max_subset_size)
    t = 0.0
    rng = np.random.RandomState(opts.rng_seed)
    for _ in range(num_subsets):
        x = gen[rng.choice(gen.shape[0], m, replace=False)]
        y = real[rng.choice(real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def _compute_is(opts: MetricOptions, num_gen: int, num_splits: int = 10):
    """reference: inception_score.py:18-37."""
    _, num_gen = _budget(opts, None, num_gen)
    detector = get_feature_detector(opts.detector, opts.detector_path)
    logits = metric_utils.compute_feature_stats_for_generator(
        opts, detector, max_items=num_gen, capture_all=True,
        return_logits=True).get_all()
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = probs / probs.sum(axis=1, keepdims=True)
    scores = []
    for i in range(num_splits):
        part = probs[i * num_gen // num_splits:(i + 1) * num_gen // num_splits]
        kl = part * (np.log(part + 1e-12) -
                     np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def _compute_pr(opts: MetricOptions, max_real: Optional[int], num_gen: int,
                nhood_size: int = 3, row_batch_size: int = 4096,
                col_batch_size: int = 8192):
    """reference: precision_recall.py:19-60 (k-NN manifold test).

    The distance/kNN blocks run as jitted TPU programs (metrics/knn.py) —
    the reference streams fp16 torch.cdist blocks across GPUs; here each
    block is an f32 MXU matmul with a streaming smallest-k scan, so the
    full pr50k3 budget (200k x 50k) is minutes of device time, not hours
    of host numpy."""
    from style_big_gan_tpu.metrics import knn

    max_real, num_gen = _budget(opts, max_real, num_gen)
    detector = get_feature_detector(opts.detector, opts.detector_path)
    real = metric_utils.compute_feature_stats_for_dataset(
        opts, detector, max_items=max_real, capture_all=True).get_all()
    gen = metric_utils.compute_feature_stats_for_generator(
        opts, detector, max_items=num_gen, capture_all=True).get_all()

    radii_real = knn.knn_radii_sq(real, nhood_size, row_batch_size,
                                  col_batch_size)
    radii_gen = knn.knn_radii_sq(gen, nhood_size, row_batch_size,
                                 col_batch_size)
    precision = float(knn.manifold_hits(gen, real, radii_real,
                                        row_batch_size,
                                        col_batch_size).mean())
    recall = float(knn.manifold_hits(real, gen, radii_gen, row_batch_size,
                                     col_batch_size).mean())
    return precision, recall


def _compute_ppl(opts: MetricOptions, num_samples: int, epsilon: float,
                 space: str, sampling: str, crop: bool) -> float:
    """reference: perceptual_path_length.py:24-132.  Requires a G that
    exposes paired perturbed rollouts via opts.G_kwargs['ppl_sampler'] — a
    metrics.ppl_sampler.PPLSampler (built by tools/calc_metrics.py and
    BaseTrainer.evaluate_metrics for SG2-family generators)."""
    if opts.num_items:
        num_samples = min(num_samples, opts.num_items)
    sampler = opts.G_kwargs.get("ppl_sampler")
    if sampler is None:
        raise ValueError(
            "PPL requires G_kwargs['ppl_sampler'] "
            "(metrics/ppl_sampler.PPLSampler; needs an SG2-family G)")
    detector = get_feature_detector(opts.detector, opts.detector_path)
    # Native-resolution LPIPS when the detector supports it (the reference
    # PPL feeds vgg16 with resize_images=False); fall back to the generic
    # feature path otherwise.
    dev_fn = getattr(detector, "lpips_embed_device", None) or \
        getattr(detector, "features_device", None)
    dists = []
    bs = opts.batch_size
    rng = np.random.RandomState(opts.rng_seed)
    done = 0
    while done < num_samples:
        img0, img1 = sampler(batch_size=bs, rng=rng, epsilon=epsilon,
                             space=space, sampling=sampling, crop=crop)
        if dev_fn is not None and not isinstance(img0, np.ndarray):
            # Keep the squared LPIPS distance on device, defer all syncs
            # (same pipelining as compute_feature_stats_for_generator).
            import jax.numpy as jnp
            f0 = dev_fn(img0)
            f1 = dev_fn(img1)
            dists.append(jnp.sum(jnp.square(f0 - f1), axis=1)
                         / epsilon ** 2)
        else:
            # Host detectors: prefer the native-resolution LPIPS embedding
            # (the reference PPL contract) over the generic feature path.
            host_fn = getattr(detector, "lpips_embed", None) or detector
            f0 = host_fn(img0)
            f1 = host_fn(img1)
            dists.append(np.sum((f0 - f1) ** 2, axis=1) / epsilon ** 2)
        done += bs
    dist = np.concatenate([np.asarray(d) for d in dists])[:num_samples]
    lo = np.percentile(dist, 1, method="lower")
    hi = np.percentile(dist, 99, method="higher")
    return float(np.extract(np.logical_and(dist >= lo, dist <= hi),
                            dist).mean())


# ------------------------------------------------------- registered metrics
# Full suite (reference: metric_main.py:82-116).


@register_metric
def fid50k_full(opts):
    return dict(fid50k_full=_compute_fid(opts, max_real=None, num_gen=50000))


@register_metric
def kid50k_full(opts):
    return dict(kid50k_full=_compute_kid(opts, max_real=1000000,
                                         num_gen=50000))


@register_metric
def pr50k3_full(opts):
    p, r = _compute_pr(opts, max_real=200000, num_gen=50000)
    return dict(pr50k3_full_precision=p, pr50k3_full_recall=r)


@register_metric
def ppl2_wend(opts):
    return dict(ppl2_wend=_compute_ppl(opts, num_samples=50000, epsilon=1e-4,
                                       space="w", sampling="end", crop=False))


@register_metric
def is50k(opts):
    mean, std = _compute_is(opts, num_gen=50000)
    return dict(is50k_mean=mean, is50k_std=std)


# Legacy variants (reference: metric_main.py:120-150).


@register_metric
def fid50k(opts):
    return dict(fid50k=_compute_fid(opts, max_real=50000, num_gen=50000))


@register_metric
def kid50k(opts):
    return dict(kid50k=_compute_kid(opts, max_real=50000, num_gen=50000))


@register_metric
def pr50k3(opts):
    p, r = _compute_pr(opts, max_real=50000, num_gen=50000)
    return dict(pr50k3_precision=p, pr50k3_recall=r)


@register_metric
def ppl_zfull(opts):
    return dict(ppl_zfull=_compute_ppl(opts, num_samples=50000, epsilon=1e-4,
                                       space="z", sampling="full", crop=True))


@register_metric
def ppl_wfull(opts):
    return dict(ppl_wfull=_compute_ppl(opts, num_samples=50000, epsilon=1e-4,
                                       space="w", sampling="full", crop=True))


@register_metric
def ppl_zend(opts):
    return dict(ppl_zend=_compute_ppl(opts, num_samples=50000, epsilon=1e-4,
                                      space="z", sampling="end", crop=True))


@register_metric
def ppl_wend(opts):
    return dict(ppl_wend=_compute_ppl(opts, num_samples=50000, epsilon=1e-4,
                                      space="w", sampling="end", crop=True))
