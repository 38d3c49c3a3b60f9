"""Test config: force an 8-device CPU mesh so multi-device SPMD logic
(psum grads, sharded samplers, cross-replica BN) is tested without TPU
hardware — the capability the PyTorch reference lacked (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Trainer e2e tests run single-device for speed plus one 2-device run
# (test_e2e.py::test_dcgan_end_to_end_multidevice); the full trainer is
# verified green on all 8 fake devices (round-1's rendezvous aborts stopped
# reproducing once the D phase split into rollout + update programs).

import jax  # noqa: E402  (import after env is set)
import pytest  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via config so tests
# run on the 8 fake host devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite's wall time on a 1-core box is
# dominated by XLA:CPU compiles, and many programs recur — across test files
# within one run (the in-memory jit cache is per-function-instance, the disk
# cache keys on HLO hash) and across repeated runs.  Measured: a warm rerun
# of the e2e lane drops ~4-5x.  Override the location with
# SBG_TEST_CACHE_DIR; set it empty to disable.
_cache_dir = os.environ.get(
    "SBG_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_compile_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------- test lanes
# Auto-marking: every test gets exactly one of fast/slow/e2e (+ multihost),
# so `pytest -m fast` is a <5-min smoke on a 1-core box (VERDICT r2 #7) and
# `pytest -m "not e2e"` skips the full trainer runs.  Assignment is by
# module, with per-test overrides for quick tests inside slow modules.

_E2E_MODULES = {"test_e2e", "test_train", "test_cycle", "test_multihost",
                "test_tools", "test_exact_resume", "test_metric_number_parity"}
_FAST_MODULES = {"test_config", "test_data", "test_resolver", "test_ops",
                 "test_native_loader"}
# Quick tests inside otherwise-slow modules (measured on the 1-core box).
_FAST_TESTS = {
    ("test_metrics", "test_feature_stats_mean_cov"),
    ("test_metrics", "test_feature_stats_max_items_truncation"),
    ("test_metrics", "test_fake_detector_deterministic"),
    ("test_metrics", "test_metric_registry_complete"),
    ("test_metrics", "test_knn_device_matches_numpy_oracle"),
    ("test_metrics", "test_pr_self_distribution_is_perfect"),
    ("test_augment", "test_augpipe_specs_complete"),
    ("test_models", "test_fully_connected_equalized_lr"),
    ("test_models", "test_minibatch_std_layer"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod == "test_multihost":
            item.add_marker(pytest.mark.multihost)
        if mod in _FAST_MODULES or (mod, name) in _FAST_TESTS:
            item.add_marker(pytest.mark.fast)
        elif mod in _E2E_MODULES:
            item.add_marker(pytest.mark.e2e)
        else:
            item.add_marker(pytest.mark.slow)
