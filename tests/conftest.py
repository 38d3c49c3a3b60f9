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

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via config so tests
# run on the 8 fake host devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
