"""Platform capability probes.

The axon-tunneled TPU backend reports platform 'tpu' but fails at runtime on
buffer donation (INVALID_ARGUMENT surfacing at the first device_get).  A
one-time micro-probe detects this so the step builder can fall back to
non-donating jits instead of crashing mid-training.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def donation_supported() -> bool:
    import jax
    import jax.numpy as jnp
    try:
        f = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
        y = f(jnp.ones((8,), jnp.float32))
        float(y[0])
        return True
    except Exception:
        return False
