"""Perceptual Path Length sampler: paired perturbed generator rollouts.

Rebuild of reference stylegan2ada/metrics/perceptual_path_length.py:24-97
(PPLSampler): interpolate two latents at t and t+epsilon (slerp in z, lerp
in w), synthesize both with SHARED per-layer noise, optional center-crop,
mean-pool to <=256px, scale to [0, 255] float.  The LPIPS distance between
the pair divided by epsilon^2 is aggregated by metric_main._compute_ppl.

TPU-native differences: one jitted pure function per (epsilon, space,
sampling, crop) combination over the G param pytree; the reference's
noise-buffer randomization + noise_mode='const' becomes noise_mode='random'
with the SAME rng key for both rollouts (flax folds the key per call site,
so identical keys give identical per-layer noise).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation of batched vectors
    (reference: perceptual_path_length.py:24-33)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b - d * a
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    d = a * jnp.cos(p) + c * jnp.sin(p)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


class PPLSampler:
    """Callable consumed by metric_main._compute_ppl:

        sampler(batch_size, rng, epsilon, space, sampling, crop)
            -> (img0, img1) float device arrays in [0, 255], NHWC, <=256px.

    Requires a generator exposing ``map_ws``/``synthesize`` (the SG2 family;
    reference PPL has the same constraint — it calls G.mapping/G.synthesis).
    """

    def __init__(self, G, g_vars, dataset=None):
        if not (hasattr(G, "map_ws") and hasattr(G, "synthesize")):
            raise ValueError(
                f"PPL requires a mapping/synthesis generator (got "
                f"{type(G).__name__}); SG2-family models expose map_ws/"
                f"synthesize.")
        self.G = G
        self.g_vars = g_vars
        self.dataset = dataset
        self.z_dim = int(getattr(G, "z_dim", 512))
        self.c_dim = int(getattr(G, "c_dim", 0))
        self.img_resolution = int(getattr(G, "img_resolution", 0))
        self.img_channels = int(getattr(G, "img_channels", 3))
        self._jitted = {}

    # ------------------------------------------------------------------

    def _build(self, epsilon: float, space: str, sampling: str, crop: bool):
        assert space in ("z", "w") and sampling in ("full", "end")
        G = self.G
        res, ch = self.img_resolution, self.img_channels

        def pair(g_vars, z0, z1, t, c, k_noise):
            # Interpolate in W or Z (reference: :56-63).
            if space == "w":
                w0 = G.apply(g_vars, z0, c, method=G.map_ws)
                w1 = G.apply(g_vars, z1, c, method=G.map_ws)
                tt = t[:, None, None]
                wt0 = w0 + (w1 - w0) * tt
                wt1 = w0 + (w1 - w0) * (tt + epsilon)
            else:
                zt0 = slerp(z0, z1, t[:, None])
                zt1 = slerp(z0, z1, t[:, None] + epsilon)
                wt0 = G.apply(g_vars, zt0, c, method=G.map_ws)
                wt1 = G.apply(g_vars, zt1, c, method=G.map_ws)

            def synth(ws):
                # Shared noise across the pair: same key -> same per-layer
                # draws (replaces the reference's buffer randomization +
                # noise_mode='const', :65-71).
                return G.apply(g_vars, ws, method=G.synthesize,
                               force_fp32=True, noise_mode="random",
                               rngs={"noise": k_noise})

            img0, img1 = synth(wt0), synth(wt1)

            def post(img):
                if crop:
                    # Center crop to rows [3c:7c], cols [2c:6c] (NHWC;
                    # reference NCHW :74-77).
                    assert img.shape[1] == img.shape[2]
                    cq = img.shape[1] // 8
                    img = img[:, cq * 3:cq * 7, cq * 2:cq * 6, :]
                factor = res // 256
                if factor > 1:
                    n, h, w, cc = img.shape
                    img = img.reshape(n, h // factor, factor, w // factor,
                                      factor, cc).mean(axis=(2, 4))
                img = (img + 1) * (255 / 2)
                if ch == 1:
                    img = jnp.tile(img, (1, 1, 1, 3))
                return img

            return post(img0), post(img1)

        return jax.jit(pair)

    # ------------------------------------------------------------------

    def _sample_c(self, rng: np.random.RandomState, n: int) -> jax.Array:
        if self.c_dim > 0 and self.dataset is not None:
            idx = [rng.randint(len(self.dataset)) for _ in range(n)]
            return jnp.asarray(
                np.stack([self.dataset.get_label(int(i)) for i in idx]),
                jnp.float32)
        return jnp.zeros((n, self.c_dim), jnp.float32)

    def __call__(self, batch_size: int, rng: np.random.RandomState,
                 epsilon: float = 1e-4, space: str = "w",
                 sampling: str = "end", crop: bool = False):
        key = (float(epsilon), space, sampling, bool(crop))
        if key not in self._jitted:
            self._jitted[key] = self._build(*key)
        fn = self._jitted[key]
        t = rng.rand(batch_size).astype(np.float32) * \
            (1.0 if sampling == "full" else 0.0)
        z0 = rng.randn(batch_size, self.z_dim).astype(np.float32)
        z1 = rng.randn(batch_size, self.z_dim).astype(np.float32)
        c = self._sample_c(rng, batch_size)
        k_noise = jax.random.PRNGKey(rng.randint(2 ** 31))
        return fn(self.g_vars, jnp.asarray(z0), jnp.asarray(z1),
                  jnp.asarray(t), c, k_noise)
