"""Modulated / demodulated convolution — the StyleGAN2 core op.

TPU-first design of reference train_parts/generators.py:43-100
(`modulated_conv2d`).  The reference's fused GPU path folds the batch into
conv *groups* with per-sample materialized weights — a grouped-conv trick
that maps poorly onto the MXU (tiny per-group contractions).  Because
convolution is linear, per-sample weight modulation is algebraically identical
to scaling the *input channels* before the conv and (for demodulation) scaling
the *output channels* after it:

    y[n] = conv(x[n], w * s[n]) * d[n]
         = conv(x[n] * s[n], w) * d[n]
    d[n,o] = rsqrt( sum_{k,i,j} (w[i,j,k,o] * s[n,k])^2 + eps )
           = rsqrt( (s[n]^2) @ W2 + eps ),   W2[k,o] = sum_{i,j} w[i,j,k,o]^2

so one big batched conv feeds the MXU at full tile size, the demod
coefficients are one small [N,K]x[K,O] matmul, and XLA fuses both elementwise
scalings into the conv's input/output.  This is exact (up to float assoc.),
not an approximation, and it is the reference's own non-fused path
(generators.py:84-88) promoted to the only path.

Layouts: x [N,H,W,Cin], w [kh,kw,Cin,Cout], styles [N,Cin], noise [N,H,W,1]
or [N,H,W,Cout].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from style_big_gan_tpu.ops.conv2d_resample import conv2d_resample


def modulated_conv2d(x: jax.Array,
                     w: jax.Array,
                     styles: jax.Array,
                     noise: Optional[jax.Array] = None,
                     up: int = 1,
                     down: int = 1,
                     padding: int = 0,
                     resample_filter: Optional[jnp.ndarray] = None,
                     demodulate: bool = True,
                     flip_weight: bool = True,
                     fused_modconv: bool = False) -> jax.Array:
    """Style-modulated conv (reference: generators.py:43-100).

    `fused_modconv` is accepted for API parity but ignored: on TPU the
    input/output-scaling formulation is the fast path (see module docstring).
    """
    n = x.shape[0]
    kh, kw, cin, cout = w.shape
    assert styles.shape == (n, cin), (styles.shape, (n, cin))

    # Pre-normalize to avoid overflow in reduced precision
    # (reference: generators.py:63-65).
    if demodulate and x.dtype in (jnp.float16, jnp.bfloat16):
        w = w * (1.0 / jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True), 1e-8))
        styles = styles / jnp.maximum(
            jnp.max(jnp.abs(styles), axis=1, keepdims=True), 1e-8)

    # Demodulation coefficients without materializing per-sample weights.
    dcoefs = None
    if demodulate:
        w32 = w.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        w2 = jnp.sum(w32 * w32, axis=(0, 1))              # [Cin, Cout]
        sigma2 = jnp.matmul(s32 * s32, w2)                # [N, Cout]
        dcoefs = jax.lax.rsqrt(sigma2 + 1e-8)

    x = x * styles.astype(x.dtype)[:, None, None, :]
    # Cast the kernel to the activation dtype HERE, not inside the conv:
    # the conv's fwd, input-grad and weight-grad each want a different
    # kernel layout, and XLA places those transpose copies before the
    # convert — on the f32 param they cost 2x the bytes of the bf16 copies
    # this early cast produces (trace evidence: f32[3,3,512,512] copy ops
    # dominating jit__g_reg_step's data-formatting time, BASELINE.md r3).
    x = conv2d_resample(x, w.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
