"""Pallas warp-pass kernel vs its jnp reference twin (interpret mode on the
CPU test mesh): forward equality, adjoint identity, grads, grad-of-grad."""

import numpy as np
import jax
import jax.numpy as jnp

from style_big_gan_tpu.ops.warp_pallas import warp_pass, warp_pass_ref

BITS = 4   # shifts < 16


def _inputs(n=2, a=40, l=136, v=24, seed=0):
    """l deliberately not a multiple of 128 (exercises the partial lane
    tile); a not a multiple of the sublane tile."""
    rnd = np.random.RandomState(seed)
    src = jnp.asarray(rnd.randn(n, a, l).astype(np.float32))
    pos = rnd.rand(n, v, 1) * (a - 1)
    i = np.arange(a)[None, None, :]
    tent = jnp.asarray(np.maximum(0, 1 - np.abs(pos - i)).astype(np.float32))
    shift = jnp.asarray((rnd.rand(n, l) * ((1 << BITS) - 2)).astype(
        np.float32))
    return src, tent, shift


def test_forward_matches_reference():
    src, tent, shift = _inputs()
    out = warp_pass(src, tent, shift, BITS)
    ref = warp_pass_ref(src, tent, shift, BITS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_adjoint_identity():
    """<warp(x), y> == <x, warp^T(y)> — the custom VJP is the exact adjoint."""
    src, tent, shift = _inputs(seed=1)
    rnd = np.random.RandomState(2)
    y = jnp.asarray(rnd.randn(*warp_pass(src, tent, shift, BITS).shape)
                    .astype(np.float32))
    lhs = jnp.sum(warp_pass(src, tent, shift, BITS) * y)
    (xt,) = jax.vjp(lambda s: warp_pass(s, tent, shift, BITS), src)[1](y)
    rhs = jnp.sum(src * xt)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_grad_matches_reference():
    src, tent, shift = _inputs(seed=3)

    def loss_pallas(s):
        return jnp.sum(jnp.sin(warp_pass(s, tent, shift, BITS)))

    def loss_ref(s):
        return jnp.sum(jnp.sin(warp_pass_ref(s, tent, shift, BITS)))

    gp = jax.grad(loss_pallas)(src)
    gr = jax.grad(loss_ref)(src)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_grad_of_grad():
    """R1 runs the warp inside a double backward; the custom-VJP pair must
    differentiate twice and agree with the jnp reference."""
    src, tent, shift = _inputs(n=1, a=24, l=130, v=12, seed=4)

    def inner(fn):
        def f(s):
            return jnp.sum(fn(s, tent, shift, BITS) ** 2)

        def outer(s):
            return jnp.sum(jax.grad(f)(s) ** 2)
        return jax.grad(outer)(src)

    gg_p = inner(warp_pass)
    gg_r = inner(warp_pass_ref)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_r),
                               rtol=1e-4, atol=1e-5)


def test_sharded_execution_matches_reference():
    """The kernel's custom_partitioning runs it batch-sharded over the
    8-device test mesh — forward and gradient must match the unsharded jnp
    reference (no collectives: each grid cell touches one image)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    src, tent, shift = _inputs(n=16, seed=7)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    s3 = NamedSharding(mesh, P("data"))
    s2 = NamedSharding(mesh, P("data", None))
    src_s = jax.device_put(src, s3)
    tent_s = jax.device_put(tent, s3)
    shift_s = jax.device_put(shift, s2)

    out = jax.jit(lambda s, t, sh: warp_pass(s, t, sh, BITS))(
        src_s, tent_s, shift_s)
    ref = warp_pass_ref(src, tent, shift, BITS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert out.sharding.spec == P("data")

    def loss_p(s):
        return jnp.sum(jnp.sin(warp_pass(s, tent_s, shift_s, BITS)))

    def loss_r(s):
        return jnp.sum(jnp.sin(warp_pass_ref(s, tent, shift, BITS)))

    gp = jax.jit(jax.grad(loss_p))(src_s)
    gr = jax.grad(loss_r)(src)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_bf16_path():
    src, tent, shift = _inputs(seed=5)
    out16 = warp_pass(src.astype(jnp.bfloat16), tent, shift, BITS)
    assert out16.dtype == jnp.bfloat16
    ref = warp_pass_ref(src, tent, shift, BITS)
    np.testing.assert_allclose(np.asarray(out16, dtype=np.float32),
                               np.asarray(ref), rtol=0.03, atol=0.05)
