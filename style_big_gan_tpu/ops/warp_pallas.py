"""Pallas TPU kernel for one scanline pass of the ADA affine warp.

One warp pass (augment/ada.py::affine_warp_2pass) is: per-lane fractional
clamp-shift along the row axis (binary cascade of edge-replicating shifts +
selects) followed by a per-image 1-D tent resample (a matmul).  As jnp ops,
the ~10 cascade steps each round-trip the full array through HBM.  This
kernel fuses the whole pass per (image, 128-lane tile): the source block is
read into VMEM once, the cascade runs on-chip, and the tent matmul executes
on the MXU — one HBM read of the source and one write of the (smaller)
resampled output.

Gradients: the pass is linear in `src`, so its VJP is the adjoint pass —
tent^T matmul followed by the adjoint of the clamp-shift cascade (a "splat":
zero-fill shift with boundary-row accumulation).  The two kernels are wired
as a `jax.custom_vjp` pair, each defined as the other's backward, so
`jax.grad` works to any order (the pattern the reference built by hand for
its CUDA ops, bias_act.py:178-206).

Shapes: src [n, A, L], tent [n, V, A], shift [n, L] (non-negative, integer
part < 2**bits) -> out [n, V, L].  Callers fold trailing channel dims into L
and repeat `shift` accordingly.  On CPU (tests) the kernels run in Pallas
interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _shift_clamp_rows(x, k):
    """x[min(i + k, A-1)] along axis 0 (edge-replicating shift)."""
    a = x.shape[0]
    return jnp.concatenate(
        [x[k:], jnp.broadcast_to(x[a - 1:a], (k,) + x.shape[1:])], axis=0)


def _splat_rows(x, k):
    """Adjoint of _shift_clamp_rows: zero-fill shift down by k, with the
    clamped mass (last k rows) accumulated onto the last row."""
    a = x.shape[0]
    body = jnp.concatenate(
        [jnp.zeros((k,) + x.shape[1:], x.dtype), x[:a - k]], axis=0)
    last = body[a - 1:a] + jnp.sum(x[a - k:], axis=0, keepdims=True)
    return jnp.concatenate([body[:a - 1], last], axis=0)


def _prec(dtype):
    """Match augment/ada.py::_prec_for: the f32 datapath keeps full-precision
    MXU passes (the 'exact' warp_dtype='float32' contract), bf16 runs at
    native rate."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _fwd_kernel(src_ref, tent_ref, shift_ref, out_ref, *, bits):
    x = src_ref[0]                                   # [A, LANE]
    sh = shift_ref[0]                                # [1, LANE] f32
    idx = jnp.floor(sh).astype(jnp.int32)
    frac = (sh - jnp.floor(sh)).astype(x.dtype)
    cur = x
    for b in range(bits):
        k = 1 << b
        cur = jnp.where((idx & k) > 0, _shift_clamp_rows(cur, k), cur)
    nxt = _shift_clamp_rows(cur, 1)
    cur = cur * (1.0 - frac) + nxt * frac
    t = tent_ref[0].astype(x.dtype)                  # [V, A]
    out_ref[0] = jnp.dot(t, cur, precision=_prec(x.dtype),
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _bwd_kernel(g_ref, tent_ref, shift_ref, out_ref, *, bits):
    g = g_ref[0]                                     # [V, LANE]
    sh = shift_ref[0]
    idx = jnp.floor(sh).astype(jnp.int32)
    frac = (sh - jnp.floor(sh)).astype(g.dtype)
    t = tent_ref[0].astype(g.dtype)                  # [V, A]
    u = jnp.dot(t.T, g, precision=_prec(g.dtype),
                preferred_element_type=jnp.float32
                ).astype(g.dtype)                    # [A, LANE]
    # adjoint of the fractional lerp
    cur = u * (1.0 - frac) + _splat_rows(u * frac, 1)
    # adjoint cascade: reversed bit order, same masks, splat instead of shift
    for b in reversed(range(bits)):
        k = 1 << b
        cur = jnp.where((idx & k) > 0, _splat_rows(cur, k), cur)
    out_ref[0] = cur.astype(out_ref.dtype)


_SHARDED_CACHE: dict = {}


def _sharded_call(kernel, rule, rows_out, src, tent, shift, bits):
    """Wrap the pallas_call in a jax custom_partitioning so GSPMD can run it
    batch-sharded on a device mesh: every grid cell touches exactly one
    image, so partitioning along dim 0 of all operands is exact — each
    device runs the kernel on its local shard, no collectives.  Non-batch
    dims are pinned replicated by the partition callback (the kernel needs
    full rows/tent per image)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    key = (kernel.__name__ if hasattr(kernel, "__name__") else id(kernel),
           rule, rows_out, bits)
    f = _SHARDED_CACHE.get(key)
    if f is None:
        def raw(s, t, sh):
            return _call(kernel, s.shape[1], rows_out, s, t, sh, bits)

        def _batch_axis(arg_infos):
            sharding = arg_infos[0].sharding
            spec = sharding.spec if sharding is not None else None
            return spec[0] if spec is not None and len(spec) else None

        def partition(mesh, arg_infos, result_info):
            b = _batch_axis(arg_infos)
            return (mesh, raw,
                    NamedSharding(mesh, PartitionSpec(b, None, None)),
                    (NamedSharding(mesh, PartitionSpec(b, None, None)),
                     NamedSharding(mesh, PartitionSpec(b, None, None)),
                     NamedSharding(mesh, PartitionSpec(b, None))))

        def infer(mesh, arg_infos, result_info):
            b = _batch_axis(arg_infos)
            return NamedSharding(mesh, PartitionSpec(b, None, None))

        f = custom_partitioning(raw)
        f.def_partition(infer_sharding_from_operands=infer,
                        partition=partition, sharding_rule=rule)
        _SHARDED_CACHE[key] = f
    return f(src, tent, shift)


def _call(kernel, rows_in, rows_out, src, tent, shift, bits):
    n, _, l = src.shape
    tiles = pl.cdiv(l, LANE)
    # shift as [n, 1, L]: Mosaic requires a block's last two dims to be
    # (8k, 128k) or equal to the array dims — (1, 128) on [n, L] violates
    # that, (1, 128) on [n, 1, L] satisfies it.
    return pl.pallas_call(
        functools.partial(kernel, bits=bits),
        out_shape=jax.ShapeDtypeStruct((n, rows_out, l), src.dtype),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, rows_in, LANE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tent.shape[1], tent.shape[2]),
                         lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_out, LANE), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(src, tent, shift[:, None, :])


def warp_pass(src, tent, shift, bits):
    """Fused shift-cascade + tent-resample: out[n,v,l] =
    sum_i tent[n,v,i] * lerp(src[n, clamp(i + shift[n,l]), l]).

    `tent` and `shift` are non-differentiable residuals (they derive from
    the augmentation's random draws, matching grid-sample semantics where
    only the image carries gradients).  The pass is linear in `src`, so it
    is declared via `linear_call` with the splat kernel as its transpose —
    JAX then derives JVPs and arbitrary-order VJPs (transpose of transpose
    is the forward), which the R1 double-backward requires."""
    a = src.shape[1]
    v = tent.shape[1]

    def fwd(res, x):
        t, sh = res
        return _sharded_call(_fwd_kernel, "n a l, n v a, n l -> n v l",
                             v, x, t, sh, bits)

    def trans(res, ct):
        t, sh = res
        return _sharded_call(_bwd_kernel, "n v l, n v a, n l -> n a l",
                             a, ct, t, sh, bits)

    return jax.custom_derivatives.linear_call(fwd, trans, (tent, shift), src)


# Pure-jnp reference twin (oracle for tests, mirrors augment/ada.py's
# cascade + einsum formulation).
def warp_pass_ref(src, tent, shift, bits):
    idx = jnp.floor(shift)
    frac = (shift - idx).astype(src.dtype)[:, None, :]
    idx = idx.astype(jnp.int32)[:, None, :]
    cur = src
    for b in range(bits):
        k = 1 << b
        a = cur.shape[1]
        shifted = jnp.concatenate(
            [cur[:, k:], jnp.broadcast_to(cur[:, a - 1:a],
                                          (cur.shape[0], k, cur.shape[2]))],
            axis=1)
        cur = jnp.where((idx & k) > 0, shifted, cur)
    a = cur.shape[1]
    nxt = jnp.concatenate([cur[:, 1:], cur[:, a - 1:a]], axis=1)
    cur = cur * (1.0 - frac) + nxt * frac
    return jnp.einsum("nvi,nil->nvl", tent.astype(src.dtype), cur)
