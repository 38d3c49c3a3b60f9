"""Device-side k-NN manifold test for Precision/Recall.

TPU-native rebuild of the reference's sharded-cdist manifold estimator
(reference: stylegan2ada/metrics/precision_recall.py:19-60).  The reference
streams fp16 ``torch.cdist`` blocks across GPUs and reduces them on rank 0;
here the whole test is two jitted programs over statically-tiled distance
blocks:

* ``knn_radii_sq``  — per-point squared distance to the (k)-th nearest
  neighbour (self included, matching ``kthvalue(nhood_size + 1)`` on a
  matrix that contains the zero self-distance), computed as a
  ``lax.scan`` over column tiles carrying a running smallest-k set.
* ``manifold_hits`` — for each probe, whether ANY manifold point j has
  ``d^2(probe, j) <= radius_sq[j]`` (the reference's ``(dist <= kth).any``),
  as a scan with an OR-accumulated hit vector.

Everything stays in squared distances: k-NN order and the radius comparison
are invariant under sqrt, so no sqrt is taken at all.  Distance blocks are
``x^2 + y^2 - 2xy`` with an f32 MXU matmul — the compute is ~100 GFLOP-scale
even at the 200k x 50k full budget, so f32 (vs the reference's fp16) costs
nothing and removes the fp16 rounding the reference tolerates.

Padding: feature rows are padded to a tile multiple; padded *columns* get
+inf distance via an index mask (a zero-padded feature row would otherwise
be a fake point at the origin), and padded probe/manifold rows are sliced
off on the host after the jitted call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ROW_TILE = 4096
COL_TILE = 8192


def _pad_rows(x: np.ndarray, tile: int) -> np.ndarray:
    pad = (-x.shape[0]) % tile
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


def _dist_sq_block(row, col):
    """Squared Euclidean distances (R, C) for f32 tiles (R, D), (C, D)."""
    rn = jnp.sum(jnp.square(row), axis=1)[:, None]
    cn = jnp.sum(jnp.square(col), axis=1)[None, :]
    d = rn + cn - 2.0 * jnp.dot(row, col.T,
                                preferred_element_type=jnp.float32)
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def _radii_tile(row_tile, feats_tiles, n_valid, k):
    """Smallest-k squared distances from each row to all valid feats.

    feats_tiles: (T, C, D) column tiles; columns with global index >=
    n_valid are masked to +inf.  Carry: (R, k) running smallest set.
    """
    r = row_tile.shape[0]
    init = jnp.full((r, k), jnp.inf, jnp.float32)

    def body(carry, xs):
        tile_idx, col_tile = xs
        d = _dist_sq_block(row_tile, col_tile)
        col_ids = tile_idx * col_tile.shape[0] + jnp.arange(
            col_tile.shape[0])
        d = jnp.where(col_ids[None, :] < n_valid, d, jnp.inf)
        cat = jnp.concatenate([carry, d], axis=1)
        neg_topk, _ = jax.lax.top_k(-cat, k)
        return -neg_topk, None

    xs = (jnp.arange(feats_tiles.shape[0]), feats_tiles)
    smallest, _ = jax.lax.scan(body, init, xs)
    return smallest[:, k - 1]


@functools.partial(jax.jit)
def _hits_tile(probe_tile, feats_tiles, radii_sq_tiles, n_valid):
    """For each probe row: any valid manifold point j with d^2 <= r^2[j]."""
    r = probe_tile.shape[0]
    init = jnp.zeros((r,), jnp.bool_)

    def body(carry, xs):
        tile_idx, col_tile, rad_tile = xs
        d = _dist_sq_block(probe_tile, col_tile)
        col_ids = tile_idx * col_tile.shape[0] + jnp.arange(
            col_tile.shape[0])
        ok = (d <= rad_tile[None, :]) & (col_ids[None, :] < n_valid)
        return carry | jnp.any(ok, axis=1), None

    xs = (jnp.arange(feats_tiles.shape[0]), feats_tiles, radii_sq_tiles)
    hits, _ = jax.lax.scan(body, init, xs)
    return hits


def _as_col_tiles(feats: np.ndarray, col_tile: int):
    feats = _pad_rows(np.asarray(feats, np.float32), col_tile)
    return feats.reshape(-1, col_tile, feats.shape[1])


def knn_radii_sq(feats: np.ndarray, nhood_size: int = 3,
                 row_tile: int = ROW_TILE,
                 col_tile: int = COL_TILE) -> np.ndarray:
    """Squared k-NN radius per feature row (k = nhood_size, self excluded
    by counting the zero self-distance as the reference does)."""
    n = feats.shape[0]
    k = nhood_size + 1
    row_tile = min(row_tile, max(8, n))
    col_tile = min(col_tile, max(8, n))
    tiles = jnp.asarray(_as_col_tiles(feats, col_tile))
    rows = _pad_rows(np.asarray(feats, np.float32), row_tile)
    out = []
    for i in range(0, rows.shape[0], row_tile):
        out.append(_radii_tile(jnp.asarray(rows[i:i + row_tile]), tiles,
                               n, k))
    return np.concatenate([np.asarray(o) for o in out])[:n]


def manifold_hits(probes: np.ndarray, feats: np.ndarray,
                  radii_sq: np.ndarray, row_tile: int = ROW_TILE,
                  col_tile: int = COL_TILE) -> np.ndarray:
    """Boolean per probe: lies within any manifold point's k-NN radius."""
    n_probe, n_feat = probes.shape[0], feats.shape[0]
    row_tile = min(row_tile, max(8, n_probe))
    col_tile = min(col_tile, max(8, n_feat))
    tiles = jnp.asarray(_as_col_tiles(feats, col_tile))
    rad = _pad_rows(np.asarray(radii_sq, np.float32), col_tile)
    rad_tiles = jnp.asarray(rad.reshape(-1, col_tile))
    rows = _pad_rows(np.asarray(probes, np.float32), row_tile)
    out = []
    for i in range(0, rows.shape[0], row_tile):
        out.append(_hits_tile(jnp.asarray(rows[i:i + row_tile]), tiles,
                              rad_tiles, n_feat))
    return np.concatenate([np.asarray(o) for o in out])[:n_probe]
