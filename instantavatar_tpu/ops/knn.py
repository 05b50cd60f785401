"""Brute-force exact K-nearest-neighbors on the MXU.

Replaces the reference's vendored pytorch3d CUDA KNN
(/root/reference/third_parties/pytorch3d/): used with K=30 for LBS-voxel
baking (deformer_torch.py:225-244) and K=1 by the SMPL deformer. For the
point counts involved (<= ~0.5M queries vs 6890 SMPL vertices) a chunked
(M, V) squared-distance matmul + top_k beats any spatial structure on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["knn_points"]


def knn_points(pts: jax.Array, verts: jax.Array, k: int,
               chunk: int = 8192) -> tuple[jax.Array, jax.Array]:
    """(M, 3) queries vs (V, 3) references -> (dist_sq (M, k), idx (M, k)),
    ascending by distance. Chunked over queries to bound the (chunk, V)
    buffer; shapes stay static (pad + lax.map)."""
    M = pts.shape[0]
    v_sq = jnp.sum(verts * verts, axis=-1)
    pad = (-M) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))

    def one(chunk_pts):
        d = (jnp.sum(chunk_pts * chunk_pts, axis=-1, keepdims=True)
             - 2.0 * chunk_pts @ verts.T + v_sq[None])
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx

    n_chunks = (M + pad) // chunk
    dist, idx = jax.lax.map(one, pts_p.reshape(n_chunks, chunk, 3))
    return (jnp.maximum(dist.reshape(-1, k)[:M], 0.0),
            idx.reshape(-1, k)[:M].astype(jnp.int32))
