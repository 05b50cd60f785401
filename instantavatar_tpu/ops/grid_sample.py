"""Trilinear 3-D grid sampling — pure XLA.

Matches torch.nn.functional.grid_sample semantics for the cases the
reference relies on (align_corners=True, padding_mode='border', 5-D input):
used for LBS-weight-voxel queries (deformer_torch.py:190-202) and the
Broyden kernel's hand-rolled ``grid_sampler_3d``
(fuse_cuda_kernel_fast.cu:110-248).

Coordinate convention: ``coords`` are normalized to [-1, 1] with
``coords[..., 0] -> W (x), [..., 1] -> H (y), [..., 2] -> D (z)``, exactly
like grid_sample's last-dimension ordering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grid_sample_3d"]


def grid_sample_3d(voxel: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a (C, D, H, W) voxel at (..., 3) normalized coords.

    align_corners=True, border padding. Returns (..., C).
    """
    C, D, H, W = voxel.shape
    shape = coords.shape[:-1]
    c = coords.reshape(-1, 3).astype(jnp.float32)

    # align_corners: -1 -> 0, +1 -> size-1
    fx = (c[:, 0] + 1.0) * 0.5 * (W - 1)
    fy = (c[:, 1] + 1.0) * 0.5 * (H - 1)
    fz = (c[:, 2] + 1.0) * 0.5 * (D - 1)

    def split(f, size):
        f = jnp.clip(f, 0.0, size - 1.0)  # border padding
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, size - 2) \
            if size > 1 else jnp.zeros_like(f, jnp.int32)
        t = f - i0
        return i0, t

    x0, tx = split(fx, W)
    y0, ty = split(fy, H)
    z0, tz = split(fz, D)

    flat = voxel.reshape(C, D * H * W)

    def gather(z, y, x):
        idx = (z * H + y) * W + x
        return jnp.take(flat, idx, axis=1)            # (C, M)

    c000 = gather(z0, y0, x0)
    c001 = gather(z0, y0, x0 + 1)
    c010 = gather(z0, y0 + 1, x0)
    c011 = gather(z0, y0 + 1, x0 + 1)
    c100 = gather(z0 + 1, y0, x0)
    c101 = gather(z0 + 1, y0, x0 + 1)
    c110 = gather(z0 + 1, y0 + 1, x0)
    c111 = gather(z0 + 1, y0 + 1, x0 + 1)

    c00 = c000 * (1 - tx) + c001 * tx
    c01 = c010 * (1 - tx) + c011 * tx
    c10 = c100 * (1 - tx) + c101 * tx
    c11 = c110 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz                     # (C, M)
    return out.T.reshape(*shape, C)
