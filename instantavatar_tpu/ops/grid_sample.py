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

__all__ = ["grid_sample_3d", "pack_corners_3d", "grid_sample_3d_packed",
           "pack_corners_2d", "grid_sample_2d_packed",
           "grid_sample_2d_packed_shared", "grid_sample_3d_packed_shared"]


def pack_corners_2d(plane: jax.Array) -> jax.Array:
    """(C, H, W) -> (H*W, 4*C) corner-packed rows (corner = dy*2 + dx)."""
    C, H, W = plane.shape
    v = jnp.pad(plane, ((0, 0), (0, 1), (0, 1)), mode="edge")
    rows = [v[:, dy:dy + H, dx:dx + W] for dy in (0, 1) for dx in (0, 1)]
    packed = jnp.stack(rows, axis=0)                  # (4, C, H, W)
    return packed.transpose(2, 3, 0, 1).reshape(H * W, 4 * C)


def grid_sample_2d_packed(packed: jax.Array, shape: tuple[int, int],
                          uv: jax.Array, lerp_dtype=None) -> jax.Array:
    """Bilinear sample from a corner-packed plane (one gather per point).

    Args:
      packed: (H*W, 4*C) from ``pack_corners_2d``.
      shape: (H, W).
      uv: (..., 2) in [0, 1], (u -> W, v -> H), align-corners.
      lerp_dtype: dtype the lerp weights/output use; defaults to the
        rows' dtype (zero convert passes in bf16 hot loops). Callers
        whose CONSUMERS need full-precision interpolation of a bf16
        table (e.g. the LBS weight voxel feeding Broyden's forward-
        skinning residual) pass jnp.float32 here.

    Returns (..., C).
    """
    H, W = shape
    C = packed.shape[-1] // 4
    out_shape = uv.shape[:-1]
    c = uv.reshape(-1, 2).astype(jnp.float32)
    fu = jnp.clip(c[:, 0], 0.0, 1.0) * (W - 1)
    fv = jnp.clip(c[:, 1], 0.0, 1.0) * (H - 1)
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, max(W - 2, 0))
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, max(H - 2, 0))
    tu = fu - u0
    tv = fv - v0
    rows = jnp.take(packed, v0 * W + u0, axis=0).reshape(-1, 4, C)
    w4 = jnp.stack([(1 - tv) * (1 - tu), (1 - tv) * tu,
                    tv * (1 - tu), tv * tu], axis=-1)   # corner = dy*2+dx
    # lerp in the rows' dtype by default: f32 weights would promote bf16
    # rows to f32, inserting a (M, C) convert pass after every gather
    # (xplane r4: ~7 ms/frame at 540px); accumulation stays f32
    wdt = lerp_dtype or packed.dtype
    out = jnp.einsum("mkc,mk->mc", rows.astype(wdt), w4.astype(wdt),
                     preferred_element_type=jnp.float32)
    return out.astype(wdt).reshape(*out_shape, C)


def grid_sample_2d_packed_shared(packed: jax.Array, shape: tuple[int, int],
                                 uv_ref: jax.Array, uv: jax.Array,
                                 lerp_dtype=None) -> jax.Array:
    """Bilinear sample Q query variants against ONE shared corner gather.

    ``uv_ref`` (N, 2) picks the corner cell — one row gather total;
    ``uv`` (Q, N, 2) are Q per-point variants (e.g. the p^2 pixel
    offsets of a render block, which spread millimetres at body
    distance) whose lerp weights are taken RELATIVE TO the ref cell,
    UNCLAMPED — a variant that leaves the ref cell linearly
    extrapolates from it. Exact while every variant stays inside the
    ref cell; across a face the error is O(overshoot x the neighbour
    cells' feature-slope difference) — sub-bf16-noise for smooth
    learned features at sub-cell offsets (gated by
    test_shared_corner_sampling + the quality bench). Cuts gather rows
    Q-fold: rows cost ~6 ns each regardless of width (PERF.md).

    Returns (Q, N, C).
    """
    H, W = shape
    C = packed.shape[-1] // 4
    N = uv_ref.shape[0]
    cr = uv_ref.reshape(-1, 2).astype(jnp.float32)
    fu_r = jnp.clip(cr[:, 0], 0.0, 1.0) * (W - 1)
    fv_r = jnp.clip(cr[:, 1], 0.0, 1.0) * (H - 1)
    u0 = jnp.clip(jnp.floor(fu_r).astype(jnp.int32), 0, max(W - 2, 0))
    v0 = jnp.clip(jnp.floor(fv_r).astype(jnp.int32), 0, max(H - 2, 0))
    rows = jnp.take(packed, v0 * W + u0, axis=0).reshape(N, 4, C)
    c = uv.astype(jnp.float32)
    fu = jnp.clip(c[..., 0], 0.0, 1.0) * (W - 1)       # (Q, N)
    fv = jnp.clip(c[..., 1], 0.0, 1.0) * (H - 1)
    tu = fu - u0[None]                                  # unclamped
    tv = fv - v0[None]
    w4 = jnp.stack([(1 - tv) * (1 - tu), (1 - tv) * tu,
                    tv * (1 - tu), tv * tu], axis=-1)   # (Q, N, 4)
    wdt = lerp_dtype or packed.dtype
    out = jnp.einsum("nkc,qnk->qnc", rows.astype(wdt), w4.astype(wdt),
                     preferred_element_type=jnp.float32)
    return out.astype(wdt)


def pack_corners_3d(voxel: jax.Array) -> jax.Array:
    """(C, D, H, W) -> (D*H*W, 8*C) corner-packed rows.

    Row for cell (d, h, w) holds the features of its 8 trilerp corners
    (edge-replicated at the boundary), corner index = dz*4 + dy*2 + dx.
    TPU rationale (PERF.md): random gathers cost ~6 ns *per row* regardless
    of width, so fetching one 8C-wide row beats eight C-wide fetches ~8x.
    Costs 8x feature memory — pack per-frame/baked voxels, not parameters.
    """
    C, D, H, W = voxel.shape
    v = jnp.pad(voxel, ((0, 0), (0, 1), (0, 1), (0, 1)), mode="edge")
    rows = [v[:, dz:dz + D, dy:dy + H, dx:dx + W]
            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    packed = jnp.stack(rows, axis=0)                  # (8, C, D, H, W)
    return packed.transpose(2, 3, 4, 0, 1).reshape(D * H * W, 8 * C)


def grid_sample_3d_packed(packed: jax.Array, shape: tuple[int, int, int],
                          coords: jax.Array, lerp_dtype=None) -> jax.Array:
    """Trilinear sample from a corner-packed voxel (one gather per point).

    Args:
      packed: (D*H*W, 8*C) from ``pack_corners_3d``.
      shape: (D, H, W).
      coords: (..., 3) normalized [-1, 1], xyz order (like grid_sample_3d).
      lerp_dtype: see ``grid_sample_2d_packed``.

    Returns (..., C). align_corners=True, border padding.
    """
    D, H, W = shape
    C = packed.shape[-1] // 8
    out_shape = coords.shape[:-1]
    c = coords.reshape(-1, 3).astype(jnp.float32)

    fx = (c[:, 0] + 1.0) * 0.5 * (W - 1)
    fy = (c[:, 1] + 1.0) * 0.5 * (H - 1)
    fz = (c[:, 2] + 1.0) * 0.5 * (D - 1)

    def split(f, size):
        f = jnp.clip(f, 0.0, size - 1.0)
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, max(size - 2, 0))
        return i0, f - i0

    x0, tx = split(fx, W)
    y0, ty = split(fy, H)
    z0, tz = split(fz, D)

    rows = jnp.take(packed, (z0 * H + y0) * W + x0, axis=0)  # (M, 8C)
    rows = rows.reshape(-1, 8, C)

    wx = jnp.stack([1 - tx, tx], axis=-1)              # (M, 2)
    wy = jnp.stack([1 - ty, ty], axis=-1)
    wz = jnp.stack([1 - tz, tz], axis=-1)
    w8 = (wz[:, :, None, None] * wy[:, None, :, None]
          * wx[:, None, None, :]).reshape(-1, 8)        # corner = dz*4+dy*2+dx
    # lerp in the rows' dtype by default (see grid_sample_2d_packed)
    wdt = lerp_dtype or packed.dtype
    out = jnp.einsum("mkc,mk->mc", rows.astype(wdt), w8.astype(wdt),
                     preferred_element_type=jnp.float32)
    return out.astype(wdt).reshape(*out_shape, C)


def grid_sample_3d_packed_shared(packed: jax.Array,
                                 shape: tuple[int, int, int],
                                 coords_ref: jax.Array, coords: jax.Array,
                                 lerp_dtype=None) -> jax.Array:
    """Trilinear sample Q query variants against ONE shared corner gather.

    3-D analog of ``grid_sample_2d_packed_shared``: ``coords_ref``
    (N, 3) picks the cell (one row gather), ``coords`` (Q, N, 3) trilerp
    against it with unclamped weights (linear extrapolation outside the
    ref cell). Both in [-1, 1] xyz order. Returns (Q, N, C).
    """
    D, H, W = shape
    C = packed.shape[-1] // 8
    N = coords_ref.shape[0]
    cr = coords_ref.reshape(-1, 3).astype(jnp.float32)

    def base(f, size):
        f = jnp.clip(f, 0.0, size - 1.0)
        return jnp.clip(jnp.floor(f).astype(jnp.int32), 0, max(size - 2, 0))

    x0 = base((cr[:, 0] + 1.0) * 0.5 * (W - 1), W)
    y0 = base((cr[:, 1] + 1.0) * 0.5 * (H - 1), H)
    z0 = base((cr[:, 2] + 1.0) * 0.5 * (D - 1), D)
    rows = jnp.take(packed, (z0 * H + y0) * W + x0, axis=0).reshape(N, 8, C)

    c = coords.astype(jnp.float32)
    tx = jnp.clip((c[..., 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0) \
        - x0[None]                                      # (Q, N), unclamped
    ty = jnp.clip((c[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0) \
        - y0[None]
    tz = jnp.clip((c[..., 2] + 1.0) * 0.5 * (D - 1), 0.0, D - 1.0) \
        - z0[None]
    wx = jnp.stack([1 - tx, tx], axis=-1)               # (Q, N, 2)
    wy = jnp.stack([1 - ty, ty], axis=-1)
    wz = jnp.stack([1 - tz, tz], axis=-1)
    w8 = (wz[..., :, None, None] * wy[..., None, :, None]
          * wx[..., None, None, :]).reshape(*tx.shape, 8)  # dz*4+dy*2+dx
    wdt = lerp_dtype or packed.dtype
    out = jnp.einsum("nkc,qnk->qnc", rows.astype(wdt), w8.astype(wdt),
                     preferred_element_type=jnp.float32)
    return out.astype(wdt)


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
