"""TPU-native flagship canonical field: dense voxel + tri-plane hybrid.

The hash-grid encoding that makes Instant-NGP fast on GPUs is structurally
wrong for TPU: 16 levels x 8 corners = 128 random HBM rows per sample, and
TPU gathers are latency-bound at ~6 ns/row (PERF.md). This field provides
the same capability (a fast-converging, high-capacity explicit+implicit
canonical radiance field with the NGP head layout: 16 geo features, raw
sigma at index 0, 15 -> color MLP with sigmoid) at **4 gather rows per
sample**:

  * one corner-packed dense feature voxel (default 64^3 cells x 8ch) —
    coarse geometry;
  * three corner-packed feature planes (default 256^2 x 16ch) — fine
    detail, concatenated like the reference's TriPlane variant
    (/root/reference/instant_avatar/models/networks/triplane.py) but
    packed so each plane costs one row fetch.

Parameters are stored UNPACKED on corner lattices ((G+1)^3 / (G+1)^2) so
each physical corner is a single trainable weight; packing happens per
apply (cheap contiguous slices) and gradients flow back through the pad.
Compute dtype defaults to bf16 (7x faster MLPs on v5e than fp32 —
PERF.md); parameters and compositing stay fp32.
Drop-in replacement for NGPField (same init/apply/density interface).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import (grid_sample_2d_packed,
                               grid_sample_2d_packed_shared,
                               grid_sample_3d_packed,
                               grid_sample_3d_packed_shared,
                               pack_corners_2d, pack_corners_3d)
from .ngp import _init_mlp, _mlp

__all__ = ["VoxelTriplaneField", "VoxelTriplaneParams"]


class VoxelTriplaneParams(NamedTuple):
    voxel: jax.Array              # (Gv+1, Gv+1, Gv+1, Cv) corner lattice
    plane_xy: jax.Array           # (Gp+1, Gp+1, Cp)
    plane_xz: jax.Array
    plane_yz: jax.Array
    sigma_w: tuple[jax.Array, ...]
    sigma_b: tuple[jax.Array, ...]
    color_w: tuple[jax.Array, ...]
    color_b: tuple[jax.Array, ...]


class VoxelTriplaneField:
    GEO_FEATS = 16

    def __init__(self, voxel_res: int = 64, voxel_feats: int = 8,
                 plane_res: int = 256, plane_feats: int = 16,
                 sigma_hidden: int = 64, color_hidden: int = 64,
                 color_layers: int = 2, compute_dtype=jnp.bfloat16):
        self.voxel_res = voxel_res
        self.voxel_feats = voxel_feats
        self.plane_res = plane_res
        self.plane_feats = plane_feats
        enc_dim = voxel_feats + 3 * plane_feats
        self.sigma_dims = (enc_dim, sigma_hidden, self.GEO_FEATS)
        self.color_dims = ((self.GEO_FEATS - 1,)
                           + (color_hidden,) * color_layers + (3,))
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> VoxelTriplaneParams:
        ks = jax.random.split(key, 6)
        Gv, Cv = self.voxel_res, self.voxel_feats
        Gp, Cp = self.plane_res, self.plane_feats
        sigma_w, sigma_b = _init_mlp(ks[4], self.sigma_dims)
        color_w, color_b = _init_mlp(ks[5], self.color_dims)

        def feat(k, shape):
            return jax.random.uniform(k, shape, jnp.float32, -1e-4, 1e-4)

        return VoxelTriplaneParams(
            voxel=feat(ks[0], (Gv + 1, Gv + 1, Gv + 1, Cv)),
            plane_xy=feat(ks[1], (Gp + 1, Gp + 1, Cp)),
            plane_xz=feat(ks[2], (Gp + 1, Gp + 1, Cp)),
            plane_yz=feat(ks[3], (Gp + 1, Gp + 1, Cp)),
            sigma_w=sigma_w, sigma_b=sigma_b,
            color_w=color_w, color_b=color_b)

    # -- encoding ----------------------------------------------------------

    def encode(self, params: VoxelTriplaneParams, xn: jax.Array) -> jax.Array:
        """xn (..., 3) in [0, 1] -> (..., Cv + 3*Cp) features.

        Packed corner rows are cast to bf16: the voxel row is 8 corners x
        8ch and each plane row 4 corners x 16ch — 256 B at fp32, 128 B at
        bf16. TPU gathers are free up to 128-byte rows and pay ~2x beyond
        (measured 42 ns/row at 256 B vs ~7 ns at <=128 B, PERF.md);
        features are smooth learned values, far above bf16's ~3-digit
        precision floor. Params stay fp32 (grads flow through the cast)."""
        Gv1 = self.voxel_res + 1
        Gp1 = self.plane_res + 1
        row_dtype = self.compute_dtype
        vox_packed = pack_corners_3d(
            params.voxel.transpose(3, 0, 1, 2)).astype(row_dtype)
        coords = 2.0 * jnp.clip(xn, 0.0, 1.0) - 1.0
        f_vox = grid_sample_3d_packed(vox_packed, (Gv1, Gv1, Gv1), coords)

        def plane(p, uv):
            return grid_sample_2d_packed(
                pack_corners_2d(p.transpose(2, 0, 1)).astype(row_dtype),
                (Gp1, Gp1), uv)

        f_xy = plane(params.plane_xy, xn[..., (0, 1)])
        f_xz = plane(params.plane_xz, xn[..., (0, 2)])
        f_yz = plane(params.plane_yz, xn[..., (1, 2)])
        # stay in compute dtype: the old .astype(f32) forced a (M, 64)
        # convert pass per frame only for _mlp to cast straight back
        return jnp.concatenate([f_vox, f_xy, f_xz, f_yz], axis=-1)

    def encode_shared(self, params: VoxelTriplaneParams, xn_ref: jax.Array,
                      xn: jax.Array) -> jax.Array:
        """Encode Q per-point variants against ONE corner gather per
        lattice (the shared-corner samplers in ops/grid_sample.py).

        ``xn_ref`` (N, 3) picks the corner cells; ``xn`` (Q, N, 3) are
        variants lerped/extrapolated against them. Used by the fused
        flat render where the p^2 pixel offsets of a block are
        millimetre-scale perturbations of the block-center canonical
        point (train/model.py stage 5'): the 4 feature gathers drop
        from Q*N to N rows (xplane r4: 26.4 -> ~3 ms/frame at 540px).
        Returns (Q, N, Cv + 3*Cp)."""
        Gv1 = self.voxel_res + 1
        Gp1 = self.plane_res + 1
        row_dtype = self.compute_dtype
        vox_packed = pack_corners_3d(
            params.voxel.transpose(3, 0, 1, 2)).astype(row_dtype)
        c_ref = 2.0 * jnp.clip(xn_ref, 0.0, 1.0) - 1.0
        c_all = 2.0 * jnp.clip(xn, 0.0, 1.0) - 1.0
        f_vox = grid_sample_3d_packed_shared(
            vox_packed, (Gv1, Gv1, Gv1), c_ref, c_all)

        def plane(p, ij):
            return grid_sample_2d_packed_shared(
                pack_corners_2d(p.transpose(2, 0, 1)).astype(row_dtype),
                (Gp1, Gp1), xn_ref[..., ij], xn[..., ij])

        f_xy = plane(params.plane_xy, (0, 1))
        f_xz = plane(params.plane_xz, (0, 2))
        f_yz = plane(params.plane_yz, (1, 2))
        return jnp.concatenate([f_vox, f_xy, f_xz, f_yz], axis=-1)

    # -- field -------------------------------------------------------------

    def apply_shared(self, params: VoxelTriplaneParams, x_ref: jax.Array,
                     x: jax.Array, center: jax.Array, scale: jax.Array):
        """``apply`` over Q variants (Q, N, 3) sharing ``x_ref`` (N, 3)'s
        corner gathers (see encode_shared). Returns
        (color (Q, N, 3), sigma (Q, N))."""
        Q, N = x.shape[:2]
        xn_ref = (x_ref - center) / scale + 0.5
        xn = (x - center) / scale + 0.5
        enc = self.encode_shared(params, xn_ref, xn).reshape(Q * N, -1)
        geo = _mlp(enc, params.sigma_w, params.sigma_b,
                   dtype=self.compute_dtype)
        sigma = geo[..., 0].reshape(Q, N)
        color = _mlp(geo[..., 1:], params.color_w, params.color_b,
                     final_act=jax.nn.sigmoid,
                     dtype=self.compute_dtype).reshape(Q, N, 3)
        return color, sigma

    def apply(self, params: VoxelTriplaneParams, x: jax.Array,
              center: jax.Array, scale: jax.Array):
        xn = (x - center) / scale + 0.5
        enc = self.encode(params, xn)
        geo = _mlp(enc, params.sigma_w, params.sigma_b,
                   dtype=self.compute_dtype)
        sigma = geo[..., 0]
        color = _mlp(geo[..., 1:], params.color_w, params.color_b,
                     final_act=jax.nn.sigmoid, dtype=self.compute_dtype)
        return color, sigma

    def density(self, params: VoxelTriplaneParams, x: jax.Array,
                center: jax.Array, scale: jax.Array) -> jax.Array:
        xn = (x - center) / scale + 0.5
        enc = self.encode(params, xn)
        geo = _mlp(enc, params.sigma_w, params.sigma_b,
                   dtype=self.compute_dtype)
        return geo[..., 0]
