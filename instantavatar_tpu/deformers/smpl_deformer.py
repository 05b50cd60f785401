"""SMPL nearest-neighbor deformer — TPU-native.

Capability parity with /root/reference/instant_avatar/deformers/
smpl_deformer.py: canonical da-pose template (legs split pi/6), per-frame
per-vertex inverse transforms T_inv = T_template @ (T^-1 @ s2w +
blendshape-offset correction), K=1 nearest-vertex lookup with a distance
threshold, world->SMPL-space ray transform via the root bone, and gradients
flowing to betas/pose through the SMPL vertices and transforms (used for
pose fitting).

TPU redesign: pytorch3d's CUDA KNN is replaced by a chunked brute-force
(M, V) squared-distance matmul on the MXU (`lax.map` over fixed chunks, so
shapes stay static and peak memory is bounded); the KNN index is
stop-gradient'ed like the reference's no_grad block.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body import SMPLModel, SMPLOutput, smpl_forward

__all__ = ["SMPLDeformer", "SMPLDeformerState", "get_bbox_from_verts",
           "rigid_inverse", "nearest_vertex"]


def get_bbox_from_verts(verts: jax.Array, factor: float = 1.2) -> jax.Array:
    """Cubic bbox around (V, 3) verts, edge = factor * max extent
    (smpl_deformer.py:7-18)."""
    vmin, vmax = verts.min(axis=0), verts.max(axis=0)
    c = (vmin + vmax) / 2
    s = jnp.max(vmax - vmin) / 2 * factor
    return jnp.stack([c - s, c + s])


def rigid_inverse(T: jax.Array) -> jax.Array:
    """Inverse of (..., 4, 4) rigid transforms: [R^T, -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def _affine_inverse(T: jax.Array) -> jax.Array:
    """Inverse of (..., 4, 4) affine transforms with [0,0,0,1] last row.
    LBS-blended transforms are not exactly rigid, so invert the 3x3 block
    properly (the reference uses a full torch.inverse)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Ri = jnp.linalg.inv(R)
    ti = -(Ri @ t[..., None])[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Ri)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def nearest_vertex(pts: jax.Array, verts: jax.Array,
                   chunk: int = 8192) -> tuple[jax.Array, jax.Array]:
    """Exact 1-NN: (M, 3) pts vs (V, 3) verts -> (dist_sq (M,), idx (M,)).

    Distances via the MXU: d^2 = |x|^2 - 2 x.v + |v|^2, computed over
    fixed-size chunks of pts (pad + lax.map) to bound the (chunk, V)
    buffer. Indices are stop-gradient'ed by construction (int output).
    """
    M = pts.shape[0]
    v_sq = jnp.sum(verts * verts, axis=-1)                    # (V,)
    pad = (-M) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))

    def one(chunk_pts):
        d = (jnp.sum(chunk_pts * chunk_pts, axis=-1, keepdims=True)
             - 2.0 * chunk_pts @ verts.T + v_sq[None])        # (c, V)
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1)

    n_chunks = (M + pad) // chunk
    dist, idx = jax.lax.map(one, pts_p.reshape(n_chunks, chunk, 3))
    return (jnp.maximum(dist.reshape(-1)[:M], 0.0),
            idx.reshape(-1)[:M].astype(jnp.int32))


class SMPLDeformerState(NamedTuple):
    """Per-frame prepared state (the functional analog of the reference's
    prepare_deformer side effects)."""
    T_inv: jax.Array        # (V, 4, 4) posed-space -> canonical
    verts_smpl: jax.Array   # (V, 3) posed verts in SMPL space
    w2s: jax.Array          # (4, 4) world -> SMPL space
    bbox_canonical: jax.Array  # (2, 3)
    bbox_deformed: jax.Array   # (2, 3) bbox of posed verts in SMPL space


class SMPLDeformer:
    """Static descriptor; all methods are pure.

    Deformer interface (shared with SNARFDeformer): ``init_state(betas)``
    bakes per-subject canonical state, ``prepare(cano, ...)`` bakes
    per-frame state, ``transform_rays_w2s`` / ``make_field_fn`` /
    ``bbox_deformed`` consume it.
    """

    def __init__(self, body_model: SMPLModel, threshold: float = 0.05,
                 knn_chunk: int = 8192):
        self.body = body_model
        self.threshold = threshold
        self.knn_chunk = knn_chunk

    def init_state(self, betas: jax.Array):
        """No per-subject bake needed (canonical is rebuilt per prepare,
        mirroring the reference's re-initialize-every-call,
        smpl_deformer.py:57-60)."""
        return ()

    def canonical_bbox(self, cano, betas: jax.Array) -> jax.Array:
        out = self.canonical_smpl(jnp.asarray(betas).reshape(1, -1))
        return get_bbox_from_verts(out.vertices[0])

    def bbox_deformed(self, state: "SMPLDeformerState") -> jax.Array:
        return state.bbox_deformed

    def canonical_pose(self, batch: int = 1) -> jax.Array:
        """da-pose: legs split by pi/6 (smpl_deformer.py:36-38)."""
        pose = jnp.zeros((batch, 69))
        pose = pose.at[:, 2].set(jnp.pi / 6)
        pose = pose.at[:, 5].set(-jnp.pi / 6)
        return pose

    def canonical_smpl(self, betas: jax.Array) -> SMPLOutput:
        return smpl_forward(self.body, betas, self.canonical_pose(1),
                            jnp.zeros((1, 3)))

    def prepare(self, betas: jax.Array, body_pose: jax.Array,
                global_orient: jax.Array, transl: jax.Array
                ) -> SMPLDeformerState:
        """Build per-frame deform state. Batch size 1 (one frame per step,
        like the reference); vmap externally for multi-frame."""
        cano = self.canonical_smpl(betas)
        posed = smpl_forward(self.body, betas, body_pose, global_orient,
                             transl)
        s2w = posed.A[0, 0]                                   # (4, 4)
        w2s = rigid_inverse(s2w)

        # posed -> T-pose -> canonical: undo skinning + blendshape delta,
        # re-apply canonical skinning (smpl_deformer.py:67-74)
        T_inv = _affine_inverse(posed.T[0]) @ s2w             # (V, 4, 4)
        off = ((cano.pose_offsets[0] - posed.pose_offsets[0])
               + (cano.shape_offsets[0] - posed.shape_offsets[0]))
        T_inv = T_inv.at[..., :3, 3].add(off)
        T_inv = cano.T[0] @ T_inv

        verts_s = (posed.vertices[0] @ w2s[:3, :3].T) + w2s[:3, 3]
        return SMPLDeformerState(
            T_inv=T_inv,
            verts_smpl=verts_s,
            w2s=w2s,
            bbox_canonical=get_bbox_from_verts(cano.vertices[0]),
            bbox_deformed=get_bbox_from_verts(verts_s))

    def transform_rays_w2s(self, state: SMPLDeformerState, rays):
        """World rays -> SMPL space; near/far = ||o|| -/+ 1
        (smpl_deformer.py:76-84)."""
        from ..render.raymarcher import Rays
        R, t = state.w2s[:3, :3], state.w2s[:3, 3]
        o = rays.o @ R.T + t
        d = rays.d @ R.T
        dist = jnp.linalg.norm(o, axis=-1)
        return Rays(o=o, d=d, near=dist - 1.0, far=dist + 1.0)

    def deform(self, state: SMPLDeformerState, pts: jax.Array
               ) -> tuple[jax.Array, jax.Array]:
        """(M, 3) SMPL-space pts -> (canonical pts (M, 3), valid (M,))."""
        dist_sq, idx = nearest_vertex(jax.lax.stop_gradient(pts),
                                      jax.lax.stop_gradient(state.verts_smpl),
                                      self.knn_chunk)
        valid = dist_sq < self.threshold ** 2
        T = jnp.take(state.T_inv, idx, axis=0)                # (M, 4, 4)
        xc = (T[:, :3, :3] @ pts[..., None])[..., 0] + T[:, :3, 3]
        return xc, valid

    def prepare_frame(self, cano, betas, body_pose, global_orient, transl
                      ) -> SMPLDeformerState:
        """Uniform deformer interface; cano is unused for this deformer."""
        return self.prepare(betas, body_pose, global_orient, transl)

    # -- packed inverse-warp cache (eval acceleration) ----------------------
    # Same interface and row format as SNARFDeformer (packed_cache.py):
    # enables the fused flat-stream frame render for the fit flow
    # (deformer=smpl), which otherwise fell back to the dense per-sample
    # march with one (M, V) KNN per chunk. The nearest-vertex inverse warp
    # xc(xd) = T_inv[nn(xd)] xd is affine within a Voronoi cell, so the
    # cached-Newton step is exact wherever cell center and sample share a
    # nearest vertex: J_inv = d xc / d xd = T_inv[:3, :3].

    ROW_FLOATS = 13  # xc(3) + J_inv(9) + valid(1); K = 1 candidate
    cache_K = 1      # static candidate-lane count (see SNARFDeformer)

    def bake_packed_cache(self, cano, state: SMPLDeformerState,
                          cells: jax.Array, net_sigma_fn=None,
                          cell_mask: jax.Array | None = None,
                          return_sigma: bool = False):
        """KNN inverse warp on posed-space cell centers -> packed rows.

        Args:
          cells: (C, 3) posed SMPL-space cell centers.
          net_sigma_fn: canonical sigma closure; only used when
            ``return_sigma`` (K = 1, nothing to sort).
          cell_mask: optional (C,) bool; False rows are zeroed (dynamic
            occupied-cell padding).
          return_sigma: also return the per-cell baked sigma (C,) driving
            transmittance-terminated window selection (AvatarModel).
        Returns:
          rows (C, 13) float32; with ``return_sigma`` a (rows, sigma_cell)
          tuple.
        """
        dist_sq, idx = nearest_vertex(cells, state.verts_smpl,
                                      self.knn_chunk)
        valid = dist_sq < self.threshold ** 2
        T = jnp.take(state.T_inv, idx, axis=0)            # (C, 4, 4)
        xc = (T[:, :3, :3] @ cells[..., None])[..., 0] + T[:, :3, 3]
        rows = jnp.concatenate(
            [xc, T[:, :3, :3].reshape(-1, 9),
             valid.astype(jnp.float32)[:, None]], axis=-1)
        if cell_mask is not None:
            rows = rows * cell_mask[:, None].astype(rows.dtype)
        if not return_sigma:
            return rows
        if net_sigma_fn is None:
            sigma_cell = jnp.zeros(cells.shape[:1], rows.dtype)
        else:
            sigma_cell = jnp.maximum(net_sigma_fn(xc), 0.0)
            sigma_cell = jnp.where(valid, sigma_cell, 0.0)
            if cell_mask is not None:
                sigma_cell = sigma_cell * cell_mask.astype(sigma_cell.dtype)
        return rows, sigma_cell

    def make_packed_cache_fns(self, cache_rows: jax.Array,
                              grid_aabb: jax.Array, grid_size: int,
                              net_apply, n_cand: int = 1, net_shared=None):
        """Marcher closures over the packed cache (shared deformer-agnostic
        implementation — see packed_cache.make_packed_cache_fns)."""
        from .packed_cache import make_packed_cache_fns
        return make_packed_cache_fns(cache_rows, grid_aabb, grid_size,
                                     net_apply, n_cand, self.ROW_FLOATS,
                                     net_shared=net_shared)

    def make_frame_field_fn(self, cano, state: SMPLDeformerState, net_apply,
                            eval_mode: bool = False):
        return self.make_field_fn(state, net_apply, eval_mode)

    def make_field_fn(self, state: SMPLDeformerState, net_apply,
                      eval_mode: bool = False):
        """Compose deformer + canonical net into the marcher's field
        closure (the analog of DNeRF.py:67 + deform_train/test)."""
        def field_fn(pts):
            xc, valid = self.deform(state, pts)
            rgb, sigma = net_apply(xc)
            finite = jnp.isfinite(sigma) & jnp.isfinite(rgb).all(axis=-1)
            valid = valid & finite
            rgb = jnp.where(valid[..., None], rgb, 0.0)
            return rgb, sigma, valid
        return field_fn
