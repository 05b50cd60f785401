"""Fast-SNARF forward deformer — TPU-native.

The production articulation module: capability parity with
/root/reference/instant_avatar/deformers/{snarf_deformer.py,
fast_snarf/deformer_torch.py} and its three CUDA kernels (fuse_broyden,
precompute, filter). Finds, for every posed-space sample, its canonical
correspondences by iterative root-finding of the forward-skinning map.

TPU redesign (SURVEY §7.1.2):
  * ``precompute`` CUDA kernel -> one einsum baking the per-frame
    skinning-Jacobian voxel ``voxel_J (12, D, H, W)`` from the LBS weight
    voxel and bone transforms.
  * ``fuse_broyden`` CUDA kernel (one thread per point x init-bone, early
    returns) -> a vectorized ``lax.fori_loop`` over a fixed 10 iterations
    with per-lane done/valid masks; divergence "return" becomes a state
    freeze. Trilinear J sampling via ops.grid_sample_3d.
  * ``filter`` CUDA dedup -> a pairwise (I, I) mask.
  * pytorch3d KNN(K=30) -> ops.knn.knn_points (MXU matmul + top_k).
  * The Broyden search runs under stop_gradient (the reference wraps it in
    no_grad); gradients come from the version-1 implicit-function-theorem
    correction or the version-2 re-skinning path (deformer_torch.py:50-75).

Geometry/conventions preserved: anisotropic canonical voxel
(D, H, W) = (res/4, res, res), normalized coords with the z-ratio fold,
13 bone-anchored inits [0,1,2,4,5,10,11,12,15,16,17,18,19], convergence
1e-5 / divergence 1e-1, a_pose/da_pose canonical rest poses, and
``tfs = w2s @ A @ A_cano^-1``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body import SMPLModel, smpl_forward
from ..ops.grid_sample import (grid_sample_3d,
                               grid_sample_3d_packed, pack_corners_3d)
from ..ops.knn import knn_points
from .smpl_deformer import get_bbox_from_verts, rigid_inverse

__all__ = ["SNARFDeformer", "SnarfCanonical", "SnarfFrame",
           "get_predefined_rest_pose"]

INIT_BONES = (0, 1, 2, 4, 5, 10, 11, 12, 15, 16, 17, 18, 19)


def get_predefined_rest_pose(cano_pose: str | tuple) -> jax.Array:
    """Canonical rest pose (snarf_deformer.py:6-18): 'da_pose' legs pi/6,
    'a_pose' legs 0.2 + elbows -/+0.8, or 4 explicit angles."""
    pose = jnp.zeros((1, 69))
    if isinstance(cano_pose, str):
        if cano_pose.lower() == "da_pose":
            angles = (jnp.pi / 6, -jnp.pi / 6, 0.0, 0.0)
        elif cano_pose.lower() == "a_pose":
            angles = (0.2, -0.2, -0.8, 0.8)
        else:
            raise ValueError(f"unknown cano_pose: {cano_pose}")
    else:
        angles = tuple(cano_pose)
    pose = pose.at[:, 2].set(angles[0])
    pose = pose.at[:, 5].set(angles[1])
    pose = pose.at[:, 47].set(angles[2])
    pose = pose.at[:, 50].set(angles[3])
    return pose


class SnarfCanonical(NamedTuple):
    """Once-per-subject baked state (switch_to_explicit analog)."""
    lbs_voxel: jax.Array    # (24, D, H, W) smoothed skinning weights
    lbs_packed: jax.Array   # (D*H*W, 192) corner-packed bf16 weights
    lbs_packed32: jax.Array  # (D*H*W, 192) corner-packed f32 weights
    # (feeds the per-frame voxel_J bake: packing is linear, so
    # pack(einsum(lbs, tfs)) == einsum(pack(lbs), tfs) — one MXU matmul
    # per frame instead of an einsum over the raw voxel + a re-pack,
    # which cost a ~40 ms layout copy in the fused frame jit)
    offset: jax.Array       # (3,) voxel-normalization offset
    inv_scale: jax.Array    # (3,) 1/scale with z-ratio folded in
    tfs_inv_t: jax.Array    # (24, 4, 4) inverse canonical bone transforms
    vs_template: jax.Array  # (V, 3) canonical verts
    joints_cano: jax.Array  # (24, 3) canonical joint locations
    bbox: jax.Array         # (2, 3) canonical bbox (net init)


class SnarfFrame(NamedTuple):
    """Per-frame baked state (precompute analog)."""
    voxel_J_packed: jax.Array  # (D*H*W, 96) corner-packed 3x4 transforms
    voxel_d: jax.Array      # (3, D, H, W) forward-warped cell positions
    tfs: jax.Array          # (24, 4, 4) canonical -> posed SMPL space
    w2s: jax.Array          # (4, 4)
    verts_smpl: jax.Array   # (V, 3) posed verts in SMPL space


def _voxel_grid_coords(res: int) -> jax.Array:
    """Normalized (D*H*W, 3) cell coords in [-1, 1], xyz order."""
    d, h, w = res // 4, res, res
    zs = jnp.linspace(-1.0, 1.0, d)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    z, y, x = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


class SNARFDeformer:
    """Static descriptor; canonical/frame state are explicit pytrees."""

    def __init__(self, body_model: SMPLModel, *,
                 resolution: int = 128,
                 cano_pose: str | tuple = "a_pose",
                 global_scale: float = 1.2,
                 n_iters: int = 10,
                 cvg_threshold: float = 1e-5,
                 dvg_threshold: float = 1e-1,
                 version: int = 1,
                 cand_cap: int = 4,
                 n_init_active: int | None = None,
                 knn_chunk: int = 8192,
                 bake_residual: float = 1e-2):
        self.body = body_model
        self.resolution = resolution
        self.cano_pose = cano_pose
        self.global_scale = global_scale
        self.n_iters = n_iters
        self.cvg = cvg_threshold
        self.dvg = dvg_threshold
        self.version = version
        self.cand_cap = cand_cap
        # prune the 13 bone inits to the A nearest posed bones per sample
        # (None = reference-parity full set); see PERF.md
        self.n_init_active = n_init_active
        self.knn_chunk = knn_chunk
        # cache-bake validity: accept lanes whose final residual (posed
        # meters) is below this even if not strictly converged — the bake
        # searches CELL CENTERS, which sit off-surface half a cell more
        # often than ray samples do; the per-sample cached-Newton step
        # absorbs residuals of this size. Strict convergence alone loses
        # silhouette-edge candidates (measured ~2 dB at 48px).
        self.bake_residual = bake_residual
        self.init_bones = np.asarray(INIT_BONES, np.int32)

    @property
    def vox_shape(self) -> tuple[int, int, int]:
        return self.resolution // 4, self.resolution, self.resolution

    # uniform deformer interface (shared with SMPLDeformer)
    def init_state(self, betas: jax.Array) -> "SnarfCanonical":
        return self.build_canonical(betas)

    def canonical_bbox(self, cano: "SnarfCanonical", betas) -> jax.Array:
        return cano.bbox

    def prepare_frame(self, cano, betas, body_pose, global_orient, transl
                      ) -> "SnarfFrame":
        return self.prepare(cano, betas, body_pose, global_orient, transl)

    def make_frame_field_fn(self, cano, frame, net_apply,
                            eval_mode: bool = False):
        return self.make_field_fn(cano, frame, net_apply, eval_mode)

    # -- canonical bake ---------------------------------------------------

    def normalize(self, canonical: SnarfCanonical, x: jax.Array) -> jax.Array:
        """SMPL-space canonical point -> [-1,1] voxel coords (z-ratio
        folded into inv_scale, deformer_torch.py:151-166)."""
        return (x - canonical.offset) * canonical.inv_scale

    def denormalize(self, canonical: SnarfCanonical, x: jax.Array) -> jax.Array:
        return x / canonical.inv_scale + canonical.offset

    def build_canonical(self, betas: jax.Array) -> SnarfCanonical:
        """Bake the per-subject canonical state: rest-pose SMPL, voxel
        bounds, KNN(30) inverse-distance LBS weights + 30 Laplacian
        smoothing sweeps (query_weights_smpl, deformer_torch.py:225-244)."""
        d, h, w = self.vox_shape
        ratio = h / d
        rest = smpl_forward(self.body, betas.reshape(1, -1),
                            get_predefined_rest_pose(self.cano_pose),
                            jnp.zeros((1, 3)))
        verts = rest.vertices[0]
        vmin, vmax = verts.min(axis=0), verts.max(axis=0)
        offset = (vmin + vmax) / 2
        scale = jnp.max(vmax - vmin) / 2 * self.global_scale
        inv_scale = jnp.stack([1.0 / scale, 1.0 / scale, ratio / scale])

        coords_n = _voxel_grid_coords(self.resolution)
        coords = coords_n / inv_scale + offset        # denormalized

        dist_sq, idx = knn_points(coords, verts, k=30, chunk=self.knn_chunk)
        dist = jnp.clip(jnp.sqrt(dist_sq), 1e-4, 1.0)
        wgt = 1.0 / dist
        wgt = wgt / wgt.sum(-1, keepdims=True)        # (M, 30)
        nn_w = jnp.take(self.body.lbs_weights, idx, axis=0)  # (M, 30, 24)
        weights = jnp.einsum("mk,mkj->mj", wgt, nn_w)        # (M, 24)
        vox = weights.T.reshape(24, d, h, w)

        def smooth(_, v):
            mean = (v[:, 2:, 1:-1, 1:-1] + v[:, :-2, 1:-1, 1:-1]
                    + v[:, 1:-1, 2:, 1:-1] + v[:, 1:-1, :-2, 1:-1]
                    + v[:, 1:-1, 1:-1, 2:] + v[:, 1:-1, 1:-1, :-2]) / 6.0
            interior = (v[:, 1:-1, 1:-1, 1:-1] - mean) * 0.7 + mean
            v = v.at[:, 1:-1, 1:-1, 1:-1].set(interior)
            return v / v.sum(0, keepdims=True)

        vox = jax.lax.fori_loop(0, 30, smooth, vox)

        packed32 = pack_corners_3d(vox)
        return SnarfCanonical(
            lbs_voxel=vox,
            # corner-packed bf16 copy: 1 gather row per weight query on
            # the hot gradient path (weights are smooth in [0,1]; bf16's
            # ~1e-3 error is far below the voxelization error)
            lbs_packed=packed32.astype(jnp.bfloat16),
            lbs_packed32=packed32,
            offset=offset,
            inv_scale=inv_scale,
            tfs_inv_t=jnp.linalg.inv(rest.A[0]),
            vs_template=verts,
            joints_cano=rest.joints[0],
            bbox=get_bbox_from_verts(verts))

    # -- per-frame bake ---------------------------------------------------

    def prepare(self, canonical: SnarfCanonical, betas, body_pose,
                global_orient, transl) -> SnarfFrame:
        posed = smpl_forward(self.body, betas.reshape(1, -1),
                             body_pose.reshape(1, -1),
                             global_orient.reshape(1, -1),
                             transl.reshape(1, -1))
        s2w = posed.A[0, 0]
        w2s = rigid_inverse(s2w)
        tfs = jnp.einsum("ij,bjk,bkl->bil", w2s, posed.A[0],
                         canonical.tfs_inv_t)          # (24, 4, 4)

        d, h, w = self.vox_shape
        M = d * h * w
        # voxel_J[c] = sum_j lbs[j] * tfs[j, :3, :4]  (precompute.cu:51-58)
        # — done directly on the corner-packed f32 LBS table (packing is
        # linear), so the per-frame bake is ONE (M*8, 24) @ (24, 12) MXU
        # matmul with no transposes/re-pack (PERF.md)
        tfs12 = tfs[:, :3, :4].reshape(24, 12)
        voxel_J_packed = (canonical.lbs_packed32.reshape(M * 8, 24)
                          @ tfs12).reshape(M, 96)
        coords = self.denormalize(canonical,
                                  _voxel_grid_coords(self.resolution))
        # corner 0 of cell m is the lattice value at m itself
        J0 = voxel_J_packed[:, :12].reshape(M, 3, 4)
        warped = jnp.einsum("mrc,mc->mr", J0[:, :, :3], coords) \
            + J0[:, :, 3]
        voxel_d = warped.T.reshape(3, d, h, w)

        verts_s = (posed.vertices[0] @ w2s[:3, :3].T) + w2s[:3, 3]
        return SnarfFrame(voxel_J_packed=voxel_J_packed,
                          voxel_d=voxel_d, tfs=tfs,
                          w2s=w2s, verts_smpl=verts_s)

    def bbox_deformed(self, frame: SnarfFrame) -> jax.Array:
        """AABB of the forward-warped voxel (get_bbox_deformed,
        snarf_deformer.py:105-107)."""
        v = frame.voxel_d.reshape(3, -1)
        return jnp.stack([v.min(axis=1), v.max(axis=1)])

    def transform_rays_w2s(self, frame: SnarfFrame, rays):
        from ..render.raymarcher import Rays
        R, t = frame.w2s[:3, :3], frame.w2s[:3, 3]
        o = rays.o @ R.T + t
        dd = rays.d @ R.T
        dist = jnp.linalg.norm(o, axis=-1)
        return Rays(o=o, d=dd, near=dist - 1.0, far=dist + 1.0)

    # -- Broyden search ---------------------------------------------------

    def _sample_J(self, canonical: SnarfCanonical, frame: SnarfFrame,
                  x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Trilerp voxel_J at canonical points x (..., 3) -> (J (..., 3, 3),
        t (..., 3)); also returns nothing else. Border-padded like the CUDA
        sampler's clamped reads."""
        n = self.normalize(canonical, x)
        J12 = grid_sample_3d_packed(frame.voxel_J_packed, self.vox_shape, n)
        J = J12.reshape(*J12.shape[:-1], 3, 4)
        return J[..., :3], J[..., 3]

    def search(self, canonical: SnarfCanonical, frame: SnarfFrame,
               xd: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Vectorized fused Broyden root-finding.

        Args:
          xd: (N, 3) posed SMPL-space points.
        Returns:
          xc (N, I, 3) canonical candidates (0 where invalid),
          valid (N, I), J_inv (N, I, 3, 3).
        No gradients flow (wrapped in stop_gradient like the reference's
        no_grad search, deformer_torch.py:96-97).
        """
        x, J_inv, valid, _, _ = self._search_raw(canonical, frame, xd)
        xc = jnp.where(valid[..., None], x, 0.0)
        valid = self._filter_duplicates(xc, valid)
        return xc, valid, J_inv

    def _search_raw(self, canonical: SnarfCanonical, frame: SnarfFrame,
                    xd: jax.Array):
        """Broyden core. Returns RAW per-lane results before the dedup
        filter: (x (N, I, 3) final positions, J_inv (N, I, 3, 3),
        valid_strict (N, I) — converged to cvg while in-bounds (the
        reference semantics), res_sq (N, I) — final residual ||f(x)-xd||^2,
        in_b (N, I) — final position inside the canonical voxel). The
        loose callers (cache bake) accept lanes with small-but-unconverged
        residuals that a downstream Newton step absorbs."""
        xd = jax.lax.stop_gradient(xd)
        tfs = jax.lax.stop_gradient(frame.tfs)
        I = len(self.init_bones)
        N = xd.shape[0]

        bones = jnp.asarray(self.init_bones)
        Rb_all = tfs[bones][:, :3, :3]                 # (I, 3, 3)
        tb_all = tfs[bones][:, :3, 3]                  # (I, 3)

        A = self.n_init_active
        if A is not None and A < I:
            # per-sample init pruning: keep the A nearest posed init bones.
            # Sort-free: A rounds of masked argmin (PERF.md).
            jc = canonical.joints_cano[bones]          # (I, 3)
            posed_j = jnp.einsum("irc,ic->ir", Rb_all, jc) + tb_all
            d2 = jnp.sum((xd[:, None] - posed_j[None]) ** 2, -1)  # (N, I)
            sel = []
            dcur = d2
            for _ in range(A):
                m = dcur.min(axis=-1, keepdims=True)
                is_min = dcur == m
                first = is_min & (jnp.cumsum(is_min, axis=-1) == 1)
                sel.append(first)
                dcur = jnp.where(first, jnp.inf, dcur)
            onehot = jnp.stack(sel, axis=1).astype(jnp.float32)  # (N, A, I)
            Rb = jnp.einsum("nai,irc->narc", onehot, Rb_all)
            tb = jnp.einsum("nai,ir->nar", onehot, tb_all)
            x0 = jnp.einsum("nac,nacr->nar", xd[:, None] - tb, Rb)
            I = A
        else:
            # init: inverse rigid transform of the anchor bone
            # (xd - t) @ R == R^T (xd - t), matching the CUDA init
            x0 = jnp.einsum("nic,icr->nir", xd[:, None] - tb_all[None],
                            Rb_all)

        # ---- lane-efficient scalar-unrolled Broyden (PERF.md) -----------
        # Arrays shaped (N, I, 3, 3) put only 3 of 128 vector lanes to
        # work; the loop below keeps every quantity as flat (N*I,)
        # component vectors (exactly like the CUDA kernel's registers,
        # fuse_cuda_kernel_fast.cu:287-415), which measured ~4x faster.
        M = N * I
        # no_grad search (deformer_torch.py:96-97): without this the
        # backward pass differentiates through every Broyden iteration's
        # (M, 96) gather, materializing per-iteration residuals — pose
        # gradients flow only through the correction (_grad_correct)
        packed = jax.lax.stop_gradient(frame.voxel_J_packed)
        D, H, W = self.vox_shape
        off = canonical.offset
        isc = canonical.inv_scale

        def sample12(x0c, x1c, x2c):
            """Trilerp voxel_J at flat component coords -> (12 x (M,),
            in_bounds (M,))."""
            nx = (x0c - off[0]) * isc[0]
            ny = (x1c - off[1]) * isc[1]
            nz = (x2c - off[2]) * isc[2]
            in_b = (jnp.abs(nx) <= 1.0) & (jnp.abs(ny) <= 1.0) \
                & (jnp.abs(nz) <= 1.0)
            fx = jnp.clip((nx + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
            fy = jnp.clip((ny + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
            fz = jnp.clip((nz + 1.0) * 0.5 * (D - 1), 0.0, D - 1.0)
            ix = jnp.minimum(fx.astype(jnp.int32), W - 2)
            iy = jnp.minimum(fy.astype(jnp.int32), H - 2)
            iz = jnp.minimum(fz.astype(jnp.int32), D - 2)
            tx, ty, tz = fx - ix, fy - iy, fz - iz
            rows = jnp.take(packed, (iz * H + iy) * W + ix, axis=0)
            w = []
            for k in range(8):
                dz, dy, dx = k >> 2 & 1, k >> 1 & 1, k & 1
                w.append((tz if dz else 1 - tz) * (ty if dy else 1 - ty)
                         * (tx if dx else 1 - tx))
            # one pass over the 96-wide rows, then one transpose so the
            # Broyden math reads contiguous (M,) component vectors
            J12 = jnp.einsum("mkc,mk->mc", rows.reshape(-1, 8, 12),
                             jnp.stack(w, axis=-1))
            J12t = J12.T                                  # (12, M)
            return [J12t[c] for c in range(12)], in_b

        xx = [x0[..., c].reshape(M) for c in range(3)]
        xdt = [jnp.broadcast_to(xd[:, None, c], (N, I)).reshape(M)
               for c in range(3)]

        # first "iteration" (i=0) only samples J at x0, initializing
        # J_inv := J^T and g — keeping the sample inside the loop avoids a
        # duplicated, separately-materialized (M, 96) gather outside it
        zero = jnp.zeros((M,))
        Ji = [zero] * 9
        g = [zero] * 3
        done = jnp.zeros((M,), bool)
        valid = jnp.zeros((M,), bool)

        def body(i, carry):
            xx, g, Ji, done, valid = carry
            first = i == 0
            live = jnp.where(first, 0.0, 1.0)
            u = [-(Ji[3 * r] * g[0] + Ji[3 * r + 1] * g[1]
                   + Ji[3 * r + 2] * g[2]) * live for r in range(3)]
            xn = [jnp.where(done, xx[r], xx[r] + u[r]) for r in range(3)]
            J, in_b = sample12(*xn)
            gn = [J[4 * r] * xn[0] + J[4 * r + 1] * xn[1]
                  + J[4 * r + 2] * xn[2] + J[4 * r + 3] - xdt[r]
                  for r in range(3)]
            norm_sq = gn[0] * gn[0] + gn[1] * gn[1] + gn[2] * gn[2]
            conv = (norm_sq < self.cvg ** 2) & ~first
            div = (norm_sq > self.dvg ** 2) & ~first
            newly_conv = conv & ~done
            newly_div = div & ~conv & ~done
            valid = valid | (newly_conv & in_b)

            # Broyden rank-1 (fuse_J_inv_update): c = J_inv^T u;
            # J_inv += outer(u - J_inv dg, c) / (c . dg);
            # on the first pass, J_inv := J^T instead
            dg = [gn[r] - g[r] for r in range(3)]
            cvec = [Ji[r] * u[0] + Ji[3 + r] * u[1] + Ji[6 + r] * u[2]
                    for r in range(3)]
            s = cvec[0] * dg[0] + cvec[1] * dg[1] + cvec[2] * dg[2]
            s = jnp.where(jnp.abs(s) < 1e-12, 1.0, s)
            rr = [-(Ji[3 * r] * dg[0] + Ji[3 * r + 1] * dg[1]
                    + Ji[3 * r + 2] * dg[2]) for r in range(3)]
            active = ~(done | newly_conv | newly_div)
            scale_ = jnp.where(active, 1.0 / s, 0.0) * live
            Ji_n = [jnp.where(first, J[4 * c + r],
                              Ji[3 * r + c] + cvec[c] * (rr[r] + u[r])
                              * scale_)
                    for r in range(3) for c in range(3)]
            g_keep = [jnp.where(done, g[r], gn[r]) for r in range(3)]
            done = done | newly_conv | newly_div
            return xn, g_keep, Ji_n, done, valid

        xx, g, Ji, done, valid = jax.lax.fori_loop(
            0, self.n_iters + 1, body, (xx, g, Ji, done, valid))

        valid = valid.reshape(N, I)
        x = jnp.stack(xx, axis=-1).reshape(N, I, 3)
        J_inv = jnp.stack(Ji, axis=-1).reshape(N, I, 3, 3)
        res_sq = (g[0] * g[0] + g[1] * g[1] + g[2] * g[2]).reshape(N, I)
        # final in-bounds test is pure arithmetic (no gather)
        in_b = jnp.ones((M,), bool)
        for c in range(3):
            nc = (xx[c] - off[c]) * isc[c]
            in_b = in_b & (jnp.abs(nc) <= 1.0)
        return x, J_inv, valid, res_sq, in_b.reshape(N, I)

    # -- packed inverse-warp cache (eval acceleration) ----------------------
    #
    # Per-frame bake: run the Broyden search ONCE on occupied-cell centers
    # and store, per cell, K candidate rows [xc (3), J_inv (9, row-major),
    # valid (1)] — 13 floats/candidate, K*52 bytes/cell (<= the 128-byte
    # single-gather-row limit for K <= 2, PERF.md). Because the search
    # converged to f(xc0) = cell_center, the exact correspondence of any
    # sample xd inside the cell is one cached-Newton step away:
    #     xc = xc0 + J_inv @ (xd - cell_center)
    # with NO voxel_J trilerp at render time — the cell row (which also
    # serves as the occupancy test) is the only gather besides the field's.
    # Candidates are ordered by baked field sigma (desc) so a top-1 render
    # reproduces the reference's max-sigma candidate select at cell
    # granularity (snarf_deformer.py:157-158).

    ROW_FLOATS = 13  # xc(3) + J_inv(9) + valid(1)

    @property
    def cache_K(self) -> int:
        """Static candidate-lane count of packed cache rows (the K in
        (C, K*13)) — lets hosts pre-allocate reuse buffers."""
        I = len(self.init_bones)
        if self.n_init_active is not None and self.n_init_active < I:
            I = self.n_init_active
        return min(self.cand_cap, I)

    def bake_packed_cache(self, canonical: SnarfCanonical,
                          frame: SnarfFrame, cells: jax.Array,
                          net_sigma_fn=None,
                          cell_mask: jax.Array | None = None,
                          return_sigma: bool = False):
        """Full Broyden search on posed-space cell centers -> packed rows.

        Args:
          cells: (C, 3) posed SMPL-space cell centers.
          net_sigma_fn: optional (M, 3) canonical pts -> sigma (M,); when
            given, candidates are sorted by baked sigma descending.
          cell_mask: optional (C,) bool; False rows are zeroed (used for
            padding when the occupied-cell count is dynamic).
          return_sigma: also return the per-cell max baked sigma (C,)
            (0 where no valid candidate) — drives the transmittance-
            terminated window selection (the flat-eval analog of the
            reference composite_test kernel's T<=1e-4 early-out,
            raymarcher.cu:200-235).
        Returns:
          rows (C, K * 13) float32, K = min(cand_cap, active inits);
          with ``return_sigma`` a (rows, sigma_cell) tuple.
        """
        x, J_inv, strict, res_sq, in_b = self._search_raw(canonical, frame,
                                                          cells)
        valid = strict | (in_b & (res_sq < self.bake_residual ** 2))
        xc = jnp.where(valid[..., None], x, 0.0)
        valid = self._filter_duplicates(xc, valid)
        C, I = valid.shape
        Jf = J_inv.reshape(C, I, 9)
        K = min(self.cand_cap, I)
        if K < I:
            from ..render.raymarcher import compact_samples
            order, keep = compact_samples(valid, K)
            xc = jnp.take_along_axis(xc, order[..., None].repeat(3, -1),
                                     axis=1)
            Jf = jnp.take_along_axis(Jf, order[..., None].repeat(9, -1),
                                     axis=1)
            valid = keep
        sigma_cell = None
        if net_sigma_fn is not None and (K > 1 or return_sigma):
            sigma = net_sigma_fn(xc.reshape(C * K, 3)).reshape(C, K)
            sigma = jnp.where(valid, sigma, -jnp.inf)
            if K > 1:
                # bake-time sort over the tiny K axis (NOT a hot-path sort)
                order2 = jnp.argsort(-sigma, axis=-1)
                xc = jnp.take_along_axis(xc,
                                         order2[..., None].repeat(3, -1),
                                         axis=1)
                Jf = jnp.take_along_axis(Jf,
                                         order2[..., None].repeat(9, -1),
                                         axis=1)
                valid = jnp.take_along_axis(valid, order2, axis=1)
                sigma = jnp.take_along_axis(sigma, order2, axis=1)
            sigma_cell = jnp.maximum(sigma.max(axis=-1), 0.0)
            sigma_cell = jnp.where(valid.any(-1), sigma_cell, 0.0)
        rows = jnp.concatenate(
            [xc, Jf, valid.astype(jnp.float32)[..., None]], axis=-1)
        if cell_mask is not None:
            rows = rows * cell_mask[:, None, None].astype(rows.dtype)
            if sigma_cell is not None:
                sigma_cell = sigma_cell * cell_mask.astype(sigma_cell.dtype)
        rows = rows.reshape(C, K * self.ROW_FLOATS)
        if return_sigma:
            if sigma_cell is None:
                sigma_cell = jnp.zeros((C,), rows.dtype)
            return rows, sigma_cell
        return rows

    def make_packed_cache_fns(self, cache_rows: jax.Array,
                              grid_aabb: jax.Array, grid_size: int,
                              net_apply, n_cand: int = 1, net_shared=None):
        """Marcher closures over the packed cache (shared deformer-agnostic
        implementation — see packed_cache.make_packed_cache_fns)."""
        from .packed_cache import make_packed_cache_fns
        return make_packed_cache_fns(cache_rows, grid_aabb, grid_size,
                                     net_apply, n_cand, self.ROW_FLOATS,
                                     net_shared=net_shared)

    @staticmethod
    def _filter_duplicates(xc: jax.Array, valid: jax.Array,
                           eps: float = 1e-4) -> jax.Array:
        """Drop candidate i if a *later* valid candidate j sits within eps
        (filter.cu:25-51 keeps the last duplicate)."""
        diff = xc[:, :, None] - xc[:, None]             # (N, I, I, 3)
        close = jnp.sum(diff * diff, axis=-1) < eps ** 2
        I = xc.shape[1]
        later = jnp.triu(jnp.ones((I, I), bool), k=1)[None]
        dup = jnp.any(close & later & valid[:, None], axis=-1)
        return valid & ~dup

    # -- skinning + gradients ---------------------------------------------

    def query_weights(self, canonical: SnarfCanonical, xc: jax.Array
                      ) -> jax.Array:
        """(..., 3) canonical pts -> (..., 24) trilerped LBS weights
        (single corner-packed gather per point — PERF.md)."""
        # lerp in f32: the rows are bf16 (gather-width economics) but the
        # weights feed forward-skinning residuals the Broyden search is
        # judged by — bf16 lerp WEIGHTS doubled the inversion residual
        # (0.001 -> 0.0022, test_posed_search_inverts_forward_skinning)
        w = grid_sample_3d_packed(canonical.lbs_packed, self.vox_shape,
                                  self.normalize(canonical, xc),
                                  lerp_dtype=jnp.float32)
        return w.astype(jnp.float32)

    def forward_skinning(self, canonical: SnarfCanonical, tfs: jax.Array,
                         xc: jax.Array) -> jax.Array:
        """Canonical -> posed via voxel LBS (skinning_mask analog)."""
        w = self.query_weights(canonical, xc)           # (..., 24)
        T = jnp.einsum("...j,jrc->...rc", w, tfs[:, :3])  # (..., 3, 4)
        return (jnp.einsum("...rc,...c->...r", T[..., :3], xc)
                + T[..., 3])

    def deform(self, canonical: SnarfCanonical, frame: SnarfFrame,
               xd: jax.Array, eval_mode: bool = False
               ) -> tuple[jax.Array, jax.Array]:
        """(N, 3) posed pts -> (xc (N, I, 3), valid (N, I)) with gradients
        per the configured version (deformer_torch.py:46-75)."""
        xc, valid, J_inv = self.search(canonical, frame, xd)
        if eval_mode:
            return xc, valid
        return (self._grad_correct(canonical, frame, xd, xc, valid, J_inv),
                valid)

    def _grad_correct(self, canonical: SnarfCanonical, frame: SnarfFrame,
                      xd: jax.Array, xc: jax.Array, valid: jax.Array,
                      J_inv: jax.Array) -> jax.Array:
        """Differentiable-pose correction on (possibly compacted) search
        candidates (deformer_torch.py:50-75).

        Both versions read the trilerped per-frame transform
        J(x), t(x) = trilerp(voxel_J_packed)(x) instead of re-querying LBS
        weights and contracting with tfs per point: corner packing and the
        bake's (M*8, 24) @ (24, 12) matmul are linear, so
        trilerp(lbs)(x) @ tfs == trilerp(lbs @ tfs)(x) exactly — one
        96-float f32 row gather per candidate (the weights path gathered a
        192-float row AND did a per-point (24)x(24,12) contraction), with
        pose gradients flowing through the bake matmul in prepare()."""
        xc_sg = jax.lax.stop_gradient(xc)
        J, t = self._sample_J(canonical, frame, xc_sg)
        if self.version == 1:
            # implicit-diff correction: xc' = -J_inv d(fwd_skin)/d(theta)
            xd_opt = jnp.einsum("...rc,...c->...r", J, xc_sg) + t
            corr = xd_opt - jax.lax.stop_gradient(xd_opt)
            corr = -jnp.einsum("...rc,...c->...r",
                               jax.lax.stop_gradient(J_inv), corr)
            return xc_sg + jnp.where(valid[..., None], corr, 0.0)
        # version 2: re-skin with grid transforms; grads flow into tfs/xd
        rel = xd[:, None] - t
        xc2 = jnp.einsum("...c,...cr->...r", rel, J)
        return jnp.where(valid[..., None], xc2, 0.0)

    # -- field composition -------------------------------------------------

    def make_field_fn(self, canonical: SnarfCanonical, frame: SnarfFrame,
                      net_apply, eval_mode: bool = False):
        """Marcher closure: deform -> evaluate net on all candidates ->
        max-sigma select (snarf_deformer.py:139-158)."""
        def field_fn(pts):
            xc, valid, J_inv = self.search(canonical, frame, pts)
            N, I, _ = xc.shape
            # candidate compaction: of the 13 search lanes usually <=2 are
            # valid — evaluate the (expensive) field only on the first
            # cand_cap valid candidates per sample (static shapes; the
            # dedup filter means dropped extras are genuine duplicates or
            # rare >cand_cap-way contacts). Compaction runs BEFORE the
            # gradient correction so the correction's per-candidate row
            # gather pays for cand_cap lanes, not all I search lanes.
            C = min(self.cand_cap, I)
            if C < I:
                from ..render.raymarcher import compact_samples
                order, keep = compact_samples(valid, C)  # sort-free (PERF.md)
                valid = keep
                xc = jnp.take_along_axis(
                    xc, order[..., None].repeat(3, -1), axis=1)
                if not eval_mode and self.version == 1:
                    J_inv = jnp.take_along_axis(
                        J_inv.reshape(N, I, 9),
                        order[..., None].repeat(9, -1),
                        axis=1).reshape(N, C, 3, 3)
            if not eval_mode:
                xc = self._grad_correct(canonical, frame, pts, xc, valid,
                                        J_inv)
            rgb, sigma = net_apply(xc.reshape(N * C, 3))
            rgb = rgb.reshape(N, C, 3)
            sigma = sigma.reshape(N, C)
            finite = jnp.isfinite(sigma) & jnp.isfinite(rgb).all(-1)
            ok = valid & finite
            sigma = jnp.where(ok, sigma, -1e5)
            best = jnp.argmax(sigma, axis=-1)
            sigma_out = jnp.take_along_axis(sigma, best[:, None],
                                            axis=1)[:, 0]
            rgb_out = jnp.take_along_axis(
                rgb, best[:, None, None].repeat(3, -1), axis=1)[:, 0]
            any_ok = ok.any(axis=-1)
            rgb_out = jnp.where(any_ok[:, None], rgb_out, 0.0)
            return rgb_out, sigma_out, any_ok
        return field_fn
