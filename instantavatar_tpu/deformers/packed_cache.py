"""Deformer-agnostic packed inverse-warp cache closures.

The per-frame cache stores, for every occupied occupancy-grid cell, K
candidate rows ``[xc (3), J_inv (9), valid (1)]``: the canonical
correspondence of the cell CENTER and the inverse-warp Jacobian there.
A sample xd inside the cell renders through the cached-Newton step
``xc(xd) ~= xc0 + J_inv (xd - center)`` — one row gather per sample
instead of a full inverse search (Broyden for SNARF, an (M, V) KNN for
the SMPL-NN deformer). This cache layer has no counterpart in the
reference (which re-runs its CUDA search per sample,
deformer_torch.py:96-128); it exists because on TPU the per-sample
search is gather-bound while the per-CELL bake amortizes across every
sample in the cell (PERF.md).

Shared by SNARFDeformer and SMPLDeformer — both inverse warps are
locally affine, so the row format and the marcher closures are
identical; only the bake differs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ROW_FLOATS", "make_packed_cache_fns"]

ROW_FLOATS = 13  # xc(3) + J_inv(9) + valid(1)


def make_packed_cache_fns(cache_rows: jax.Array, grid_aabb: jax.Array,
                          grid_size: int, net_apply, n_cand: int = 1,
                          row_floats: int = ROW_FLOATS, net_shared=None):
    """Marcher closures over the packed cache. Returns
    (probe_fn, field_fn, occupancy_fn, field_fn_pts):

      * probe_fn/field_fn — the fused single-gather pair for
        ``render_rays_probed`` (one (M, K*13) row gather per dense
        sample; rows ride through compaction via take_along_axis);
      * occupancy_fn/field_fn_pts — the split pair for ``render_rays``
        (1-byte any-valid gather per dense sample; rows gathered only
        at the k_cap compacted samples).

    Both implement identical semantics; which is faster depends on how
    XLA lowers the payload take_along_axis — pick by measurement
    (AvatarModel.cache_fused_probe).
    """
    G = grid_size
    R = row_floats
    K = cache_rows.shape[-1] // R
    C = min(n_cand, K)
    aabb0 = grid_aabb[0]
    span = grid_aabb[1] - grid_aabb[0]
    # per-cell "has any valid candidate" table (derived once); int32
    # elements — u8/bool gathers hit XLA's bit-packed pred tiling
    # (~3x slower, PERF.md)
    occ_bytes = (cache_rows.reshape(-1, K, R)[..., 12] > 0.5) \
        .any(-1).astype(jnp.int32)

    def cell_of(pts):
        rel = (pts - aabb0) / span
        inside = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
        cell = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
        return cell, inside

    def flat_cell(pts):
        cell, inside = cell_of(pts)
        return (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2], inside

    def probe_fn(pts):
        flat, inside = flat_cell(pts)
        rows = jnp.take(cache_rows, flat, axis=0)       # (M, K*13)
        any_valid = (rows.reshape(-1, K, R)[..., 12] > 0.5).any(-1)
        return inside & any_valid, rows

    def occupancy_fn(pts):
        flat, inside = flat_cell(pts)
        return (jnp.take(occ_bytes, flat) != 0) & inside

    def field_fn_pts(pts):
        flat, _ = flat_cell(pts)
        rows = jnp.take(cache_rows, flat, axis=0)
        return field_fn(pts, rows)

    def field_fn(pts, rows, centers=None, pts_all=None):
        """``centers``: optional (M, 3) cell centers the rows were
        BAKED for — callers that gather one row per block sample and
        reuse it across nearby pixel rays (flat eval) must pass the
        row's own center so the cached-Newton delta is taken against
        the correct expansion point even when a pixel ray crosses a
        cell boundary.

        ``pts_all``: optional (Q, M, 3) pixel-offset variants of
        ``pts`` (which must be one of them — the block-center ray's
        samples). The Newton step runs per variant directly off the
        (M, ...) row/center arrays via einsum — the rows are never
        tiled to (Q*M, K*13) (the tile broadcast materialized ~76 MB
        and cost ~8 ms/frame at 540px, xplane r4). With ``net_shared``
        (field ``apply_shared``) the canonical field's corner gathers
        are additionally shared across the Q variants (they spread
        millimetres in canonical space; measured NEGATIVE on v5e,
        PERF.md — default off); without it each variant gets the exact
        per-point field eval. Returns (Q, ...) leading shapes instead
        of (M, ...)."""
        M = pts.shape[0]
        r = rows.reshape(M, K, R)[:, :C]
        if centers is None:
            cell, _ = cell_of(pts)
            centers = aabb0 + (cell.astype(jnp.float32) + 0.5) \
                / G * span
        xc0 = r[..., 0:3]
        Ji = r[..., 3:12].reshape(M, C, 3, 3)
        val = r[..., 12] > 0.5
        if pts_all is None:
            delta = pts - centers                       # (M, 3)
            xc = xc0 + jnp.einsum("mcrk,mk->mcr", Ji, delta)
            rgb, sigma = net_apply(xc.reshape(M * C, 3))
            rgb = rgb.reshape(M, C, 3)
            sigma = sigma.reshape(M, C)
        else:
            Q = pts_all.shape[0]
            xc = xc0[None] + jnp.einsum("mcrk,qmk->qmcr", Ji,
                                        pts_all - centers[None])
            if net_shared is not None:
                xc_ref = xc0 + jnp.einsum("mcrk,mk->mcr", Ji,
                                          pts - centers)
                rgb, sigma = net_shared(xc_ref.reshape(M * C, 3),
                                        xc.reshape(Q, M * C, 3))
            else:
                rgb, sigma = net_apply(xc.reshape(Q * M * C, 3))
            rgb = rgb.reshape(Q, M, C, 3)
            sigma = sigma.reshape(Q, M, C)
            val = val[None]
        finite = jnp.isfinite(sigma) & jnp.isfinite(rgb).all(-1)
        ok = val & finite
        sigma = jnp.where(ok, sigma, -1e5)
        if C == 1:
            sigma_out, rgb_out = sigma[..., 0], rgb[..., 0, :]
            any_ok = ok[..., 0]
        else:
            best = jnp.argmax(sigma, axis=-1)
            sigma_out = jnp.take_along_axis(sigma, best[..., None],
                                            axis=-1)[..., 0]
            rgb_out = jnp.take_along_axis(
                rgb, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
            any_ok = ok.any(axis=-1)
        rgb_out = jnp.where(any_ok[..., None], rgb_out, 0.0)
        return rgb_out, sigma_out, any_ok

    return probe_fn, field_fn, occupancy_fn, field_fn_pts
