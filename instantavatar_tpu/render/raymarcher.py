"""Fixed-shape occupancy-accelerated ray marcher — the TPU redesign of the
reference's CUDA marcher (/root/reference/instant_avatar/renderers/
raymarcher_acc.py + cuda/raymarcher.cu).

Design (SURVEY §7.1): the reference's two data-dependent constructs —
alive-ray compaction in the test path and boolean-mask model calls — are
replaced by static-shape masked compute:

  1. *Dense stratified sampling*: every ray gets MAX_SAMPLES z-values in
     [near, far] (jittered in train, midpoints in eval).
  2. *Occupancy masking*: a cheap gather from the 64^3 occupancy bitfield
     marks candidate samples (replaces the CUDA DDA walk; at 256
     steps/ray the fixed-stride walk visits the same cells).
  3. *Per-ray compaction*: a stable argsort moves occupied samples to the
     front of each ray; only the first ``k_cap`` are evaluated by the
     (expensive) field closure. This bounds field evals exactly like the
     reference's MAX_BATCH_SIZE global cap, but with static shapes.
  4. *Masked compositing* (compositing.py) — transmittance zeroes dead
     samples, so no early-exit control flow is needed.

Per-ray sample counters are kept as the reference's main perf diagnostic
(raymarcher_acc.py:116,137 → val/counter_* logs).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .compositing import composite

__all__ = ["Rays", "RenderOutput", "ray_aabb", "sample_z", "compact_samples",
           "render_rays", "render_rays_probed", "render_rays_windows"]


class Rays(NamedTuple):
    """A bundle of rays (any leading batch shape, flattened internally).

    Mirrors instant_avatar/models/structures/utils.py:5-11.
    """
    o: jax.Array      # (..., 3)
    d: jax.Array      # (..., 3)
    near: jax.Array   # (...,)
    far: jax.Array    # (...,)


class RenderOutput(NamedTuple):
    rgb: jax.Array      # (N, 3)
    depth: jax.Array    # (N,)
    alpha: jax.Array    # (N,)
    counter: jax.Array  # (N,) evaluated-sample count per ray
    weights: jax.Array  # (N, K) compositing weights (train losses use this)


def ray_aabb(o: jax.Array, d: jax.Array, bbox_min: jax.Array,
             bbox_max: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Slab intersection; returns (near, far), far < near when missed.
    (raymarcher_acc.py:38-48.)"""
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t1 = (bbox_min - o) * inv_d
    t2 = (bbox_max - o) * inv_d
    near = jnp.minimum(t1, t2).max(axis=-1)
    far = jnp.maximum(t1, t2).min(axis=-1)
    return near, far


def sample_z(near: jax.Array, far: jax.Array, n_steps: int,
             key: jax.Array | None) -> tuple[jax.Array, jax.Array]:
    """Stratified depths: z_i = near + (i + u_i) * step, u ~ U[0,1) in
    train (key given) else 0.5. Returns (z (N, S), step (N, 1))."""
    step = ((far - near) / n_steps)[..., None]               # (N, 1)
    i = jnp.arange(n_steps, dtype=jnp.float32)
    if key is not None:
        u = jax.random.uniform(key, near.shape + (n_steps,))
    else:
        u = 0.5
    return near[..., None] + (i + u) * step, step


def compact_samples(valid: jax.Array, k_cap: int
                    ) -> tuple[jax.Array, jax.Array]:
    """Move valid samples to the front of each ray (stable, so z-order is
    preserved) and keep the first k_cap.

    Returns (idx (N, K) int32 into the dense sample axis, keep (N, K) bool).

    TPU note: implemented as cumsum + a one-hot contraction on the MXU —
    a full argsort of the (N, S) mask costs ~200 ms at eval shapes on v5e
    while this runs in ~1 ms (PERF.md). idx[n, k] = the position of the
    (k+1)-th valid sample = sum_s s * [cumsum(valid)[n, s] == k+1 & valid].
    """
    S = valid.shape[-1]
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)        # (N, S)
    k = jnp.arange(1, k_cap + 1, dtype=jnp.int32)             # (K,)
    hit = (cum[..., None] == k) & valid[..., None]            # (N, S, K)
    s_idx = jnp.arange(S, dtype=jnp.float32)
    idx = jnp.einsum("nsk,s->nk", hit.astype(jnp.float32), s_idx,
                     preferred_element_type=jnp.float32)
    idx = idx.astype(jnp.int32)                               # 0 where none
    keep = k[None] <= cum[..., -1:]                           # (N, K)
    return idx, keep


def render_rays(field_fn: Callable[[jax.Array], tuple[jax.Array, jax.Array,
                                                      jax.Array]],
                rays: Rays,
                *,
                occupancy_fn: Callable[[jax.Array], jax.Array] | None = None,
                aabb: jax.Array | None = None,
                n_steps: int = 256,
                k_cap: int | None = None,
                key: jax.Array | None = None,
                noise_std: float | jax.Array = 0.0,
                bg_color: jax.Array | None = None) -> RenderOutput:
    """March a flat bundle of rays through a field.

    Args:
      field_fn: (M, 3) pts -> (rgb (M,3), sigma (M,), valid (M,) bool).
        This is the deformer+network closure (the analog of DNeRF.py:67).
      rays: flat Rays (N rays).
      occupancy_fn: (M, 3) pts -> bool occupancy (the 64^3 grid lookup);
        None = everything occupied.
      aabb: optional (2, 3) scene box; near/far are clipped to it.
      n_steps: dense samples per ray (reference MAX_SAMPLES = 256).
      k_cap: per-ray evaluated-sample budget; None = evaluate all n_steps.
      key: PRNG for stratified jitter + sigma noise (None = eval mode).
      noise_std: sigma noise std (reference: 1.0 for the first 1k steps).
      bg_color: (N, 3)/(3,) background (None = white).
    """
    o, d = rays.o.reshape(-1, 3), rays.d.reshape(-1, 3)
    near, far = rays.near.reshape(-1), rays.far.reshape(-1)
    if aabb is not None:
        a_near, a_far = ray_aabb(o, d, aabb[0], aabb[1])
        near = jnp.clip(a_near, near, far)
        far = jnp.clip(a_far, near, far)

    k_jitter = k_noise = None
    if key is not None:
        k_jitter, k_noise = jax.random.split(key)
    z, step = sample_z(near, far, n_steps, k_jitter)          # (N,S),(N,1)
    pts = o[:, None] + z[..., None] * d[:, None]              # (N, S, 3)

    in_range = z < far[..., None]
    if occupancy_fn is not None:
        occ = occupancy_fn(pts.reshape(-1, 3)).reshape(z.shape)
        valid = occ & in_range
    else:
        valid = in_range

    if k_cap is not None and k_cap < n_steps:
        idx, keep = compact_samples(valid, k_cap)
        z_k = jnp.take_along_axis(z, idx, axis=-1)            # (N, K)
        pts_k = o[:, None] + z_k[..., None] * d[:, None]
    else:
        keep, z_k, pts_k = valid, z, pts

    counter = keep.sum(axis=-1)

    flat = pts_k.reshape(-1, 3)
    rgb, sigma, f_valid = field_fn(flat)
    S = z_k.shape[-1]
    rgb = rgb.reshape(-1, S, 3)
    sigma = sigma.reshape(-1, S)
    keep = keep & f_valid.reshape(-1, S)
    sigma = jnp.where(keep, sigma, -1e3)  # matches reference invalid fill

    if key is not None and noise_std is not None:
        sigma = sigma + noise_std * jax.random.normal(k_noise, sigma.shape)

    out = composite(sigma, rgb, z_k, step, keep, bg_color)
    return RenderOutput(out.rgb, out.depth, out.alpha,
                        counter.astype(jnp.int32), out.weights)


def render_rays_windows(field_fn_pts: Callable[[jax.Array],
                                               tuple[jax.Array, jax.Array,
                                                     jax.Array]],
                        o: jax.Array, d: jax.Array,
                        z_w: jax.Array, keep: jax.Array, step: jax.Array,
                        bg_color: jax.Array | None = None) -> RenderOutput:
    """Composite pre-selected sample windows — the zero-mask chunk phase.

    The coarse prepass already walked the occupancy grid and compacted
    each ray's occupied coarse samples into ``z_w`` (N, K) ascending
    window centers (+ ``keep``), so this phase does NO occupancy gathers,
    NO (N, S) masks and NO cumsum compaction (which cost ~110 ms/frame in
    pred-tiling copies and gather fusions, PERF.md xplane): per sample
    it is one warp-cache row fetch + one field eval + masked composite.

    Args:
      field_fn_pts: (M, 3) pts -> (rgb, sigma, valid) — validity comes
        from the packed cache row, subsuming the occupancy test.
      z_w/keep: (N, K); step: (N, 1) the coarse stride (compositing delta).
    """
    pts = o[:, None] + z_w[..., None] * d[:, None]
    rgb, sigma, f_valid = field_fn_pts(pts.reshape(-1, 3))
    K = z_w.shape[-1]
    rgb = rgb.reshape(-1, K, 3)
    sigma = sigma.reshape(-1, K)
    keep = keep & f_valid.reshape(-1, K)
    sigma = jnp.where(keep, sigma, -1e3)
    counter = keep.sum(axis=-1)
    out = composite(sigma, rgb, z_w, step, keep, bg_color)
    return RenderOutput(out.rgb, out.depth, out.alpha,
                        counter.astype(jnp.int32), out.weights)


def render_rays_probed(probe_fn: Callable[[jax.Array],
                                          tuple[jax.Array, jax.Array]],
                       field_fn: Callable[[jax.Array, jax.Array],
                                          tuple[jax.Array, jax.Array,
                                                jax.Array]],
                       rays: Rays,
                       *,
                       aabb: jax.Array | None = None,
                       n_steps: int = 64,
                       k_cap: int = 8,
                       bg_color: jax.Array | None = None) -> RenderOutput:
    """Eval-only marcher where occupancy and per-cell payload come from ONE
    gather (the packed warp-cache row doubles as the occupancy bit —
    VERDICT r1 next-1a). The payload is compacted alongside z, so the
    field closure never re-gathers per-cell state.

    Args:
      probe_fn: (M, 3) pts -> (occupied (M,) bool, payload (M, R)).
      field_fn: ((M', 3) pts, (M', R) payload) -> (rgb, sigma, valid).
      rays: flat bundle whose near/far should already be TIGHT per-ray
        bounds (e.g. from the coarse occupancy prepass) — fewer dense
        steps cover the occupied segment at finer spacing than the
        reference's 256 over the full [‖t‖-1, ‖t‖+1] span.
    """
    o, d = rays.o.reshape(-1, 3), rays.d.reshape(-1, 3)
    near, far = rays.near.reshape(-1), rays.far.reshape(-1)
    if aabb is not None:
        a_near, a_far = ray_aabb(o, d, aabb[0], aabb[1])
        near = jnp.clip(a_near, near, far)
        far = jnp.clip(a_far, near, far)

    z, step = sample_z(near, far, n_steps, None)              # (N,S),(N,1)
    pts = o[:, None] + z[..., None] * d[:, None]              # (N, S, 3)

    occ, payload = probe_fn(pts.reshape(-1, 3))
    R = payload.shape[-1]
    valid = occ.reshape(z.shape) & (z < far[..., None])

    idx, keep = compact_samples(valid, k_cap)
    z_k = jnp.take_along_axis(z, idx, axis=-1)                # (N, K)
    pts_k = o[:, None] + z_k[..., None] * d[:, None]
    payload_k = jnp.take_along_axis(
        payload.reshape(*z.shape, R), idx[..., None], axis=1)

    counter = keep.sum(axis=-1)

    rgb, sigma, f_valid = field_fn(pts_k.reshape(-1, 3),
                                   payload_k.reshape(-1, R))
    K = z_k.shape[-1]
    rgb = rgb.reshape(-1, K, 3)
    sigma = sigma.reshape(-1, K)
    keep = keep & f_valid.reshape(-1, K)
    sigma = jnp.where(keep, sigma, -1e3)

    out = composite(sigma, rgb, z_k, step, keep, bg_color)
    return RenderOutput(out.rgb, out.depth, out.alpha,
                        counter.astype(jnp.int32), out.weights)
