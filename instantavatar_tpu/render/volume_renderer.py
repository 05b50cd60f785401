"""Classic coarse/fine volume renderer — parity with the reference's
vestigial ``VolumeRenderer`` (/root/reference/instant_avatar/renderers/
volume_renderer.py): stratified coarse sampling, inverse-CDF importance
sampling from the coarse weights, and hierarchical compositing. The
production path is the occupancy marcher (raymarcher.py); this module is
the reference math, kept exercised (the reference's render_train raises
NotImplementedError — volume_renderer.py:106-108 — so only the eval path
is load-bearing there as well).

All static shapes: the inverse-CDF draw uses ``searchsorted`` on the fixed
coarse-bin CDF (TPU-friendly vectorized binary search).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .compositing import composite
from .raymarcher import Rays, sample_z

__all__ = ["importance_sampling", "VolumeRenderer"]


def importance_sampling(z_coarse: jax.Array, weights: jax.Array,
                        n_fine: int, key: jax.Array | None) -> jax.Array:
    """Draw n_fine depths per ray from the piecewise-constant pdf defined
    by the coarse compositing weights (volume_renderer.py importance path).

    Args:
      z_coarse: (N, S) coarse bin centers (ascending).
      weights: (N, S) coarse weights.
    Returns:
      z_fine: (N, n_fine), sorted ascending.
    """
    mids = 0.5 * (z_coarse[..., 1:] + z_coarse[..., :-1])     # (N, S-1)
    w = weights[..., 1:-1] + 1e-5                              # (N, S-2)
    pdf = w / w.sum(-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros_like(pdf[..., :1]),
                           jnp.cumsum(pdf, -1)], axis=-1)      # (N, S-1)
    if key is not None:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_fine,))
    else:
        u = jnp.broadcast_to(jnp.linspace(1e-4, 1 - 1e-4, n_fine),
                             cdf.shape[:-1] + (n_fine,))
    idx = jax.vmap(jnp.searchsorted)(cdf, u)                   # (N, F)
    lo = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    hi = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_lo = jnp.take_along_axis(cdf, lo, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, hi, axis=-1)
    z_lo = jnp.take_along_axis(mids, jnp.clip(lo, 0, mids.shape[-1] - 1),
                               axis=-1)
    z_hi = jnp.take_along_axis(mids, jnp.clip(hi, 0, mids.shape[-1] - 1),
                               axis=-1)
    t = (u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-8)
    z = z_lo + jnp.clip(t, 0.0, 1.0) * (z_hi - z_lo)
    return jnp.sort(z, axis=-1)


class VolumeRenderer:
    """Hierarchical coarse/fine renderer over an arbitrary field closure."""

    def __init__(self, n_coarse: int = 64, n_fine: int = 128):
        self.n_coarse = n_coarse
        self.n_fine = n_fine

    def __call__(self, field_fn, rays: Rays, *,
                 key: jax.Array | None = None,
                 bg_color: jax.Array | None = None):
        o, d = rays.o.reshape(-1, 3), rays.d.reshape(-1, 3)
        near, far = rays.near.reshape(-1), rays.far.reshape(-1)
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)

        z_c, step = sample_z(near, far, self.n_coarse, k1)
        pts = o[:, None] + z_c[..., None] * d[:, None]
        rgb_c, sigma_c, valid_c = field_fn(pts.reshape(-1, 3))
        S = self.n_coarse
        coarse = composite(sigma_c.reshape(-1, S),
                           rgb_c.reshape(-1, S, 3), z_c, step,
                           valid_c.reshape(-1, S), bg_color)

        z_f = importance_sampling(z_c, coarse.weights, self.n_fine, k2)
        z_all = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
        deltas = jnp.diff(z_all, axis=-1)
        deltas = jnp.concatenate([deltas, deltas[..., -1:]], axis=-1)
        pts = o[:, None] + z_all[..., None] * d[:, None]
        rgb_f, sigma_f, valid_f = field_fn(pts.reshape(-1, 3))
        Sa = z_all.shape[-1]
        fine = composite(sigma_f.reshape(-1, Sa),
                         rgb_f.reshape(-1, Sa, 3), z_all, deltas,
                         valid_f.reshape(-1, Sa), bg_color)
        return {
            "rgb_coarse": coarse.rgb, "depth_coarse": coarse.depth,
            "alpha_coarse": coarse.alpha,
            "rgb": fine.rgb, "depth": fine.depth, "alpha": fine.alpha,
            "weights": fine.weights,
        }
