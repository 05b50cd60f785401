"""Tri-plane field variant — parity with the reference's triplane
``NeRFNGPNet`` (/root/reference/instant_avatar/models/networks/triplane.py):
three learned 32-channel 256x256 planes, bilinearly sampled (align-corners
semantics, matching F.grid_sample align_corners=True) and concatenated into
a 96-d feature feeding the same 16-out sigma MLP + 15-in color MLP stack as
the hash-grid field.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ngp import _init_mlp, _mlp

__all__ = ["TriPlaneField", "TriPlaneParams", "sample_plane_bilinear"]


def sample_plane_bilinear(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample a (C, H, W) plane at uv in [0,1]^2 (align-corners).

    Returns (..., C).
    """
    C, H, W = plane.shape
    u = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)
    v = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    fu = u - u0
    fv = v - v0
    flat = plane.reshape(C, H * W)

    def gather(vy, ux):
        return jnp.take(flat, vy * W + ux, axis=1)  # (C, ...)

    p00 = gather(v0, u0)
    p01 = gather(v0, u0 + 1)
    p10 = gather(v0 + 1, u0)
    p11 = gather(v0 + 1, u0 + 1)
    top = p00 * (1 - fu) + p01 * fu
    bot = p10 * (1 - fu) + p11 * fu
    out = top * (1 - fv) + bot * fv                 # (C, ...)
    return jnp.moveaxis(out, 0, -1)


class TriPlaneParams(NamedTuple):
    plane_xy: jax.Array   # (C, H, W)
    plane_xz: jax.Array
    plane_yz: jax.Array
    sigma_w: tuple[jax.Array, ...]
    sigma_b: tuple[jax.Array, ...]
    color_w: tuple[jax.Array, ...]
    color_b: tuple[jax.Array, ...]


class TriPlaneField:
    GEO_FEATS = 16

    def __init__(self, features: int = 32, res: int = 256,
                 sigma_hidden: int = 64, color_hidden: int = 64,
                 compute_dtype=jnp.float32):
        self.features = features
        self.res = res
        self.sigma_dims = (3 * features, sigma_hidden, self.GEO_FEATS)
        self.color_dims = (self.GEO_FEATS - 1, color_hidden, color_hidden, 3)
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> TriPlaneParams:
        ks = jax.random.split(key, 5)
        shape = (self.features, self.res, self.res)
        sigma_w, sigma_b = _init_mlp(ks[3], self.sigma_dims)
        color_w, color_b = _init_mlp(ks[4], self.color_dims)
        return TriPlaneParams(
            plane_xy=jax.random.normal(ks[0], shape, jnp.float32),
            plane_xz=jax.random.normal(ks[1], shape, jnp.float32),
            plane_yz=jax.random.normal(ks[2], shape, jnp.float32),
            sigma_w=sigma_w, sigma_b=sigma_b,
            color_w=color_w, color_b=color_b)

    def apply(self, params: TriPlaneParams, x: jax.Array,
              center: jax.Array, scale: jax.Array):
        xn = jnp.clip((x - center) / scale + 0.5, 0.0, 1.0)
        feat = jnp.concatenate([
            sample_plane_bilinear(params.plane_xy, xn[..., (0, 1)]),
            sample_plane_bilinear(params.plane_xz, xn[..., (0, 2)]),
            sample_plane_bilinear(params.plane_yz, xn[..., (1, 2)]),
        ], axis=-1)
        geo = _mlp(feat, params.sigma_w, params.sigma_b,
                   dtype=self.compute_dtype)
        sigma = geo[..., 0]
        color = _mlp(geo[..., 1:], params.color_w, params.color_b,
                     final_act=jax.nn.sigmoid, dtype=self.compute_dtype)
        return color, sigma
