"""Instant-NGP canonical radiance field — TPU-native JAX.

Capability parity with the reference's tcnn-backed ``NeRFNGPNet``
(/root/reference/instant_avatar/models/networks/ngp.py:23-83): a hash-grid
encoding (16x2 @ 2^19, base 16, growth 1.5) fused with a 1-hidden-layer
64-wide sigma MLP producing 16 outputs — raw output 0 is sigma (activation
happens in compositing, like the reference) — and a 2-hidden-layer 64-wide
color MLP with sigmoid on the remaining 15 features. No view direction, no
conditioning (matching ``confs/network/ngp.yaml``: use_viewdir false).

Functional design: ``NGPField`` is a static description; parameters are an
``NGPParams`` pytree threaded through jit. The reference's mutable
``initialize(bbox)`` buffer latch (ngp.py:64-71) becomes the pure helper
``bbox_center_scale`` whose result lives in the train state.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.hashgrid import (HashGridConfig, hash_encode, init_hash_table,
                            level_resolutions)

__all__ = ["NGPField", "NGPParams", "bbox_center_scale", "trunc_exp"]


@jax.custom_jvp
def trunc_exp(x):
    """exp with clamped input and a matching clamped-gradient rule — the
    sigma activation the reference defines (and leaves disabled) as
    ``TruncExp`` (ngp.py:9-20, 58-59). Provided for the same optional use."""
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, y * dx


class NGPParams(NamedTuple):
    table: jax.Array                 # (L, T, F) hash features
    sigma_w: tuple[jax.Array, ...]   # ((32,64), (64,16))
    sigma_b: tuple[jax.Array, ...]
    color_w: tuple[jax.Array, ...]   # ((15,64), (64,64), (64,3))
    color_b: tuple[jax.Array, ...]


def _init_mlp(key: jax.Array, dims: Sequence[int]):
    ws, bs = [], []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / d_in)  # He init for ReLU trunks
        ws.append(jax.random.normal(sub, (d_in, d_out), jnp.float32) * scale)
        bs.append(jnp.zeros((d_out,), jnp.float32))
    return tuple(ws), tuple(bs)


def _mlp(x, ws, bs, *, final_act=None, dtype=jnp.float32):
    """MLP with per-layer ``dtype`` matmul inputs and fp32 accumulation.

    The cast back to ``dtype`` happens at EVERY matmul input: the dot's
    preferred_element_type=f32 output would otherwise propagate f32 into
    all later layers, silently running them as f32 MXU passes (4-8x the
    bf16 cost — caught via xplane r4). Hidden bias-adds/relus also stay
    in ``dtype``: an fp32 bias would materialize an (M, 64) f32
    activation per layer only for the next matmul to cast it back
    (xplane r4: 3 x 2.1 ms select_convert fusions per 540px frame). The
    FINAL layer keeps the f32 accumulation — sigma/color leave in full
    precision."""
    h = x
    n = len(ws)
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = jnp.dot(h.astype(dtype), w.astype(dtype),
                    preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jax.nn.relu(h.astype(dtype) + b.astype(dtype))
        else:
            h = h + b
    h = h.astype(jnp.float32)
    return final_act(h) if final_act is not None else h


def bbox_center_scale(bbox: jax.Array) -> tuple[jax.Array, jax.Array]:
    """bbox (2, 3) → (center, scale) normalization state (ngp.py:64-71)."""
    c = (bbox[0] + bbox[1]) / 2
    s = bbox[1] - bbox[0]
    return c, s


class NGPField:
    """Static field description. ``apply`` is pure and jit-friendly."""

    GEO_FEATS = 16

    def __init__(self,
                 grid: HashGridConfig = HashGridConfig(),
                 sigma_hidden: int = 64,
                 color_hidden: int = 64,
                 color_layers: int = 2,
                 compute_dtype=jnp.float32):
        self.grid = grid
        self.resolutions = tuple(level_resolutions(grid))
        self.sigma_dims = (grid.out_dim, sigma_hidden, self.GEO_FEATS)
        self.color_dims = ((self.GEO_FEATS - 1,)
                           + (color_hidden,) * color_layers + (3,))
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> NGPParams:
        k_tab, k_sig, k_col = jax.random.split(key, 3)
        sigma_w, sigma_b = _init_mlp(k_sig, self.sigma_dims)
        color_w, color_b = _init_mlp(k_col, self.color_dims)
        return NGPParams(table=init_hash_table(k_tab, self.grid),
                         sigma_w=sigma_w, sigma_b=sigma_b,
                         color_w=color_w, color_b=color_b)

    def apply(self, params: NGPParams, x: jax.Array,
              center: jax.Array, scale: jax.Array,
              ) -> tuple[jax.Array, jax.Array]:
        """Evaluate the field.

        Args:
          x: (..., 3) points in world/canonical units.
          center, scale: (3,) normalization (from ``bbox_center_scale``).

        Returns:
          color (..., 3) in [0,1]; sigma (...,) raw (pre-activation, like
          the reference — compositing applies relu/exp).
        """
        xn = (x - center) / scale + 0.5
        enc = hash_encode(params.table, xn, self.grid, self.resolutions)
        geo = _mlp(enc, params.sigma_w, params.sigma_b,
                   dtype=self.compute_dtype)
        sigma = geo[..., 0]
        color = _mlp(geo[..., 1:], params.color_w, params.color_b,
                     final_act=jax.nn.sigmoid, dtype=self.compute_dtype)
        return color, sigma

    def density(self, params: NGPParams, x: jax.Array,
                center: jax.Array, scale: jax.Array) -> jax.Array:
        """Sigma-only path (occupancy-grid updates skip the color MLP)."""
        xn = (x - center) / scale + 0.5
        enc = hash_encode(params.table, xn, self.grid, self.resolutions)
        geo = _mlp(enc, params.sigma_w, params.sigma_b,
                   dtype=self.compute_dtype)
        return geo[..., 0]
