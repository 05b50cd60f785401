"""Vanilla NeRF MLP field — parity with the reference's ``NeRFNet``
(/root/reference/instant_avatar/models/networks/mlp.py): sin/cos positional
encoding (10 octaves pts / 6 octaves dirs), 256-wide trunk with a skip
connection feeding the encoding back in, sigma = relu(raw[0]), color head
(128-wide) with sigmoid, optional view-direction branch.

Same functional conventions as ``NGPField``: static descriptor + params
pytree. Positional encoding is a single fused broadcast (octaves stacked on
one axis) so XLA vectorizes the sin/cos over all frequencies at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["positional_encoding", "VanillaNeRF", "VanillaNeRFParams"]


def positional_encoding(x: jax.Array, multires: int) -> jax.Array:
    """NeRF sin/cos encoding: (..., D) → (..., D*(2*multires+1)).

    Matches the reference ordering [x, sin(pi f0 x), cos(pi f0 x), ...]
    with frequencies logspace(0, multires-1, base=2).
    """
    freqs = jnp.asarray(2.0 ** np.arange(multires), x.dtype) * jnp.pi
    ang = x[..., None, :] * freqs[:, None]          # (..., M, D)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    flat = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, flat], axis=-1)


class VanillaNeRFParams(NamedTuple):
    w: tuple[jax.Array, ...]
    b: tuple[jax.Array, ...]


class VanillaNeRF:
    def __init__(self, use_viewdir: bool = False, width: int = 256,
                 multires_pts: int = 10, multires_dir: int = 6):
        self.use_viewdir = use_viewdir
        self.multires_pts = multires_pts
        self.multires_dir = multires_dir
        n_pts = 3 * (2 * multires_pts + 1)
        n_dir = 3 * (2 * multires_dir + 1) if use_viewdir else 0
        W = width
        # block0: 5 layers; block1: skip-in, 4 layers → W+1; block2: color head
        self.dims = ([ (n_pts, W) ] + [(W, W)] * 4
                     + [(n_pts + W, W)] + [(W, W)] * 2 + [(W, W + 1)]
                     + [(n_dir + W, 128), (128, 3)])
        self.n_block0 = 5
        self.n_block1 = 4

    def init(self, key: jax.Array) -> VanillaNeRFParams:
        ws, bs = [], []
        for d_in, d_out in self.dims:
            key, sub = jax.random.split(key)
            scale = jnp.sqrt(2.0 / d_in)
            ws.append(jax.random.normal(sub, (d_in, d_out), jnp.float32) * scale)
            bs.append(jnp.zeros((d_out,), jnp.float32))
        return VanillaNeRFParams(tuple(ws), tuple(bs))

    def apply(self, params: VanillaNeRFParams, x: jax.Array,
              d: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
        ws, bs = params.w, params.b
        enc = positional_encoding(x, self.multires_pts)
        h = enc
        i = 0
        for _ in range(self.n_block0):
            h = jax.nn.relu(h @ ws[i] + bs[i]); i += 1
        h = jnp.concatenate([enc, h], axis=-1)
        for k in range(self.n_block1):
            h = h @ ws[i] + bs[i]; i += 1
            if k < self.n_block1 - 1:
                h = jax.nn.relu(h)
        sigma = jax.nn.relu(h[..., 0])
        feat = h[..., 1:]
        if self.use_viewdir:
            if d is None:
                raise ValueError("use_viewdir=True requires view directions")
            feat = jnp.concatenate(
                [positional_encoding(d, self.multires_dir), feat], axis=-1)
        c = jax.nn.relu(feat @ ws[i] + bs[i]); i += 1
        color = jax.nn.sigmoid(c @ ws[i] + bs[i])
        return color, sigma
