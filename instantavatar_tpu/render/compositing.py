"""Differentiable volume compositing — pure XLA, static shapes.

Math parity with the reference's train-path compositor
(/root/reference/instant_avatar/renderers/raymarcher_acc.py:25-36,140-186):
alpha = 1 - exp(-relu(sigma) * delta), transmittance = exclusive
cumprod(1 - alpha + 1e-10), color = sum(w * rgb) + T_final * bg. The
reference's CUDA ``composite_test`` early-termination (T < 1e-4) is
replaced by masked accumulation — transmittance already kills dead tail
contributions, so the fixed-shape sum is numerically equivalent.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["composite", "CompositeOutput"]


class CompositeOutput(NamedTuple):
    rgb: jax.Array      # (N, 3)
    depth: jax.Array    # (N,)
    alpha: jax.Array    # (N,) accumulated opacity (sum of weights)
    weights: jax.Array  # (N, S) per-sample compositing weights
    trans: jax.Array    # (N,) final transmittance (no-hit probability)


def composite(sigma: jax.Array, rgb: jax.Array, z: jax.Array,
              delta: jax.Array, valid: jax.Array,
              bg_color: jax.Array | None = None) -> CompositeOutput:
    """Front-to-back alpha compositing over per-ray sample sequences.

    Args:
      sigma: (N, S) raw density (pre-activation; relu applied here).
      rgb: (N, S, 3) sample colors.
      z: (N, S) sample depths (ordered ascending where valid).
      delta: (N, S) or (N, 1) step sizes.
      valid: (N, S) bool — invalid samples contribute nothing.
      bg_color: (N, 3) or (3,) background; None = white.

    Returns:
      CompositeOutput with fp32 results.
    """
    sigma = sigma.astype(jnp.float32)
    tau = jax.nn.relu(sigma) * delta
    tau = jnp.where(valid, tau, 0.0)
    alpha = 1.0 - jnp.exp(-tau)                              # (N, S)
    # exclusive cumprod: T_i = prod_{j<i} (1 - alpha_j + eps)
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-10],
        axis=-1)
    trans = jnp.cumprod(shifted, axis=-1)                    # (N, S)
    weights = alpha * trans
    trans_final = trans[..., -1] * (1.0 - alpha[..., -1] + 1e-10)

    color = jnp.sum(weights[..., None] * rgb.astype(jnp.float32), axis=-2)
    if bg_color is None:
        color = color + trans_final[..., None]
    else:
        color = color + trans_final[..., None] * bg_color.astype(jnp.float32)
    depth = jnp.sum(weights * z, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    return CompositeOutput(color, depth, acc, weights, trans_final)
