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

__all__ = ["composite", "composite_stream", "CompositeOutput"]


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


def composite_stream(sigma: jax.Array, rgb: jax.Array, z: jax.Array,
                     delta: jax.Array, valid: jax.Array, ray_id: jax.Array,
                     offsets: jax.Array, counts: jax.Array) -> jax.Array:
    """Segmented compositing over a ray-major FLAT sample stream.

    The padding-free analog of :func:`composite` for globally compacted
    samples: instead of an (N, S) grid where silhouette rays waste most
    of the S axis, every kept sample across the frame lives in one (M,)
    stream ordered (ray-major, z-ascending within ray). The exclusive
    per-ray transmittance cumprod becomes a log-space cumsum over the
    stream rebased at each ray's first sample, and per-ray accumulation
    is the cumsum DIFFERENCE csum[end] - csum[start] — two (N,) row
    gathers instead of an (M, 5) scatter-add (TPU scatters with duplicate
    indices serialize; xplane measured ~70 ms/frame for the scatter form
    at 540px). Reference economics analog: raymarcher_acc.py alive-ray
    compaction + composite_test early exit.

    Args:
      sigma/rgb/z/delta/valid: (M,) / (M, 3) / (M,) / (M,) / (M,) — the
        flat stream; ``valid=False`` slots (budget padding, cache misses)
        contribute nothing.
      ray_id: (M,) int32 — owning ray per slot (masked slots may carry
        any in-range id; their weight is zero).
      offsets: (N,) int32 — flat position of each ray's FIRST sample
        (exclusive cumsum of per-ray counts over the *untruncated*
        stream); entries at/past M belong to fully-truncated rays and
        accumulate to zero.
      counts: (N,) int32 — per-ray sample counts (untruncated).

    Returns:
      (N, 5) fp32 accumulators [sum w*rgb (3), sum w*z, sum w]; the
      caller blends background via 1 - sum_w.
    """
    M = sigma.shape[0]
    tau = jax.nn.relu(sigma.astype(jnp.float32)) * delta
    tau = jnp.where(valid, tau, 0.0)
    alpha = 1.0 - jnp.exp(-tau)                              # (M,)
    logt = jnp.where(valid, jnp.log1p(-alpha + 1e-10), 0.0)
    c = jnp.cumsum(logt)
    c_excl = c - logt
    base = jnp.take(c_excl, jnp.clip(offsets, 0, M - 1))     # (N,)
    trans = jnp.exp(c_excl - jnp.take(base, ray_id))         # (M,)
    w = jnp.where(valid, trans * alpha, 0.0)
    packed = jnp.concatenate(
        [w[:, None] * rgb.astype(jnp.float32),
         (w * z)[:, None], w[:, None]], axis=-1)             # (M, 5)
    csum = jnp.concatenate(
        [jnp.zeros((1, 5), jnp.float32), jnp.cumsum(packed, axis=0)])
    start = jnp.clip(offsets, 0, M)
    end = jnp.clip(offsets + counts, 0, M)
    return jnp.take(csum, end, axis=0) - jnp.take(csum, start, axis=0)
