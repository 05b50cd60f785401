"""Training losses — parity with /root/reference/instant_avatar/utils/loss.py.

``nerf_loss``: w_rgb * MSE + w_alpha * mask-MSE + w_reg * hard-surface
regularizers (the binary-entropy-like -log(e^-x + e^(x-1)) + 0.313262 on
both accumulated alpha and per-sample weights).

``ngp_loss`` adds the patch-only terms (loss.py:27-46): LPIPS over (P,S,S,3)
patch stacks and the within-patch depth-variance regularizer. LPIPS is
injected as a callable so the perceptual net stays a separate module.

All pure jnp; returns (total, dict-of-components) for logging.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["hard_surface_reg", "nerf_loss", "ngp_loss"]

_OFFSET = 0.313262


def hard_surface_reg(x: jax.Array) -> jax.Array:
    """-log(e^-x + e^(x-1)), minimized at x in {0, 1} (loss.py:45-47)."""
    return jnp.mean(-jnp.log(jnp.exp(-x) + jnp.exp(x - 1.0))) + _OFFSET


def nerf_loss(predicts: dict[str, jax.Array], targets: dict[str, Any],
              *, w_rgb: float = 1.0, w_alpha: float = 0.1,
              w_reg: float = 0.1) -> tuple[jax.Array, dict[str, jax.Array]]:
    losses: dict[str, jax.Array] = {}
    rgb_loss = jnp.mean((predicts["rgb"] - targets["rgb"]) ** 2)
    alpha_loss = jnp.mean((predicts["alpha"] - targets["alpha"]) ** 2)
    reg_alpha = hard_surface_reg(predicts["alpha"])
    reg_density = hard_surface_reg(predicts["weights"])
    losses["mse_loss"] = rgb_loss
    losses["loss_alpha"] = alpha_loss
    losses["reg_alpha"] = reg_alpha
    losses["reg_density"] = reg_density
    total = (w_rgb * rgb_loss + w_alpha * alpha_loss
             + w_reg * (reg_alpha + reg_density))
    losses["loss"] = total
    return total, losses


def ngp_loss(predicts: dict[str, jax.Array], targets: dict[str, Any],
             *, w_rgb: float = 1.0, w_alpha: float = 0.1, w_reg: float = 0.1,
             w_lpips: float = 0.0, w_depth_reg: float = 0.0,
             lpips_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
             ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """NeRFLoss + patch terms. Patch terms fire only when rgb is a patch
    stack (P, S, S, 3) — mirroring the reference's ndim==5 gate (batch dim
    dropped here; we carry (P, S, S, 3))."""
    total, losses = nerf_loss(predicts, targets, w_rgb=w_rgb,
                              w_alpha=w_alpha, w_reg=w_reg)
    is_patch = predicts["rgb"].ndim == 4
    if is_patch and w_lpips > 0 and lpips_fn is not None:
        lp = jnp.sum(lpips_fn(jnp.clip(predicts["rgb"], 0.0, 1.0),
                              targets["rgb"]))
        losses["loss_lpips"] = lp
        total = total + w_lpips * lp
    if is_patch and w_depth_reg > 0:
        alpha = predicts["alpha"]                    # (P, S, S)
        depth = predicts["depth"]
        alpha_sum = alpha.sum(axis=(-1, -2))
        depth_avg = ((depth * alpha).sum(axis=(-1, -2))
                     / (alpha_sum + 1e-3))
        reg = jnp.mean(alpha * jnp.abs(depth - depth_avg[..., None, None]))
        losses["loss_depth_reg"] = reg
        total = total + w_depth_reg * reg
    losses["loss"] = total
    return total, losses
