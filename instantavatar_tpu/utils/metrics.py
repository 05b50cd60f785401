"""Image quality metrics — PSNR / SSIM / LPIPS evaluator.

Parity with the reference's ``Evaluator`` (/root/reference/eval.py:14-33:
torchmetrics PSNR(data_range=1), SSIM, LPIPS-alex, fp32, NHWC inputs with
predictions clamped to <= 1).

PSNR and SSIM are exact reimplementations (SSIM follows the standard Wang
et al. formulation with the torchmetrics defaults: 11x11 gaussian window,
sigma 1.5, k1=0.01, k2=0.03). LPIPS uses losses.lpips (weights-gated — see
that module).
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "Evaluator"]


def psnr(pred: jax.Array, target: jax.Array,
         data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred.astype(jnp.float32)
                    - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Mean SSIM over (H, W, C) or (N, H, W, C) images."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # NHWC -> (N*C, H, W, 1) depthwise windows via conv per channel
    n, h, w, c = pred.shape
    x = pred.transpose(0, 3, 1, 2).reshape(n * c, 1, h, w)
    y = target.transpose(0, 3, 1, 2).reshape(n * c, 1, h, w)
    kern = _gaussian_kernel(kernel_size, sigma)[None, None]

    def filt(img):
        return jax.lax.conv_general_dilated(
            img, kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    mu_x = filt(x)
    mu_y = filt(y)
    sigma_x = filt(x * x) - mu_x ** 2
    sigma_y = filt(y * y) - mu_y ** 2
    sigma_xy = filt(x * y) - mu_x * mu_y
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


class Evaluator:
    """PSNR/SSIM/LPIPS over NHWC fp32 images in [0, 1]; predictions are
    clamped to <= 1 like the reference (eval.py:28-33).

    LPIPS runs only with numerically-matched weights (real alex trunk +
    the shipped exact heads); otherwise it is skipped with a LOUD one-time
    warning and ``lpips_skip_reason`` records why (surfaced into
    results.txt by the harness)."""

    def __init__(self, lpips_fn=None):
        self.lpips_skip_reason = None
        if lpips_fn is None:
            try:
                from ..losses.lpips import load_lpips
                lpips_fn = load_lpips(net="alex")
                if not lpips_fn.numerically_matched:
                    self.lpips_skip_reason = (
                        "LPIPS weights are not numerically matched "
                        "(random/partial trunk)")
                    lpips_fn = None
            except FileNotFoundError as e:
                self.lpips_skip_reason = str(e)
                lpips_fn = None
            except Exception as e:  # malformed weights etc.
                self.lpips_skip_reason = f"LPIPS init failed: {e!r}"
                lpips_fn = None
            if lpips_fn is None:
                warnings.warn(
                    "Evaluator: LPIPS column will be OMITTED — "
                    + str(self.lpips_skip_reason)
                    + ". Provide a torchvision alexnet state dict via "
                    "INSTANTAVATAR_LPIPS_WEIGHTS to enable it.",
                    stacklevel=2)
        self.lpips_fn = lpips_fn
        self._psnr = jax.jit(psnr)
        self._ssim = jax.jit(ssim)

    def __call__(self, pred, target) -> dict[str, float]:
        pred = jnp.clip(jnp.asarray(pred, jnp.float32), None, 1.0)
        target = jnp.asarray(target, jnp.float32)
        out = {
            "psnr": float(self._psnr(pred, target)),
            "ssim": float(self._ssim(pred, target)),
        }
        if self.lpips_fn is not None:
            p = pred[None] if pred.ndim == 3 else pred
            t = target[None] if target.ndim == 3 else target
            out["lpips"] = float(jnp.mean(self.lpips_fn(p, t)))
        return out
