"""Optimizer construction — parity with the reference's parameter groups
and schedule (/root/reference/instant_avatar/models/DNeRF.py:29-58).

Reference: Adam(betas=(0.9, 0.99), eps=1e-15) with three groups — hash
encoder @ lr, other net params @ lr, SMPL embedding @ optimize_SMPL.lr —
and a LambdaLR decay ``(1 - epoch/max_epochs)^1.5`` stepped once per
validation epoch. Here the decay is a step schedule (epoch = step //
steps_per_epoch) applied to the field groups; the refine flow freezes the
field entirely (eval.py:71-73) via a zero mask.
"""
from __future__ import annotations

from typing import Any

import jax
import optax

__all__ = ["make_optimizer", "poly_decay_schedule"]


def poly_decay_schedule(base_lr: float, max_epochs: int,
                        steps_per_epoch: int, power: float = 1.5):
    def schedule(step):
        epoch = jax.numpy.minimum(step // max(steps_per_epoch, 1),
                                  max_epochs - 1)
        return base_lr * (1.0 - epoch / max_epochs) ** power
    return schedule


def make_optimizer(lr: float = 1e-2,
                   smpl_lr: float | None = None,
                   *,
                   max_epochs: int | None = None,
                   steps_per_epoch: int = 100,
                   freeze_field: bool = False,
                   betas: tuple[float, float] = (0.9, 0.99),
                   eps: float = 1e-15,
                   skip_nonfinite: int = 10) -> optax.GradientTransformation:
    """Build the grouped optimizer over params pytrees shaped
    ``{"field": ..., "smpl": SMPLParams | ()}``.

    ``skip_nonfinite``: updates with non-finite grads are skipped in-graph
    (optax.apply_if_finite) — the functional analog of the reference's
    try/except around optimizer.step (DNeRF.py:155-161)."""
    if max_epochs is not None:
        field_lr = poly_decay_schedule(lr, max_epochs, steps_per_epoch)
    else:
        field_lr = lr

    field_opt = (optax.set_to_zero() if freeze_field
                 else optax.adam(field_lr, b1=betas[0], b2=betas[1],
                                 eps=eps))
    smpl_opt = (optax.adam(smpl_lr, b1=betas[0], b2=betas[1], eps=eps)
                if smpl_lr is not None else optax.set_to_zero())

    def label_fn(params: dict[str, Any]):
        return {k: k for k in params}

    opt = optax.multi_transform(
        {"field": field_opt, "smpl": smpl_opt}, label_fn)
    if skip_nonfinite:
        opt = optax.apply_if_finite(opt, max_consecutive_errors=skip_nonfinite)
    return opt
