"""Avatar model composition + jitted train/eval steps.

The TPU-native replacement for the reference's LightningModule
(/root/reference/instant_avatar/models/DNeRF.py): glue between body model,
deformer, canonical field, raymarcher and losses. Instead of mutable module
state + manual optimization, everything lives in an explicit ``TrainState``
pytree threaded through pure jitted step functions; the "initialize-once"
latches (net bbox init DNeRF.py:133-134, deformer init) happen at state
construction time.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..body import SMPLModel
from ..deformers.smpl_deformer import SMPLDeformer
from ..losses.nerf_loss import nerf_loss, ngp_loss
from ..models.ngp import NGPField, NGPParams, bbox_center_scale
from ..render.raymarcher import Rays, render_rays

__all__ = ["AvatarModel", "TrainState"]


class TrainState(NamedTuple):
    params: Any            # field params (NGPParams, ...)
    opt_state: Any
    center: jax.Array      # (3,) field input normalization
    scale: jax.Array       # (3,)
    step: jax.Array        # () int32


class AvatarModel:
    """Static composition descriptor; all step methods are pure."""

    def __init__(self,
                 body_model: SMPLModel,
                 field: NGPField | None = None,
                 deformer: SMPLDeformer | None = None,
                 *,
                 n_steps: int = 256,
                 k_cap: int | None = 64,
                 noise_steps: int = 1000,
                 loss_weights: dict[str, float] | None = None,
                 optimizer: optax.GradientTransformation | None = None):
        self.field = field or NGPField()
        self.deformer = deformer or SMPLDeformer(body_model)
        self.n_steps = n_steps
        self.k_cap = k_cap
        self.noise_steps = noise_steps
        self.loss_weights = dict(w_rgb=1.0, w_alpha=0.1, w_reg=0.1)
        if loss_weights:
            self.loss_weights.update(loss_weights)
        self.optimizer = optimizer or optax.adam(1e-2)

    # -- state ------------------------------------------------------------

    def init(self, key: jax.Array, betas: jax.Array) -> TrainState:
        params = self.field.init(key)
        cano = self.deformer.canonical_smpl(jnp.asarray(betas).reshape(1, -1))
        from ..deformers.smpl_deformer import get_bbox_from_verts
        bbox = get_bbox_from_verts(cano.vertices[0])
        center, scale = bbox_center_scale(bbox)
        return TrainState(params=params,
                          opt_state=self.optimizer.init(params),
                          center=center, scale=scale,
                          step=jnp.int32(0))

    # -- forward ----------------------------------------------------------

    def _net_apply(self, params, center, scale):
        return lambda x: self.field.apply(params, x, center, scale)

    def render(self, params, center, scale, batch: dict[str, jax.Array],
               *, key: jax.Array | None = None,
               noise_std: jax.Array | float = 0.0,
               bg_color: jax.Array | None = None) -> dict[str, jax.Array]:
        """Render one frame's ray bundle (flat or patch-shaped)."""
        dstate = self.deformer.prepare(
            batch["betas"].reshape(1, -1), batch["body_pose"].reshape(1, -1),
            batch["global_orient"].reshape(1, -1),
            batch["transl"].reshape(1, -1))
        rays = Rays(o=batch["rays_o"], d=batch["rays_d"],
                    near=batch["near"], far=batch["far"])
        rays_s = self.deformer.transform_rays_w2s(dstate, rays)
        if bg_color is not None and bg_color.ndim > 2:
            bg_color = bg_color.reshape(-1, 3)  # marcher works on flat rays
        field_fn = self.deformer.make_field_fn(
            dstate, self._net_apply(params, center, scale))
        out = render_rays(
            field_fn, rays_s,
            aabb=dstate.bbox_deformed,
            n_steps=self.n_steps, k_cap=self.k_cap,
            key=key, noise_std=noise_std,
            bg_color=bg_color)
        shape = batch["rays_o"].shape[:-1]
        return {
            "rgb": out.rgb.reshape(*shape, 3),
            "depth": out.depth.reshape(shape),
            "alpha": out.alpha.reshape(shape),
            "counter": out.counter.reshape(shape),
            "weights": out.weights.reshape(*shape, -1),
        }

    # -- training ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch: dict[str, jax.Array],
                   key: jax.Array) -> tuple[TrainState, dict[str, jax.Array]]:
        noise_std = jnp.where(state.step < self.noise_steps, 1.0, 0.0)

        def loss_fn(params):
            predicts = self.render(params, state.center, state.scale, batch,
                                   key=key, noise_std=noise_std,
                                   bg_color=batch.get("bg_color"))
            total, losses = nerf_loss(predicts, batch, **self.loss_weights)
            losses["counter_avg"] = jnp.mean(predicts["counter"].astype(
                jnp.float32))
            return total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.center, state.scale,
                           state.step + 1),
                losses)

    # -- inference --------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_rays(self, state: TrainState, batch: dict[str, jax.Array]
                  ) -> dict[str, jax.Array]:
        """No-grad render of a (chunked) ray bundle, white background."""
        return self.render(state.params, state.center, state.scale, batch,
                           key=None, noise_std=0.0,
                           bg_color=batch.get("bg_color"))
