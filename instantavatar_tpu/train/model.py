"""Avatar model composition + jitted train/eval steps.

The TPU-native replacement for the reference's LightningModule
(/root/reference/instant_avatar/models/DNeRF.py): glue between body model,
deformer, canonical field, occupancy grid, raymarcher and losses. Instead
of mutable module state + manual optimization, everything lives in an
explicit ``TrainState`` pytree threaded through pure jitted step functions;
the "initialize-once" latches (net bbox init DNeRF.py:133-134, deformer
init) happen at state construction.

Grid cadence: the reference updates the occupancy grid every N=20 steps
inside the training step, with the (differentiable) sampled density feeding
an occupancy regularizer (DNeRF.py:99-110). Here the host train loop picks
between two compiled variants — ``train_step`` and ``train_step_update``
— both fully static; no in-jit conditionals on the step counter.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..body import SMPLModel
from ..deformers.smpl_deformer import SMPLDeformer
from ..losses.nerf_loss import nerf_loss
from ..models.ngp import NGPField, bbox_center_scale
from ..render.density_grid import (DensityGridState, initialize_grid,
                                   make_grid_state, occupancy_lookup,
                                   occupancy_regularizer, update_grid)
from ..render.raymarcher import Rays, render_rays
from .smpl_params import SMPLParams, lookup_frame

__all__ = ["AvatarModel", "TrainState", "WORLD_AABB"]

# the reference's hard-coded SMPL-space scene box (raymarcher_acc.py:61-62)
WORLD_AABB = ((-1.25, -1.55, -1.25), (1.25, 0.95, 1.25))


class TrainState(NamedTuple):
    params: Any            # {"field": NGPParams..., "smpl": SMPLParams|()}
    opt_state: Any
    grid: DensityGridState
    deformer_cano: Any     # per-subject deformer bake (SNARF LBS voxel, ...)
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
                 grid_size: int = 64,
                 grid_update_interval: int = 20,
                 noise_steps: int = 1000,
                 use_noise: bool = True,
                 optimize_smpl: bool = False,
                 is_refine: bool = False,
                 smpl_init: bool = False,
                 use_warp_cache: bool = True,
                 warp_refine_iters: int = 1,
                 loss_weights: dict[str, float] | None = None,
                 optimizer: optax.GradientTransformation | None = None):
        self.field = field or NGPField()
        self.deformer = deformer or SMPLDeformer(body_model)
        self.n_steps = n_steps
        self.k_cap = k_cap
        self.grid_size = grid_size
        # smpl_init: per-frame grids seeded from the posed body, updated
        # every step (reference demo flow: DNeRF.py:100, density_grid.py
        # smpl_init branch)
        self.smpl_init = smpl_init
        self.grid_update_interval = 1 if smpl_init else grid_update_interval
        # eval acceleration: per-frame inverse-warp bake on occupied cells
        # (SNARF only; PERF.md item 4). Exactness is restored per sample by
        # warp_refine_iters Newton steps from the cached candidate.
        self.use_warp_cache = use_warp_cache
        self.warp_refine_iters = warp_refine_iters
        # refine mode disables sigma noise (DNeRF.py:65)
        self.noise_steps = noise_steps if (use_noise and not is_refine) else 0
        self.optimize_smpl = optimize_smpl
        self.is_refine = is_refine
        self.loss_weights = dict(w_rgb=1.0, w_alpha=0.1, w_reg=0.1)
        if loss_weights:
            self.loss_weights.update(loss_weights)
        self.optimizer = optimizer or optax.adam(1e-2)

    # -- state ------------------------------------------------------------

    def init(self, key: jax.Array, betas: jax.Array,
             smpl_params: SMPLParams | None = None) -> TrainState:
        """Build the train state. ``smpl_params`` seeds the per-frame
        optimizable SMPL embedding (required when optimize_smpl)."""
        field_params = self.field.init(key)
        betas = jnp.asarray(betas).reshape(1, -1)
        if self.optimize_smpl and smpl_params is None:
            raise ValueError("optimize_smpl=True needs initial smpl_params")
        params = {"field": field_params,
                  "smpl": smpl_params if self.optimize_smpl else ()}
        cano = self.deformer.init_state(betas)
        bbox = self.deformer.canonical_bbox(cano, betas)
        center, scale = bbox_center_scale(bbox)
        grid = make_grid_state(jnp.asarray(WORLD_AABB), self.grid_size)
        # before the first grid update, march everywhere inside the box
        grid = grid._replace(occupancy=jnp.ones_like(grid.occupancy))
        if self.smpl_init:
            if smpl_params is None:
                raise ValueError("smpl_init=True needs smpl_params (all "
                                 "frames' poses seed the per-frame grids)")
            grid = self._smpl_init_grids(cano, smpl_params, grid)
        return TrainState(params=params,
                          opt_state=self.optimizer.init(params),
                          grid=grid,
                          deformer_cano=cano,
                          center=center, scale=scale,
                          step=jnp.int32(0))

    def _smpl_init_grids(self, cano, smpl_params: SMPLParams,
                         template: DensityGridState) -> DensityGridState:
        """Per-frame occupancy grids seeded from the posed body: cells
        within 2 cm of a body vertex (vertex-distance approximation of the
        reference's kaolin point-to-mesh signed distance,
        density_grid.py:53-75; at SMPL vertex density the difference is
        below one cell). Stacked on a leading frame axis."""
        G = self.grid_size
        F = smpl_params.body_pose.shape[0]
        aabb = template.aabb
        idxs = (jnp.arange(G) + 0.5) / G
        zz, yy, xx = jnp.meshgrid(idxs, idxs, idxs, indexing="ij")
        cells = (jnp.stack([zz, yy, xx], -1).reshape(-1, 3)
                 * (aabb[1] - aabb[0]) + aabb[0])

        def one(args):
            body_pose, global_orient, transl = args
            frame = self.deformer.prepare_frame(
                cano, smpl_params.betas, body_pose.reshape(1, -1),
                global_orient.reshape(1, -1), transl.reshape(1, -1))
            from ..ops.knn import knn_points
            d2, _ = knn_points(cells, frame.verts_smpl, k=1, chunk=8192)
            # threshold: the reference's 1 cm SD margin, widened to half a
            # cell diagonal so coarse grids still catch the surface
            thr = jnp.maximum(0.02,
                              0.5 * jnp.linalg.norm((aabb[1] - aabb[0]) / G))
            occ = (d2[:, 0] < thr ** 2).reshape(G, G, G)
            # opacity cache seeding like the reference (-log(1-occ)*100)
            cached = jnp.where(occ, 100.0 * 4.6, 0.0)
            return cached, occ

        cached, occ = jax.lax.map(
            one, (smpl_params.body_pose, smpl_params.global_orient,
                  smpl_params.transl))
        return DensityGridState(
            density_cached=cached,
            occupancy=occ,
            aabb=jnp.broadcast_to(aabb, (F, 2, 3)))

    # -- forward ----------------------------------------------------------

    def _net_apply(self, params, center, scale):
        return lambda x: self.field.apply(params, x, center, scale)

    def _resolve_batch(self, params, batch):
        """Swap in the optimized per-frame SMPL params (DNeRF.py:113-128;
        betas only for the SMPL-NN deformer like the reference)."""
        if not self.optimize_smpl or not isinstance(params, dict) \
                or not isinstance(params.get("smpl"), SMPLParams):
            return batch
        refined = lookup_frame(params["smpl"], batch["idx"])
        out = dict(batch)
        for k in ("global_orient", "body_pose", "transl"):
            out[k] = refined[k]
        from ..deformers.smpl_deformer import SMPLDeformer
        if isinstance(self.deformer, SMPLDeformer):
            out["betas"] = refined["betas"]
        return out

    def _prepare(self, cano, batch):
        return self.deformer.prepare_frame(
            cano,
            batch["betas"].reshape(1, -1), batch["body_pose"].reshape(1, -1),
            batch["global_orient"].reshape(1, -1),
            batch["transl"].reshape(1, -1))

    def render(self, params, center, scale, batch, *,
               cano=None, dstate=None,
               grid: DensityGridState | None = None,
               key=None, noise_std=0.0, bg_color=None,
               eval_mode: bool = True,
               k_cap: int | None = None) -> dict[str, jax.Array]:
        """Render one frame's ray bundle (flat or patch-shaped).

        near/far are recomputed by the world->SMPL ray transform
        (reference smpl_deformer.py:76-84); batch near/far are ignored.
        """
        if dstate is None:
            dstate = self._prepare(cano, batch)
        rays = Rays(o=batch["rays_o"], d=batch["rays_d"],
                    near=batch["near"], far=batch["far"])
        rays_s = self.deformer.transform_rays_w2s(dstate, rays)
        if bg_color is not None and bg_color.ndim > 2:
            bg_color = bg_color.reshape(-1, 3)  # marcher works on flat rays
        field_fn = self.deformer.make_frame_field_fn(
            cano, dstate, self._net_apply(params, center, scale),
            eval_mode=eval_mode)
        occupancy_fn = (None if grid is None
                        else lambda pts: occupancy_lookup(grid, pts))
        out = render_rays(
            field_fn, rays_s,
            occupancy_fn=occupancy_fn,
            aabb=grid.aabb if grid is not None
            else self.deformer.bbox_deformed(dstate),
            n_steps=self.n_steps, k_cap=k_cap or self.k_cap,
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

    def _density_fn(self, params, center, scale, cano, dstate):
        """Grid-update query: full deform + field sigma on SMPL-space pts
        (the reference queries deformer(coords, net) the same way,
        density_grid.py:48-50). Uses the deformer's field closure so it
        works for both SMPL-NN and SNARF deformers."""
        field_fn = self.deformer.make_frame_field_fn(
            cano, dstate, self._net_apply(params, center, scale),
            eval_mode=True)

        def fn(pts):
            _, sigma, valid = field_fn(pts)
            return jnp.where(valid, sigma, 0.0)
        return fn

    def grads_and_losses(self, state: TrainState, batch, key,
                         with_grid_update: bool = False):
        """Gradient computation only — the building block shared by the
        single-chip steps below and the shard_map data-parallel step in
        parallel/ (which pmeans the returned grads across ray shards)."""
        return self._grads_impl(state, batch, key, with_grid_update)

    def apply_grads(self, state: TrainState, grads, new_grid):
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state,
                              grid=new_grid, step=state.step + 1)

    def _step_impl(self, state: TrainState, batch, key,
                   with_grid_update: bool):
        grads, losses, new_grid = self._grads_impl(state, batch, key,
                                                   with_grid_update)
        return self.apply_grads(state, grads, new_grid), losses

    def _grads_impl(self, state: TrainState, batch, key,
                    with_grid_update: bool):
        noise_std = jnp.where(state.step < self.noise_steps, 1.0, 0.0) \
            if self.noise_steps > 0 else 0.0
        k_render, k_grid = jax.random.split(key)

        def loss_fn(params):
            rbatch = self._resolve_batch(params, batch)
            field_params = params["field"] if isinstance(params, dict) \
                else params
            dstate = self._prepare(state.deformer_cano, rbatch)
            if self.smpl_init:
                # per-frame grid (stacked on the leading axis)
                cur_grid = jax.tree.map(lambda x: x[rbatch["idx"]],
                                        state.grid)
            else:
                cur_grid = state.grid
            new_grid = cur_grid
            reg = 0.0
            if with_grid_update:
                new_grid, density_norm, old_occ = update_grid(
                    cur_grid,
                    self._density_fn(field_params, state.center, state.scale,
                                     state.deformer_cano, dstate),
                    k_grid)
                if self.smpl_init:
                    # hold the body-seeded grid fixed for the first 500
                    # steps (density_grid.py:52-75 initialized latch)
                    new_grid = jax.tree.map(
                        lambda new, old: jnp.where(state.step < 500, old,
                                                   new),
                        new_grid, cur_grid)
                # first 500 steps: judge vs the fresh field (DNeRF.py:104-107)
                valid = jnp.where(state.step < 500, new_grid.occupancy,
                                  old_occ)
                reg = occupancy_regularizer(density_norm, valid, state.step,
                                            self.grid_update_interval)
            predicts = self.render(field_params, state.center, state.scale,
                                   rbatch,
                                   cano=state.deformer_cano, dstate=dstate,
                                   grid=new_grid, eval_mode=False,
                                   key=k_render, noise_std=noise_std,
                                   bg_color=rbatch.get("bg_color"))
            total, losses = nerf_loss(predicts, rbatch, **self.loss_weights)
            # refine mode skips the occupancy reg (DNeRF.py:139)
            if not self.is_refine:
                total = total + reg
            losses["loss"] = total
            losses["reg_occupancy"] = jnp.asarray(reg)
            losses["counter_avg"] = jnp.mean(
                predicts["counter"].astype(jnp.float32))
            # SMPL-param drift vs the dataset's initial estimate
            # (DNeRF.py:117-119 logging)
            if self.optimize_smpl and isinstance(params, dict) \
                    and isinstance(params.get("smpl"), SMPLParams):
                for k in ("global_orient", "body_pose", "transl"):
                    losses[f"drift_{k}"] = jnp.mean(
                        jnp.abs(rbatch[k] - batch[k]))
            return total, (losses, new_grid)

        (_, (losses, new_grid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if self.smpl_init and with_grid_update:
            # scatter the updated per-frame grid back into the stack
            new_grid = jax.tree.map(
                lambda stack, g: stack.at[batch["idx"]].set(g),
                state.grid, new_grid)
        elif self.smpl_init:
            new_grid = state.grid
        return grads, losses, new_grid

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, key):
        return self._step_impl(state, batch, key, with_grid_update=False)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step_update(self, state: TrainState, batch, key):
        """Train step + occupancy-grid update + occupancy regularizer
        (host calls this every ``grid_update_interval`` steps)."""
        return self._step_impl(state, batch, key, with_grid_update=True)

    def step(self, state: TrainState, batch, key):
        """Host-side dispatcher matching the reference cadence."""
        if int(state.step) % self.grid_update_interval == 0:
            return self.train_step_update(state, batch, key)
        return self.train_step(state, batch, key)

    # -- inference --------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def build_test_grid(self, state: TrainState, batch
                        ) -> DensityGridState:
        """Per-frame test grid: aabb from the deformed body, 5 jittered
        max-density passes (density_grid.py:94-110)."""
        rbatch = self._resolve_batch(state.params, batch)
        dstate = self._prepare(state.deformer_cano, rbatch)
        field_params = state.params["field"] \
            if isinstance(state.params, dict) else state.params
        return initialize_grid(
            self.deformer.bbox_deformed(dstate),
            self._density_fn(field_params, state.center, state.scale,
                             state.deformer_cano, dstate),
            jax.random.PRNGKey(0), self.grid_size)

    def _frame_grid(self, state: TrainState, batch):
        if self.smpl_init:
            return jax.tree.map(lambda x: x[batch["idx"]], state.grid)
        return state.grid

    @functools.partial(jax.jit, static_argnums=0)
    def eval_rays(self, state: TrainState, batch,
                  grid: DensityGridState | None = None):
        """No-grad render of a ray bundle (white/bg background)."""
        rbatch = self._resolve_batch(state.params, batch)
        field_params = state.params["field"] \
            if isinstance(state.params, dict) else state.params
        return self.render(field_params, state.center, state.scale, rbatch,
                           cano=state.deformer_cano, grid=grid,
                           key=None, noise_std=0.0, eval_mode=True,
                           bg_color=rbatch.get("bg_color"))

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _ray_hit_prepass(self, state: TrainState, batch, grid,
                         dstate=None, coarse_steps: int = 64):
        """Cheap per-ray occupancy test (no field evals): does any coarse
        sample along the ray land in an occupied cell of the test grid?
        Used by render_frame to prune background rays — the static-shape
        analog of the reference's alive-ray compaction. ~64 grid lookups
        per ray ≈ 0.1 ms per 292k rays vs ~1 s to fully march them."""
        rbatch = self._resolve_batch(state.params, batch)
        if dstate is None:
            dstate = self._prepare(state.deformer_cano, rbatch)
        rays = Rays(o=rbatch["rays_o"], d=rbatch["rays_d"],
                    near=rbatch["near"], far=rbatch["far"])
        rays_s = self.deformer.transform_rays_w2s(dstate, rays)
        aabb = grid.aabb
        from ..render.raymarcher import ray_aabb, sample_z
        near, far = ray_aabb(rays_s.o, rays_s.d, aabb[0], aabb[1])
        near = jnp.clip(near, rays_s.near, rays_s.far)
        far = jnp.clip(far, near, rays_s.far)
        z, _ = sample_z(near, far, coarse_steps, None)
        pts = rays_s.o[:, None] + z[..., None] * rays_s.d[:, None]
        occ = occupancy_lookup(grid, pts.reshape(-1, 3)).reshape(z.shape)
        return (occ & (z < far[..., None])).any(axis=-1)

    @functools.partial(jax.jit, static_argnums=0)
    def _prepare_jit(self, state: TrainState, batch):
        """Once-per-frame deformer bake (hoisted out of the per-chunk
        jits — the SNARF prepare einsum reads the full 50 MB LBS voxel
        and must not re-run per chunk, PERF.md)."""
        rbatch = self._resolve_batch(state.params, batch)
        return self._prepare(state.deformer_cano, rbatch)

    @functools.partial(jax.jit, static_argnums=0)
    def _bake_warp_cache(self, state: TrainState, dstate, centers):
        """Jitted per-frame inverse-warp bake over (padded) occupied-cell
        centers."""
        return self.deformer.bake_warp_cache(state.deformer_cano, dstate,
                                             centers)

    @functools.partial(jax.jit, static_argnums=0)
    def _render_chunks_cached(self, state: TrainState, chunked, grid,
                              cache_xc, cache_valid, dstate):
        """Single-dispatch chunked render through the inverse-warp cache
        (per-sample cost: 1 cell lookup + warp_refine_iters trilerp rows
        instead of a full Broyden search)."""
        field_params = state.params["field"] \
            if isinstance(state.params, dict) else state.params
        field_fn = self.deformer.make_cached_field_fn(
            state.deformer_cano, dstate, cache_xc, cache_valid, grid.aabb,
            self._net_apply(field_params, state.center, state.scale),
            self.grid_size, self.warp_refine_iters)

        def one(rays):
            from ..render.raymarcher import render_rays
            rays_s = self.deformer.transform_rays_w2s(
                dstate, Rays(o=rays["rays_o"], d=rays["rays_d"],
                             near=rays["near"], far=rays["far"]))
            out = render_rays(
                field_fn, rays_s,
                occupancy_fn=lambda pts: occupancy_lookup(grid, pts),
                aabb=grid.aabb, n_steps=self.n_steps, k_cap=self.k_cap,
                key=None, noise_std=0.0, bg_color=rays.get("bg_color"))
            return {"rgb": out.rgb, "depth": out.depth, "alpha": out.alpha,
                    "counter": out.counter}

        return jax.lax.map(one, chunked["rays"])

    @functools.partial(jax.jit, static_argnums=0)
    def _render_chunks(self, state: TrainState, chunked, grid, dstate):
        """Render (n_chunks, chunk, ...) ray bundles in ONE dispatch —
        a lax.map over chunks inside jit. Per-dispatch latency through
        remote TPU links is ~tens of ms (PERF.md), so the per-frame loop
        must not dispatch per chunk."""
        rbatch = self._resolve_batch(state.params, chunked["frame"])
        field_params = state.params["field"] \
            if isinstance(state.params, dict) else state.params

        def one(rays):
            sub = dict(rbatch)
            sub.update(rays)
            out = self.render(field_params, state.center, state.scale, sub,
                              cano=state.deformer_cano, dstate=dstate,
                              grid=grid, key=None, noise_std=0.0,
                              eval_mode=True, bg_color=rays.get("bg_color"))
            out.pop("weights", None)
            return out

        return jax.lax.map(one, chunked["rays"])

    def render_frame(self, state: TrainState, batch,
                     chunk: int = 32768,
                     prune_rays: bool = True,
                     grid: DensityGridState | None = None,
                     image_shape: tuple[int, int] | None = None
                     ) -> dict[str, jax.Array]:
        """Full-frame inference: build the test grid once, prune rays that
        cannot hit the body (host-side dynamic selection — free outside
        jit), then render the surviving rays in fixed-size chunks
        (render_image_fast analog, DNeRF.py:72-97)."""
        import numpy as np
        if grid is None:
            grid = self.build_test_grid(state, batch)
        n = batch["rays_o"].shape[0]

        per_ray = ("rays_o", "rays_d", "near", "far", "rgb", "alpha",
                   "bg_color")
        # once-per-frame deformer bake, shared by prepass/bake/chunks
        dstate = self._prepare_jit(
            state, {k: jnp.asarray(v) if hasattr(v, "shape") else v
                    for k, v in batch.items() if k not in per_ray})

        if prune_rays:
            hit = np.asarray(self._ray_hit_prepass(state, batch, grid,
                                                   dstate))
            sel = np.nonzero(hit)[0]
        else:
            sel = np.arange(n)

        bg = batch.get("bg_color")
        out_full = {
            "rgb": (np.asarray(bg, np.float32).reshape(n, 3).copy()
                    if bg is not None else np.ones((n, 3), np.float32)),
            "depth": np.zeros((n,), np.float32),
            "alpha": np.zeros((n,), np.float32),
            "counter": np.zeros((n,), np.int32),
        }
        if len(sel) == 0:
            return out_full

        sel_batch = dict(batch)
        for k in per_ray:
            if k in sel_batch and hasattr(sel_batch[k], "shape") \
                    and sel_batch[k].shape[:1] == (n,):
                sel_batch[k] = np.asarray(sel_batch[k])[sel]

        m = len(sel)
        # pad the surviving-ray count to a whole number of chunks, rounded
        # up to a power of two of chunks to bound jit retraces across frames
        n_chunks = max(1, -(-m // chunk))
        n_chunks = 1 << (n_chunks - 1).bit_length()
        total = n_chunks * chunk
        rays = {}
        for k in per_ray:
            v = sel_batch.get(k)
            if v is not None and hasattr(v, "shape") and v.shape[:1] == (m,):
                v = np.asarray(v)
                v = np.concatenate(
                    [v, np.repeat(v[-1:], total - m, axis=0)]) \
                    if total > m else v[:total]
                rays[k] = jnp.asarray(
                    v.reshape(n_chunks, chunk, *v.shape[1:]))
        frame = {k: jnp.asarray(v) if hasattr(v, "shape") else v
                 for k, v in batch.items() if k not in per_ray}
        use_cache = (self.use_warp_cache
                     and hasattr(self.deformer, "bake_warp_cache"))
        if use_cache:
            G = self.grid_size
            occ_flat = np.asarray(grid.occupancy).reshape(-1)
            occ_idx = np.nonzero(occ_flat)[0]
            if len(occ_idx) == 0:
                occ_idx = np.array([0])
            budget = 1 << (len(occ_idx) - 1).bit_length()
            pad_idx = np.concatenate(
                [occ_idx, np.repeat(occ_idx[:1], budget - len(occ_idx))])
            i0 = pad_idx // (G * G)
            i1 = (pad_idx // G) % G
            i2 = pad_idx % G
            aabb = np.asarray(grid.aabb)
            span = aabb[1] - aabb[0]
            centers = np.stack([
                aabb[0][0] + (i0 + 0.5) / G * span[0],
                aabb[0][1] + (i1 + 0.5) / G * span[1],
                aabb[0][2] + (i2 + 0.5) / G * span[2]], axis=-1)
            xc_c, valid_c = self._bake_warp_cache(
                state, dstate, jnp.asarray(centers, jnp.float32))
            K = xc_c.shape[1]
            cache_xc = jnp.zeros((G ** 3, K, 3)).at[pad_idx].set(xc_c)
            cache_valid = jnp.zeros((G ** 3, K), bool).at[pad_idx] \
                .set(valid_c)
            out = self._render_chunks_cached(
                state, {"frame": frame, "rays": rays}, grid,
                cache_xc, cache_valid, dstate)
        else:
            out = self._render_chunks(state, {"frame": frame,
                                              "rays": rays}, grid, dstate)
        merged = {k: np.asarray(v).reshape(total, *v.shape[2:])[:m]
                  for k, v in out.items()}
        for k in out_full:
            out_full[k][sel] = merged[k]
        return out_full
