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
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..body import SMPLModel
from ..deformers.smpl_deformer import SMPLDeformer
from ..losses.nerf_loss import nerf_loss, ngp_loss
from ..models.ngp import NGPField, bbox_center_scale
from ..render.density_grid import (DensityGridState, initialize_grid,
                                   make_grid_state, occupancy_lookup,
                                   occupancy_regularizer, update_grid)
from ..render.raymarcher import Rays, render_rays
from .smpl_params import SMPLParams, lookup_frame

__all__ = ["AvatarModel", "RenderSession", "TrainState", "WORLD_AABB"]

# the reference's hard-coded SMPL-space scene box (raymarcher_acc.py:61-62)
WORLD_AABB = ((-1.25, -1.55, -1.25), (1.25, 0.95, 1.25))

# Registry of (n_rays, prepass_shape, samp_budget, has_reuse) tuples whose
# fused-render program crashes the libtpu backend compiler (regalloc
# RET_CHECK, live_range_finder.cc:29 — reproduced at e.g. n=291600,
# samp_budget=393216 on v5e, independent of graph content; see
# _call_fused_size_hopped). Budget sizes only pad, so hopping to the next
# chunk multiple is semantically free; remembering bad sizes avoids paying
# a ~90 s failed compile per size — persisted across processes (each
# rediscovery costs a full failed compile) in the user cache, loaded
# lazily, best-effort on IO errors.
_BAD_FUSED_SIZES: set[tuple] = set()

# models that have dispatched at least one jitted method — later config
# mutation warns (pjit's static-arg identity fast path keeps the stale
# program; see AvatarModel docstring)
import weakref  # noqa: E402

_LOCKED_MODELS: "weakref.WeakSet[AvatarModel]" = weakref.WeakSet()
_BAD_SIZES_LOADED = False


def _bad_sizes_path():
    import os
    from pathlib import Path
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.expanduser("~/.cache"))
    return Path(root) / "instantavatar_tpu" / "bad_fused_sizes.json"


def _load_bad_sizes() -> None:
    global _BAD_SIZES_LOADED
    if _BAD_SIZES_LOADED:
        return
    _BAD_SIZES_LOADED = True
    import json
    try:
        for row in json.loads(_bad_sizes_path().read_text()):
            n, pre, samp, has_reuse = row
            _BAD_FUSED_SIZES.add(
                (n, tuple(pre) if pre is not None else None, samp,
                 bool(has_reuse)))
    except Exception:  # noqa: BLE001 — cache miss/corruption is fine
        pass


def _save_bad_sizes() -> None:
    import json
    try:
        path = _bad_sizes_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(
            [[n, list(pre) if pre is not None else None, samp, has_reuse]
             for n, pre, samp, has_reuse in _BAD_FUSED_SIZES]))
    except Exception:  # noqa: BLE001
        pass


def _is_backend_compiler_crash(e: Exception) -> bool:
    """True only for the known libtpu backend-compiler crash signature
    (regalloc RET_CHECK, live_range_finder.cc:29 — see
    _call_fused_size_hopped). RET_CHECK failures are internal XLA
    compile-time invariant violations; they never appear in ordinary
    runtime errors. Deliberately narrow: an unrelated INTERNAL runtime
    error must surface immediately instead of silently burning up to 16
    size hops at ~90 s of failed compile each."""
    return "RET_CHECK" in str(e)


class RenderSession:
    """Explicit cross-frame budget-learning state for frame rendering.

    The fused frame render sizes two static capacities — the flat-stream
    sample budget and the bake's occupied-cell budget — from the previous
    frame's measured counts (+15%/+20%, 4096-granular; PERF.md "budgets
    track observed counts"). Those learned hints used to live as hidden
    instance attributes on ``AvatarModel``, which made the otherwise
    static composition descriptor stateful and thrashed budgets (and
    recompiles) when one model alternated resolutions or served two
    states. They now live here, keyed by ``(n_rays, prepass_shape)`` so
    each resolution learns independently, and callers that render frame
    sequences pass one session through (``render_frames`` creates one per
    sequence automatically)."""

    def __init__(self) -> None:
        self.samp_budget: dict = {}
        self.cell_budget: dict = {}
        # single-slot frame-asset memos: the warp cache / sigma table and
        # the auto test grid depend only on (params, betas, body_pose[,
        # frame idx when SMPL params are optimized]) — global orientation
        # and translation CANCEL in the world->SMPL transform (tfs_j =
        # inv(rel_0) rel_j), so a turntable re-bakes identical tables
        # every frame. The fused render reuses them via a lax.cond branch
        # when the host-computed key matches the previous frame.
        self.last_bake: tuple | None = None   # (key, (cache, sig_table))
        self.last_grid: tuple | None = None   # (key, DensityGridState)


class TrainState(NamedTuple):
    params: Any            # {"field": NGPParams..., "smpl": SMPLParams|()}
    opt_state: Any
    grid: DensityGridState
    deformer_cano: Any     # per-subject deformer bake (SNARF LBS voxel, ...)
    center: jax.Array      # (3,) field input normalization
    scale: jax.Array       # (3,)
    step: jax.Array        # () int32


class AvatarModel:
    """Static composition descriptor; all step methods are pure.

    The model rides every jitted method as a STATIC argument, and jax's
    pjit cache hits on static-arg IDENTITY before ever consulting
    hash/eq — so `setattr(avatar, "term_T", ...)` after a method has
    been traced silently reuses the program compiled with the OLD value
    (measured r5: an alpha_skip/term_T ablation returned bit-identical
    images across arms; config-aware __hash__/__eq__ did NOT help, the
    identity fast path bypasses them). The only safe pattern is a fresh
    model per configuration. To make the trap loud, the config locks at
    the first host dispatch and later mutation of a primitive attribute
    warns (host-only knobs listed in _HOST_ATTRS stay silent)."""

    # attrs read only on the host side (never traced) — safe to mutate
    _HOST_ATTRS = frozenset({"eval_grid"})

    def _lock_config(self):
        # membership set, not an instance attr: the model is a pure
        # static descriptor and tests pin vars(model) invariant
        _LOCKED_MODELS.add(self)

    def __setattr__(self, name, value):
        if (self in _LOCKED_MODELS
                and name not in self._HOST_ATTRS
                and isinstance(value, (int, float, str, bool, type(None)))
                and getattr(self, name, object()) != value):
            import warnings
            warnings.warn(
                f"mutating AvatarModel.{name} after jit dispatch: "
                f"already-traced methods keep the program compiled with "
                f"the OLD value (pjit's static-arg identity fast path) — "
                f"build a fresh AvatarModel per configuration",
                RuntimeWarning, stacklevel=2)
        object.__setattr__(self, name, value)

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
                 eval_grid: str = "density",
                 shell_margin: float = 0.12,
                 use_warp_cache: bool = True,
                 train_warp_cache: bool = True,
                 cache_n_cand: int = 1,
                 cache_fused_probe: bool = False,
                 eval_sampling: str = "flat",
                 shared_corner_eval: bool = False,
                 flat_tile_rows: bool = False,
                 n_windows: int = 48,
                 term_T: float | None = 1e-5,
                 alpha_skip: float | None = None,
                 samples_per_ray: float = 3.0,
                 eval_n_steps: int | None = None,
                 cell_budget: int | None = None,
                 prepass_steps: int = 96,
                 prepass_block: int | None = None,
                 prepass_dilate: int = 1,
                 prepass_margin_steps: float = 1.5,
                 loss_weights: dict[str, float] | None = None,
                 lpips_fn=None,
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
        # per-frame EVAL grid source: "density" = 5-pass jittered density
        # sweep (reference test-grid semantics, density_grid.py:94-110);
        # "smpl_shell" = posed-vertex shell (reference smpl_init,
        # density_grid.py:53-75) — ~100x cheaper per NEW pose, the
        # animation-path default candidate (gate: diag_trained_render).
        # shell_margin: shell thickness in meters around the posed verts
        # (must cover the learned surface's offset from the SMPL mesh).
        # Gate sweep on the trained 540px capsule scene (r5,
        # artifacts/r5_shell_gate.jsonl): 2 cm -> 9.2 dB in-mask
        # (learned radii reach ~8 cm), 8 cm -> 26.42 (-0.66 vs density),
        # 12 cm -> 26.96 (-0.12 dB) at 208 ms/frame pose-varying vs the
        # density sweep's 968 ms — the 4.7x animate-path win.
        self.eval_grid = eval_grid
        self.shell_margin = shell_margin
        # eval acceleration: per-frame packed inverse-warp bake on occupied
        # cells (SNARF only; PERF.md). Exactness is restored per sample by
        # one cached-Newton step (J_inv rides in the cache row).
        self.use_warp_cache = use_warp_cache
        # cached-search TRAINING (SNARF only): bake the per-cell warp
        # cache inside the jitted step and train the field through
        # cached-Newton correspondences — the per-sample inverse search
        # (N*k_cap samples x A lanes x n_iters row gathers, the step's
        # largest gather cost) collapses to cell_budget cells + ONE row
        # gather per sample. Pose gradients still flow via _grad_correct
        # at the cached correspondence; grid updates keep the exact
        # full-search density query. Default ON since the on-device
        # quality gate passed (tools/warp_cache_gate.py, v5e 264px
        # 20 epochs: cached 34.71 dB vs full 34.53, step -39% —
        # artifacts/r5_warp_gate.jsonl); train_warp_cache=False restores
        # the per-sample full search (non-SNARF deformers ignore this).
        self.train_warp_cache = train_warp_cache
        # candidates the packed render evaluates per sample (1 = cell-level
        # max-baked-sigma select; cand_cap = per-sample argmax parity)
        self.cache_n_cand = cache_n_cand
        # fused single-gather probe vs split byte-occupancy + row gather at
        # compacted samples (same semantics; measured choice)
        self.cache_fused_probe = cache_fused_probe
        # eval sample selection: "flat" compacts kept (ray, window) pairs
        # across the WHOLE frame into one padding-free sample stream
        # (segmented composite, composite_stream); "windows" keeps per-ray
        # window padding; "dense" keeps the per-chunk dense march +
        # compaction
        self.eval_sampling = eval_sampling
        # flat-mode field eval shares each block sample's feature-lattice
        # corner gathers across the p^2 pixel offsets (their canonical
        # points spread millimetres); offsets just outside the shared
        # cell linearly extrapolate. Needs field.apply_shared; gated by
        # test_shared_corner_render parity + the quality bench.
        # MEASURED NEGATIVE on v5e (bench.py A/B, 2026-08-19): despite
        # 9x fewer gather rows the turntable reads 1.59M rays/s with it
        # vs 1.96M without — the per-offset trilerp/extrapolation math
        # and tile layouts cost more than the recovered gather time
        # (same shape of result as the Pallas fused head, PERF.md).
        # Default OFF; the path stays for narrower-HBM parts.
        self.shared_corner_eval = shared_corner_eval
        # flat eval's Newton step over the p^2 pixel offsets: False (the
        # default) feeds the (M,)-shaped rows/centers straight into the
        # offset einsum (packed_cache field_fn pts_all); True restores
        # the r4 path that materialized (pp*S, K*13) row tiles (~76 MB,
        # ~8 ms/frame at 540px, xplane r4) — kept for A/B only.
        self.flat_tile_rows = flat_tile_rows
        self.n_windows = n_windows
        # transmittance-terminated window selection (flat/windows modes):
        # drop prepass samples whose estimated transmittance — from the
        # per-cell max BAKED sigma, cumulated at the prepass stride — has
        # fallen below term_T. The reference's composite_test CUDA kernel
        # early-outs rays at T <= 1e-4 (raymarcher.cu:200-235); the
        # static-shape analog prunes the sample STREAM instead. One decade
        # of margin (1e-5 vs 1e-4) absorbs the cell-granular sigma
        # over-estimate. None disables.
        self.term_T = term_T
        # selection-time analog of the reference composite_test's
        # per-sample skip of alpha < 0.01 contributions
        # (raymarcher.cu:222-227): drop prepass strides whose BAKED cell
        # sigma yields alpha below this at the prepass step. On the
        # opaque bench workload this is a no-op; on a real TRAINED
        # avatar the occupancy grid keeps low-density fringe cells
        # (threshold = clamp(mean, 0.01), density_grid.py:88) whose
        # strides otherwise flood the flat stream — the r5 budget table
        # measured 12k rays/s on the trained 540px capsule vs 1.85M on
        # the toy before this cut. None disables.
        self.alpha_skip = alpha_skip
        # "flat" sample budget: average kept samples per ray the static
        # stream is sized for (overflow transparently re-renders)
        self.samples_per_ray = samples_per_ray
        # dense eval samples per ray across the TIGHT prepass span (the
        # training path keeps n_steps across the full near/far span)
        self.eval_n_steps = eval_n_steps or min(n_steps, 64)
        # static occupied-cell capacity for the on-device bake compaction
        self.cell_budget = cell_budget or max(grid_size ** 3 // 8, 1024)
        # coarse prepass: few strides against an extra-dilated occupancy
        # (prepass_dilate 3^3 max-pools guarantee grazing rays cannot step
        # over the occupied shell at this stride — see _coarse_occupancy)
        self.prepass_steps = prepass_steps
        # pixel-block edge p for the subsampled prepass / flat selection
        # (None -> auto from (3, 2) by divisibility). Larger p shrinks
        # the prepass+selection machinery ~p^2/9-fold while the p^2
        # pixels of a block share windows/cache rows; the canonical
        # offset spread grows with p (quality-gate any change).
        self.prepass_block = prepass_block
        self.prepass_dilate = prepass_dilate
        # z-span margin in coarse-step units (large => spans degenerate to
        # the full [near, far], useful to isolate cache-vs-search effects)
        self.prepass_margin_steps = prepass_margin_steps
        # refine mode disables sigma noise (DNeRF.py:65)
        self.noise_steps = noise_steps if (use_noise and not is_refine) else 0
        self.optimize_smpl = optimize_smpl
        self.is_refine = is_refine
        self.loss_weights = dict(w_rgb=1.0, w_alpha=0.1, w_reg=0.1)
        if loss_weights:
            known = {"w_rgb", "w_alpha", "w_reg", "w_lpips", "w_depth_reg"}
            unknown = set(loss_weights) - known
            if unknown:  # never silently drop loss terms a config requests
                raise ValueError(
                    f"unknown loss weight(s) {sorted(unknown)}; "
                    f"supported: {sorted(known)}")
            self.loss_weights.update(loss_weights)
        # patch losses (NGPLoss parity, utils/loss.py:27-39): active when
        # the config requests them; LPIPS needs an injected perceptual net
        self._use_ngp_loss = (self.loss_weights.get("w_lpips", 0) > 0
                              or self.loss_weights.get("w_depth_reg", 0) > 0)
        self.lpips_fn = lpips_fn
        if self.loss_weights.get("w_lpips", 0) > 0 and lpips_fn is None:
            raise ValueError("w_lpips > 0 requires an lpips_fn "
                             "(losses.lpips.load_lpips)")
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

    def _net_apply_shared(self, params, center, scale):
        """Shared-corner multi-variant field closure (or None if the
        field doesn't support it): (x_ref (N,3), x (Q,N,3)) ->
        (rgb (Q,N,3), sigma (Q,N)) with the feature-lattice corner
        gathers shared across the Q variants (see
        VoxelTriplaneField.encode_shared)."""
        if not hasattr(self.field, "apply_shared"):
            return None
        return lambda x_ref, x: self.field.apply_shared(
            params, x_ref, x, center, scale)

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
        net = self._net_apply(params, center, scale)
        if (not eval_mode and self.train_warp_cache and grid is not None
                and hasattr(self.deformer, "bake_packed_cache")
                and hasattr(self.deformer, "_grad_correct")):
            field_fn = self._make_train_cache_field_fn(net, cano, dstate,
                                                       grid)
        else:
            field_fn = self.deformer.make_frame_field_fn(
                cano, dstate, net, eval_mode=eval_mode)
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

    def _make_train_cache_field_fn(self, net, cano, dstate, grid):
        """Cached-search training field closure (opt-in train_warp_cache).

        Bakes the same per-cell packed warp cache the eval renderer uses
        (one full inverse search per OCCUPIED CELL instead of per sample),
        then resolves each marcher sample with one row gather + a
        cached-Newton step, and applies the differentiable-pose correction
        (_grad_correct) at that correspondence. Implicit differentiation
        holds at an approximate root, so gradient structure matches the
        full-search path up to the O(delta^2) in-cell warp error the eval
        parity test bounds. The reference re-searches every sample every
        step (deformer_torch.py:96-128) — this trade exists because on
        TPU the search is gather-bound and cells are ~30x fewer than
        samples."""
        G = self.grid_size
        aabb = grid.aabb
        occ_flat = grid.occupancy.reshape(-1)
        (cell_idx,) = jnp.nonzero(occ_flat, size=self.cell_budget,
                                  fill_value=G ** 3)
        cmask = cell_idx < G ** 3
        csafe = jnp.where(cmask, cell_idx, 0)
        span = aabb[1] - aabb[0]
        ijk = jnp.stack([csafe // (G * G), (csafe // G) % G, csafe % G],
                        axis=-1).astype(jnp.float32)
        centers = aabb[0] + (ijk + 0.5) / G * span
        rows = self.deformer.bake_packed_cache(
            cano, dstate, centers, net_sigma_fn=lambda x: net(x)[1],
            cell_mask=cmask)
        cache = jnp.zeros((G ** 3, rows.shape[-1]), rows.dtype) \
            .at[cell_idx].set(rows, mode="drop")
        R = self.deformer.ROW_FLOATS
        K = rows.shape[-1] // R
        aabb0 = aabb[0]

        def field_fn(pts):
            M = pts.shape[0]
            rel = (pts - aabb0) / span
            inside = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
            cell = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
            flat = (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2]
            r = jnp.take(cache, flat, axis=0).reshape(M, K, R)
            ctr = aabb0 + (cell.astype(jnp.float32) + 0.5) / G * span
            Ji = r[..., 3:12].reshape(M, K, 3, 3)
            xc = r[..., 0:3] + jnp.einsum("mkrc,mc->mkr", Ji, pts - ctr)
            val = (r[..., 12] > 0.5) & inside[:, None]
            xc = self.deformer._grad_correct(cano, dstate, pts, xc, val,
                                             Ji)
            rgb, sigma = net(xc.reshape(M * K, 3))
            rgb = rgb.reshape(M, K, 3)
            sigma = sigma.reshape(M, K)
            finite = jnp.isfinite(sigma) & jnp.isfinite(rgb).all(-1)
            ok = val & finite
            sigma = jnp.where(ok, sigma, -1e5)
            if K == 1:
                sigma_out, rgb_out, any_ok = sigma[:, 0], rgb[:, 0], ok[:, 0]
            else:
                best = jnp.argmax(sigma, axis=-1)
                sigma_out = jnp.take_along_axis(sigma, best[:, None],
                                                axis=1)[:, 0]
                rgb_out = jnp.take_along_axis(
                    rgb, best[:, None, None].repeat(3, -1), axis=1)[:, 0]
                any_ok = ok.any(axis=-1)
            rgb_out = jnp.where(any_ok[:, None], rgb_out, 0.0)
            return rgb_out, sigma_out, any_ok

        return field_fn

    def _density_fn(self, params, center, scale, cano, dstate,
                    eval_mode: bool = False):
        """Grid-update query: full deform + field sigma on SMPL-space pts
        (the reference queries deformer(coords, net) the same way,
        density_grid.py:48-50). Uses the deformer's field closure so it
        works for both SMPL-NN and SNARF deformers.

        eval_mode=False during training updates (the reference runs the
        deformer under enable_grad, density_grid.py:48-49, so the occupancy
        regularizer's gradient reaches optimizable SMPL params); True for
        the no-grad test-grid build."""
        field_fn = self.deformer.make_frame_field_fn(
            cano, dstate, self._net_apply(params, center, scale),
            eval_mode=eval_mode)

        def fn(pts):
            _, sigma, valid = field_fn(pts)
            return jnp.where(valid, sigma, 0.0)
        return fn

    def grads_and_losses(self, state: TrainState, batch, key,
                         with_grid_update: bool = False, grid_key=None):
        """Gradient computation only — the building block shared by the
        single-chip steps below and the shard_map data-parallel step in
        parallel/ (which pmeans the returned grads across ray shards).

        grid_key: optional PRNG for the occupancy-grid jitter. Ray-DP
        shards fold their shard index into ``key`` to decorrelate render
        sampling but must pass the UN-folded key here so every chip
        computes a bit-identical grid update."""
        return self._grads_impl(state, batch, key, with_grid_update,
                                grid_key)

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
                    with_grid_update: bool, grid_key=None):
        noise_std = jnp.where(state.step < self.noise_steps, 1.0, 0.0) \
            if self.noise_steps > 0 else 0.0
        k_render, k_grid = jax.random.split(key)
        if grid_key is not None:
            k_grid = jax.random.split(grid_key)[1]

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
            if self._use_ngp_loss:
                total, losses = ngp_loss(predicts, rbatch,
                                         lpips_fn=self.lpips_fn,
                                         **self.loss_weights)
            else:
                total, losses = nerf_loss(predicts, rbatch,
                                          **self.loss_weights)
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
        self._lock_config()  # runs at trace time (host)
        return self._step_impl(state, batch, key, with_grid_update=False)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step_update(self, state: TrainState, batch, key):
        """Train step + occupancy-grid update + occupancy regularizer
        (host calls this every ``grid_update_interval`` steps)."""
        self._lock_config()  # runs at trace time (host)
        return self._step_impl(state, batch, key, with_grid_update=True)

    def step(self, state: TrainState, batch, key, step: int | None = None):
        """Host-side dispatcher matching the reference cadence.

        Pass ``step`` (a host-tracked counter) to avoid the device->host
        sync of reading ``state.step`` every iteration — through the
        remote-TPU tunnel that read costs ~33 ms/step (PERF.md)."""
        if step is None:
            step = int(state.step)
        if step % self.grid_update_interval == 0:
            return self.train_step_update(state, batch, key)
        return self.train_step(state, batch, key)

    @functools.partial(jax.jit, static_argnums=0)
    def train_multi_step(self, state: TrainState, batches, keys):
        """K train steps in ONE dispatch: ``lax.scan`` over batches whose
        leaves carry a leading K axis.

        Through the remote-TPU tunnel each jit dispatch costs ~50-100 ms
        on top of the ~200 ms device step (measured r4: 0.30 s/step wall
        with per-step dispatch); scanning K steps amortizes that K-fold.
        The grid-update cadence keeps the reference semantics
        (DNeRF.py:99-110, every ``grid_update_interval`` steps) via a
        ``lax.cond`` on the DEVICE step counter — both branches compile
        into the one program, exactly one executes per iteration.

        Returns (state, losses of the LAST step) — matching what a
        per-step logging cadence actually reads."""
        def body(st, inp):
            batch, key = inp
            st2, losses = jax.lax.cond(
                (st.step % self.grid_update_interval) == 0,
                lambda args: self._step_impl(*args,
                                             with_grid_update=True),
                lambda args: self._step_impl(*args,
                                             with_grid_update=False),
                (st, batch, key))
            return st2, losses

        state, losses = jax.lax.scan(body, state, (batches, keys))
        return state, jax.tree.map(lambda x: x[-1], losses)

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
                             state.deformer_cano, dstate, eval_mode=True),
            jax.random.PRNGKey(0), self.grid_size)

    @functools.partial(jax.jit, static_argnums=0)
    def build_pose_grid(self, state: TrainState, batch
                        ) -> DensityGridState:
        """Per-pose test grid from the POSED BODY SHELL instead of a
        density sweep: cells within max(shell_margin, half a cell
        diagonal) of a posed vertex (the reference's smpl_init
        semantics, density_grid.py:53-75). The density sweep runs the full SNARF
        search over 5 x G^3 jittered points (~0.8 s/pose at the
        production config, the dominant cost of the pose-varying render
        path measured r5); this is one KNN against the ~1k toy / 6.9k
        SMPL vertices — milliseconds on the MXU. Conservative for bodies
        whose learned surface hugs the SMPL mesh (shell thickness covers
        the offsets the deformer itself can express); gate any default
        flip with tools/diag_trained_render.py's shell-vs-density rows."""
        from ..ops.knn import knn_points
        rbatch = self._resolve_batch(state.params, batch)
        dstate = self._prepare(state.deformer_cano, rbatch)
        aabb = self.deformer.bbox_deformed(dstate)
        G = self.grid_size
        idxs = (jnp.arange(G) + 0.5) / G
        zz, yy, xx = jnp.meshgrid(idxs, idxs, idxs, indexing="ij")
        cells = (jnp.stack([zz, yy, xx], -1).reshape(-1, 3)
                 * (aabb[1] - aabb[0]) + aabb[0])
        d2, _ = knn_points(cells, dstate.verts_smpl, k=1, chunk=32768)
        thr = jnp.maximum(self.shell_margin,
                          0.5 * jnp.linalg.norm((aabb[1] - aabb[0]) / G))
        occ = (d2[:, 0] < thr ** 2).reshape(G, G, G)
        return DensityGridState(
            density_cached=jnp.where(occ, 100.0 * 4.6, 0.0),
            occupancy=occ, aabb=aabb)

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

    def _coarse_occupancy(self, grid: DensityGridState) -> jax.Array:
        """Extra-dilated occupancy for the coarse ray prepass: the prepass
        strides ~``span/prepass_steps`` per sample, so the occupied shell
        must be thicker than one stride or grazing rays slip between
        samples. Each extra 3^3 max-pool adds one cell (~span/G) of
        margin per side."""
        from ..render.density_grid import max_pool3d
        occ = grid.occupancy
        for _ in range(self.prepass_dilate):
            occ = max_pool3d(occ.astype(jnp.uint8)) > 0
        return occ

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 11))
    def _render_frame_fused(self, state: TrainState, batch, grid,
                            ray_budget: int, chunk: int,
                            cell_budget: int | None = None,
                            prepass_shape: tuple[int, int, int]
                            | None = None,
                            samp_budget: int | None = None,
                            prev_bake=None, reuse=None,
                            payload: str = "f16"):
        """ONE-dispatch full-frame render. Per-host-readback latency
        through the remote-TPU tunnel is ~33 ms while chained async
        dispatches cost ~2 ms (PERF.md), so the whole frame — deformer
        bake, coarse ray prepass, packed warp-cache bake, chunked march,
        full-image scatter — compiles into a single launch whose only
        sync is the final image fetch (which pipelined callers overlap
        with the next frame's compute).

        Stages (all static shapes):
          1. frame bake (prepare) + world->SMPL ray transform;
          2. coarse occupancy prepass (``prepass_steps`` strides against
             the extra-dilated grid) -> per-ray (hit, z_lo, z_hi): the
             static-shape analog of the reference's alive-ray compaction
             + per-ray ``nears`` advance (raymarcher_acc.py:108-127,
             raymarcher.cu:13-73);
          3. hit rays compact ON-DEVICE into a static ``ray_budget``
             (jnp.nonzero(size=...)); overflow is reported via ``n_hit``;
          4. packed inverse-warp cache bake on occupied cells (SNARF);
          5. lax.map over ``ray_budget/chunk`` chunks: dense samples over
             the TIGHT [z_lo, z_hi] span, fused occupancy+candidate
             gather, cumsum compaction to k_cap, cached-Newton refine +
             field eval, masked composite;
          6. scatter results into full-frame buffers (background fill
             elsewhere).

        Returns one packed (n+1, 6) float16 buffer (see _unpack_frame):
        rgb/depth/alpha/counter rows plus digit-encoded n_hit/n_occ, so
        the host retrieves the whole frame — including the overflow
        counters — in a single tunnel transfer.
        """
        cell_budget = cell_budget or self.cell_budget
        rbatch = self._resolve_batch(state.params, batch)
        dstate = self._prepare(state.deformer_cano, rbatch)
        have_rays = "rays_o" in rbatch
        if have_rays:
            rays = Rays(o=rbatch["rays_o"], d=rbatch["rays_d"],
                        near=rbatch["near"], far=rbatch["far"])
            rays_s = self.deformer.transform_rays_w2s(dstate, rays)
            n = rays_s.o.shape[0]
        else:
            # basis-only batch (flat mode): the host shipped the (4, 3)
            # pinhole generator basis + scalar near/far instead of the
            # full-resolution ray tensors (~13 MB/frame through the
            # remote-TPU tunnel); the block-lattice prepass rays are
            # reconstructed in-jit below and per-pixel dirs come from
            # the basis in stage 5' as before.
            if prepass_shape is None:
                raise ValueError("basis-only batches need image_shape")
            rays_s = None
            n = prepass_shape[0] * prepass_shape[1]
        aabb = grid.aabb
        from ..render.raymarcher import (ray_aabb, render_rays,
                                         render_rays_probed, sample_z)

        field_params = state.params["field"] \
            if isinstance(state.params, dict) else state.params
        net = self._net_apply(field_params, state.center, state.scale)
        use_cache = (self.use_warp_cache
                     and hasattr(self.deformer, "bake_packed_cache"))
        want_term = (self.term_T is not None
                     and self.eval_sampling in ("flat", "windows"))
        n_occ = jnp.int32(0)
        bake_out = None
        net_shared = (self._net_apply_shared(field_params, state.center,
                                             state.scale)
                      if self.shared_corner_eval else None)
        if use_cache:
            # -- 4. packed warp-cache bake (BEFORE the prepass: its
            # validity table drives window selection below) --------------
            G = self.grid_size
            occ_flat = grid.occupancy.reshape(-1)
            n_occ = occ_flat.sum()
            (cell_idx,) = jnp.nonzero(occ_flat, size=cell_budget,
                                      fill_value=G ** 3)
            cmask = cell_idx < G ** 3
            csafe = jnp.where(cmask, cell_idx, 0)
            span = aabb[1] - aabb[0]
            ijk = jnp.stack([csafe // (G * G), (csafe // G) % G, csafe % G],
                            axis=-1).astype(jnp.float32)
            centers = aabb[0] + (ijk + 0.5) / G * span

            def do_bake(_):
                baked = self.deformer.bake_packed_cache(
                    state.deformer_cano, dstate, centers,
                    net_sigma_fn=lambda x: net(x)[1], cell_mask=cmask,
                    return_sigma=want_term)
                rows, sig_cell = baked if want_term else (baked, None)
                cache = jnp.zeros((G ** 3, rows.shape[-1]), rows.dtype) \
                    .at[cell_idx].set(rows, mode="drop")
                if want_term:
                    # sigma validity table: ONE f32 gather per prepass
                    # sample yields BOTH the cache-validity bit (v >= 0;
                    # empty cells hold -1) and sigma_hat for the
                    # transmittance cut. relu matches compositing's
                    # alpha = 1-exp(-relu(s)d). (An int32-quantized
                    # encoding hit a libtpu regalloc RET_CHECK,
                    # live_range_finder.cc:29 — f32 is the same gather
                    # width and dodges the compiler bug.)
                    R = self.deformer.ROW_FLOATS
                    K = rows.shape[-1] // R
                    any_valid = (rows.reshape(-1, K, R)[..., 12] > 0.5) \
                        .any(-1)
                    q = jnp.where(any_valid, jax.nn.relu(sig_cell), -1.0)
                    sig_table = jnp.full((G ** 3,), -1.0, jnp.float32) \
                        .at[cell_idx].set(q, mode="drop")
                else:
                    sig_table = jnp.full((G ** 3,), -1.0, jnp.float32)
                return cache, sig_table

            if prev_bake is not None:
                # cross-frame bake reuse: the cache/sigma tables depend
                # only on (params, betas, body_pose) — orientation and
                # translation cancel in tfs — so the host passes the
                # previous frame's tables + a matched-key flag, and a
                # turntable pays the ~28 ms bake once per POSE, not per
                # frame. lax.cond executes only one branch on TPU.
                cache, sig_table = jax.lax.cond(
                    reuse, lambda _: prev_bake, do_bake, None)
            else:
                cache, sig_table = do_bake(None)
            bake_out = (cache, sig_table)
            probe_fn, pfield_fn, occ_fn, field_pts = \
                self.deformer.make_packed_cache_fns(
                    cache, aabb, G, net, self.cache_n_cand,
                    net_shared=net_shared)

        # -- 2. coarse prepass --------------------------------------------
        # Optionally run on a p x p-subsampled ray lattice (image-space
        # blocks share the verdict: neighbouring 540px rays diverge by
        # ~p px * z / f ~ millimetres at body distance, far below the
        # occupancy dilation margin) — a p=3 subsample cuts the dominant
        # prepass gather volume 9x (xplane: 143 ms -> ~16 ms at 540px).
        if prepass_shape is not None and not have_rays:
            # reconstruct the p x p-subsampled block-lattice rays from the
            # generator basis IN-JIT (world space, then the same w2s
            # transform the full-res path applies): identical numerics to
            # building the full make_ray_grid and striding [::p, ::p] —
            # basis convention is d(x, y) = b0 + x*bx + y*by (rays.py).
            Hs, Ws, p = prepass_shape
            Hb, Wb = Hs // p, Ws // p
            basis_w = rbatch["ray_basis"]
            # 5-row basis [o, b0, bx, by_px, by_blk] decouples the BLOCK-
            # row step from the within-block pixel-row step, so a ray-DP
            # host can deal p-row block-rows round-robin across chips
            # (by_blk = n_chip * by_px) for statistically uniform load —
            # block semantics stay bit-identical to single-chip. A 4-row
            # basis means by_blk == by_px (the contiguous-image default).
            by_blk_w = basis_w[4] if basis_w.shape[0] == 5 else basis_w[3]
            xs = jnp.arange(Wb, dtype=jnp.float32) * p
            ys = jnp.arange(Hb, dtype=jnp.float32) * p
            d_un = (basis_w[1][None, None]
                    + xs[None, :, None] * basis_w[2][None, None]
                    + ys[:, None, None] * by_blk_w[None, None])
            d_w = (d_un / jnp.linalg.norm(d_un, axis=-1, keepdims=True)) \
                .reshape(-1, 3)
            nb_lat = Hb * Wb
            # near/far ship as scalars (per-frame constants in every
            # dataset, near_far_from_transl) — broadcast; [:1] also
            # accepts a legacy (n,) array (constant per frame)
            nr_w = jnp.broadcast_to(
                jnp.asarray(rbatch["near"], jnp.float32).reshape(-1)[:1],
                (nb_lat,))
            fr_w = jnp.broadcast_to(
                jnp.asarray(rbatch["far"], jnp.float32).reshape(-1)[:1],
                (nb_lat,))
            rays_blk = self.deformer.transform_rays_w2s(
                dstate, Rays(o=jnp.broadcast_to(basis_w[0], (nb_lat, 3)),
                             d=d_w, near=nr_w, far=fr_w))
            o_sub, d_sub = rays_blk.o, rays_blk.d
            nr_sub, fr_sub = rays_blk.near, rays_blk.far
        elif prepass_shape is not None:
            Hs, Ws, p = prepass_shape
            o_sub = rays_s.o.reshape(Hs, Ws, 3)[::p, ::p].reshape(-1, 3)
            d_sub = rays_s.d.reshape(Hs, Ws, 3)[::p, ::p].reshape(-1, 3)
            nr_sub = rays_s.near.reshape(Hs, Ws)[::p, ::p].reshape(-1)
            fr_sub = rays_s.far.reshape(Hs, Ws)[::p, ::p].reshape(-1)
        else:
            p = 1
            o_sub, d_sub = rays_s.o, rays_s.d
            nr_sub, fr_sub = rays_s.near, rays_s.far
        near_s, far_s = ray_aabb(o_sub, d_sub, aabb[0], aabb[1])
        near_s = jnp.clip(near_s, nr_sub, fr_sub)
        far_s = jnp.clip(far_s, near_s, fr_sub)
        z, step = sample_z(near_s, far_s, self.prepass_steps, None)
        pts = o_sub[:, None] + z[..., None] * d_sub[:, None]
        use_flat = (self.eval_sampling == "flat" and use_cache
                    and samp_budget is not None)
        use_windows_mode = (self.eval_sampling == "windows" and use_cache)
        if not have_rays and not use_flat:
            raise ValueError(
                "basis-only batches render through the flat path only "
                "(rays_o/rays_d required otherwise)")
        if (use_flat or use_windows_mode) and want_term:
            # window selection samples the sigma validity table (see the
            # bake above): ONE f32 gather yields cache validity AND the
            # per-cell baked sigma, whose running optical depth at the
            # prepass stride terminates each ray once estimated
            # transmittance falls below term_T — samples behind an opaque
            # surface never enter the stream (composite_test early-out
            # economics, raymarcher.cu:222-227). This is where an opaque
            # trained avatar's per-ray work collapses to the front
            # surface.
            G = self.grid_size
            span_g = aabb[1] - aabb[0]
            p_flat = pts.reshape(-1, 3)
            rel = (p_flat - aabb[0]) / span_g
            inside = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
            cell = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
            qv = jnp.take(sig_table,
                          (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2])
            qv = jnp.where(inside, qv, -1.0).reshape(z.shape)
            occ = qv >= 0.0
            tau = jnp.maximum(qv, 0.0) * step  # (nr, S) opt. depth/stride
            if self.alpha_skip is not None:
                # selection-time analog of the reference composite_test
                # alpha < 0.01 skip — default OFF (measured NEGATIVE r5):
                # the baked CELL-CENTER sigma is a bad proxy for the
                # per-sample alpha the reference tests (surface-edge
                # cells read near-zero at the center while the surface
                # crosses the cell), and culling on it cost 6.6 dB
                # in-mask / 2.0 dB whole-frame on the trained 540px
                # avatar for ZERO frame-time win (both arms 1.02 s on
                # the pose-varying workload; the kept-sample count it
                # cuts 3.4x was not the bottleneck). Knob retained for
                # ablation only.
                # (alpha = 1 - exp(-sigma*dt) < a  <=>  tau < -log(1-a))
                occ = occ & (tau > -math.log1p(-self.alpha_skip))
            # Per-ray termination INDEX, not a per-sample mask product:
            # count samples whose exclusive prefix optical depth (via one
            # (nr,S)@(S,S) strict-lower MXU matmul) keeps estimated
            # transmittance above term_T, then cut with an iota compare.
            # Feeding a second full (nr,S) data-dependent mask into the
            # selection fusion trips a libtpu regalloc RET_CHECK
            # (live_range_finder.cc:29, ordinal-stable across int32/f32/
            # barrier/cumsum-vs-matmul encodings); the (nr,) scalar + iota
            # broadcast compiles clean. Monotonicity of the prefix makes
            # the two formulations identical.
            S_pre = tau.shape[-1]
            excl = jnp.tril(jnp.ones((S_pre, S_pre), tau.dtype), k=-1)
            log_t_excl = -(tau @ excl.T)
            n_live = (log_t_excl > math.log(self.term_T)) \
                .sum(-1).astype(jnp.int32)              # (nr,)
            n_live = jax.lax.optimization_barrier(n_live)
            occ = occ & (jnp.arange(S_pre, dtype=jnp.int32)[None]
                         < n_live[:, None])
        elif use_flat or use_windows_mode:
            # window selection samples the CACHE-VALIDITY table, not the
            # raw grid: only cells with a valid baked warp row can render,
            # and a bloated test grid (ambient density at the threshold)
            # otherwise exhausts the n_windows cap inside the no-render
            # halo before the body — the eval-side analog of the train
            # k_cap truncation pathology. Same gather count (one int32
            # row per prepass sample); strictly fewer kept samples.
            occ = occ_fn(pts.reshape(-1, 3)).reshape(z.shape)
        else:
            coarse = grid._replace(occupancy=self._coarse_occupancy(grid))
            occ = occupancy_lookup(coarse, pts.reshape(-1, 3)) \
                .reshape(z.shape)
        occ = occ & (z < far_s[..., None])
        hit = occ.any(axis=-1)
        margin = self.prepass_margin_steps * step[:, 0]
        z_lo = jnp.maximum(jnp.where(occ, z, jnp.inf).min(axis=-1) - margin,
                           near_s)
        z_hi = jnp.minimum(jnp.where(occ, z, -jnp.inf).max(axis=-1)
                           + margin, far_s)
        z_lo = jnp.minimum(z_lo, z_hi)
        use_windows = use_windows_mode
        z_w = keep_w = None
        if use_windows:
            # sample selection happens HERE: compact each ray's occupied
            # coarse samples into n_windows ascending window centers —
            # the chunk phase then needs no occupancy march at all.
            # (Flat mode selects directly off the dense lattice below —
            # no per-ray compaction at all.)
            from ..render.raymarcher import compact_samples
            idx_w, keep_w = compact_samples(occ, self.n_windows)
            z_w = jnp.where(keep_w, jnp.take_along_axis(z, idx_w, axis=-1),
                            1e9)
            keep_w = keep_w.astype(jnp.float32)
        step_c = step[:, 0]
        step_blk = step_c
        if prepass_shape is not None and p > 1 and not use_flat:
            def up(x):
                x = x.reshape(Hs // p, Ws // p, *x.shape[1:])
                return jnp.repeat(jnp.repeat(x, p, axis=0), p,
                                  axis=1).reshape(-1, *x.shape[2:])
            hit = up(hit[:, None])[:, 0]
            z_lo = up(z_lo[:, None])[:, 0]
            z_hi = up(z_hi[:, None])[:, 0]
            step_c = up(step_c[:, None])[:, 0]
            if use_windows:
                z_w, keep_w = up(z_w), up(keep_w)
        bg = rbatch.get("bg_color")
        if bg is not None:
            bg = jnp.broadcast_to(bg.reshape(-1, 3), (n, 3))
        if use_flat:
            # -- 3'. direct block-level sample selection --------------------
            # No per-ray padding anywhere: every kept (block, stride) pair
            # compacts into ONE static (samp_budget,) stream ordered
            # (block-major, z-ascending — jnp.nonzero is order-
            # preserving). Selection runs DIRECTLY on the dense prepass
            # lattice: z is AFFINE in the stride index (sample_z:
            # z = near + (i + 0.5) * step), so the former per-ray window
            # compaction (cumsum + one-hot MXU contraction) + its z
            # gather + the packed zdt row gather all collapse into one
            # nonzero + index math + a single packed (near, step) row
            # gather (xplane r4: the window machinery cost ~44 ms/frame
            # at 540px — take_along_axis 15.1 ms + its S(1) copy 15.1 ms
            # + the Kw-lattice nonzero 13.6 ms). Selection stays on the
            # p x p-SUBSAMPLED block lattice (the p^2 pixels of a block
            # share their samples); per-pixel work appears only in the
            # field-eval/composite loop over the p^2 pixel offsets
            # (stage 5'). The kept-count rides the n_hit report slot for
            # transparent re-render on overflow.
            S_lat = occ.shape[-1]
            nb = occ.shape[0]
            counts_b = occ.sum(-1).astype(jnp.int32)
            n_hit = counts_b.sum()
            offsets = jnp.cumsum(counts_b) - counts_b  # (nb,) excl. cumsum
            (sidx,) = jnp.nonzero(occ.reshape(-1), size=samp_budget,
                                  fill_value=nb * S_lat)
            smask = sidx < nb * S_lat
            ssafe = jnp.where(smask, sidx, 0)
            blk_id = (ssafe // S_lat).astype(jnp.int32)
            s_in = (ssafe % S_lat).astype(jnp.float32)
            # near + step packed per BLOCK row — one (samp_budget,)
            # gather (row count is what costs, not width)
            nf = jnp.stack([near_s, step_blk], axis=-1)  # (nb, 2)
            nf_s = nf[blk_id]
            z_s = nf_s[:, 0] + (s_in + 0.5) * nf_s[:, 1]
            dt_s = nf_s[:, 1]
        else:
            n_hit = hit.sum()

            # -- 3. on-device hit-ray compaction ----------------------------
            (ray_idx,) = jnp.nonzero(hit, size=ray_budget, fill_value=n)
            rmask = ray_idx < n
            safe = jnp.where(rmask, ray_idx, 0)
            sel = {
                "o": rays_s.o[safe], "d": rays_s.d[safe],
                "z_lo": z_lo[safe], "z_hi": z_hi[safe],
                "near": rays_s.near[safe], "far": rays_s.far[safe],
                "bg": (bg[safe] if bg is not None
                       else jnp.ones((ray_budget, 3))),
            }
            if use_windows:
                sel["z_w"] = z_w[safe]
                sel["keep_w"] = keep_w[safe]
                sel["step_c"] = step_c[safe]
            n_chunks = ray_budget // chunk
            sel = jax.tree.map(
                lambda x: x.reshape(n_chunks, chunk, *x.shape[1:]), sel)

        if use_cache:
            def one(r):
                if use_windows:
                    from ..render.raymarcher import render_rays_windows
                    out = render_rays_windows(
                        field_pts, r["o"], r["d"], r["z_w"],
                        r["keep_w"] > 0.5, r["step_c"][:, None],
                        bg_color=r["bg"])
                    return {"rgb": out.rgb, "depth": out.depth,
                            "alpha": out.alpha, "counter": out.counter}
                rays_t = Rays(o=r["o"], d=r["d"], near=r["z_lo"],
                              far=r["z_hi"])
                if self.cache_fused_probe:
                    out = render_rays_probed(
                        probe_fn, pfield_fn, rays_t,
                        aabb=aabb, n_steps=self.eval_n_steps,
                        k_cap=self.k_cap or self.eval_n_steps,
                        bg_color=r["bg"])
                else:
                    out = render_rays(
                        field_pts, rays_t, occupancy_fn=occ_fn,
                        aabb=aabb, n_steps=self.eval_n_steps,
                        k_cap=self.k_cap or self.eval_n_steps,
                        key=None, noise_std=0.0, bg_color=r["bg"])
                return {"rgb": out.rgb, "depth": out.depth,
                        "alpha": out.alpha, "counter": out.counter}
        else:
            # non-SNARF / cache-off fallback: full deform per sample over
            # the reference-parity [near, far] span
            field_fn = self.deformer.make_frame_field_fn(
                state.deformer_cano, dstate, net, eval_mode=True)

            def one(r):
                out = render_rays(
                    field_fn,
                    Rays(o=r["o"], d=r["d"], near=r["near"],
                         far=r["far"]),
                    occupancy_fn=lambda p: occupancy_lookup(grid, p),
                    aabb=aabb, n_steps=self.n_steps, k_cap=self.k_cap,
                    key=None, noise_std=0.0, bg_color=r["bg"])
                return {"rgb": out.rgb, "depth": out.depth,
                        "alpha": out.alpha, "counter": out.counter}

        if use_flat:
            # -- 5'. per-pixel-offset field eval + cumsum composite ---------
            # For each of the p^2 pixel offsets, evaluate the shared
            # sample stream at that pixel's rays and composite by the
            # cumsum-DIFFERENCE trick: per-block accumulations are
            # csum[end] - csum[start] over the packed (S, 5) stream —
            # two (nb,) gathers instead of a (S, 5) scatter-add (xplane
            # r2: the scatter-add alone cost ~70 ms/frame; TPU scatters
            # with duplicate indices serialize). The image assembles by
            # pure reshape/transpose — the whole flat path has ZERO
            # scatters.
            from ..render.compositing import composite_stream
            S = samp_budget
            pp = p * p
            # z_s/dt_s computed in stage 3' (affine in the stride index)
            if p > 1:
                Hb, Wb = Hs // p, Ws // p
                by, bx = blk_id // Wb, blk_id % Wb
                qy = jnp.repeat(jnp.arange(p), p)                # (pp,)
                qx = jnp.tile(jnp.arange(p), p)
            # ONE field eval over all p^2 pixel offsets (9 separate
            # launches paid ~9x the fixed gather/copy cost, xplane r2).
            # The warp-cache row is gathered ONCE per block sample from
            # the CENTER pixel's ray — the p^2 pixel rays of a block
            # spread ~p px (~millimetres at body distance), far inside
            # one 64^3 cell, and the cached-Newton step absorbs the
            # cross-pixel delta exactly because the row's own cell
            # center rides along (field_fn(centers=...)). This cuts the
            # dominant cache gather p^2-fold (16.9 -> 1.9 ms, xplane r2).
            basis = rbatch.get("ray_basis")
            if basis is not None and prepass_shape is not None:
                # pixel dirs COMPUTED from the pinhole generator basis
                # (make_ray_basis) instead of gathered per (offset,
                # sample): the (pp*S,) od gather + its index copies cost
                # ~65 ms/frame at 540px (xplane r3); this is pure
                # vectorized math. The basis rides the same w2s rotation
                # as the rays (o is the camera center, constant).
                rb = self.deformer.transform_rays_w2s(
                    dstate, Rays(o=basis[:1], d=basis[1:],
                                 near=jnp.zeros((1,)),
                                 far=jnp.ones((1,))))
                o_s = rb.o[0]
                b0_s, bx_s, by_s = rb.d[0], rb.d[1], rb.d[2]
                if basis.shape[0] == 5:
                    # block-strided layout (see the prepass note): the
                    # block-row term advances by by_blk, the within-block
                    # pixel offset by by_px.
                    by_blk_s = rb.d[3]
                    if p > 1:
                        pxs = bx[None] * p + qx[:, None]         # (pp, S)
                        d_un = (b0_s + pxs[..., None] * bx_s
                                + (by[None] * p)[..., None] * by_blk_s
                                + qy[:, None, None] * by_s)      # (pp,S,3)
                    else:
                        pxs = (blk_id % Ws)[None]
                        pys = (blk_id // Ws)[None]
                        d_un = (b0_s + pxs[..., None] * bx_s
                                + pys[..., None] * by_blk_s)
                elif p > 1:
                    pxs = bx[None] * p + qx[:, None]             # (pp, S)
                    pys = by[None] * p + qy[:, None]
                    d_un = (b0_s + pxs[..., None] * bx_s
                            + pys[..., None] * by_s)             # (pp,S,3)
                else:
                    pxs = (blk_id % Ws)[None]
                    pys = (blk_id // Ws)[None]
                    d_un = (b0_s + pxs[..., None] * bx_s
                            + pys[..., None] * by_s)             # (pp,S,3)
                d_q = d_un / jnp.linalg.norm(d_un, axis=-1,
                                             keepdims=True)
                pts_q = o_s + z_s[None, :, None] * d_q
            else:
                od = jnp.concatenate([rays_s.o, rays_s.d], axis=-1)
                if p > 1:
                    rid = ((by[None] * p + qy[:, None]) * Ws
                           + bx[None] * p + qx[:, None])         # (pp, S)
                else:
                    rid = blk_id[None]
                od_q = od[rid.reshape(-1)].reshape(pp, S, 6)
                pts_q = od_q[..., :3] + z_s[None, :, None] * od_q[..., 3:]
            qc = (p // 2) * p + p // 2 if p > 1 else 0
            _, rows_blk = probe_fn(pts_q[qc])                # (S, K*13)
            G = self.grid_size
            span = aabb[1] - aabb[0]
            cell = jnp.clip(jnp.floor((pts_q[qc] - aabb[0]) / span * G),
                            0, G - 1)
            centers = aabb[0] + (cell + 0.5) / G * span      # (S, 3)
            if net_shared is not None:
                # shared-corner eval: the Newton step still runs per
                # pixel offset, but the canonical field's 4 feature
                # gathers happen ONCE per block sample (the offsets'
                # canonical points spread millimetres — within/around
                # one feature cell) and each offset trilerps/
                # extrapolates against the shared corner rows. Also
                # skips the (pp*S, K*13) row/center tile broadcasts
                # (xplane r4: gathers 26.4 ms + tiles ~8 ms -> ~4 ms).
                rgb_s, sigma_s, ok = pfield_fn(
                    pts_q[qc], rows_blk, centers, pts_all=pts_q)
            elif not self.flat_tile_rows:
                # exact per-offset field eval WITHOUT tiling the rows:
                # the offset Newton einsum reads the (S, K*13) rows once
                # (packed_cache field_fn pts_all with net_shared=None)
                rgb_s, sigma_s, ok = pfield_fn(
                    pts_q[qc], rows_blk, centers, pts_all=pts_q)
            else:
                tile = lambda x: jnp.broadcast_to(
                    x[None], (pp, *x.shape)).reshape(pp * x.shape[0],
                                                     *x.shape[1:])
                rgb_s, sigma_s, ok = pfield_fn(
                    pts_q.reshape(pp * S, 3), tile(rows_blk),
                    tile(centers))
                rgb_s = rgb_s.reshape(pp, S, 3)
                sigma_s = sigma_s.reshape(pp, S)
                ok = ok.reshape(pp, S)
            ok = ok & smask[None]
            acc = jax.vmap(
                lambda s, r, o: composite_stream(
                    s, r, z_s, dt_s, o, blk_id, offsets, counts_b)
            )(sigma_s, rgb_s, ok)                                # (pp,nb,5)
            if p > 1:
                A = (acc.transpose(1, 0, 2).reshape(Hb, Wb, p, p, 5)
                     .transpose(0, 2, 1, 3, 4).reshape(n, 5))
                cnt = jnp.broadcast_to(
                    counts_b.reshape(Hb, 1, Wb, 1).astype(jnp.float32),
                    (Hb, p, Wb, p)).reshape(n)
            else:
                A = acc[0]
                cnt = counts_b.astype(jnp.float32)
            t_final = jnp.clip(1.0 - A[:, 4], 0.0, 1.0)
            bg_i = bg if bg is not None else jnp.ones((n, 3))
            out = {"rgb": A[:, :3] + t_final[:, None] * bg_i,
                   "depth": A[:, 3], "alpha": A[:, 4], "counter": cnt}
        else:
            # statically unrolled chunk loop: gathers inside a lax.map
            # while body run ~3-5x slower (xplane: S(1)-staged carries, no
            # cross-iteration pipelining); n_chunks is small and static
            n_chunks_static = ray_budget // chunk
            outs = [one({k: v[i] for k, v in sel.items()})
                    for i in range(n_chunks_static)]
            flat = {k: jnp.concatenate([o[k] for o in outs])
                    for k in outs[0]}

            # -- 6. full-frame scatter + single-fetch packing ---------------
            full = {
                "rgb": (bg if bg is not None else jnp.ones((n, 3))),
                "depth": jnp.zeros((n,)),
                "alpha": jnp.zeros((n,)),
                "counter": jnp.zeros((n,)),
            }
            flat["counter"] = flat["counter"].astype(jnp.float32)
            out = {k: full[k].at[ray_idx].set(flat[k], mode="drop")
                   for k in full}
        # ONE (n+1, 6) float16 buffer: host fetches through the remote-TPU
        # tunnel run at ~110 MB/s with a ~33 ms round trip EACH (PERF.md),
        # so rgb/depth/alpha/counter ship together at half width, with
        # n_hit/n_occ base-1024-digit-encoded in the extra row (f16 holds
        # integers <= 2048 exactly) — 1 fetch/frame instead of 6.
        if payload == "u8":
            # rgb+alpha quantized to u8 (4 B/ray vs 12): the animation /
            # novel-view consumers write u8 PNGs anyway, and the tunnel
            # fetch is the wall-clock bottleneck (12-110 MB/s, PERF.md) —
            # a 540px frame drops 3.5 MB -> 1.17 MB. depth/counter are
            # not shipped (unpack returns zeros); callers that need them
            # (harness val stats, eval metrics) keep the f16 payload.
            def digits8(v):
                v = v.astype(jnp.int32)
                return jnp.stack([v // 65536 % 256, v // 256 % 256,
                                  v % 256])

            extra8 = jnp.concatenate(
                [digits8(n_hit), digits8(n_occ),
                 jnp.zeros(2, jnp.int32)]).astype(jnp.uint8)
            rgba = jnp.concatenate([out["rgb"], out["alpha"][:, None]],
                                   axis=-1)
            q = jnp.clip(jnp.round(rgba * 255.0), 0, 255) \
                .astype(jnp.uint8)
            return jnp.concatenate([q.reshape(-1), extra8]), bake_out
        img = jnp.concatenate(
            [out["rgb"], out["depth"][:, None], out["alpha"][:, None],
             out["counter"][:, None]], axis=-1)

        def digits(v):
            v = v.astype(jnp.int32)
            return jnp.stack([v // 1024 ** 2 % 1024, v // 1024 % 1024,
                              v % 1024]).astype(jnp.float32)

        extra = jnp.concatenate([digits(n_hit), digits(n_occ)])[None]
        # return a FLAT f16 vector: XLA lays (n, 6) outputs out column-
        # major here, and the axon client then pays a ~100-180 ms relayout
        # per fetch (measured r2); a 1-D output is contiguous by
        # construction and any relayout happens on-device at HBM speed.
        # bake_out (cache + sigma table) rides along as DEVICE arrays —
        # never fetched — so the next same-pose frame can reuse them.
        buf = jnp.concatenate([img, extra]).astype(jnp.float16).reshape(-1)
        return buf, bake_out

    @staticmethod
    def _unpack_frame(buf) -> tuple[dict, int, int]:
        """Host-side unpack of the fused render's flat buffer — (n+1)*6
        f16 (default payload) or n*4+8 u8 (payload="u8"), told apart by
        dtype."""
        import numpy as np
        buf = np.asarray(buf)
        if buf.dtype == np.uint8:
            extra = buf[-8:].astype(np.int64)
            n_hit = int(extra[0] * 65536 + extra[1] * 256 + extra[2])
            n_occ = int(extra[3] * 65536 + extra[4] * 256 + extra[5])
            q = buf[:-8].reshape(-1, 4).astype(np.float32) / 255.0
            nq = q.shape[0]
            return ({"rgb": q[:, :3], "alpha": q[:, 3],
                     "depth": np.zeros(nq, np.float32),
                     "counter": np.zeros(nq, np.int32)}, n_hit, n_occ)
        buf = buf.astype(np.float32).reshape(-1, 6)
        extra = buf[-1].astype(np.int64)
        n_hit = int(extra[0] * 1024 ** 2 + extra[1] * 1024 + extra[2])
        n_occ = int(extra[3] * 1024 ** 2 + extra[4] * 1024 + extra[5])
        out = {"rgb": buf[:-1, :3], "depth": buf[:-1, 3],
               "alpha": buf[:-1, 4],
               "counter": buf[:-1, 5].astype(np.int32)}
        return out, n_hit, n_occ

    @staticmethod
    def _round_budget(m: int, chunk: int) -> tuple[int, int]:
        """(budget, chunk) with budget the next chunk multiple of m (the
        budget is static per (resolution, frac) — no pow2 inflation; a
        pow2 count here cost 80% wasted rays at 540px)."""
        chunk = min(chunk, 1 << (max(m, 1) - 1).bit_length())
        n_chunks = max(1, -(-m // chunk))
        return n_chunks * chunk, chunk

    def render_frame(self, state: TrainState, batch,
                     chunk: int = 32768,
                     prune_rays: bool = True,
                     grid: DensityGridState | None = None,
                     image_shape: tuple[int, int] | None = None,
                     ray_budget_frac: float = 0.5,
                     session: RenderSession | None = None,
                     payload: str = "f16"
                     ) -> dict[str, jax.Array]:
        """Full-frame inference (render_image_fast analog, DNeRF.py:72-97):
        test-grid build + one fused render dispatch + one host fetch.

        ``ray_budget_frac`` sizes the static hit-ray capacity; when a frame
        overflows it (body covers more pixels than budgeted), the frame is
        transparently re-rendered with the full-ray budget (one extra
        compile the first time it happens).

        ``session`` carries learned budget hints across frames; pass one
        ``RenderSession`` through a sequence of calls to reuse the learned
        capacities (without one, every call sizes from the static priors).
        """
        return self._finish_frame(self._render_frame_async(
            state, batch, chunk, prune_rays, grid, ray_budget_frac,
            image_shape, session, payload))

    def _frame_key(self, state: TrainState, batch):
        """Frame-asset memo key: the warp cache / sigma table / auto test
        grid depend only on (params, betas, body_pose[, idx when per-frame
        SMPL params are optimized]) — global orientation + translation
        cancel in the world->SMPL transform, so turntable frames share
        them (RenderSession.last_bake / last_grid). Returns
        ``(fkey, fkey_refs)``; refs pin the id()-keyed objects so ids
        cannot recycle while the key lives in a session."""
        import numpy as _np

        def _pose_part(v):
            # content for host arrays; OBJECT IDENTITY for device arrays —
            # np.asarray on a remote-device array costs a ~33 ms tunnel
            # readback per frame (PERF.md), which would erase the win.
            if isinstance(v, _np.ndarray):
                return v.tobytes()
            return id(v)

        if not hasattr(self.deformer, "bake_packed_cache"):
            return None, None
        idx_k = None
        if self.optimize_smpl and isinstance(state.params, dict) \
                and isinstance(state.params.get("smpl"), SMPLParams):
            idx_k = int(batch["idx"])
        fkey = (id(state.params), self.grid_size,
                _pose_part(batch["betas"]),
                _pose_part(batch["body_pose"]), idx_k)
        return fkey, (state.params, batch["betas"], batch["body_pose"])

    def _render_frame_async(self, state: TrainState, batch,
                            chunk: int = 32768,
                            prune_rays: bool = True,
                            grid: DensityGridState | None = None,
                            ray_budget_frac: float = 0.5,
                            image_shape: tuple[int, int] | None = None,
                            session: RenderSession | None = None,
                            payload: str = "f16"):
        """Enqueue a full frame WITHOUT forcing a host sync; returns an
        in-flight record for ``_finish_frame`` — callers that render frame
        sequences overlap the fetch of frame i with the compute of frame
        i+1 (render_frames)."""
        if session is None:
            session = RenderSession()  # per-call: priors only, no learning
        self._lock_config()
        fkey, fkey_refs = self._frame_key(state, batch)
        if grid is None:
            if fkey is not None and session.last_grid is not None \
                    and session.last_grid[0] == fkey:
                grid = session.last_grid[1]
            else:
                grid = (self.build_pose_grid(state, batch)
                        if self.eval_grid == "smpl_shell"
                        else self.build_test_grid(state, batch))
                if fkey is not None:
                    # refs pin the id()-keyed objects until the next
                    # compare (an id can recycle once its object dies)
                    session.last_grid = (fkey, grid, fkey_refs)
        else:
            fkey = (fkey, id(grid)) if fkey is not None else None
            if fkey is not None:
                fkey_refs = fkey_refs + (grid,)
        import numpy as _np
        n = (batch["rays_o"].shape[0] if "rays_o" in batch
             else image_shape[0] * image_shape[1])
        prepass_shape = None
        if image_shape is not None:
            H, W = image_shape
            if H * W == n:
                cand = ((self.prepass_block,)
                        if self.prepass_block else (3, 2))
                for p in cand:
                    if H % p == 0 and W % p == 0:
                        prepass_shape = (H, W, p)
                        break
        # host-batch slimming: in flat mode with a generator basis, the
        # full-res ray tensors are pure redundancy — the fused program
        # reconstructs block rays from the (4, 3) basis and stage 5'
        # already computes per-pixel dirs from it. Shipping them anyway
        # cost ~13 MB/frame of host->device tunnel traffic at 540px.
        # Applied to HOST (numpy) batches only: device-resident batches
        # upload nothing, and their near/far may not be ours to reduce.
        slim = (prepass_shape is not None and "ray_basis" in batch
                and self.eval_sampling == "flat" and self.use_warp_cache
                and hasattr(self.deformer, "bake_packed_cache")
                and isinstance(batch.get("near"), _np.ndarray)
                and isinstance(batch.get("rays_o"), _np.ndarray))
        fbatch = {}
        for k, v in batch.items():
            if k in ("rgb", "alpha"):
                continue
            if slim:
                if k in ("rays_o", "rays_d"):
                    continue
                if k == "near":
                    v = _np.float32(_np.min(v))
                elif k == "far":
                    v = _np.float32(_np.max(v))
                elif k == "bg_color" and isinstance(v, _np.ndarray) \
                        and v.size > 3:
                    flat_bg = v.reshape(-1, 3)
                    if bool((flat_bg == flat_bg[:1]).all()):
                        v = flat_bg[0].copy()
            fbatch[k] = jnp.asarray(v) if hasattr(v, "shape") else v
        if prune_rays:
            budget, chunk_eff = self._round_budget(
                max(int(n * ray_budget_frac), 1), chunk)
            full_budget = self._round_budget(n, chunk)[0]
            budget = min(budget, full_budget)
        else:
            budget, chunk_eff = self._round_budget(n, chunk)
        use_flat = (self.eval_sampling == "flat" and self.use_warp_cache
                    and hasattr(self.deformer, "bake_packed_cache"))
        samp_budget = None
        if use_flat:
            # BLOCK-level sample budget: the flat stream lives on the
            # p x p-subsampled prepass lattice (nb = n / p^2 rays), so
            # budget slots cost p^2 field evals each — sizing at full
            # res ran 9x the kept work (xplane r2)
            p = prepass_shape[2] if prepass_shape is not None else 1
            nb = n // (p * p)
            hint = session.samp_budget.get((n, prepass_shape))
            m = hint if hint is not None else int(nb * self.samples_per_ray)
            # direct flat selection keeps up to prepass_steps samples per
            # block (no per-ray n_windows cap anymore) — the budget
            # ceiling must match or a dense pattern could overflow
            # forever against a clamp it can never satisfy
            m = min(max(m, 1), nb * self.prepass_steps)
            samp_budget, chunk_eff = self._round_budget(m, chunk)
        # adaptive bake capacity: the previous frame's occupied-cell count
        # (+15%, 4096-granular) sizes this frame's bake — the default
        # G^3/8 budget padded the bake's Broyden/voxel_J work ~40%
        # (xplane r2); animation poses change n_occ slowly and overflow
        # transparently re-renders. self.cell_budget is the frame-0 PRIOR
        # only — the learned hint may exceed it up to the whole grid: a
        # trained avatar's fringe cells routinely push n_occ past G^3/8,
        # and capping the hint forced a cell-overflow DOUBLE render (+ a
        # forced rebake) on EVERY frame (diag r5: 38228 occupied cells vs
        # the 32768 cap at 540px).
        cell_budget = min(session.cell_budget.get((n, prepass_shape))
                          or self.cell_budget, self.grid_size ** 3)
        prev_bake, reuse = self._bake_memo(session, fkey)
        buf, bake_out, samp_budget = self._call_fused_size_hopped(
            state, fbatch, grid, budget, chunk_eff, cell_budget,
            prepass_shape, samp_budget, prev_bake=prev_bake, reuse=reuse,
            payload=payload)
        if bake_out is not None and fkey is not None:
            session.last_bake = (fkey, bake_out, fkey_refs)
        return dict(buf=buf, state=state, fbatch=fbatch, grid=grid,
                    chunk=chunk, budget=budget,
                    cell_budget=cell_budget,
                    prepass_shape=prepass_shape,
                    samp_budget=samp_budget, chunk_eff=chunk_eff,
                    session=session, fkey=fkey, payload=payload,
                    fkey_refs=fkey if fkey is None else fkey_refs)

    def _bake_memo(self, session: RenderSession, fkey):
        """(prev_bake, reuse) for the fused dispatch: the previous frame's
        (cache, sigma table) device arrays plus a matched-key flag. Arrays
        are ALWAYS passed once a compatible pair exists (zeros on the
        first frame) so the jit traces ONE program; reuse=False simply
        takes the bake branch of the cond."""
        want_term = (self.term_T is not None
                     and self.eval_sampling in ("flat", "windows"))
        if fkey is None or not want_term or not self.use_warp_cache \
                or not hasattr(self.deformer, "cache_K"):
            return None, None
        G3 = self.grid_size ** 3
        W = self.deformer.cache_K * self.deformer.ROW_FLOATS
        if session.last_bake is not None \
                and session.last_bake[1][0].shape == (G3, W):
            key, assets = session.last_bake[0], session.last_bake[1]
            return assets, jnp.asarray(key == fkey)
        return ((jnp.zeros((G3, W), jnp.float32),
                 jnp.full((G3,), -1.0, jnp.float32)),
                jnp.asarray(False))

    def _call_fused_size_hopped(self, state, fbatch, grid, budget,
                                chunk_eff, cell_budget, prepass_shape,
                                samp_budget, prev_bake=None, reuse=None,
                                payload: str = "f16"):
        """Dispatch the fused render, hopping the flat-stream sample
        budget past sizes the backend TPU compiler cannot compile.

        libtpu's regalloc hits a RET_CHECK (live_range_finder.cc:29) on
        this program at specific static sizes (reproduced: n=291600,
        samp_budget=393216, v5e — content-independent: same crash with
        the termination mask, without it, and across int32/f32/barrier
        re-encodings). The sample budget is pure padding, so the next
        chunk multiple renders identically; bad sizes are remembered
        process-wide (_BAD_FUSED_SIZES) so each costs at most one failed
        compile per process."""
        n = (fbatch["rays_o"].shape[0] if "rays_o" in fbatch
             else prepass_shape[0] * prepass_shape[1])
        _load_bad_sizes()
        samp0 = samp_budget
        last = None
        for _ in range(16):
            key = (n, prepass_shape, samp_budget, prev_bake is not None)
            if samp_budget is not None and key in _BAD_FUSED_SIZES:
                samp_budget += chunk_eff
                continue
            try:
                buf, bake_out = self._render_frame_fused(
                    state, fbatch, grid, budget, chunk_eff, cell_budget,
                    prepass_shape, samp_budget, prev_bake=prev_bake,
                    reuse=reuse, payload=payload)
                return buf, bake_out, samp_budget
            except Exception as e:  # noqa: BLE001 — filtered below
                if samp_budget is None or not _is_backend_compiler_crash(e):
                    raise
                _BAD_FUSED_SIZES.add(key)
                _save_bad_sizes()
                samp_budget += chunk_eff
                last = e
        if prev_bake is not None:
            # the bake-reuse cond variant may be uncompilable where the
            # plain program is not — degrade to bake-always rather than
            # failing the frame
            return self._call_fused_size_hopped(
                state, fbatch, grid, budget, chunk_eff, cell_budget,
                prepass_shape, samp0, payload=payload)
        raise RuntimeError(
            f"no compilable flat-stream size found near {samp_budget} "
            f"(16 hops tried)") from last

    def _finish_frame(self, rec) -> dict:
        """Fetch an in-flight frame (ONE host transfer); transparently
        re-renders when the hit count overflowed the static ray budget
        (body covering more pixels than budgeted) or the occupied-cell
        count overflowed the bake's cell budget — rare, one extra compile
        the first time each overflow size appears.

        The overflow check LOOPS on the re-rendered frame's counters: a
        cell-budget overflow means the first bake was truncated, so the
        re-render's fuller cache can select MORE samples and newly
        overflow the sample stream — shipping that frame unchecked
        rendered visibly truncated images (caught by the dp-vs-single
        parity test). Each pass resizes from the latest true counts, so
        the loop converges in <= 2 extra renders."""
        out, n_hit, n_occ = self._unpack_frame(rec["buf"])
        fb = rec["fbatch"]
        n = (fb["rays_o"].shape[0] if "rays_o" in fb
             else rec["prepass_shape"][0] * rec["prepass_shape"][1])
        session, skey = rec["session"], (n, rec["prepass_shape"])
        budget = rec["budget"]
        chunk_eff = rec.get("chunk_eff", min(rec["chunk"], budget))
        cell_budget = rec["cell_budget"]
        samp_budget = rec.get("samp_budget")
        for _ in range(4):
            # learn capacities for the NEXT frame from the latest counts.
            # HIGH-WATER after the first learn: a frame with fewer hits
            # (turntable side view) must NOT shrink the budget — budgets
            # are pure padding, so a smaller static size renders the same
            # pixels but costs a fresh ~80 s fused-program compile
            # (measured r3). Only the first frame shrinks from the prior.
            def _hw(table, want):
                cur = table.get(skey)
                table[skey] = want if cur is None else max(cur, want)
            _hw(session.cell_budget,
                min(self.grid_size ** 3,
                    max(4096, -(-int(n_occ * 1.15) // 4096) * 4096)))
            if samp_budget is not None:
                _hw(session.samp_budget, max(8192, int(n_hit * 1.2)))
                # flat mode: the n_hit slot carries the kept-SAMPLE count
                ray_over = n_hit > samp_budget
            else:
                ray_over = budget < n and n_hit > budget
            cell_over = n_occ > cell_budget
            if not (ray_over or cell_over):
                return out
            if ray_over:
                if samp_budget is not None:
                    samp_budget, chunk_eff = self._round_budget(
                        n_hit, rec["chunk"])
                else:
                    budget, chunk_eff = self._round_budget(n, rec["chunk"])
            if cell_over:
                cell_budget = -(-n_occ // 4096) * 4096
            prev_bake, reuse = self._bake_memo(session, rec.get("fkey"))
            if cell_over and reuse is not None:
                # the previous attempt's bake was truncated at its cell
                # budget — its stored tables are incomplete; rebake
                reuse = jnp.asarray(False)
            buf, bake_out, samp_budget = self._call_fused_size_hopped(
                rec["state"], rec["fbatch"], rec["grid"], budget,
                chunk_eff, cell_budget, rec["prepass_shape"], samp_budget,
                prev_bake=prev_bake, reuse=reuse,
                payload=rec.get("payload", "f16"))
            if bake_out is not None and rec.get("fkey") is not None:
                session.last_bake = (rec["fkey"], bake_out,
                                     rec.get("fkey_refs"))
            out, n_hit, n_occ = self._unpack_frame(buf)
        # Loop exhausted: re-check the LAST render's counters so a
        # pathologically oscillating budget can never ship a truncated
        # frame silently — warn loudly instead (the pixels past the
        # budget rendered as background).
        if samp_budget is not None:
            ray_over = n_hit > samp_budget
        else:
            ray_over = budget < n and n_hit > budget
        if ray_over or n_occ > cell_budget:
            import warnings
            warnings.warn(
                f"frame still overflowed after 4 re-render passes "
                f"(hits {int(n_hit)} vs budget "
                f"{samp_budget if samp_budget is not None else budget}, "
                f"occupied cells {int(n_occ)} vs {cell_budget}); the "
                f"returned image is truncated (overflowed rays/samples "
                f"rendered as background)", RuntimeWarning, stacklevel=3)
        return out

    def render_frames(self, state: TrainState, batches,
                      chunk: int = 32768,
                      grid: DensityGridState | None = None,
                      depth: int = 2,
                      ray_budget_frac: float = 0.5,
                      image_shape: tuple[int, int] | None = None,
                      session: RenderSession | None = None,
                      payload: str = "f16"):
        """Pipelined frame-sequence renderer (animate/novel_view/bench):
        keeps ``depth`` frames in flight so the ~33 ms host-fetch latency
        of frame i overlaps frame i+1's on-device compute (the TPU analog
        of overlapping bake_{n+1} with render_n). Yields numpy dicts.

        One ``RenderSession`` spans the sequence (created here if not
        passed), so later frames reuse the budget capacities learned from
        earlier ones."""
        session = session or RenderSession()
        inflight = []
        for batch in batches:
            inflight.append(self._render_frame_async(
                state, batch, chunk=chunk, grid=grid,
                ray_budget_frac=ray_budget_frac, image_shape=image_shape,
                session=session, payload=payload))
            if len(inflight) >= depth:
                yield self._finish_frame(inflight.pop(0))
        for rec in inflight:
            yield self._finish_frame(rec)
