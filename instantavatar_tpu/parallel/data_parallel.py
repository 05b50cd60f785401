"""Multi-chip parallelism — the layer the reference does not have.

The reference trains on exactly one GPU (SURVEY §2.8: pl.Trainer(gpus=1),
no DDP/NCCL anywhere). The TPU-native framework makes scaling first-class:

  * **Ray data-parallelism** (`make_dp_train_step`): shard the per-step ray
    batch (the patch axis) across a 1-D ``ray`` mesh axis with
    ``shard_map``; each chip renders its rays against replicated
    parameters, gradients are ``pmean``-ed over ICI, and the (replicated)
    optimizer update keeps parameters bit-identical on every chip. This is
    the "sequence parallelism" analog for NeRFs — rays are embarrassingly
    parallel, so the only collective per step is one gradient psum.

  * **Subject parallelism** (`stack_subjects` + `make_multi_subject_step`):
    train S independent avatars simultaneously — parameters stacked on a
    leading subject axis and sharded over the ``subject`` mesh axis; vmap
    turns the single-avatar step into a per-subject step with NO cross-
    subject communication (matching BASELINE's "8 avatars on a v5e-8").

  * **Sharded inference** (`make_dp_render`): shard eval ray chunks across
    chips; the image is gathered at the end (psum-free march).

All of this runs identically on real ICI meshes and on the virtual
8-device CPU mesh used by tests/the driver dry-run.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import inspect

try:  # canonical location in newer jax
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

if "check_rep" in inspect.signature(_shard_map).parameters:
    def shard_map(f, **kw):
        return _shard_map(f, **kw)
else:  # newer API renamed/removed check_rep
    def shard_map(f, *, check_rep=False, **kw):
        kw.setdefault("check_vma", check_rep)
        return _shard_map(f, **kw)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.model import AvatarModel, TrainState

__all__ = ["make_mesh", "make_dp_train_step", "make_dp_render",
           "stack_subjects", "make_multi_subject_step", "shard_batch"]


def make_mesh(n_ray: int | None = None, n_subject: int = 1,
              devices=None) -> Mesh:
    """Build a (subject, ray) mesh. Defaults to all devices on one ray
    axis."""
    devices = devices if devices is not None else jax.devices()
    if n_ray is None:
        n_ray = len(devices) // n_subject
    import numpy as np
    arr = np.asarray(devices[:n_subject * n_ray]).reshape(n_subject, n_ray)
    return Mesh(arr, ("subject", "ray"))


def _ray_specs(batch: dict[str, Any]) -> dict[str, P]:
    """Shard the per-ray leaves on their leading (patch/ray) axis;
    replicate the per-frame SMPL leaves."""
    per_frame = {"betas", "body_pose", "global_orient", "transl", "idx"}
    return {k: (P() if k in per_frame else P("ray"))
            for k in batch}


def shard_batch(mesh: Mesh, batch: dict[str, Any]) -> dict[str, Any]:
    """Device-put a host batch with ray sharding (input pipeline side)."""
    specs = _ray_specs(batch)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}


def make_dp_train_step(avatar: AvatarModel, mesh: Mesh,
                       with_grid_update: bool = False):
    """Ray-data-parallel train step over mesh axis ``ray``.

    batch: ray-sharded on the leading axis. state: replicated.
    Returns (new_state, losses), both replicated.
    """
    batch_spec_fn = _ray_specs

    def step(state: TrainState, batch, key):
        specs = batch_spec_fn(batch)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), {k: specs[k] for k in batch}, P()),
            out_specs=P(),
            check_rep=False)
        def _sharded(state, local_batch, key):
            # decorrelate stochastic RENDER sampling across ray shards;
            # the grid jitter uses the un-folded key (grid_key) so every
            # chip computes a bit-identical occupancy update and the pmean
            # below is a true no-op consistency guard
            k_render = jax.random.fold_in(key, jax.lax.axis_index("ray"))
            grads, losses, new_grid = avatar.grads_and_losses(
                state, local_batch, k_render, with_grid_update,
                grid_key=key)
            grads = jax.lax.pmean(grads, "ray")
            losses = jax.lax.pmean(losses, "ray")
            if with_grid_update:
                new_grid = new_grid._replace(
                    density_cached=jax.lax.pmean(new_grid.density_cached,
                                                 "ray"),
                    occupancy=jax.lax.pmean(
                        new_grid.occupancy.astype(jnp.float32), "ray") > 0.5)
            return avatar.apply_grads(state, grads, new_grid), losses

        return _sharded(state, batch, key)

    return jax.jit(step)


def make_dp_render(avatar: AvatarModel, mesh: Mesh):
    """Ray-sharded inference: each chip renders its slice of the pixel
    rays; outputs come back ray-sharded (gather happens on host copy)."""

    def render(state: TrainState, batch, grid):
        specs = _ray_specs(batch)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), {k: specs[k] for k in batch}, P()),
            out_specs=P("ray"),
            check_rep=False)
        def _sharded(state, local_batch, grid):
            out = avatar.render(state.params, state.center, state.scale,
                                local_batch, cano=state.deformer_cano,
                                grid=grid, key=None, noise_std=0.0,
                                eval_mode=True,
                                bg_color=local_batch.get("bg_color"))
            out.pop("weights", None)
            return out

        return _sharded(state, batch, grid)

    return jax.jit(render)


def dp_render_frame(avatar: AvatarModel, mesh: Mesh, state: TrainState,
                    batch: dict[str, Any], grid,
                    image_shape: tuple[int, int],
                    chunk: int = 32768) -> dict[str, Any]:
    """Ray-sharded FUSED frame render: each chip runs the full flat-stream
    frame program (prepass-window selection, transmittance termination,
    packed-cache field eval, cumsum-difference composite) on a horizontal
    band of the image — the path the 30 FPS @540px target is costed on
    (BASELINE.md: 8.75M rays/s / 8 chips).

    Bands are fully independent (the march has no cross-ray coupling), so
    this is a shard_map with NO collectives: the per-chip bake is
    replicated compute (same tables on every chip — wall-clock equal to
    one chip's bake), and each band's pinhole ray basis is pre-shifted by
    its first row (d = (b0 + y0*by) + x*bx + y_local*by) so the computed
    per-pixel directions stay globally correct.

    The image height must split into per-chip bands whose rows are
    divisible by the prepass subsample p (e.g. 540 rows on 4 chips at
    p=3; pad the frame otherwise). Static budgets come from the model
    priors; overflow raises (callers re-render with prune_rays=False
    semantics by passing a bigger ray budget via ``chunk``/model config).
    """
    import numpy as np
    n_ray = mesh.shape["ray"]
    H, W = image_shape
    n = H * W
    assert H % n_ray == 0, (H, n_ray)
    H_loc = H // n_ray
    p = next((q for q in (3, 2) if H_loc % q == 0 and W % q == 0), 1)
    prepass_shape = (H_loc, W, p)

    fbatch = {k: jnp.asarray(v) if hasattr(v, "shape") else v
              for k, v in batch.items() if k not in ("rgb", "alpha")}
    basis = fbatch.pop("ray_basis", None)
    if basis is not None:
        b = np.asarray(basis)
        # per-band basis: fold each band's first GLOBAL row into b0
        fbatch["ray_basis"] = jnp.asarray(np.stack(
            [np.stack([b[0], b[1] + (c * H_loc) * b[3], b[2], b[3]])
             for c in range(n_ray)]))                    # (n_ray, 4, 3)

    n_loc = n // n_ray
    budget, chunk_eff = avatar._round_budget(n_loc, chunk)
    nb = n_loc // (p * p)
    # overflow-free by construction (selection keeps <= n_windows samples
    # per block; the bake budget covers the actual occupied-cell count,
    # read once per grid on the host): dp budget tuning belongs with
    # hardware measurement
    samp_budget, chunk_eff = avatar._round_budget(
        nb * avatar.n_windows, chunk)
    G3 = avatar.grid_size ** 3
    n_occ = int(np.asarray(grid.occupancy).sum())
    cell_budget = min(max(avatar.cell_budget,
                          -(-n_occ // 4096) * 4096), G3)

    per_frame = {"betas", "body_pose", "global_orient", "transl", "idx"}
    specs = {k: (P() if k in per_frame
                 else P("ray", *([None] * (np.ndim(v) - 1))))
             for k, v in fbatch.items()}
    if "ray_basis" in fbatch:
        # one (4,3) basis PER BAND: the leading axis is the shard axis and
        # must collapse inside the local program
        specs["ray_basis"] = P("ray")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=P("ray"),
        check_rep=False)
    def _sharded(state, local_batch, grid):
        if "ray_basis" in local_batch:
            local_batch = {**local_batch,
                           "ray_basis": local_batch["ray_basis"][0]}
        buf, _ = avatar._render_frame_fused(
            state, local_batch, grid, budget, chunk_eff,
            cell_budget, prepass_shape, samp_budget)
        return buf

    buf = jax.jit(_sharded)(state, fbatch, grid)
    rows = np.asarray(buf, np.float32).reshape(n_ray, -1, 6)
    out = {"rgb": rows[:, :-1, :3].reshape(n, 3),
           "depth": rows[:, :-1, 3].reshape(n),
           "alpha": rows[:, :-1, 4].reshape(n),
           "counter": rows[:, :-1, 5].reshape(n).astype(np.int32)}
    return out


# -- subject parallelism ---------------------------------------------------


def stack_subjects(states: list[TrainState]) -> TrainState:
    """Stack S per-subject TrainStates on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_multi_subject_step(avatar: AvatarModel, mesh: Mesh,
                            with_grid_update: bool = False):
    """Combined (subject x ray) train step: S independent avatars whose
    parameters/batches shard over mesh axis ``subject`` (no cross-subject
    collectives), while each subject's ray batch additionally shards over
    mesh axis ``ray`` with a per-subject gradient pmean — the natural
    layout for >8-chip pods (e.g. 4 subjects x 4 ray shards on 16 chips).

    batch leaves carry a leading subject axis; per-ray leaves are
    (S, R, ...) and shard P("subject", "ray"). states are stacked with
    ``stack_subjects``; keys are per-subject (S, 2) uint32.
    """
    n_ray = mesh.shape["ray"]
    per_frame = {"betas", "body_pose", "global_orient", "transl", "idx"}

    def one_subject(state, batch, key):
        # decorrelate render sampling across this subject's ray shards
        # (same fold as make_dp_train_step, so a combined S x R step is
        # bit-identical to S independent 1 x R ray-DP steps); grid jitter
        # keeps the un-folded per-subject key so every ray shard computes
        # a bit-identical grid update. n_ray == 1 keeps single-chip key
        # semantics exactly.
        if n_ray > 1:
            k_render = jax.random.fold_in(key, jax.lax.axis_index("ray"))
            grads, losses, new_grid = avatar.grads_and_losses(
                state, batch, k_render, with_grid_update, grid_key=key)
        else:
            grads, losses, new_grid = avatar.grads_and_losses(
                state, batch, key, with_grid_update)
        if n_ray > 1:
            grads = jax.lax.pmean(grads, "ray")
            losses = jax.lax.pmean(losses, "ray")
            if with_grid_update:
                new_grid = new_grid._replace(
                    density_cached=jax.lax.pmean(new_grid.density_cached,
                                                 "ray"),
                    occupancy=jax.lax.pmean(
                        new_grid.occupancy.astype(jnp.float32), "ray") > 0.5)
        return avatar.apply_grads(state, grads, new_grid), losses

    vstep = jax.vmap(one_subject)

    def step(states: TrainState, batches, keys):
        batch_specs = {k: (P("subject") if k in per_frame
                           else P("subject", "ray")) for k in batches}
        sharded = shard_map(
            vstep, mesh=mesh,
            in_specs=(P("subject"), batch_specs, P("subject")),
            out_specs=(P("subject"), P("subject")),
            check_rep=False)
        return sharded(states, batches, keys)

    return jax.jit(step)
