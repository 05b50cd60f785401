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
           "DPFrameRenderer", "dp_render_frame",
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


class DPFrameRenderer:
    """Production ray-sharded FUSED frame loop: each chip runs the full
    flat-stream frame program (prepass-window selection, transmittance
    termination, packed-cache field eval, cumsum-difference composite) on
    a horizontal band of the image — the path the 30 FPS @540px target is
    costed on (BASELINE.md: 8.75M rays/s / 8 chips).

    Shards are fully independent (the march has no cross-ray coupling),
    so this is a shard_map with NO collectives: the per-chip bake is
    replicated compute (same tables on every chip — wall-clock equal to
    one chip's bake), and each chip's pinhole ray basis is pre-shifted so
    the computed per-pixel directions stay globally correct. The default
    ``layout="stride"`` deals p-row block-rows round-robin across chips
    (5-row basis: [o, b0 + c*p*by, bx, by, n_ray*by]) so the shared SPMD
    sample budget tracks the MEAN per-chip load; ``layout="band"`` keeps
    contiguous horizontal bands (d = (b0 + y0*by) + x*bx + y_local*by),
    whose budget is sized by the worst band over the body's center.

    Production semantics mirroring the single-device ``render_frame``
    (train/model.py):

      * **one compiled program per static shape** — the shard_map closure
        is built and jitted ONCE per (n, prepass_shape, budgets,
        has_reuse) and cached on the renderer, so steady-state frames pay
        zero retrace (the r3 prototype re-jitted a fresh closure every
        call);
      * **RenderSession threading** — learned sample/cell budget hints
        (keyed by the per-band shape) and the cross-frame bake memo
        (turntable frames rebake once per pose, via the same lax.cond
        reuse branch inside every chip's local program);
      * **transparent overflow re-render** — per-band hit/cell counters
        are checked on fetch (max over bands sizes the shared static
        budget); overflow re-renders with grown budgets instead of
        raising, warning loudly if 4 passes cannot satisfy it;
      * **pipelined ``render_frames``** — keeps ``depth`` frames in
        flight so the host fetch of frame i overlaps frame i+1's
        on-device compute.

    The image height must split into per-chip bands whose rows are
    divisible by the prepass subsample p (e.g. 540 rows on 4 chips at
    p=3; pad the frame otherwise).
    """

    PER_FRAME = frozenset(
        {"betas", "body_pose", "global_orient", "transl", "idx"})

    def __init__(self, avatar: AvatarModel, mesh: Mesh,
                 chunk: int = 32768, layout: str = "stride"):
        import numpy as np
        assert layout in ("stride", "band"), layout
        self.avatar = avatar
        self.mesh = mesh
        self.chunk = chunk
        # "stride" (default): deal p-row BLOCK-rows round-robin across
        # chips, so every chip sees a statistically uniform slice of the
        # body instead of a contiguous band. Contiguous bands concentrate
        # the subject's samples on the center chips while edge chips march
        # background, and the shared SPMD budget is sized by the WORST
        # band — measured 53.5 ms/band vs a 15.4 ms ideal on the trained
        # 540px avatar (PERF.md r5). Blocks are independent in the flat
        # path, so per-chip output is bit-identical to the same blocks
        # rendered single-chip; only the assignment changes (5-row basis,
        # see model.py stage 2/5'). "band" keeps the legacy contiguous
        # split for A/B.
        self.layout = layout
        self.n_ray = mesh.shape["ray"]
        self._np = np
        self._compiled: dict[tuple, Any] = {}
        # sizes whose sharded program crashed the backend compiler: kept
        # per-renderer (the sharded program differs from the single-chip
        # one, so the persisted single-chip registry does not apply)
        self._bad_sizes: set[tuple] = set()

    # -- program cache -----------------------------------------------------

    def _get_compiled(self, skey: tuple, fbatch: dict, has_reuse: bool,
                      payload: str = "f16"):
        """The jitted shard_map program for one static configuration.
        ``skey`` = (budget, chunk_eff, cell_budget, prepass_shape,
        samp_budget). Built once and cached on the renderer — steady-state
        frames pay zero retrace."""
        np = self._np
        has_basis = "ray_basis" in fbatch
        ckey = (skey, tuple(sorted(fbatch)), has_reuse, payload)
        fn = self._compiled.get(ckey)
        if fn is not None:
            return fn
        budget, chunk_eff, cell_budget, prepass_shape, samp_budget = skey
        avatar, mesh = self.avatar, self.mesh

        def _local(state, local_batch, grid, prev_bake, reuse):
            if "ray_basis" in local_batch:
                # one (4,3) basis PER BAND: the leading axis is the shard
                # axis and must collapse inside the local program
                local_batch = {**local_batch,
                               "ray_basis": local_batch["ray_basis"][0]}
            kw = (dict(prev_bake=prev_bake, reuse=reuse) if has_reuse
                  else {})
            buf, bake_out = avatar._render_frame_fused(
                state, local_batch, grid, budget, chunk_eff,
                cell_budget, prepass_shape, samp_budget,
                payload=payload, **kw)
            if bake_out is None:
                bake_out = jnp.zeros((), jnp.float32)
            return buf, bake_out

        specs = {k: (P() if k in self.PER_FRAME
                     else P("ray", *([None] * (np.ndim(v) - 1))))
                 for k, v in fbatch.items()}
        if has_basis:
            specs["ray_basis"] = P("ray")
        sharded = shard_map(_local, mesh=mesh,
                            in_specs=(P(), specs, P(), P(), P()),
                            out_specs=(P("ray"), P()),
                            check_rep=False)
        fn = jax.jit(sharded)
        self._compiled[ckey] = fn
        return fn

    # -- per-frame shaping ------------------------------------------------

    def _shape_frame(self, batch, image_shape):
        np = self._np
        assert image_shape is not None, \
            "DPFrameRenderer needs image_shape to split bands"
        H, W = image_shape
        n = H * W
        n_ray = self.n_ray
        assert H % n_ray == 0, (H, n_ray)
        H_loc = H // n_ray
        cand = ((self.avatar.prepass_block,) if self.avatar.prepass_block
                else (3, 2))
        p = next((q for q in cand if H_loc % q == 0 and W % q == 0), 1)
        prepass_shape = (H_loc, W, p)
        # block-row round-robin (layout="stride"): chip c takes block-rows
        # {c, c+n_ray, ...}; falls back to contiguous bands when the
        # block-row count does not divide the mesh
        stride = self.layout == "stride" and (H // p) % n_ray == 0
        perm = None
        if stride:
            Kb = H // p // n_ray
            perm = (np.arange(n).reshape(Kb, n_ray, p * W)
                    .transpose(1, 0, 2).reshape(-1))
        fbatch = {}
        for k, v in batch.items():
            if k in ("rgb", "alpha"):
                continue
            if not hasattr(v, "shape"):
                fbatch[k] = v
                continue
            if (perm is not None and k not in self.PER_FRAME
                    and np.ndim(v) >= 1 and v.shape[0] == n):
                v = np.asarray(v)[perm]
            fbatch[k] = jnp.asarray(v)
        basis = fbatch.pop("ray_basis", None)
        if basis is not None:
            b = np.asarray(basis)
            if stride:
                # per-chip 5-row basis [o, b0 + c*p*by, bx, by, n_ray*by]:
                # the block-row step advances n_ray block-rows per local
                # block-row, the within-block pixel step stays by
                fbatch["ray_basis"] = jnp.asarray(np.stack(
                    [np.stack([b[0], b[1] + (c * p) * b[3], b[2], b[3],
                               n_ray * b[3]]) for c in range(n_ray)]))
            else:
                # per-band basis: fold each band's first GLOBAL row into b0
                fbatch["ray_basis"] = jnp.asarray(np.stack(
                    [np.stack([b[0], b[1] + (c * H_loc) * b[3], b[2], b[3]])
                     for c in range(n_ray)]))            # (n_ray, 4, 3)
        return fbatch, n, n // n_ray, prepass_shape, perm

    def _budgets(self, session, n_loc, prepass_shape):
        """Static budgets for the shared per-band program: session hints
        (keyed by the per-band shape, so they never clash with the
        single-device keys) else the model priors."""
        avatar = self.avatar
        p = prepass_shape[2]
        nb = n_loc // (p * p)
        budget, chunk_eff = avatar._round_budget(n_loc, self.chunk)
        hint = session.samp_budget.get((n_loc, prepass_shape))
        m = hint if hint is not None else int(nb * avatar.samples_per_ray)
        # ceiling matches the direct flat selection (up to prepass_steps
        # kept samples per block — see model.py's samp_budget clamp)
        m = min(max(m, 1), nb * avatar.prepass_steps)
        samp_budget, chunk_eff = avatar._round_budget(m, self.chunk)
        cell_budget = min(session.cell_budget.get((n_loc, prepass_shape))
                          or avatar.cell_budget, avatar.cell_budget)
        return budget, chunk_eff, cell_budget, samp_budget

    # -- dispatch / fetch ---------------------------------------------------

    def _dispatch(self, state, fbatch, grid, skey, session, fkey,
                  fkey_refs, prev_bake=None, reuse=None,
                  payload: str = "f16"):
        """One sharded dispatch, hopping the sample budget past sizes the
        backend compiler cannot compile (same pathology as the single-chip
        program; see model._call_fused_size_hopped)."""
        from ..train.model import _is_backend_compiler_crash
        budget, chunk_eff, cell_budget, prepass_shape, samp_budget = skey
        has_reuse = prev_bake is not None
        if prev_bake is None:
            # dummy replicated operands keep the jit arity fixed; the
            # no-reuse trace never reads them
            prev_bake = jnp.zeros((), jnp.float32)
            reuse = jnp.zeros((), jnp.bool_)
        samp0, last = samp_budget, None
        for _ in range(16):
            k = (budget, chunk_eff, cell_budget, prepass_shape,
                 samp_budget)
            if (k, has_reuse, payload) in self._bad_sizes:
                samp_budget += chunk_eff
                continue
            fn = self._get_compiled(k, fbatch, has_reuse, payload)
            try:
                buf, bake_out = fn(state, fbatch, grid, prev_bake, reuse)
                return buf, bake_out, k
            except Exception as e:  # noqa: BLE001 — filtered below
                if not _is_backend_compiler_crash(e):
                    raise
                self._bad_sizes.add((k, has_reuse, payload))
                self._compiled.pop(
                    (k, tuple(sorted(fbatch)), has_reuse, payload), None)
                samp_budget += chunk_eff
                last = e
        if has_reuse:
            # degrade to bake-always rather than failing the frame
            return self._dispatch(state, fbatch, grid,
                                  (budget, chunk_eff, cell_budget,
                                   prepass_shape, samp0),
                                  session, fkey, fkey_refs,
                                  payload=payload)
        raise RuntimeError(
            f"no compilable sharded flat-stream size found near "
            f"{samp_budget} (16 hops tried)") from last

    def render_frame_async(self, state: TrainState, batch,
                           grid=None,
                           image_shape: tuple[int, int] | None = None,
                           session: "Any | None" = None,
                           payload: str = "f16"):
        """Enqueue a sharded frame WITHOUT forcing a host sync; returns an
        in-flight record for ``finish_frame``."""
        from ..train.model import RenderSession
        session = session or RenderSession()
        avatar = self.avatar
        fkey, fkey_refs = avatar._frame_key(state, batch)
        if grid is None:
            if fkey is not None and session.last_grid is not None \
                    and session.last_grid[0] == fkey:
                grid = session.last_grid[1]
            else:
                grid = avatar.build_test_grid(state, batch)
                if fkey is not None:
                    session.last_grid = (fkey, grid, fkey_refs)
        else:
            fkey = (fkey, id(grid)) if fkey is not None else None
            if fkey is not None:
                fkey_refs = fkey_refs + (grid,)
        fbatch, n, n_loc, prepass_shape, perm = self._shape_frame(
            batch, image_shape)
        budget, chunk_eff, cell_budget, samp_budget = self._budgets(
            session, n_loc, prepass_shape)
        skey = (budget, chunk_eff, cell_budget, prepass_shape, samp_budget)
        prev_bake, reuse = avatar._bake_memo(session, fkey)
        buf, bake_out, skey = self._dispatch(
            state, fbatch, grid, skey, session, fkey, fkey_refs,
            prev_bake=prev_bake, reuse=reuse, payload=payload)
        if prev_bake is not None and fkey is not None:
            session.last_bake = (fkey, bake_out, fkey_refs)
        return dict(buf=buf, state=state, fbatch=fbatch, grid=grid,
                    n=n, n_loc=n_loc, skey=skey, session=session,
                    fkey=fkey, fkey_refs=fkey_refs, payload=payload,
                    perm=perm)

    def _unpack(self, buf, n, perm=None):
        """Per-band unpack: counters are per band; budget learning uses
        the max over bands (the static budget is shared by the SPMD
        program). ``perm`` (stride layout) maps chip-order position i to
        global pixel index perm[i]; outputs scatter back to image order."""
        np = self._np

        def _img(arr):
            if perm is None:
                return arr
            img = np.empty_like(arr)
            img[perm] = arr
            return img

        buf = np.asarray(buf)
        if buf.dtype == np.uint8:
            rows8 = buf.reshape(self.n_ray, -1)
            extra = rows8[:, -8:].astype(np.int64)
            n_hit = int((extra[:, 0] * 65536 + extra[:, 1] * 256
                         + extra[:, 2]).max())
            n_occ = int((extra[:, 3] * 65536 + extra[:, 4] * 256
                         + extra[:, 5]).max())
            q = rows8[:, :-8].reshape(self.n_ray, -1, 4) \
                .astype(np.float32) / 255.0
            return ({"rgb": _img(q[..., :3].reshape(n, 3)),
                     "alpha": _img(q[..., 3].reshape(n)),
                     "depth": np.zeros(n, np.float32),
                     "counter": np.zeros(n, np.int32)}, n_hit, n_occ)
        rows = buf.astype(np.float32).reshape(self.n_ray, -1, 6)
        extra = rows[:, -1].astype(np.int64)
        n_hit = int((extra[:, 0] * 1024 ** 2 + extra[:, 1] * 1024
                     + extra[:, 2]).max())
        n_occ = int((extra[:, 3] * 1024 ** 2 + extra[:, 4] * 1024
                     + extra[:, 5]).max())
        out = {"rgb": _img(rows[:, :-1, :3].reshape(n, 3)),
               "depth": _img(rows[:, :-1, 3].reshape(n)),
               "alpha": _img(rows[:, :-1, 4].reshape(n)),
               "counter": _img(rows[:, :-1, 5].reshape(n)).astype(np.int32)}
        return out, n_hit, n_occ

    def finish_frame(self, rec) -> dict:
        """Fetch an in-flight sharded frame (one host transfer);
        transparently re-renders on band overflow — same convergence loop
        and exhaustion warning as the single-device _finish_frame."""
        avatar = self.avatar
        out, n_hit, n_occ = self._unpack(rec["buf"], rec["n"],
                                         rec.get("perm"))
        session, n_loc = rec["session"], rec["n_loc"]
        budget, chunk_eff, cell_budget, prepass_shape, samp_budget = \
            rec["skey"]
        hkey = (n_loc, prepass_shape)
        for _ in range(4):
            def _hw(table, want):
                cur = table.get(hkey)
                table[hkey] = want if cur is None else max(cur, want)
            _hw(session.cell_budget,
                min(avatar.cell_budget,
                    max(4096, -(-int(n_occ * 1.15) // 4096) * 4096)))
            _hw(session.samp_budget, max(8192, int(n_hit * 1.2)))
            ray_over = n_hit > samp_budget
            cell_over = n_occ > cell_budget
            if not (ray_over or cell_over):
                return out
            if ray_over:
                samp_budget, chunk_eff = avatar._round_budget(
                    n_hit, self.chunk)
            if cell_over:
                cell_budget = -(-n_occ // 4096) * 4096
            prev_bake, reuse = avatar._bake_memo(session, rec.get("fkey"))
            if cell_over and reuse is not None:
                # previous bake was truncated at its cell budget; rebake
                reuse = jnp.asarray(False)
            skey = (budget, chunk_eff, cell_budget, prepass_shape,
                    samp_budget)
            buf, bake_out, skey = self._dispatch(
                rec["state"], rec["fbatch"], rec["grid"], skey, session,
                rec.get("fkey"), rec.get("fkey_refs"),
                prev_bake=prev_bake, reuse=reuse,
                payload=rec.get("payload", "f16"))
            budget, chunk_eff, cell_budget, prepass_shape, samp_budget = \
                skey
            if prev_bake is not None and rec.get("fkey") is not None:
                session.last_bake = (rec["fkey"], bake_out,
                                     rec.get("fkey_refs"))
            out, n_hit, n_occ = self._unpack(buf, rec["n"],
                                             rec.get("perm"))
        if n_hit > samp_budget or n_occ > cell_budget:
            import warnings
            warnings.warn(
                f"sharded frame still overflowed after 4 re-render passes "
                f"(hits {n_hit} vs budget {samp_budget}, occupied cells "
                f"{n_occ} vs {cell_budget}); the returned image is "
                f"truncated", RuntimeWarning, stacklevel=3)
        return out

    def render_frame(self, state: TrainState, batch, grid=None,
                     image_shape: tuple[int, int] | None = None,
                     session=None, payload: str = "f16"
                     ) -> dict[str, Any]:
        return self.finish_frame(self.render_frame_async(
            state, batch, grid=grid, image_shape=image_shape,
            session=session, payload=payload))

    def render_frames(self, state: TrainState, batches, grid=None,
                      image_shape: tuple[int, int] | None = None,
                      depth: int = 2, session=None):
        """Pipelined sharded frame sequence (the multi-chip analog of
        AvatarModel.render_frames): keeps ``depth`` frames in flight so
        the host fetch of frame i overlaps frame i+1's on-device compute;
        one RenderSession spans the sequence so later frames reuse learned
        budgets and the per-pose bake."""
        from ..train.model import RenderSession
        session = session or RenderSession()
        inflight = []
        for batch in batches:
            inflight.append(self.render_frame_async(
                state, batch, grid=grid, image_shape=image_shape,
                session=session))
            if len(inflight) > depth:
                yield self.finish_frame(inflight.pop(0))
        while inflight:
            yield self.finish_frame(inflight.pop(0))


def dp_render_frame(avatar: AvatarModel, mesh: Mesh, state: TrainState,
                    batch: dict[str, Any], grid,
                    image_shape: tuple[int, int],
                    chunk: int = 32768,
                    session=None, layout: str = "stride") -> dict[str, Any]:
    """One-shot convenience wrapper over ``DPFrameRenderer`` (kept for the
    dryrun/tests; sequence workloads should hold a ``DPFrameRenderer`` so
    the compiled-program cache and session persist across frames)."""
    return DPFrameRenderer(avatar, mesh, chunk=chunk, layout=layout) \
        .render_frame(state, batch, grid=grid, image_shape=image_shape,
                      session=session)


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
