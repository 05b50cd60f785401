"""Measured 8-chip render projection (VERDICT r3 item 2).

The ray-sharded fused render (parallel.DPFrameRenderer) gives every chip
an identical static-shape program: full replicated bake + a height-band
prepass + the shared (max-over-bands) sample-stream budget. SPMD with
static shapes means per-chip wall-clock is shape-determined, so ONE real
chip running exactly one band's program measures the 8-chip frame time
directly — no multi-chip hardware needed (none is reachable here), and
no assumption that the replicated bake or per-band prepass are free
(the r3 "8 x 1.72M" projection assumed both; this tool replaces it).

Protocol (matches bench.py's turntable): 540px target; 8 chips need
rows divisible by 8 and by the prepass subsample p=3, so the frame is
padded 540 -> 552 rows (bands of 69x540; the 2.2% padding cost is
charged to the projection). The measured band is the CENTER band — the
one whose hit counts drive the shared budget.

Run on the real TPU:  python tools/dp_overhead_bench.py
Outputs JSON lines; paste into PERF.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

W = 540
H_FULL = 540          # the protocol resolution (BASELINE.md)
N_CHIP = 8
H_PAD = 552           # next multiple of 8 with band rows % 3 == 0
H_BAND = H_PAD // N_CHIP                      # 69 rows per chip
TARGET = 540 * 540 * 30.0                     # 30 FPS @ 540px


def build():
    """bench.py's flagship setup (opaque trained-like workload)."""
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField
    from instantavatar_tpu.render.density_grid import make_grid_state
    from instantavatar_tpu.train import AvatarModel

    body = toy_smpl_model(bone_rings=3)
    avatar = AvatarModel(
        body, VoxelTriplaneField(),
        SNARFDeformer(body, resolution=128, cano_pose="a_pose",
                      n_iters=6, cand_cap=2, n_init_active=4),
        n_steps=128, k_cap=8, grid_size=64,
        eval_n_steps=48, cache_n_cand=1, samples_per_ray=5.0)
    state = jax.jit(avatar.init)(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})

    transl = np.array([0.0, 0.15, 5.0], np.float32)
    near = float(np.linalg.norm(transl)) - 1
    far = float(np.linalg.norm(transl)) + 1

    @jax.jit
    def body_grid(state):
        from instantavatar_tpu.render.density_grid import make_grid_state
        dstate = avatar._prepare(
            state.deformer_cano,
            {"betas": jnp.zeros((10,)), "body_pose": jnp.zeros((69,)),
             "global_orient": jnp.zeros((3,)),
             "transl": jnp.asarray(transl)})
        aabb = avatar.deformer.bbox_deformed(dstate)
        g = make_grid_state(aabb, avatar.grid_size)
        G = avatar.grid_size
        idx = (jnp.arange(G) + 0.5) / G
        zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
        pts = (jnp.stack([zz, yy, xx], -1).reshape(-1, 3)
               * (aabb[1] - aabb[0]) + aabb[0])
        d = jnp.linalg.norm(
            pts[:, None] - dstate.verts_smpl[None], axis=-1).min(1)
        return g._replace(occupancy=(d < 0.08).reshape(G, G, G))

    grid = body_grid(state)
    np.asarray(grid.occupancy)
    return avatar, state, grid, transl, near, far


def band_batch(y0: int, h: int, transl, near, far):
    """A batch for image rows [y0, y0+h) of the H_PAD x W frame, with the
    pinhole basis pre-shifted exactly as DPFrameRenderer shifts each
    band's basis."""
    from instantavatar_tpu.data.rays import make_ray_basis, make_ray_grid
    K = np.array([[2000.0, 0, W / 2], [0, 2000.0, H_PAD / 2], [0, 0, 1]])
    ro, rd = make_ray_grid(K, np.eye(4), H_PAD, W)
    b = make_ray_basis(K, np.eye(4))
    basis = np.stack([b[0], b[1] + y0 * b[3], b[2], b[3]])
    n = h * W
    return {
        "rays_o": ro.reshape(H_PAD, W, 3)[y0:y0 + h].reshape(-1, 3),
        "rays_d": rd.reshape(H_PAD, W, 3)[y0:y0 + h].reshape(-1, 3),
        "ray_basis": basis,
        "near": np.full((n,), near, np.float32),
        "far": np.full((n,), far, np.float32),
        "bg_color": np.ones((n, 3), np.float32),
        "betas": np.zeros((10,), np.float32),
        "body_pose": np.zeros((69,), np.float32),
        "global_orient": np.zeros((3,), np.float32),
        "transl": transl,
        "idx": np.int32(0),
    }


def stride_chip_batch(b: dict, c: int, p: int = 3, n_chip: int = N_CHIP):
    """Chip ``c``'s batch under the block-row round-robin layout
    (DPFrameRenderer layout="stride"): 5-row basis
    [o, b0 + c*p*by, bx, by, n_chip*by], scalar near/far, no ray
    tensors — the exact per-chip view of the sharded program."""
    basis = np.asarray(b["ray_basis"], np.float32)
    b5 = np.stack([basis[0], basis[1] + (c * p) * basis[3], basis[2],
                   basis[3], n_chip * basis[3]])
    out = {k: v for k, v in b.items()
           if k not in ("rays_o", "rays_d", "near", "far", "bg_color")}
    out["ray_basis"] = b5
    out["near"] = np.float32(np.min(b["near"]))
    out["far"] = np.float32(np.max(b["far"]))
    out["bg_color"] = np.ones(3, np.float32)
    return out


def shared_budget_session(avatar, state, grid, chip_batches, shape):
    """One RenderSession warmed over EVERY chip's batch: the session's
    high-water budget hints then equal the max-over-chips counts — the
    shared static budget the real SPMD program compiles with."""
    from instantavatar_tpu.train.model import RenderSession
    session = RenderSession()
    for cb in chip_batches:
        for _ in avatar.render_frames(state, [cb], chunk=32768, grid=grid,
                                      depth=1, image_shape=shape,
                                      session=session, payload="u8"):
            pass
    return session


def time_turntable(avatar, state, grid, batch, shape, n_frames=8,
                   session=None):
    """Steady-state per-frame seconds over a turntable (bake reused per
    pose — bench.py protocol).

    Warmup covers the FULL turntable, not just 2 frames: a later
    orientation can overflow the budgets learned on the first two,
    and the overflow re-render compiles a bigger program (~90 s
    through the tunnel) INSIDE the timed loop — the r4 battery's
    11.8 s/frame "single_chip_full" was exactly one such compile
    amortized over 8 frames. Pass 2 re-renders the same frames with
    settled budgets; the r4 steady-state bench.py number reproduces.

    payload="u8" matches bench.py's protocol exactly: the default f16
    payload fetches 3.5 MB/frame through the ~12-110 MB/s tunnel, which
    the depth-2 pipeline cannot hide — the first r5 battery run measured
    the single-chip reference at 634 ms/frame (460k rays/s) against
    bench.py's 158 ms (1.85M rays/s) purely from that fetch. Production
    hosts don't pay the tunnel at all; u8 (1/3 the bytes) is the
    protocol both numbers share."""
    from instantavatar_tpu.train.model import RenderSession
    session = session or RenderSession()
    frames = [{**batch, "global_orient":
               np.array([0.0, 2 * np.pi * i / n_frames, 0.0], np.float32)}
              for i in range(n_frames)]
    # warmup pass: compile + budget learning over every orientation
    for _ in avatar.render_frames(state, frames, chunk=32768,
                                  grid=grid, depth=2, image_shape=shape,
                                  session=session, payload="u8"):
        pass
    t0 = time.perf_counter()
    for out in avatar.render_frames(state, frames, chunk=32768, grid=grid,
                                    depth=2, image_shape=shape,
                                    session=session, payload="u8"):
        assert out["rgb"].shape[0] == shape[0] * shape[1]
    return (time.perf_counter() - t0) / n_frames


def build_trained(state_path: str, scene: str, train_frames: int = 60):
    """The trained 540px capsule avatar (quality_bench --save-state) —
    the honest per-band workload: real occupancy (38k cells), real
    transmittance-terminated spans."""
    import pickle

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from quality_bench import BONE_RINGS, make_flagship

    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data import AvatarDataset

    with open(state_path, "rb") as f:
        state = pickle.load(f)
    state = jax.device_put(state)  # the pickle is a 720 MB numpy pytree
    jax.block_until_ready(jax.tree.leaves(state))
    body = toy_smpl_model(bone_rings=BONE_RINGS)
    avatar = make_flagship(body, reduced=True, eval_sampling="flat")
    val = AvatarDataset(Path(scene) / "540px", "val",
                        start=train_frames, end=train_frames)
    b = {k: v for k, v in val[0].items() if k not in ("rgb", "alpha")}
    grid = avatar.build_test_grid(state, b)
    np.asarray(grid.occupancy)
    return avatar, state, grid, b


def trained_band_batch(b: dict, y0: int, h: int):
    """Basis-only batch for rows [y0, y0+h): b0' = b0 + y0*by, scalar
    near/far — exactly the per-band view DPFrameRenderer shards, without
    materializing ray tensors (the fused program reconstructs them
    in-jit since r5)."""
    basis = np.asarray(b["ray_basis"], np.float32)
    shifted = np.stack([basis[0], basis[1] + y0 * basis[3],
                        basis[2], basis[3]])
    out = {k: v for k, v in b.items()
           if k not in ("rays_o", "rays_d", "near", "far", "bg_color")}
    out["ray_basis"] = shifted
    out["near"] = np.float32(np.min(b["near"]))
    out["far"] = np.float32(np.max(b["far"]))
    out["bg_color"] = np.ones(3, np.float32)
    return out


def measure_stride(avatar, state, grid, b, t_full, tag: str) -> None:
    """The block-row round-robin per-chip program (layout="stride"): warm
    one session over all N_CHIP chip batches (shared budget = max over
    chips), then time one chip — static shapes make every chip's
    wall-clock identical."""
    chips = [stride_chip_batch(b, c) for c in range(N_CHIP)]
    shape = (H_BAND, W)
    session = shared_budget_session(avatar, state, grid, chips, shape)
    t_chip = time_turntable(avatar, state, grid, chips[N_CHIP // 2],
                            shape, session=session)
    print(json.dumps({"event": f"{tag}_per_chip_stride",
                      "band_rows": H_BAND,
                      "ms_per_frame": round(t_chip * 1e3, 1)}), flush=True)
    fps = 1.0 / t_chip
    rays = H_FULL * W * fps
    print(json.dumps({
        "event": f"{tag}_projection_8chip_stride",
        "fps_540px": round(fps, 2),
        "rays_per_sec": round(rays),
        "vs_target_30fps": round(rays / TARGET, 4),
        "scaling_efficiency": round(t_full / (N_CHIP * t_chip), 3),
        "note": "block-row round-robin layout; shared budget warmed over "
                "all 8 chip batches; 552-row padding + replicated bake + "
                "per-chip prepass charged; measured on one real chip "
                "running the exact per-chip program",
    }), flush=True)


def run_trained(state_path: str, scene: str,
                skip_band: bool = False) -> None:
    avatar, state, grid, b = build_trained(state_path, scene)
    full = trained_band_batch(b, 0, H_FULL)
    t_full = time_turntable(avatar, state, grid, full, (H_FULL, W))
    print(json.dumps({"event": "trained_single_chip_full",
                      "ms_per_frame": round(t_full * 1e3, 1),
                      "rays_per_sec": round(H_FULL * W / t_full)}),
          flush=True)
    if not skip_band:
        y0 = (N_CHIP // 2 - 1) * H_BAND
        band = trained_band_batch(b, y0, H_BAND)
        t_band = time_turntable(avatar, state, grid, band, (H_BAND, W))
        print(json.dumps({"event": "trained_per_chip_band",
                          "band_rows": H_BAND,
                          "ms_per_frame": round(t_band * 1e3, 1)}),
              flush=True)
        fps = 1.0 / t_band
        rays = H_FULL * W * fps
        print(json.dumps({
            "event": "trained_projection_8chip",
            "fps_540px": round(fps, 2),
            "rays_per_sec": round(rays),
            "vs_target_30fps": round(rays / TARGET, 4),
            "scaling_efficiency": round(t_full / (N_CHIP * t_band), 3),
            "note": "trained 540px capsule avatar (quality_bench state); "
                    "552-row padding + replicated bake + band prepass "
                    "charged; measured on one real chip running the exact "
                    "per-band program",
        }), flush=True)
    measure_stride(avatar, state, grid, b, t_full, "trained")


def main() -> None:
    skip_band = "--skip-band" in sys.argv
    if skip_band:
        sys.argv.remove("--skip-band")
    if "--trained" in sys.argv:
        i = sys.argv.index("--trained")
        state_path = (sys.argv[i + 1] if len(sys.argv) > i + 1
                      else "/tmp/measure_r5/trained_540.pkl")
        run_trained(state_path, "/tmp/quality_scene", skip_band=skip_band)
        return
    avatar, state, grid, transl, near, far = build()

    # 1. full-frame single-chip reference (the bench.py number, at the
    #    same session/turntable protocol)
    full = band_batch(0, H_PAD, transl, near, far)
    # measure the true 540-row frame as bench.py does (H_PAD rows would
    # overstate the single-chip cost); rebuild at exact protocol size
    from instantavatar_tpu.data.rays import make_ray_basis, make_ray_grid
    K = np.array([[2000.0, 0, W / 2], [0, 2000.0, H_FULL / 2], [0, 0, 1]])
    ro, rd = make_ray_grid(K, np.eye(4), H_FULL, W)
    n = H_FULL * W
    full540 = {**full,
               "rays_o": ro.reshape(-1, 3), "rays_d": rd.reshape(-1, 3),
               "ray_basis": make_ray_basis(K, np.eye(4)),
               "near": np.full((n,), near, np.float32),
               "far": np.full((n,), far, np.float32),
               "bg_color": np.ones((n, 3), np.float32)}
    t_full = time_turntable(avatar, state, grid, full540, (H_FULL, W))
    print(json.dumps({"event": "single_chip_full",
                      "ms_per_frame": round(t_full * 1e3, 1),
                      "rays_per_sec": round(n / t_full)}), flush=True)

    if not skip_band:
        # 2. the per-chip band program: center band (drives the shared
        #    budget), full replicated bake, band prepass
        y0 = (N_CHIP // 2 - 1) * H_BAND      # rows 207..276 (body center)
        band = band_batch(y0, H_BAND, transl, near, far)
        t_band = time_turntable(avatar, state, grid, band, (H_BAND, W))
        print(json.dumps({"event": "per_chip_band",
                          "band_rows": H_BAND,
                          "ms_per_frame": round(t_band * 1e3, 1)}),
              flush=True)

        # 3. the measured 8-chip projection: every chip runs the band
        #    program in lockstep (static shapes), frame time == band time
        fps = 1.0 / t_band
        rays = H_FULL * W * fps               # delivered 540px rays
        print(json.dumps({
            "event": "projection_8chip",
            "fps_540px": round(fps, 2),
            "rays_per_sec": round(rays),
            "vs_target_30fps": round(rays / TARGET, 4),
            "scaling_efficiency": round(t_full / (N_CHIP * t_band), 3),
            "note": "552-row padding + replicated bake + band prepass "
                    "charged; measured on one real chip running the exact "
                    "per-band program",
        }), flush=True)

    # 4. the stride (block-row round-robin) per-chip program — the
    #    production DPFrameRenderer default since r5
    measure_stride(avatar, state, grid, full, t_full, "toy")


if __name__ == "__main__":
    main()
