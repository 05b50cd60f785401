"""Benchmark: novel-view rendering throughput on the flagship avatar.

Full production inference path on the real chip — Fast-SNARF Broyden
deform (res-128 voxel, bone-pruned inits) + the TPU-native voxel+triplane
canonical field (bf16 MLPs) + occupancy-masked march with per-ray
compaction + host ray pruning + single-dispatch chunked rendering — over a
540x540 pixel grid (the reference benchmark's render resolution,
bash/run-peoplesnapshot.sh downscale=2).

The occupancy grid is seeded from the posed body mesh (the reference's
smpl_init path, density_grid.py:53-75) so ray pruning and sample counts
match a *trained* avatar's workload rather than an untrained field's noise.
For the same reason the field's sigma head is biased to ~100 (opaque
body): a trained avatar is opaque, and the reference's composite_test
kernel early-outs each ray at T <= 1e-4 behind the surface
(raymarcher.cu:222-227) — with a transparent untrained field the
transmittance-terminated window selection (model.py) would march the full
body depth, a workload no trained avatar presents. The quality side of
this configuration is gated separately by tools/quality_bench.py's
budget table on an actually-trained scene.

Prints ONE JSON line: rays/sec with vs_baseline relative to the driver
target of 30 FPS @ 540px (= 8,748,000 rays/sec, BASELINE.md).

``--animation`` measures the pose-VARYING workload instead (the
animate.py protocol, /root/reference/animate.py:81-118): every frame has
a distinct body pose, so the per-pose warp-cache bake cannot be reused —
the row tracks the +bake/frame regression the turntable number hides
(VERDICT r3 weak #7). Still one JSON line, different metric name, so the
driver default contract is unchanged.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

H = W = 540
TARGET_RAYS_PER_SEC = H * W * 30.0  # 30 FPS @ 540px
CHUNK = 32768  # rays per chunk inside the fused frame jit


def main(animation: bool = False) -> None:
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data.rays import make_ray_grid
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField
    from instantavatar_tpu.render.density_grid import make_grid_state
    from instantavatar_tpu.train import AvatarModel
    from instantavatar_tpu.train.model import RenderSession

    import os
    # ablation knobs (perf A/B only). Unset means the PRODUCTION default:
    # shared-corner eval OFF, matching AvatarModel (measured negative on
    # v5e, commit 6973fbe — 1.59M vs 1.96M rays/s).
    shared_corner = os.environ.get("BENCH_SHARED_CORNER", "0") != "0"
    body = toy_smpl_model(bone_rings=3)
    avatar = AvatarModel(
        body, VoxelTriplaneField(),
        SNARFDeformer(body, resolution=128, cano_pose="a_pose",
                      n_iters=6, cand_cap=2, n_init_active=4),
        n_steps=128, k_cap=8, grid_size=64,
        eval_n_steps=48, cache_n_cand=1, samples_per_ray=5.0,
        shared_corner_eval=shared_corner)

    state = jax.jit(avatar.init)(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    # opaque-body workload: bias the sigma head so the field is opaque
    # like a trained avatar (see module docstring)
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})

    from instantavatar_tpu.data.rays import make_ray_basis
    K = np.array([[2000.0, 0, W / 2], [0, 2000.0, H / 2], [0, 0, 1]])
    rays_o, rays_d = make_ray_grid(K, np.eye(4), H, W)
    transl = np.array([0.0, 0.15, 5.0], np.float32)
    near = float(np.linalg.norm(transl)) - 1
    far = float(np.linalg.norm(transl)) + 1

    batch = {
        "rays_o": jnp.asarray(rays_o.reshape(-1, 3)),
        "rays_d": jnp.asarray(rays_d.reshape(-1, 3)),
        "near": jnp.full((H * W,), near),
        "far": jnp.full((H * W,), far),
        "bg_color": jnp.ones((H * W, 3)),
        "betas": jnp.zeros((10,)),
        "body_pose": jnp.zeros((69,)),
        "global_orient": jnp.zeros((3,)),
        "transl": jnp.asarray(transl),
        "idx": jnp.int32(0),
        "ray_basis": jnp.asarray(make_ray_basis(K, np.eye(4))),
    }

    # body-shaped occupancy (smpl_init-style) for a trained-like workload
    @jax.jit
    def body_grid(state):
        dstate = avatar._prepare(state.deformer_cano,
                                 {k: batch[k] for k in
                                  ("betas", "body_pose", "global_orient",
                                   "transl")})
        aabb = avatar.deformer.bbox_deformed(dstate)
        g = make_grid_state(aabb, avatar.grid_size)
        G = avatar.grid_size
        idx = (jnp.arange(G) + 0.5) / G
        zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
        pts = (jnp.stack([zz, yy, xx], -1).reshape(-1, 3)
               * (aabb[1] - aabb[0]) + aabb[0])
        d = jnp.linalg.norm(
            pts[:, None] - dstate.verts_smpl[None], axis=-1).min(1)
        # thin shell around the DENSE body verts: cell counts and
        # per-ray occupied spans match a trained avatar's grid
        # (a fat occupancy here overstates the render workload)
        return g._replace(occupancy=(d < 0.08).reshape(G, G, G))

    grid = body_grid(state)
    np.asarray(grid.occupancy)  # force

    # warm/compile: first frame learns the bake cell-budget hint, second
    # compiles the hint-sized program the timing loop will run (one
    # session spans warmup + timing so the learned budgets carry over)
    session = RenderSession()
    avatar.render_frame(state, batch, chunk=CHUNK, grid=grid,
                        image_shape=(H, W), session=session, payload="u8")
    avatar.render_frame(state, batch, chunk=CHUNK, grid=grid,
                        image_shape=(H, W), session=session, payload="u8")

    # steady-state NOVEL-VIEW throughput (the BASELINE.md 30 FPS metric):
    # turntable protocol — fixed body pose, global orientation spun per
    # frame (cli/novel_view.py). Orientation/translation cancel in the
    # world->SMPL transform, so the per-pose warp-cache bake is reused
    # across frames exactly as a real turntable render reuses it;
    # pose-varying ANIMATION pays +bake per frame (PERF.md).
    n_frames = 8
    if animation:
        # distinct body pose per frame (arm swing) -> the content-keyed
        # bake memo misses every frame, charging the full per-pose bake
        # exactly as cli/animate.py workloads do
        def pose(i):
            p = np.zeros((69,), np.float32)
            p[[45, 48]] = 0.3 * np.sin(2 * np.pi * i / n_frames)  # arms
            p[[46, 49]] = 0.2 * np.cos(2 * np.pi * i / n_frames)
            return jnp.asarray(p)
        frames = [{**batch, "body_pose": pose(i)} for i in range(n_frames)]
        # warm the distinct-pose program path (first pose compiled above
        # reused; bake branch of the cond now taken every frame)
        avatar.render_frame(state, frames[0], chunk=CHUNK, grid=grid,
                            image_shape=(H, W), session=session,
                            payload="u8")
    else:
        frames = [{**batch,
                   "global_orient": jnp.asarray(
                       [0.0, 2 * np.pi * i / n_frames, 0.0], jnp.float32)}
                  for i in range(n_frames)]
    t0 = time.perf_counter()
    for out in avatar.render_frames(state, frames,
                                    chunk=CHUNK, grid=grid, depth=2,
                                    image_shape=(H, W), session=session,
                                    payload="u8"):
        assert out["rgb"].shape == (H * W, 3)
    dt = (time.perf_counter() - t0) / n_frames

    rays_per_sec = H * W / dt
    print(json.dumps({
        "metric": ("render_rays_per_sec_540px_animation" if animation
                   else "render_rays_per_sec_540px"),
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / TARGET_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main(animation="--animation" in sys.argv[1:])
