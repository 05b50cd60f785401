"""On-device HLO-op breakdown of the fused frame render via jax.profiler
xplane traces (PERF.md recipe: parse with tensorflow.tsl xplane_pb2 under
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python; the tbp converter is
version-broken here).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python
tools/profile_xplane.py [bench|train]
"""
from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def trace_and_aggregate(fn, tag: str, top: int = 30):
    """Run fn() under a profiler trace; print the top HLO ops by total
    device time."""
    tmpdir = f"/tmp/xplane_{tag}"
    os.system(f"rm -rf {tmpdir}")
    jax.profiler.start_trace(tmpdir)
    fn()
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {tmpdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    total_by_op = defaultdict(float)
    dev_total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name or "SparseCore" in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                dur = ev.duration_ps / 1e9  # ms
                name = meta.name
                total_by_op[name] += dur
                dev_total += dur
    print(f"\n== {tag}: device total {dev_total:.1f} ms over "
          f"{len(total_by_op)} distinct ops ==")
    for name, ms in sorted(total_by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:8.2f} ms  {name[:110]}")
    # category rollup: opcode = text up to first '.' / '(' in the lhs name
    cats = defaultdict(float)
    for name, ms in total_by_op.items():
        m = re.match(r"%?([a-zA-Z_-]+)", name)
        cats[m.group(1) if m else name[:20]] += ms
    print("  -- by category --")
    for name, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:8.2f} ms  {name}")


def main():
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data.rays import make_ray_grid
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField
    from instantavatar_tpu.render.density_grid import make_grid_state
    from instantavatar_tpu.train import AvatarModel

    H = W = 540
    body = toy_smpl_model(bone_rings=3)
    avatar = AvatarModel(
        body, VoxelTriplaneField(),
        SNARFDeformer(body, resolution=128, cano_pose="a_pose",
                      n_iters=6, cand_cap=2, n_init_active=4),
        n_steps=128, k_cap=8, grid_size=64,
        eval_n_steps=48, cache_n_cand=1, samples_per_ray=5.0)
    state = jax.jit(avatar.init)(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    # opaque-body sigma bias: match bench.py's trained-avatar workload so
    # the profile explains the bench number (transmittance termination
    # only engages when the field is opaque)
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})

    from instantavatar_tpu.data.rays import make_ray_basis
    K = np.array([[2000.0, 0, W / 2], [0, 2000.0, H / 2], [0, 0, 1]])
    rays_o, rays_d = make_ray_grid(K, np.eye(4), H, W)
    transl = np.array([0.0, 0.15, 5.0], np.float32)
    d = float(np.linalg.norm(transl))
    batch = {
        "rays_o": jnp.asarray(rays_o.reshape(-1, 3)),
        "rays_d": jnp.asarray(rays_d.reshape(-1, 3)),
        "near": jnp.full((H * W,), d - 1), "far": jnp.full((H * W,), d + 1),
        "bg_color": jnp.ones((H * W, 3)),
        "betas": jnp.zeros((10,)), "body_pose": jnp.zeros((69,)),
        "global_orient": jnp.zeros((3,)), "transl": jnp.asarray(transl),
        "idx": jnp.int32(0),
        "ray_basis": jnp.asarray(make_ray_basis(K, np.eye(4))),
    }

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
        dd = jnp.linalg.norm(
            pts[:, None] - dstate.verts_smpl[None], axis=-1).min(1)
        return g._replace(occupancy=(dd < 0.08).reshape(G, G, G))

    grid = body_grid(state)
    np.asarray(grid.occupancy)

    mode = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if mode == "train":
        # 4096-ray patch-batch training step (k32/n128 flagship train)
        avatar2 = AvatarModel(
            body, avatar.field, avatar.deformer,
            n_steps=128, k_cap=32, grid_size=64, noise_steps=0)
        n_rays = 4096
        tb = {
            "rays_o": batch["rays_o"][:n_rays],
            "rays_d": batch["rays_d"][:n_rays],
            "near": batch["near"][:n_rays], "far": batch["far"][:n_rays],
            "rgb": jnp.ones((n_rays, 3)) * 0.5,
            "alpha": jnp.ones((n_rays,)) * 0.5,
            "bg_color": jnp.ones((n_rays, 3)),
            "betas": batch["betas"], "body_pose": batch["body_pose"],
            "global_orient": batch["global_orient"],
            "transl": batch["transl"], "idx": batch["idx"],
        }
        st, _ = avatar2.train_step(state, tb, jax.random.PRNGKey(0))
        jax.block_until_ready(st.params)

        def run():
            s2, losses = avatar2.train_step(state, tb, jax.random.PRNGKey(1))
            _ = float(losses["loss"])

        trace_and_aggregate(run, "train_step")
        return

    # warm compile (twice: the 2nd compiles the cell-budget-hint program)
    from instantavatar_tpu.train.model import RenderSession
    sess = RenderSession()
    avatar.render_frame(state, batch, chunk=32768, grid=grid, image_shape=(H, W), session=sess)
    avatar.render_frame(state, batch, chunk=32768, grid=grid, image_shape=(H, W), session=sess)

    def run():
        out = avatar.render_frame(state, batch, chunk=32768, grid=grid, image_shape=(H, W), session=sess)
        _ = out["rgb"][0]

    trace_and_aggregate(run, "fused_frame")


if __name__ == "__main__":
    main()
