"""Micro-profile of the novel-view render hot path on the real TPU.

Times each sub-computation of the cached-warp eval path in isolation
(jitted, honest host readback, amortized over >=5 iters per PERF.md
methodology) to locate where the per-chunk milliseconds go. Run on the
real chip: python tools/profile_render.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

H = W = 540
CHUNK = 16384


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    r0 = jax.tree.leaves(r)[0]
    _ = float(jnp.asarray(r0).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        r0 = jax.tree.leaves(r)[0]
        _ = float(jnp.asarray(r0).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data.rays import make_ray_grid
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField
    from instantavatar_tpu.render.density_grid import (make_grid_state,
                                                       occupancy_lookup)
    from instantavatar_tpu.render.raymarcher import compact_samples
    from instantavatar_tpu.train import AvatarModel

    print(f"devices: {jax.devices()}")
    body = toy_smpl_model()
    field = VoxelTriplaneField()
    deformer = SNARFDeformer(body, resolution=128, cano_pose="a_pose",
                             n_iters=6, cand_cap=2, n_init_active=4)
    avatar = AvatarModel(body, field, deformer, n_steps=128, k_cap=8,
                         grid_size=64)
    state = jax.jit(avatar.init)(jax.random.PRNGKey(0), jnp.zeros((1, 10)))

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
    }

    # body-shaped grid like bench.py
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
        return g._replace(occupancy=(d < 0.1).reshape(G, G, G)), dstate

    grid, dstate = body_grid(state)
    np.asarray(grid.occupancy)
    n_occ = int(np.asarray(grid.occupancy).sum())
    print(f"occupied cells: {n_occ}")

    M = CHUNK * 128  # dense samples per chunk at n_steps=128
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (M, 3)) \
        * (grid.aabb[1] - grid.aabb[0]) + grid.aabb[0]

    # 1. occupancy gather (uint8 64^3 table)
    occ_fn = jax.jit(lambda p: occupancy_lookup(grid, p).sum())
    print(f"occupancy gather {M/1e6:.1f}M rows: "
          f"{timeit(occ_fn, pts)*1e3:.2f} ms")

    M2 = CHUNK * 64
    print(f"occupancy gather {M2/1e6:.1f}M rows: "
          f"{timeit(occ_fn, pts[:M2])*1e3:.2f} ms")

    # 1b. wide packed row gather (G^3, 26) f32
    packed = jax.random.normal(key, (64 ** 3, 26))
    idxs = jax.random.randint(key, (M,), 0, 64 ** 3)
    take_fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    print(f"packed-26f32 gather {M/1e6:.1f}M rows: "
          f"{timeit(take_fn, packed, idxs)*1e3:.2f} ms")
    print(f"packed-26f32 gather {M2/1e6:.1f}M rows: "
          f"{timeit(take_fn, packed, idxs[:M2])*1e3:.2f} ms")

    # 2. compaction
    valid = jax.random.bernoulli(key, 0.1, (CHUNK, 128))
    comp = jax.jit(lambda v: compact_samples(v, 8)[0].sum())
    print(f"compact (16k,128)->8: {timeit(comp, valid)*1e3:.2f} ms")
    valid2 = jax.random.bernoulli(key, 0.2, (CHUNK, 64))
    print(f"compact (16k,64)->8: {timeit(comp, valid2)*1e3:.2f} ms")

    # 3. packed cache bake + cached-Newton field path
    Mk = CHUNK * 8
    xd = pts[:Mk]
    cells32 = pts[:32768]
    bake_fn = jax.jit(lambda c: avatar.deformer.bake_packed_cache(
        state.deformer_cano, dstate, c).sum())
    print(f"bake_packed 32768 cells: "
          f"{timeit(bake_fn, cells32)*1e3:.2f} ms")

    # 4. net eval
    fp = state.params["field"]
    net_fn = jax.jit(lambda x: field.apply(fp, x, state.center,
                                           state.scale)[1].sum())
    xin = pts[:Mk * 2]
    print(f"net_apply 262k pts: {timeit(net_fn, xin)*1e3:.2f} ms")
    print(f"net_apply 131k pts: {timeit(net_fn, xin[:Mk])*1e3:.2f} ms")

    # 5. full Broyden search (for reference)
    s_fn = jax.jit(lambda p: deformer.search(state.deformer_cano, dstate,
                                             p)[0].sum())
    print(f"broyden search 131k pts: {timeit(s_fn, pts[:Mk])*1e3:.2f} ms")

    # 6. fused frame jit, timed two ways: synchronous single frame, and
    # pipelined steady state
    from instantavatar_tpu.train.model import RenderSession
    sess = RenderSession()
    avatar.render_frame(state, batch, chunk=CHUNK, grid=grid, session=sess)
    t0 = time.perf_counter()
    for _ in range(3):
        avatar.render_frame(state, batch, chunk=CHUNK, grid=grid, session=sess)
    dt = (time.perf_counter() - t0) / 3
    print(f"sync frame: {dt*1e3:.1f} ms -> {H*W/dt/1e3:.0f}k rays/s")

    n_frames = 8
    t0 = time.perf_counter()
    for out in avatar.render_frames(state, [batch] * n_frames,
                                    chunk=CHUNK, grid=grid, depth=2,
                                    session=sess):
        pass
    dt = (time.perf_counter() - t0) / n_frames
    print(f"pipelined frame: {dt*1e3:.1f} ms -> {H*W/dt/1e3:.0f}k rays/s")


if __name__ == "__main__":
    main()
