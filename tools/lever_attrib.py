"""Lever-by-lever attribution of the r3/r4 render throughput
(VERDICT r3 item 7): re-run the bench.py turntable with each lever
toggled off, so PERF.md's journey table carries measured attribution
instead of narrative.

Levers:
  * term_T       — transmittance-terminated window selection
                   (off: term_T=None, selection keeps the full occupied
                   span per ray);
  * ray_basis    — computed pixel dirs from the pinhole generator
                   (off: drop the basis, gather od rows per sample);
  * bake_reuse   — cross-frame bake memo on the turntable
                   (off: fresh RenderSession per frame);
  * all three off = the r2 configuration.

Run on the real TPU:  python tools/lever_attrib.py
Outputs one JSON line per configuration.
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

H = W = 540
CHUNK = 32768


def build(term_T):
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField
    from instantavatar_tpu.train import AvatarModel

    body = toy_smpl_model(bone_rings=3)
    avatar = AvatarModel(
        body, VoxelTriplaneField(),
        SNARFDeformer(body, resolution=128, cano_pose="a_pose",
                      n_iters=6, cand_cap=2, n_init_active=4),
        n_steps=128, k_cap=8, grid_size=64, term_T=term_T,
        eval_n_steps=48, cache_n_cand=1, samples_per_ray=5.0)
    state = jax.jit(avatar.init)(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})
    return avatar, state, body


def main() -> None:
    from instantavatar_tpu.data.rays import make_ray_basis, make_ray_grid
    from instantavatar_tpu.render.density_grid import make_grid_state
    from instantavatar_tpu.train.model import RenderSession

    K = np.array([[2000.0, 0, W / 2], [0, 2000.0, H / 2], [0, 0, 1]])
    rays_o, rays_d = make_ray_grid(K, np.eye(4), H, W)
    transl = np.array([0.0, 0.15, 5.0], np.float32)
    near = float(np.linalg.norm(transl)) - 1
    far = float(np.linalg.norm(transl)) + 1
    base = {
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
    basis = jnp.asarray(make_ray_basis(K, np.eye(4)))

    def grid_for(avatar, state, batch):
        @jax.jit
        def body_grid(state):
            dstate = avatar._prepare(
                state.deformer_cano,
                {k: batch[k] for k in ("betas", "body_pose",
                                       "global_orient", "transl")})
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
        g = body_grid(state)
        np.asarray(g.occupancy)
        return g

    def run(name, term_T, with_basis, reuse_bake):
        avatar, state, _ = build(term_T)
        batch = dict(base)
        if with_basis:
            batch["ray_basis"] = basis
        grid = grid_for(avatar, state, batch)
        n_frames = 8
        frames = [{**batch, "global_orient": jnp.asarray(
            [0.0, 2 * np.pi * i / n_frames, 0.0], jnp.float32)}
            for i in range(n_frames)]
        session = RenderSession()
        # warm: compiles + budget learning
        avatar.render_frame(state, batch, chunk=CHUNK, grid=grid,
                            image_shape=(H, W), session=session)
        avatar.render_frame(state, batch, chunk=CHUNK, grid=grid,
                            image_shape=(H, W), session=session)
        t0 = time.perf_counter()
        if reuse_bake:
            for out in avatar.render_frames(state, frames, chunk=CHUNK,
                                            grid=grid, depth=2,
                                            image_shape=(H, W),
                                            session=session):
                pass
        else:
            # fresh session per frame: no bake memo, budgets re-learned
            # once then warm via the shared warm session's budgets is NOT
            # available -> carry budgets via a copied session each frame
            for f in frames:
                s = RenderSession()
                s.cell_budget = dict(session.cell_budget)
                s.samp_budget = dict(session.samp_budget)
                avatar.render_frame(state, f, chunk=CHUNK, grid=grid,
                                    image_shape=(H, W), session=s)
        dt = (time.perf_counter() - t0) / n_frames
        print(json.dumps({"config": name,
                          "rays_per_sec": round(H * W / dt)}), flush=True)

    run("head (all levers)", 1e-5, True, True)
    run("no term_T", None, True, True)
    run("no ray_basis", 1e-5, False, True)
    run("no bake_reuse", 1e-5, True, False)
    run("r2 config (none)", None, False, False)


if __name__ == "__main__":
    main()
