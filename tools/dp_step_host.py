"""Host-term measurement for the 8-way ray-DP train step (VERDICT r4 #4).

The 60-second projection (PERF.md) is built from device-side step times
(tools/scaling_bench.py) plus an unquantified "+ host" term. This tool
pins that term down on the 8-device VIRTUAL CPU mesh — the same SPMD
program the real v5e-8 would run (shard_map over mesh axis "ray",
make_dp_train_step) — by timing the HOST-side stages separately from
device compute:

  * pack_ms     — DevicePrefetcher-style packing of one 4096-ray batch
                  into the one-blob transfer format;
  * shard_ms    — jax.device_put fan-out of the packed batch onto the
                  8-way NamedSharding (what the input pipeline pays);
  * dispatch_ms — enqueue cost of the jitted DP step (async dispatch
                  returns before compute; this is the per-step Python
                  overhead the TPU host would pay);
  * step_wall_ms— full blocking step (CPU compute; NOT comparable to
                  TPU device time — recorded only to show the host terms
                  are measured against a real executing program).

The CPU absolute compute time is meaningless for the projection; the
host terms are platform-independent Python/runtime costs and bound the
"+ host" term as long as the TPU host is not slower than this one.
A second check runs a 3-step overlapped loop (dispatch step i+1 before
blocking on i) and reports the amortized per-step host wall.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/dp_step_host.py
(The tool force-switches to the CPU backend itself; safe to run while
the TPU tunnel is busy.)
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np
import optax


def main() -> None:
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField
    from instantavatar_tpu.parallel.data_parallel import (make_dp_train_step,
                                                          make_mesh,
                                                          shard_batch)
    from instantavatar_tpu.train import AvatarModel

    n_dev = jax.device_count()
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev} (XLA_FLAGS)"

    body = toy_smpl_model()
    # REDUCED compute config: the production-size step (res-128 SNARF,
    # 128-step march) runs the 8 per-device programs SEQUENTIALLY on this
    # one-core host and XLA:CPU's 40 s collective-rendezvous termination
    # timer hard-aborts before the last device reaches the grad psum
    # (rendezvous.cc:127, measured 2026-08-19). The HOST terms this tool
    # exists to measure — batch pack, device_put fan-out, dispatch
    # enqueue — depend on the batch schema (identical: 4096 rays, same
    # leaves) and the pytree STRUCTURE, not on per-device FLOPs, so a
    # small field keeps them representative while the CPU step fits the
    # rendezvous window.
    avatar = AvatarModel(
        body, VoxelTriplaneField(voxel_res=32, plane_res=64),
        SNARFDeformer(body, resolution=32, cano_pose="a_pose",
                      n_iters=4, cand_cap=2, n_init_active=4),
        n_steps=32, k_cap=8, grid_size=32,
        noise_steps=0, optimizer=optax.adam(5e-3))
    state = jax.jit(avatar.init)(jax.random.PRNGKey(0), jnp.zeros((1, 10)))

    n_rays = 4096
    rng = np.random.default_rng(7)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.05 \
        + np.array([0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    host_batch = {
        "rays_o": np.zeros((n_rays, 3), np.float32)
        + np.array([0, 0.15, -5.0], np.float32),
        "rays_d": d,
        "near": np.full((n_rays,), 4.0, np.float32),
        "far": np.full((n_rays,), 6.0, np.float32),
        "rgb": rng.random((n_rays, 3), np.float32),
        "alpha": np.ones((n_rays,), np.float32),
        "bg_color": np.ones((n_rays, 3), np.float32),
        "betas": np.zeros((10,), np.float32),
        "body_pose": np.zeros((69,), np.float32),
        "global_orient": np.zeros((3,), np.float32),
        "transl": np.array([0.0, 0.15, 5.0], np.float32),
        "idx": np.int32(0),
    }

    mesh = make_mesh(n_ray=8, n_subject=1)
    with mesh:
        step = make_dp_train_step(avatar, mesh, with_grid_update=False)

        # warm/compile (includes the device_put path)
        sb = shard_batch(mesh, host_batch)
        st, losses = step(state, sb, jax.random.PRNGKey(1))
        jax.block_until_ready(st.params)

        # pack: the DevicePrefetcher one-blob format (float leaves
        # concatenated into one f32 vector) — the per-step numpy work
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            blob = np.concatenate(
                [np.asarray(v, np.float32).reshape(-1)
                 for v in host_batch.values()])
        pack_ms = (time.perf_counter() - t0) / reps * 1e3
        del blob

        # shard: device_put fan-out onto the 8-way sharding
        t0 = time.perf_counter()
        for _ in range(reps):
            sb = shard_batch(mesh, host_batch)
            jax.block_until_ready(sb)
        shard_ms = (time.perf_counter() - t0) / reps * 1e3

        # dispatch: async enqueue cost of the compiled DP step. Each
        # dispatch is timed INDIVIDUALLY against an empty queue (block
        # first): on the 1-core CPU backend a back-to-back loop fills the
        # in-flight pipeline and the enqueue blocks on compute, reporting
        # compute time as "dispatch" (first run read 59 ms). min = the
        # clean enqueue; median guards against a lucky outlier.
        times = []
        out = None
        for i in range(reps):
            if out is not None:
                jax.block_until_ready(out[0].params)
            t0 = time.perf_counter()
            out = step(state, sb, jax.random.PRNGKey(i))
            times.append(time.perf_counter() - t0)
        jax.block_until_ready(out[0].params)
        times_ms = sorted(t * 1e3 for t in times)
        dispatch_ms = times_ms[0]
        dispatch_med_ms = times_ms[len(times_ms) // 2]

        # full blocking step (CPU compute — context only)
        t0 = time.perf_counter()
        st, losses = step(state, sb, jax.random.PRNGKey(2))
        wall_ms = (time.perf_counter() - t0) * 1e3
        _ = float(losses["loss"])

        # overlapped loop: shard + dispatch i+1 while i computes
        t0 = time.perf_counter()
        n_loop = 3
        prev = None
        for i in range(n_loop):
            sb_i = shard_batch(mesh, host_batch)
            cur = step(state, sb_i, jax.random.PRNGKey(i))
            if prev is not None:
                jax.block_until_ready(prev[0].params)
            prev = cur
        jax.block_until_ready(prev[0].params)
        loop_ms = (time.perf_counter() - t0) / n_loop * 1e3

    print(json.dumps({
        "mesh": "1x8 (subject, ray), virtual CPU",
        "rays_per_chip": n_rays // 8,
        "pack_ms": round(pack_ms, 2),
        "shard_ms": round(shard_ms, 2),
        "dispatch_ms": round(dispatch_ms, 2),
        "dispatch_median_ms": round(dispatch_med_ms, 2),
        "host_term_ms": round(pack_ms + shard_ms + dispatch_ms, 2),
        "step_wall_ms_cpu": round(wall_ms, 1),
        "overlapped_loop_ms_cpu": round(loop_ms, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
