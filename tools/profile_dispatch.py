"""Measure axon-tunnel dispatch/readback overheads + the remaining
hot-path pieces that profile_render.py didn't get to.

Questions:
  1. RTT of a trivial dispatch + host readback (the per-dispatch floor).
  2. Can chained async dispatches hide the tunnel latency? (time N
     enqueues + ONE final readback vs N dispatch+readback pairs)
  3. refine_from_cache / net_apply / broyden / prepass / bake timings.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def readback(x):
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def main():
    print(f"devices: {jax.devices()}")

    # 1. trivial dispatch + readback RTT
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros(())
    readback(tiny(x))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        x = tiny(x)
        readback(x)
    rtt = (time.perf_counter() - t0) / n
    print(f"dispatch+readback RTT: {rtt*1e3:.2f} ms")

    # 2. chained dispatches, one readback
    x = jnp.zeros(())
    readback(tiny(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = x
        for _ in range(n):
            y = tiny(y)
        readback(y)
    chain = (time.perf_counter() - t0) / (reps * n)
    print(f"chained dispatch (1 readback per {n}): {chain*1e3:.2f} ms/op")

    # 2b. medium-size compute chained: does enqueue rate bottleneck?
    @jax.jit
    def med(x):
        return jnp.tanh(x @ x)

    m = jnp.eye(512)
    readback(med(m))
    t0 = time.perf_counter()
    y = m
    for _ in range(n):
        y = med(y)
    readback(y)
    print(f"chained 512-matmul dispatches: "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms/op")

    # 3. remaining hot-path pieces
    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.models import VoxelTriplaneField

    body = toy_smpl_model()
    field = VoxelTriplaneField()
    deformer = SNARFDeformer(body, resolution=128, cano_pose="a_pose",
                             n_iters=6, cand_cap=2, n_init_active=4)
    cano = jax.jit(deformer.build_canonical)(jnp.zeros((1, 10)))
    frame = jax.jit(deformer.prepare)(cano, jnp.zeros((1, 10)),
                                      jnp.zeros((1, 69)),
                                      jnp.zeros((1, 3)),
                                      jnp.asarray([[0.0, 0.15, 5.0]]))
    fp = field.init(jax.random.PRNGKey(0))
    center = jnp.zeros(3)
    scale = jnp.ones(3) * 1.3

    def timeit(fn, *args, iters=5):
        for _ in range(2):
            readback(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            readback(fn(*args))
        return (time.perf_counter() - t0) / iters - rtt

    key = jax.random.PRNGKey(1)
    Mk = 16384 * 8
    pts = jax.random.uniform(key, (Mk, 3)) * 0.8 - 0.4


    net_fn = jax.jit(lambda x: field.apply(fp, x, center, scale)[1].sum())
    big = jnp.tile(pts, (2, 1))
    print(f"net_apply 262k pts: {timeit(net_fn, big)*1e3:.2f} ms")
    print(f"net_apply 131k pts: {timeit(net_fn, pts)*1e3:.2f} ms")

    s_fn = jax.jit(lambda p: deformer.search(cano, frame, p)[0].sum())
    print(f"broyden search 131k: {timeit(s_fn, pts)*1e3:.2f} ms")

    b_fn = jax.jit(lambda p: deformer.bake_packed_cache(cano, frame,
                                                        p).sum())
    cells = jax.random.uniform(key, (32768, 3)) * 0.8 - 0.4
    print(f"bake_packed 32768 cells: {timeit(b_fn, cells)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
