"""Trained-avatar flat-render throughput (r5 diagnosis tool).

History: quality_bench's r5 budget table first measured the production
flat render at ~12k rays/s on the trained 540px capsule avatar while
bench.py measured 1.85M rays/s on the opaque-biased toy. The xplane
profile showed the DEVICE program at ~308 ms/frame — the 150x gap was
host-side, two stacked pathologies (both fixed):

  1. the state pytree loaded from --save-state's pickle is NUMPY (720 MB
     at the production config) — every dispatch re-uploaded the whole
     model through the remote-TPU tunnel (~8 s/frame). Fixed here with
     jax.device_put, and worth knowing for any tool that unpickles a
     state.
  2. the session cell-budget hint was CAPPED at self.cell_budget
     (G^3/8 = 32768), while the trained grid keeps 38228 occupied cells —
     a cell-overflow DOUBLE render (+ forced rebake) on every frame.
     Fixed in model.py: the hint may grow to G^3.

This tool measures the steady-state frame time on the trained state and
prints per-config JSON rows (f16 and u8 payloads, same-pose bake reuse).

Run on the real TPU after quality_bench --save-state:
  python tools/diag_trained_render.py --state /tmp/measure_r5/trained_540.pkl
"""
from __future__ import annotations

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from quality_bench import BONE_RINGS, make_flagship, psnr, masked_psnr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", type=str,
                    default="/tmp/measure_r5/trained_540.pkl")
    ap.add_argument("--scene", type=str, default="/tmp/quality_scene")
    ap.add_argument("--size", type=int, default=540)
    ap.add_argument("--train-frames", type=int, default=60)
    args = ap.parse_args()

    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data import AvatarDataset
    from instantavatar_tpu.train.model import RenderSession

    with open(args.state, "rb") as f:
        state = pickle.load(f)
    # the pickle holds a HOST (numpy) pytree — 720 MB at the production
    # config. Left as numpy, EVERY dispatch re-uploads all of it through
    # the remote-TPU tunnel (~8 s/frame measured r5, the root cause of
    # the 13k rays/s "trained avatar pathology"); pin it on device once.
    state = jax.device_put(state)
    jax.block_until_ready(jax.tree.leaves(state))

    val = AvatarDataset(Path(args.scene) / f"{args.size}px", "val",
                        start=args.train_frames, end=args.train_frames)
    gt = np.asarray(val[0]["rgb"], np.float32)
    mask = np.asarray(val[0]["alpha"], np.float32) > 0.5
    b = {k: v for k, v in val[0].items() if k not in ("rgb", "alpha")}

    body = toy_smpl_model(bone_rings=BONE_RINGS)
    avatar = make_flagship(body, reduced=True, eval_sampling="flat")

    def probe(name, payload="f16", spin=False, n_rep=6,
              eval_grid="density"):
        avatar.eval_grid = eval_grid
        sess = RenderSession()
        grid = (avatar.build_pose_grid(state, b)
                if eval_grid == "smpl_shell"
                else avatar.build_test_grid(state, b))
        occ_frac = float(np.asarray(grid.occupancy).mean())

        def batches(k):
            for i in range(k):
                if not spin:
                    yield b
                elif spin == "pose":
                    # pose-VARYING (animate.py workload): the warp-cache
                    # bake cannot be reused, so each frame pays a rebake
                    bi = dict(b)
                    bp = np.asarray(b["body_pose"], np.float32).copy()
                    bp[3] += 0.02 * (i + 1)
                    bi["body_pose"] = bp
                    yield bi
                else:
                    # turntable (novel_view workload): orientation spins,
                    # bake/grid reused via the pose-keyed frame memo
                    bi = dict(b)
                    bi["global_orient"] = np.asarray(
                        b["global_orient"], np.float32) \
                        + np.array([0, 0.1 * (i + 1), 0], np.float32)
                    yield bi

        outs = []
        # TWO warm waves: wave 1 learns the session budgets (and compiles
        # the prior-sized program); wave 2 compiles the budget-settled
        # program. A single wave left the settled program's ~2 min compile
        # inside the timed window (measured r5: 14.6 s/frame reported for
        # a 96 ms/frame steady state).
        for _ in range(2):
            for out in avatar.render_frames(
                    state, batches(2), chunk=32768, depth=2,
                    payload=payload, image_shape=(args.size, args.size),
                    session=sess):
                outs.append(out)
        t0 = time.perf_counter()
        for out in avatar.render_frames(state, batches(n_rep), chunk=32768,
                                        depth=2, payload=payload,
                                        image_shape=(args.size, args.size),
                                        session=sess):
            outs.append(out)
        dt = (time.perf_counter() - t0) / n_rep
        img = np.asarray(outs[-1]["rgb"]).reshape(gt.shape)
        rec = {
            "event": name,
            "occ_frac": round(occ_frac, 4),
            "n_occ_cells": int(np.asarray(grid.occupancy).sum()),
            "samp_budget": {str(k): v for k, v in sess.samp_budget.items()},
            "cell_budget": {str(k): v for k, v in sess.cell_budget.items()},
            "ms_per_frame": round(dt * 1e3, 1),
            "rays_per_sec": round(args.size ** 2 / dt),
            "fps": round(1.0 / dt, 2),
        }
        if not spin:  # spun frames don't match the fixed-view GT
            rec["psnr"] = round(psnr(img, gt), 2)
            rec["psnr_in_mask"] = round(masked_psnr(img, gt, mask), 2)
        print(json.dumps(rec), flush=True)
        return rec

    probe("flat_f16_same_pose")
    probe("flat_u8_same_pose", payload="u8")
    probe("flat_u8_turntable_spin", payload="u8", spin=True)
    probe("flat_u8_pose_varying", payload="u8", spin="pose")
    # smpl_shell eval grid (build_pose_grid): the same-pose row gates
    # quality (PSNR delta vs the density rows above), the pose-varying
    # row measures the animation-path speedup
    probe("shell_u8_same_pose", payload="u8", eval_grid="smpl_shell")
    probe("shell_u8_pose_varying", payload="u8", spin="pose",
          eval_grid="smpl_shell")


if __name__ == "__main__":
    main()
