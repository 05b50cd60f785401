"""Why is the flat render slow on a TRAINED avatar? (r5 finding)

quality_bench's r5 budget table measured the production flat render at
~12k rays/s on the trained 540px capsule avatar while bench.py measures
1.85M rays/s on the opaque-biased toy — a 150x gap with no overflow
warnings. This tool loads the trained state quality_bench saved
(--save-state) and dissects one val frame:

  * test-grid occupancy fraction (fat grid => every block survives the
    prepass);
  * n_occ (occupied cells baked) and n_hit (kept block samples) from the
    frame report vs the samp_budget the session settled at;
  * per-frame wall time at each candidate fix (term_T, grid threshold).

Run on the real TPU after quality_bench:
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

    val = AvatarDataset(Path(args.scene) / f"{args.size}px", "val",
                        start=args.train_frames, end=args.train_frames)
    gt = np.asarray(val[0]["rgb"], np.float32)
    mask = np.asarray(val[0]["alpha"], np.float32) > 0.5
    b = {k: v for k, v in val[0].items() if k not in ("rgb", "alpha")}

    body = toy_smpl_model(bone_rings=BONE_RINGS)

    def probe(name, **overrides):
        avatar = make_flagship(body, reduced=True, eval_sampling="flat")
        for k, v in overrides.items():
            setattr(avatar, k, v)
        sess = RenderSession()
        # test-grid stats (the same grid render_frame builds per frame)
        st = state
        grid = avatar.build_test_grid(st, b)
        occ_frac = float(np.asarray(grid.occupancy).mean())
        # warm 2, time 3
        outs = []
        for out in avatar.render_frames(st, [b] * 2, chunk=32768, depth=2,
                                        image_shape=(args.size, args.size),
                                        session=sess):
            outs.append(out)
        t0 = time.perf_counter()
        n_rep = 3
        for out in avatar.render_frames(st, [b] * n_rep, chunk=32768,
                                        depth=2,
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
            "psnr": round(psnr(img, gt), 2),
            "psnr_in_mask": round(masked_psnr(img, gt, mask), 2),
        }
        print(json.dumps(rec), flush=True)
        return rec

    probe("bench_flat_asis")
    # candidate fixes, cheapest first
    probe("term_T_1e-4", term_T=1e-4)          # reference early-out parity
    probe("term_T_1e-3", term_T=1e-3)


if __name__ == "__main__":
    main()
