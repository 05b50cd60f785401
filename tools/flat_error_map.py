"""Where does the flat render's PSNR gap live? (r4: flat reads ~1.6-2 dB
below the dense render on the same trained state.)

Loads a trained state (quality_bench --save-state), renders one val
frame with the dense and flat paths, and decomposes |flat - dense| into
silhouette-EDGE pixels vs interior pixels. If the gap concentrates at
edges, the cause is the p x p block sharing of windows/termination
(edge pixels inherit the block's depth); if it is uniform, the cause is
the stream math itself.

Run on the real TPU:
  python tools/flat_error_map.py --state /tmp/measure_r4b/trained_540.pkl
"""
from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from quality_bench import BONE_RINGS, make_flagship, psnr, render_val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--scene", type=str, default="/tmp/quality_scene")
    ap.add_argument("--size", type=int, default=540)
    ap.add_argument("--train-frames", type=int, default=60)
    ap.add_argument("--out", type=str, default="/tmp/flat_err")
    args = ap.parse_args()

    import cv2

    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data import AvatarDataset

    root = Path(args.scene) / f"{args.size}px"
    val = AvatarDataset(root, "val", start=args.train_frames,
                        end=args.train_frames)
    gt = np.asarray(val[0]["rgb"], np.float32)
    with open(args.state, "rb") as f:
        state = pickle.load(f)

    body = toy_smpl_model(bone_rings=BONE_RINGS)
    H = W = args.size
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    imgs = {}
    for name, sampling in [("dense", "dense"), ("flat", "flat")]:
        av = make_flagship(body, reduced=False, eval_sampling=sampling)
        imgs[name] = render_val(av, state, val, args.size)[0] \
            .reshape(H, W, 3)
        cv2.imwrite(str(out_dir / f"{name}.png"),
                    (np.clip(imgs[name], 0, 1) * 255).astype(np.uint8))

    msk = (np.asarray(val[0]["alpha"], np.float32)
           .reshape(H, W) > 0.5).astype(np.uint8)
    edge = (cv2.dilate(msk, np.ones((7, 7), np.uint8))
            - cv2.erode(msk, np.ones((7, 7), np.uint8))) > 0
    err = np.abs(imgs["flat"] - imgs["dense"]).mean(-1)
    cv2.imwrite(str(out_dir / "err.png"),
                (np.clip(err * 8, 0, 1) * 255).astype(np.uint8))
    inter = (msk > 0) & ~edge
    outb = (msk == 0) & ~edge
    report = {
        "psnr_dense_vs_gt": round(psnr(imgs["dense"], gt), 2),
        "psnr_flat_vs_gt": round(psnr(imgs["flat"], gt), 2),
        "mean_abs_flat_vs_dense": {
            "edge_band": round(float(err[edge].mean()), 5),
            "body_interior": round(float(err[inter].mean()), 5),
            "background": round(float(err[outb].mean()), 5),
        },
        "err_mass_at_edges": round(
            float(err[edge].sum() / max(err.sum(), 1e-9)), 3),
        "edge_px_frac": round(float(edge.mean()), 4),
        "out_dir": str(out_dir),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
