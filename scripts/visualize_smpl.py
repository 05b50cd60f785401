#!/usr/bin/env python
"""SMPL overlay sanity check: project the posed SMPL vertices onto each
frame and write an overlay video/images.

Capability parity with /root/reference/scripts/visualize-SMPL.py (which
uses aitviewer); this renders lightweight vertex splats with cv2 so the
check works headless without a GL stack.
"""
import argparse
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import cv2
    import jax.numpy as jnp
    from instantavatar_tpu.body import load_smpl_model, smpl_forward
    from instantavatar_tpu.data import load_smpl_param

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--smpl-path", default="data/SMPLX/smpl")
    ap.add_argument("--gender", default="neutral")
    ap.add_argument("--poses", default=None,
                    help="pose npz (default: poses_optimized or poses)")
    args = ap.parse_args()
    root = Path(args.data_dir)

    model = load_smpl_model(args.smpl_path, args.gender)
    pose_file = args.poses or (
        root / ("poses_optimized.npz"
                if (root / "poses_optimized.npz").exists() else "poses.npz"))
    params = load_smpl_param(pose_file)
    cam = np.load(root / "cameras.npz")
    K = cam["intrinsic"]
    w2c = cam["extrinsic"]

    out_dir = root / "smpl_overlay"
    out_dir.mkdir(exist_ok=True)
    files = sorted(glob.glob(f"{root}/images/*.png"))
    for i, f in enumerate(files):
        img = cv2.imread(f)
        out = smpl_forward(model, jnp.asarray(params["betas"]),
                           jnp.asarray(params["body_pose"][i:i + 1]),
                           jnp.asarray(params["global_orient"][i:i + 1]),
                           jnp.asarray(params["transl"][i:i + 1]))
        v = np.asarray(out.vertices[0])
        v_cam = v @ w2c[:3, :3].T + w2c[:3, 3]
        p = v_cam @ K.T
        p = (p[:, :2] / np.maximum(p[:, 2:3], 1e-6)).astype(int)
        ok = (p[:, 0] >= 0) & (p[:, 0] < img.shape[1]) \
            & (p[:, 1] >= 0) & (p[:, 1] < img.shape[0]) & (v_cam[:, 2] > 0)
        img[p[ok, 1], p[ok, 0]] = (0, 255, 0)
        cv2.imwrite(str(out_dir / f"{i:04d}.png"), img)
    print(f"[visualize] wrote overlays -> {out_dir}")


if __name__ == "__main__":
    main()
