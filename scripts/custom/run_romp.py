#!/usr/bin/env python
"""Per-frame SMPL initialization via ROMP.

Capability parity with /root/reference/scripts/custom/run-romp.py: run the
monocular ROMP estimator on every frame, write poses.npz (mean betas,
per-frame thetas + camera-frame translation) and a FOV-60 pinhole
cameras.npz. Requires the external ``romp`` package (gated).

Usage: python scripts/custom/run_romp.py --data-dir data/custom/<seq>
"""
import argparse
import glob
import sys
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    args = ap.parse_args()
    try:
        import cv2
        import romp
    except ImportError as e:
        raise SystemExit(
            f"missing external dependency: {e.name}. Install ROMP "
            "(pip install simple-romp) to run this stage.")

    root = Path(args.data_dir)
    settings = romp.main.default_settings
    estimator = romp.ROMP(settings)
    thetas, trans = [], []
    betas = []
    files = sorted(glob.glob(f"{root}/images/*.png"))
    for i, f in enumerate(files):
        img = cv2.imread(f)
        out = estimator(img)
        thetas.append(out["smpl_thetas"][0])
        betas.append(out["smpl_betas"][0])
        trans.append(out["cam_trans"][0])
        print(f"[romp] frame {i}")
    H, W = cv2.imread(files[0]).shape[:2]
    f = 0.5 * H / np.tan(np.radians(30))             # FOV-60 pinhole
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    np.savez(root / "cameras.npz", intrinsic=K, extrinsic=np.eye(4),
             height=H, width=W)
    np.savez(root / "poses.npz",
             betas=np.mean(betas, axis=0, keepdims=True)[:, :10],
             thetas=np.asarray(thetas, np.float32),
             transl=np.asarray(trans, np.float32))
    print(f"[romp] wrote poses.npz + cameras.npz ({len(files)} frames)")


if __name__ == "__main__":
    main()
