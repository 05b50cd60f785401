#!/usr/bin/env python
"""Segment-Anything person masks, prompted by OpenPose keypoints.

Capability parity with /root/reference/scripts/custom/run-sam.py (union of
per-keypoint prompt masks -> masks_sam/). Requires the external
``segment_anything`` package + a SAM checkpoint, which are not bundled —
the script gates cleanly when absent.

Usage: python scripts/custom/run_sam.py --data-dir data/custom/<seq>
           --checkpoint sam_vit_h.pth
"""
import argparse
import glob
import sys
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model-type", default="vit_h")
    args = ap.parse_args()
    try:
        import cv2
        from segment_anything import SamPredictor, sam_model_registry
    except ImportError as e:
        raise SystemExit(
            f"missing external dependency: {e.name}. Install "
            "segment-anything and download a SAM checkpoint to run this "
            "stage (zero-egress environments must pre-provision it).")

    root = Path(args.data_dir)
    keypoints = np.load(root / "keypoints.npy")      # (N, 25, 3)
    sam = sam_model_registry[args.model_type](checkpoint=args.checkpoint)
    predictor = SamPredictor(sam)
    out_dir = root / "masks_sam"
    out_dir.mkdir(exist_ok=True)
    for i, img_path in enumerate(sorted(glob.glob(f"{root}/images/*.png"))):
        img = cv2.imread(img_path)[..., ::-1]
        predictor.set_image(img)
        kp = keypoints[i]
        pts = kp[kp[:, 2] > 0.3, :2]
        masks, _, _ = predictor.predict(
            point_coords=pts, point_labels=np.ones(len(pts)))
        union = masks.any(axis=0).astype(np.uint8) * 255
        cv2.imwrite(str(out_dir / f"{i:04d}.png"), union)
        print(f"[sam] frame {i}")


if __name__ == "__main__":
    main()
