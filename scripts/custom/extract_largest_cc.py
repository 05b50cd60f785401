#!/usr/bin/env python
"""Mask cleanup: morphological open/close + largest connected component.

Capability parity with /root/reference/scripts/custom/
extract-largest-connected-components.py (masks_sam/ -> masks/).
"""
import argparse
import glob
from pathlib import Path

import numpy as np


def main() -> None:
    import cv2
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--src", default="masks_sam")
    ap.add_argument("--dst", default="masks")
    args = ap.parse_args()
    root = Path(args.data_dir)
    out = root / args.dst
    out.mkdir(exist_ok=True)
    kernel = np.ones((5, 5), np.uint8)
    for i, f in enumerate(sorted(glob.glob(str(root / args.src / "*")))):
        m = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel)
        m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            (m > 127).astype(np.uint8))
        if n > 1:
            biggest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
            m = (labels == biggest).astype(np.uint8) * 255
        cv2.imwrite(str(out / f"{i:04d}.png"), m)
    print(f"[cc] wrote cleaned masks -> {out}")


if __name__ == "__main__":
    main()
