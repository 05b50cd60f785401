#!/usr/bin/env python
"""PeopleSnapshot preprocessing: raw release -> training layout.

Converts a PeopleSnapshot subject directory (camera.pkl, <subject>.mp4,
masks.hdf5, reconstructed_poses.hdf5) into the sequence layout the
datasets consume: cameras.npz (intrinsic/extrinsic/height/width),
undistorted images/*.png, masks/*.npy, poses.npz (betas/thetas/transl).
Capability parity with the reference's converter
(/root/reference/scripts/peoplesnapshot/preprocess_PeopleSnapshot.py).

Usage:
    python scripts/preprocess_peoplesnapshot.py --root <PeopleSnapshotData>
        --subject male-3-casual [--out data/PeopleSnapshot]
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def main() -> None:
    import cv2
    import h5py

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="path to the raw PeopleSnapshot data")
    ap.add_argument("--subject", default="male-3-casual")
    ap.add_argument("--out", default="data/PeopleSnapshot")
    args = ap.parse_args()

    src = Path(args.root) / args.subject
    if not src.exists():
        raise SystemExit(f"cannot open {src}")
    dst = Path(args.out) / args.subject
    (dst / "images").mkdir(parents=True, exist_ok=True)
    (dst / "masks").mkdir(parents=True, exist_ok=True)

    with open(src / "camera.pkl", "rb") as f:
        cam = pickle.load(f, encoding="latin")
    K = np.eye(3)
    K[0, 0], K[1, 1] = cam["camera_f"]
    K[:2, 2] = cam["camera_c"]
    dist = cam["camera_k"]
    w2c = np.eye(4)
    w2c[:3, :3] = cv2.Rodrigues(cam["camera_rt"])[0]
    w2c[:3, 3] = cam["camera_t"]
    np.savez(dst / "cameras.npz", intrinsic=K, extrinsic=w2c,
             height=cam["height"], width=cam["width"])
    print(f"wrote {dst / 'cameras.npz'}")

    cap = cv2.VideoCapture(str(src / f"{args.subject}.mp4"))
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.undistort(frame, K, dist)
        cv2.imwrite(str(dst / f"images/image_{i:04d}.png"), frame)
        i += 1
    print(f"wrote {i} undistorted frames")

    with h5py.File(src / "masks.hdf5", "r") as f:
        masks = np.asarray(f["masks"]).astype(np.uint8)
    for j, m in enumerate(masks):
        np.save(dst / f"masks/mask_{j:04d}.npy", cv2.undistort(m, K, dist))
    print(f"wrote {len(masks)} undistorted masks")

    with h5py.File(src / "reconstructed_poses.hdf5", "r") as f:
        np.savez(dst / "poses.npz",
                 betas=np.asarray(f["betas"], np.float32),
                 thetas=np.asarray(f["pose"], np.float32),
                 transl=np.asarray(f["trans"], np.float32))
    print(f"wrote {dst / 'poses.npz'}")


if __name__ == "__main__":
    main()
