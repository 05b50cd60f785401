#!/usr/bin/env python
"""OpenPose BODY25 keypoints -> keypoints.npy (N, 25, 3).

Capability parity with /root/reference/scripts/custom/
{run-openpose-bin.sh, convert_openpose_json_to_npy.py}: either invoke an
OpenPose binary (--openpose-bin) or convert an existing directory of
OpenPose JSON outputs (--json-dir).
"""
import argparse
import glob
import json
import subprocess
from pathlib import Path

import numpy as np


def convert_json_dir(json_dir: Path, out: Path) -> None:
    frames = []
    for f in sorted(glob.glob(str(json_dir / "*_keypoints.json"))):
        data = json.load(open(f))
        people = data.get("people", [])
        if people:
            kp = np.asarray(people[0]["pose_keypoints_2d"],
                            np.float32).reshape(25, 3)
        else:
            kp = np.zeros((25, 3), np.float32)
        frames.append(kp)
    np.save(out, np.stack(frames))
    print(f"[openpose] wrote {out} ({len(frames)} frames)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--openpose-bin")
    ap.add_argument("--json-dir")
    args = ap.parse_args()
    root = Path(args.data_dir)
    if args.json_dir:
        convert_json_dir(Path(args.json_dir), root / "keypoints.npy")
        return
    if not args.openpose_bin:
        raise SystemExit("provide --openpose-bin or --json-dir")
    json_dir = root / "openpose_json"
    json_dir.mkdir(exist_ok=True)
    subprocess.run(
        [args.openpose_bin, "--image_dir", str(root / "images"),
         "--write_json", str(json_dir), "--display", "0",
         "--render_pose", "0"], check=True)
    convert_json_dir(json_dir, root / "keypoints.npy")


if __name__ == "__main__":
    main()
