#!/usr/bin/env python
"""Custom-video preprocessing orchestrator.

Capability parity with /root/reference/scripts/custom/process-sequence.sh:
OpenPose keypoints (if missing) -> SAM masks -> largest-CC cleanup -> ROMP
SMPL init -> keypoint/silhouette SMPL refinement -> overlay check video.
Each stage is a standalone script; external-model stages gate cleanly when
their dependency is absent.
"""
import argparse
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def run(script, *args):
    cmd = [sys.executable, str(HERE / script), *args]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--sam-checkpoint")
    ap.add_argument("--openpose-bin")
    ap.add_argument("--smpl-path", default="data/SMPLX/smpl")
    args = ap.parse_args()
    root = Path(args.data_dir)

    if not (root / "keypoints.npy").exists():
        run("run_openpose.py", "--data-dir", str(root),
            *( ["--openpose-bin", args.openpose_bin]
               if args.openpose_bin else []))
    if args.sam_checkpoint:
        run("run_sam.py", "--data-dir", str(root),
            "--checkpoint", args.sam_checkpoint)
        run("extract_largest_cc.py", "--data-dir", str(root))
    if not (root / "poses.npz").exists():
        run("run_romp.py", "--data-dir", str(root))
    run("refine_smpl.py", "--data-dir", str(root),
        "--smpl-path", args.smpl_path, "--silhouette")
    run("../visualize_smpl.py", "--data-dir", str(root))


if __name__ == "__main__":
    main()
