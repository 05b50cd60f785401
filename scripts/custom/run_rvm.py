#!/usr/bin/env python
"""Alternative matting via RobustVideoMatting.

Capability parity with /root/reference/scripts/custom/run-rvm.py (unused
by the default pipeline). Requires the external RVM torch hub model
(gated; zero-egress environments must pre-provision the checkpoint).
"""
import argparse
import glob
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--checkpoint", help="local rvm_mobilenetv3 torchscript")
    args = ap.parse_args()
    try:
        import cv2
        import torch
    except ImportError as e:
        raise SystemExit(f"missing dependency: {e.name}")
    if not args.checkpoint:
        raise SystemExit("provide --checkpoint (a local RVM torchscript "
                         "export; torch.hub download needs egress)")
    model = torch.jit.load(args.checkpoint).eval()
    root = Path(args.data_dir)
    out = root / "masks_rvm"
    out.mkdir(exist_ok=True)
    rec = [None] * 4
    for i, f in enumerate(sorted(glob.glob(f"{root}/images/*.png"))):
        img = cv2.imread(f)[..., ::-1].copy()
        src = torch.from_numpy(img).permute(2, 0, 1)[None].float() / 255
        with torch.no_grad():
            _, pha, *rec = model(src, *rec, 0.4)
        cv2.imwrite(str(out / f"{i:04d}.png"),
                    (pha[0, 0].numpy() * 255).astype(np.uint8))
        print(f"[rvm] frame {i}")


if __name__ == "__main__":
    main()
