"""Extract the LPIPS learned 1x1 head weights from the upstream .pth
bundles into plain npz files shipped with this package.

The reference vendors richzhang/PerceptualSimilarity with the v0.1 head
weights as data files (/root/reference/third_parties/lpips/weights/v0.1/
{vgg,alex}.pth — keys ``lin{0..4}.model.1.weight``, shapes (1, C, 1, 1)).
This reads them with the torch-free reader (utils/torch_reader.py) and
writes ``instantavatar_tpu/losses/weights/lpips_heads_{net}.npz`` with
keys ``head0..head4`` as flat (C,) float32 vectors.

Usage: python scripts/extract_lpips_heads.py [weights_dir]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from instantavatar_tpu.utils.torch_reader import load_torch_weights  # noqa: E402


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1
               else "/root/reference/third_parties/lpips/weights/v0.1")
    out_dir = (Path(__file__).resolve().parents[1]
               / "instantavatar_tpu/losses/weights")
    out_dir.mkdir(parents=True, exist_ok=True)
    for net in ("vgg", "alex"):
        pth = src / f"{net}.pth"
        if not pth.exists():
            print(f"skip {net}: {pth} not found")
            continue
        state = load_torch_weights(str(pth))
        heads = {}
        for i in range(5):
            w = np.asarray(state[f"lin{i}.model.1.weight"], np.float32)
            heads[f"head{i}"] = w.reshape(-1)
        out = out_dir / f"lpips_heads_{net}.npz"
        np.savez(out, **heads)
        print(f"wrote {out}: " + ", ".join(
            f"head{i}({len(heads[f'head{i}'])})" for i in range(5)))


if __name__ == "__main__":
    main()
