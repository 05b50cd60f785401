#!/usr/bin/env python
"""SMPL pose-fitting-from-scratch CLI — reference fit.py parity.

Trains with ``SNARF_NGP_fitting`` (joint field + per-frame SMPL
optimization, version-2 gradients), then exports the optimized per-frame
parameters to ``<dataroot>/poses/train.npz`` so subsequent ``train.py``
runs pick them up (fit.py:52-65, custom.py:62-66).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from instantavatar_tpu.config.build import build_trainer
from instantavatar_tpu.utils.cli import parse_cli, repo_root, setup_run


def main() -> None:
    cfg = parse_cli(default_config="SNARF_NGP_fitting")
    run_dir = setup_run(cfg)
    print(f"[fit] run dir: {run_dir}")
    trainer = build_trainer(cfg, workdir=run_dir)
    state = trainer.fit()

    smpl = state.params["smpl"]
    dataroot = repo_root() / cfg.dataset.opt.dataroot
    out = dataroot / "poses" / "train.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    arrays = smpl.to_arrays()
    np.savez(out, **arrays)
    print(f"[fit] exported optimized SMPL params -> {out} "
          f"({arrays['body_pose'].shape[0]} frames)")


if __name__ == "__main__":
    main()
