#!/usr/bin/env python
"""Evaluation CLI — reference eval.py parity.

Flow (eval.py:36-118): retarget the train split to the test frame range
with the refine flag (poses from ``poses/anim_nerf_test.npz``), load the
train-run checkpoint minus SMPL params, freeze everything except the
per-frame SMPL embedding, refine for ``train.max_epochs`` (20) epochs with
the edge sampler, then render the test split to ``test/{i}.png`` triptychs
and write mean PSNR/SSIM/LPIPS to ``results.txt``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from instantavatar_tpu.config.build import build_trainer
from instantavatar_tpu.utils.cli import (load_trained_state, parse_cli,
                                         setup_run)


def main() -> None:
    cfg = parse_cli(default_config="SNARF_NGP_refine")
    # retarget the train split to the test range (eval.py:50-56)
    test_opt = cfg.dataset.opt.test
    for key in ("start", "end", "skip", "downscale"):
        cfg.dataset.opt.train[key] = test_opt[key]
    cfg.dataset.opt.train["refine"] = True
    cfg.dataset.opt.test["refine"] = True
    run_dir = setup_run(cfg)
    print(f"[eval] run dir: {run_dir}")

    trainer = build_trainer(cfg, workdir=run_dir / "refinement")
    state = load_trained_state(trainer, run_dir, drop_smpl=True)
    state = trainer.fit(state)
    trainer.workdir = run_dir  # test artifacts land in the run dir
    results = trainer.test(state)
    print(f"[eval] {results}")


if __name__ == "__main__":
    main()
