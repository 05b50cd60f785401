#!/usr/bin/env python
"""Avatar training CLI — reference train.py parity.

Usage:
    python cli/train.py [--config-name SNARF_NGP] [group=option] [a.b=v ...]

Composes the Hydra-style conf tree, creates the run dir
(outputs/{name}/{experiment}/{subject}), persists the resolved config,
trains with auto-resume, and runs a final validation.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from instantavatar_tpu.config.build import build_trainer
from instantavatar_tpu.utils.cli import parse_cli, setup_run


def main() -> None:
    cfg = parse_cli(default_config="SNARF_NGP")
    run_dir = setup_run(cfg)
    print(f"[train] run dir: {run_dir}")
    trainer = build_trainer(cfg, workdir=run_dir)
    state = trainer.fit()
    trainer.validate(state, epoch=trainer.max_epochs)


if __name__ == "__main__":
    main()
