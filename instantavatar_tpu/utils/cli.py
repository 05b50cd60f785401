"""Shared CLI plumbing: Hydra-style argument parsing, run-dir setup,
checkpoint loading for the five entry points (reference train.py / fit.py /
eval.py / animate.py / novel_view.py surface)."""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Any

from ..config import load_config, to_yaml

__all__ = ["parse_cli", "setup_run", "repo_root", "load_trained_state"]


def repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def parse_cli(argv: list[str] | None = None,
              default_config: str = "SNARF_NGP"):
    """Hydra-compatible CLI: ``--config-name NAME`` + ``key=value``
    overrides."""
    argv = list(sys.argv[1:] if argv is None else argv)
    config_name = default_config
    overrides = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--config-name"):
            if "=" in a:
                config_name = a.split("=", 1)[1]
            else:
                i += 1
                config_name = argv[i]
        elif a.startswith("--config-dir"):
            raise SystemExit("--config-dir is not supported; edit confs/")
        else:
            overrides.append(a)
        i += 1
    cfg = load_config(repo_root() / "confs", config_name, overrides)
    return cfg


def setup_run(cfg: Any) -> Path:
    """Create the Hydra-style run dir and persist the resolved config
    (reference train.py:44 writes config.yaml into the cwd)."""
    run_dir = repo_root() / cfg.get("run_dir", "outputs/run")
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "config.yaml").write_text(to_yaml(cfg))
    return run_dir


def load_trained_state(trainer, run_dir: Path, *, drop_smpl: bool = False,
                       ckpt_subdir: str = "checkpoints"):
    """Init a fresh state and restore the latest checkpoint into it.

    drop_smpl mirrors eval.py:64-68 — the refine flow loads the train
    checkpoint but keeps freshly initialized per-frame SMPL params."""
    from ..train.harness import latest_checkpoint, restore_checkpoint
    from ..train.smpl_params import SMPLParams
    import jax

    trainset = trainer.dm.trainset
    smpl0 = None
    if trainer.avatar.optimize_smpl:
        smpl0 = SMPLParams.from_arrays(trainset.get_smpl_params())
    import jax.numpy as jnp
    state = jax.jit(trainer.avatar.init)(
        jax.random.PRNGKey(trainer.seed),
        jnp.asarray(trainset.smpl_params["betas"]), smpl0)
    last = latest_checkpoint(run_dir / ckpt_subdir)
    if last is None:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/"
                                f"{ckpt_subdir} — train first")
    if drop_smpl:
        # cross-stage surgery (eval.py:64-68): take field params + grid +
        # deformer bake from the train checkpoint, keep fresh per-frame
        # SMPL params and a fresh optimizer state. Raw restore because the
        # checkpointed optimizer/params structure differs from the refine
        # model's.
        from ..train.harness import restore_checkpoint_raw, graft
        raw = restore_checkpoint_raw(last)
        params = dict(state.params)
        params["field"] = graft(state.params["field"],
                                raw["params"]["field"])
        state = state._replace(
            params=params,
            grid=graft(state.grid, raw["grid"]),
            deformer_cano=graft(state.deformer_cano, raw["deformer_cano"]),
            center=graft(state.center, raw["center"]),
            scale=graft(state.scale, raw["scale"]))
    else:
        state = restore_checkpoint(last, state)
    print(f"[cli] restored {last}")
    return state
