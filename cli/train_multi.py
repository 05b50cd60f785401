#!/usr/bin/env python
"""Multi-subject training CLI — train S independent avatars simultaneously
on a (subject, ray) device mesh.

This is the scaling configuration the reference cannot express (it is
pinned to one GPU / one subject — SURVEY §2.8): parameters are stacked on
a subject axis sharded across chips, each subject consumes its own video,
and there is no cross-subject communication. On a v5e-8 this trains 8
PeopleSnapshot avatars for the cost of one.

Usage:
    python cli/train_multi.py --config-name SNARF_NGP \
        +subjects=male-3-casual,male-4-casual,... [overrides]

Subjects share one model configuration; each gets its own run dir
(outputs/<name>/<experiment>/<subject>) and checkpoint.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from instantavatar_tpu.config import load_config
from instantavatar_tpu.config.build import build_avatar, build_datamodule
from instantavatar_tpu.parallel import (make_mesh, make_multi_subject_step,
                                        stack_subjects)
from instantavatar_tpu.train.harness import save_checkpoint
from instantavatar_tpu.utils.cli import repo_root


def main() -> None:
    argv = list(sys.argv[1:])
    subjects = None
    config_name = "SNARF_NGP"
    rest = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("+subjects="):
            subjects = a.split("=", 1)[1].split(",")
        elif a.startswith("--config-name"):
            if "=" in a:
                config_name = a.split("=", 1)[1]
            else:
                i += 1
                config_name = argv[i]
        else:
            rest.append(a)
        i += 1
    if not subjects:
        raise SystemExit("pass +subjects=subj1,subj2,...")

    n_sub = len(subjects)
    n_dev = jax.device_count()
    if n_dev % n_sub and n_sub % n_dev:
        print(f"[multi] warning: {n_sub} subjects on {n_dev} devices "
              "(uneven sharding)")

    # per-subject config/dataset; one shared model config
    cfgs, dms = [], []
    for subj in subjects:
        cfg = load_config(repo_root() / "confs", config_name,
                          rest + [f"dataset.subject={subj}"])
        cfgs.append(cfg)
        dms.append(build_datamodule(cfg))
    steps_per_epoch = min(len(dm.trainset) for dm in dms)
    avatar = build_avatar(cfgs[0], steps_per_epoch=steps_per_epoch)

    # stacked states, one per subject
    init = jax.jit(avatar.init)
    states = stack_subjects([
        init(jax.random.PRNGKey(int(cfgs[k].get("seed", 42)) + k),
             jnp.asarray(dms[k].trainset.smpl_params["betas"]), None)
        for k in range(n_sub)])

    mesh = make_mesh(n_ray=1, n_subject=min(n_sub, n_dev))
    step_fn = make_multi_subject_step(avatar, mesh, with_grid_update=False)
    step_up = make_multi_subject_step(avatar, mesh, with_grid_update=True)

    max_epochs = int(cfgs[0].get("train", {}).get("max_epochs", 30))
    rng = np.random.default_rng(42)
    key = jax.random.PRNGKey(42)
    step = 0
    with mesh:
        for epoch in range(max_epochs):
            order = rng.permutation(steps_per_epoch)
            for i in order:
                batch = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[{k: jnp.asarray(v)
                       for k, v in dm.trainset[int(i)].items()}
                      for dm in dms])
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, n_sub)
                fn = step_up if step % avatar.grid_update_interval == 0 \
                    else step_fn
                states, losses = fn(states, batch, keys)
                step += 1
                if step % 50 == 0:
                    ls = np.asarray(losses["loss"])
                    print(f"[multi] epoch {epoch} step {step} "
                          f"losses={np.round(ls, 4).tolist()}")

    # unstack + checkpoint per subject
    for k, (cfg, subj) in enumerate(zip(cfgs, subjects)):
        st = jax.tree.map(lambda x: x[k], states)
        run_dir = repo_root() / cfg.get("run_dir", f"outputs/{subj}")
        run_dir.mkdir(parents=True, exist_ok=True)
        path = save_checkpoint(run_dir / "checkpoints", st)
        print(f"[multi] {subj}: checkpoint -> {path}")


if __name__ == "__main__":
    main()
