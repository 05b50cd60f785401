"""Full-pipeline CLI integration test: config composition -> training with
checkpointing -> animation -> eval refinement + metrics, all through the
real entry points on a synthetic sequence (the reference's de-facto
integration test is bash/run-peoplesnapshot.sh — SURVEY §4)."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_cli(name: str, argv: list[str], monkeypatch):
    monkeypatch.setattr(sys, "argv", [name] + argv)
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}_{len(argv)}", REPO / "cli" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    from instantavatar_tpu.data import make_synthetic_sequence
    root = tmp_path_factory.mktemp("pipeline")
    seq = make_synthetic_sequence(root / "seq", n_frames=3, H=48, W=48)
    run = root / "run"
    return seq, run


def _common_overrides(seq, run):
    return [
        f"dataset.opt.dataroot={seq}",
        f"run_dir={run}",
        "network=voxel_triplane",
        "network.opt.voxel_res=8", "network.opt.voxel_feats=4",
        "network.opt.plane_res=16", "network.opt.plane_feats=4",
        "deformer.opt.resolution=32", "deformer.opt.cano_pose=da_pose",
        "renderer.MAX_SAMPLES=32", "renderer.k_cap=8",
        "renderer.grid_size=16",
        "dataset.opt.train.start=0", "dataset.opt.train.end=2",
        "dataset.opt.train.skip=1", "dataset.opt.train.downscale=1",
        "dataset.opt.val.start=0", "dataset.opt.val.end=0",
        "dataset.opt.val.skip=1", "dataset.opt.val.downscale=1",
        "dataset.opt.test.start=1", "dataset.opt.test.end=2",
        "dataset.opt.test.skip=1", "dataset.opt.test.downscale=1",
    ]


@pytest.mark.order(1)
def test_cli_train(pipeline_dirs, monkeypatch):
    seq, run = pipeline_dirs
    _run_cli("train", ["--config-name", "SNARF_NGP",
                       "train.max_epochs=4",
                       "train.check_val_every_n_epoch=2",
                       "sampler.num_patch=2", "sampler.patch_size=16",
                       *_common_overrides(seq, run)], monkeypatch)
    assert (run / "config.yaml").exists()
    ckpts = list((run / "checkpoints").glob("step_*"))
    assert ckpts, "no checkpoint written"
    assert list((run / "val").glob("epoch_*.png"))


def test_cli_train_resume_noop(pipeline_dirs, monkeypatch, capsys):
    """Re-running train after completion must resume at max_epochs and
    exit without retraining (reference auto-resume, train.py:38-41)."""
    seq, run = pipeline_dirs
    _run_cli("train", ["--config-name", "SNARF_NGP",
                       "train.max_epochs=4",
                       "train.check_val_every_n_epoch=2",
                       "sampler.num_patch=2", "sampler.patch_size=16",
                       *_common_overrides(seq, run)], monkeypatch)
    assert "resumed from" in capsys.readouterr().out


def test_cli_animate(pipeline_dirs, monkeypatch, tmp_path):
    seq, run = pipeline_dirs
    poses = np.zeros((2, 72), np.float32)
    poses[1, 50] = 0.8
    trans = np.tile(np.array([[0, 0, 3.0]], np.float32), (2, 1))
    pose_npz = tmp_path / "dance.npz"
    np.savez(pose_npz, poses=poses, trans=trans)
    _run_cli("animate", ["--config-name", "SNARF_NGP",
                         f"+pose_sequence={pose_npz}",
                         "+render_downscale=16",
                         *_common_overrides(seq, run)], monkeypatch)
    adir = run / "animation"
    assert (adir / "0000.png").exists() and (adir / "0001.png").exists()
    assert (adir / "animation.gif").exists()


def test_cli_novel_view(pipeline_dirs, monkeypatch):
    seq, run = pipeline_dirs
    _run_cli("novel_view", ["--config-name", "SNARF_NGP",
                            "+render_downscale=16", "+n_frames=2",
                            *_common_overrides(seq, run)], monkeypatch)
    assert (run / "novel_view" / "novel_view.gif").exists()


def test_cli_eval_refine(pipeline_dirs, monkeypatch):
    seq, run = pipeline_dirs
    _run_cli("eval", ["--config-name", "SNARF_NGP_refine",
                      "train.max_epochs=1",
                      "sampler.num_sample=256", "sampler.kernel_size=4",
                      *_common_overrides(seq, run)], monkeypatch)
    results = (run / "results.txt").read_text()
    assert "psnr" in results
    assert (run / "test" / "0.png").exists()
    # metrics parse as numbers
    psnr = float([l for l in results.splitlines()
                  if l.startswith("psnr")][0].split(":")[1])
    assert np.isfinite(psnr)


def test_cli_fit_exports_poses(pipeline_dirs, monkeypatch, tmp_path_factory):
    from instantavatar_tpu.data import make_synthetic_sequence
    root = tmp_path_factory.mktemp("fitrun")
    seq = make_synthetic_sequence(root / "seq", n_frames=2, H=32, W=32)
    run = root / "run"
    _run_cli("fit", ["--config-name", "SNARF_NGP_fitting",
                     "train.max_epochs=1",
                     "train.check_val_every_n_epoch=1",
                     "sampler.num_patch=2", "sampler.patch_size=16",
                     *_common_overrides(seq, run),
                     "dataset.opt.train.end=1", "dataset.opt.val.end=0",
                     "dataset.opt.test.start=0", "dataset.opt.test.end=1",
                     ], monkeypatch)
    out = seq / "poses" / "train.npz"
    assert out.exists()
    data = np.load(out)
    assert data["body_pose"].shape == (2, 69)
    assert data["transl"].shape == (2, 3)


def test_cli_train_multi_subject(monkeypatch, tmp_path_factory):
    """Multi-subject trainer: two synthetic subjects trained on the
    subject-sharded mesh in one process; per-subject checkpoints out."""
    from instantavatar_tpu.data import make_synthetic_sequence
    root = tmp_path_factory.mktemp("multi")
    for k, name in enumerate(("subj_a", "subj_b")):
        make_synthetic_sequence(root / name, n_frames=2, H=32, W=32,
                                seed=k)
    run = root / "out"
    _run_cli("train_multi", [
        "--config-name", "SNARF_NGP",
        "+subjects=subj_a,subj_b",
        f"dataset.opt.dataroot={root}/${{dataset.subject}}",
        f"run_dir={run}/${{dataset.subject}}",
        "network=voxel_triplane",
        "network.opt.voxel_res=8", "network.opt.voxel_feats=4",
        "network.opt.plane_res=16", "network.opt.plane_feats=4",
        "deformer.opt.resolution=32", "deformer.opt.cano_pose=da_pose",
        "renderer.MAX_SAMPLES=32", "renderer.k_cap=8",
        "renderer.grid_size=16",
        "sampler.num_patch=2", "sampler.patch_size=8",
        "dataset.opt.train.start=0", "dataset.opt.train.end=1",
        "dataset.opt.train.skip=1", "dataset.opt.train.downscale=1",
        "dataset.opt.val.start=0", "dataset.opt.val.end=0",
        "dataset.opt.val.downscale=1",
        "dataset.opt.test.start=0", "dataset.opt.test.end=1",
        "dataset.opt.test.downscale=1",
        "train.max_epochs=2",
    ], monkeypatch)
    for name in ("subj_a", "subj_b"):
        assert list((run / name / "checkpoints").glob("step_*")), name
