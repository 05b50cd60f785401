#!/usr/bin/env python
"""Animation CLI — reference animate.py parity.

Loads the trained checkpoint, builds a synthetic camera (1080^2, f=2000,
identity pose, downscale 2 -> 540^2) and drives the avatar with an
arbitrary pose sequence npz (``poses (N, 72)``, ``trans (N, 3)`` — e.g.
the bundled AIST demo), recentering translation to (0, 0.15, 5) and
keeping the *training* betas so the learned identity is preserved
(animate.py:26-118). Writes RGBA PNGs + a 30 fps GIF.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from instantavatar_tpu.config.build import build_trainer
from instantavatar_tpu.utils.cli import (load_trained_state, parse_cli,
                                         repo_root, setup_run)


def make_camera(downscale: int = 2):
    from instantavatar_tpu.data.rays import make_ray_basis, make_ray_grid
    H = W = 1080 // downscale
    f = 2000.0 / downscale
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    rays_o, rays_d = make_ray_grid(K, np.eye(4), H, W)
    # (4,3) pinhole generator: the fused flat render computes per-pixel
    # dirs from it instead of gathering per-sample ray rows (rays.py)
    basis = make_ray_basis(K, np.eye(4))
    return H, W, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), basis


def _camera_batch_base(H, W, rays_o, rays_d, basis):
    n_rays = H * W
    return {
        "rays_o": rays_o, "rays_d": rays_d, "ray_basis": basis,
        "bg_color": np.ones((n_rays, 3), np.float32),
    }


def animation_batches(pose_path: Path, betas: np.ndarray,
                      downscale: int = 2):
    """Yield per-frame batches from a pose-sequence npz (animate.py:26-78)."""
    data = np.load(pose_path)
    poses = data["poses"].astype(np.float32)          # (N, 72)
    trans = data["trans"].astype(np.float32)          # (N, 3)
    trans = trans - trans.mean(axis=0, keepdims=True) \
        + np.array([0.0, 0.15, 5.0], np.float32)
    H, W, rays_o, rays_d, basis = make_camera(downscale)
    n_rays = H * W
    base = _camera_batch_base(H, W, rays_o, rays_d, basis)
    for i in range(len(poses)):
        dist = float(np.linalg.norm(trans[i]))
        yield H, W, {
            **base,
            "near": np.full((n_rays,), dist - 1, np.float32),
            "far": np.full((n_rays,), dist + 1, np.float32),
            "betas": betas.reshape(-1),
            "global_orient": poses[i, :3],
            "body_pose": poses[i, 3:],
            "transl": trans[i],
            "idx": np.int32(i),
        }


def render_sequence(trainer, state, batches, out_dir: Path,
                    tag: str = "animation"):
    import cv2
    import imageio
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = []
    batches = list(batches)
    shapes = [(H, W) for H, W, _ in batches]
    # pipelined renderer: frame i's host fetch overlaps frame i+1's
    # on-device compute (render_frames keeps 2 frames in flight)
    # u8 payload: the frames are written as u8 PNGs anyway, and the
    # quantized fetch is ~3x smaller through the host link (PERF.md)
    outs = trainer.avatar.render_frames(
        state, [b for _, _, b in batches], chunk=trainer.eval_chunk,
        image_shape=shapes[0] if shapes else None, payload="u8")
    for i, ((H, W), out) in enumerate(zip(shapes, outs)):
        rgb = np.clip(out["rgb"].reshape(H, W, 3), 0, 1)
        alpha = np.clip(out["alpha"].reshape(H, W, 1), 0, 1)
        rgba = np.concatenate([rgb, alpha], axis=-1)
        cv2.imwrite(str(out_dir / f"{i:04d}.png"),
                    (rgba * 255).astype(np.uint8))
        frames.append((rgb[..., ::-1] * 255).astype(np.uint8))
        print(f"[{tag}] frame {i + 1}", flush=True)
    imageio.mimsave(out_dir / f"{tag}.gif", frames,
                    duration=1000 / 30)  # 30 fps
    print(f"[{tag}] wrote {len(frames)} frames + {tag}.gif -> {out_dir}")


def main() -> None:
    argv = list(sys.argv[1:])
    pose_path = repo_root() / "data/animation/aist_demo.npz"
    downscale = 2
    eval_grid = "smpl_shell"
    rest = []
    for a in argv:
        if a.startswith("+pose_sequence=") or a.startswith("pose_sequence="):
            pose_path = Path(a.split("=", 1)[1])
        elif a.startswith("+render_downscale="):
            downscale = int(a.split("=", 1)[1])
        elif a.startswith("+eval_grid="):
            eval_grid = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = parse_cli(rest, default_config="SNARF_NGP")
    run_dir = setup_run(cfg)
    trainer = build_trainer(cfg, workdir=run_dir)
    # pose-varying workload: every frame pays a fresh test grid — the
    # posed-vertex shell costs milliseconds vs the density sweep's
    # ~0.8 s/pose, at -0.12 dB in-mask on the 540px gate
    # (artifacts/r5_shell_gate.jsonl; opt out with +eval_grid=density)
    trainer.avatar.eval_grid = eval_grid
    state = load_trained_state(trainer, run_dir)
    betas = np.asarray(trainer.dm.trainset.smpl_params["betas"])
    render_sequence(trainer, state,
                    animation_batches(pose_path, betas, downscale),
                    run_dir / "animation")


if __name__ == "__main__":
    main()
