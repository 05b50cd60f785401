"""Synthetic avatar sequences for hermetic tests and benchmarks.

The reference's datasets require PeopleSnapshot downloads + preprocessing;
nothing comparable ships in-repo (SURVEY §4/§6). This writes a fully valid
sequence directory (cameras.npz, images/*.png, masks/*.npy, poses.npz) from
the deterministic toy SMPL body — the *real* dataset/teardown code paths
then run end-to-end without any licensed assets.

Rendering is a simple painter's splat of per-vertex discs (host numpy/cv2):
good enough to train against and perfectly deterministic.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["make_synthetic_sequence"]


def _splat_frame(verts: np.ndarray, colors: np.ndarray, K: np.ndarray,
                 H: int, W: int, radius: int) -> tuple[np.ndarray, np.ndarray]:
    import cv2
    img = np.zeros((H, W, 3), np.float32)
    msk = np.zeros((H, W), np.float32)
    order = np.argsort(-verts[:, 2])  # far-to-near painter's order
    for i in order:
        x, y, z = verts[i]
        if z <= 0.1:
            continue
        u = int(round(K[0, 0] * x / z + K[0, 2]))
        v = int(round(K[1, 1] * y / z + K[1, 2]))
        if 0 <= u < W and 0 <= v < H:
            c = tuple(float(ch) for ch in colors[i])
            cv2.circle(img, (u, v), radius, c, -1)
            cv2.circle(msk, (u, v), radius, 1.0, -1)
    return img, msk


def make_synthetic_sequence(root: str | Path, n_frames: int = 8,
                            H: int = 64, W: int = 64,
                            ring_size: int = 8, seed: int = 0,
                            distance: float = 3.0) -> Path:
    """Write a synthetic sequence; returns the sequence dir.

    Camera: identity extrinsics (camera at origin, z forward), focal ~ W.
    Body: toy SMPL at (0, 0, distance), arms swinging sinusoidally.
    """
    import cv2
    from ..body import smpl_forward, toy_smpl_model

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "masks").mkdir(parents=True, exist_ok=True)

    model = toy_smpl_model(ring_size=ring_size, seed=seed)
    V = model.num_verts
    rng = np.random.RandomState(seed)
    colors = rng.rand(V, 3).astype(np.float32) * 0.7 + 0.3

    f = float(W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    extrinsic = np.eye(4)
    np.savez(root / "cameras.npz", intrinsic=K, extrinsic=extrinsic,
             height=H, width=W)

    betas = np.zeros((1, 10), np.float32)
    body_pose = np.zeros((n_frames, 69), np.float32)
    t = np.arange(n_frames, dtype=np.float32)
    # swing shoulders (joints 16/17 -> body_pose indices 15*3..16*3)
    body_pose[:, 45 + 2] = 0.5 * np.sin(t * 0.7)       # L shoulder z
    body_pose[:, 48 + 2] = -0.5 * np.sin(t * 0.7)      # R shoulder z
    global_orient = np.zeros((n_frames, 3), np.float32)
    global_orient[:, 1] = 0.3 * np.sin(t * 0.5)        # slow yaw
    # +y is up in SMPL but image +v is down; flip via orient about z? keep
    # simple: render in camera coords directly (y down is fine for tests)
    transl = np.tile(np.array([[0.0, 0.0, distance]], np.float32),
                     (n_frames, 1))

    out = smpl_forward(model, betas, body_pose, global_orient, transl)
    verts = np.asarray(out.vertices)               # (N, V, 3)

    radius = max(1, int(0.06 * f / distance))
    for i in range(n_frames):
        img, msk = _splat_frame(verts[i], colors, K, H, W, radius)
        # written and later read via cv2 (both BGR) — consistent round-trip
        cv2.imwrite(str(root / f"images/{i:04d}.png"),
                    (img * 255).astype(np.uint8))
        np.save(root / f"masks/{i:04d}.npy", msk)

    np.savez(root / "poses.npz", betas=betas, body_pose=body_pose,
             global_orient=global_orient, transl=transl)
    return root
