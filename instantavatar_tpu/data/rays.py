"""Camera ray generation (host-side numpy, precomputed once per camera).

Same math as the reference's per-dataset helpers
(/root/reference/instant_avatar/datasets/peoplesnapshot.py:12-25): pixel
grid -> K^-1 -> camera dirs -> c2w rotation -> normalized world dirs, with
origins broadcast from the camera center. Precomputing on host matches the
reference's dataloader-worker split and keeps the jit graphs free of
per-frame camera math.
"""
from __future__ import annotations

import numpy as np

__all__ = ["make_ray_grid", "make_ray_basis", "near_far_from_transl"]


def make_ray_grid(K: np.ndarray, c2w: np.ndarray, H: int, W: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Per-pixel rays for a pinhole camera.

    Args:
      K: (3, 3) intrinsics.
      c2w: (4, 4) or (3, 4) camera-to-world.
      H, W: image size.

    Returns:
      rays_o, rays_d: (H, W, 3) float32; directions unit-norm in world space.
    """
    x, y = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pix = np.stack([x, y, np.ones_like(x)], axis=-1).reshape(-1, 3)
    d_cam = pix.astype(np.float64) @ np.linalg.inv(K).T
    d_world = d_cam @ np.asarray(c2w)[:3, :3].T
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
    o_world = np.broadcast_to(np.asarray(c2w)[:3, 3], d_world.shape)
    return (o_world.reshape(H, W, 3).astype(np.float32),
            d_world.reshape(H, W, 3).astype(np.float32))


def make_ray_basis(K: np.ndarray, c2w: np.ndarray) -> np.ndarray:
    """Pinhole ray-grid generator basis: (4, 3) rows [o, b0, bx, by] with
    the UNnormalized world direction of pixel (x, y) being
    ``b0 + x*bx + y*by`` (and ``make_ray_grid``'s dirs its normalization).

    Full-image batches carry this so the fused flat-eval render can
    COMPUTE each pixel's direction from its block's coordinates instead of
    gathering per-pixel ray rows — at 540px the (9 offsets x stream) od
    gather plus its index copies cost ~65 ms/frame (xplane r3)."""
    Kinv = np.linalg.inv(K)
    R = np.asarray(c2w)[:3, :3]
    cols = (np.stack([[0, 0, 1.0], [1, 0, 0], [0, 1, 0]]) @ Kinv.T) @ R.T
    return np.concatenate([np.asarray(c2w)[:3, 3][None], cols]) \
        .astype(np.float32)


def near_far_from_transl(transl: np.ndarray, margin: float = 1.0
                         ) -> tuple[np.ndarray, np.ndarray]:
    """The reference's near/far heuristic: camera at origin, body at
    ``transl`` -> near/far = ||transl|| -/+ 1 (peoplesnapshot.py:146-151)."""
    dist = np.sqrt(np.square(transl).sum(-1))
    return (dist - margin).astype(np.float32), (dist + margin).astype(np.float32)
