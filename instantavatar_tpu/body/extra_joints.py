"""OpenPose BODY25 keypoints from SMPL outputs.

The reference's vendored smplx fork extends the 24 SMPL joints with
vertex-picked landmarks (nose/eyes/ears/toes/heels — vertex_joint_selector
+ vertex_ids, reference files instant_avatar/deformers/smplx/
vertex_{joint_selector,ids}.py) and maps them to the OpenPose BODY25
ordering for keypoint-based pose fitting (scripts/custom/refine-smpl.py).
This module provides the same capability for the full 6890-vertex SMPL
body (gated on vertex count so the toy body degrades gracefully).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["SMPL_EXTRA_VERTEX_IDS", "SMPL_TO_BODY25", "body25_keypoints"]

# public smplx vertex ids for the extra landmarks (order: nose, reye, leye,
# rear, lear, LBigToe, LSmallToe, LHeel, RBigToe, RSmallToe, RHeel)
SMPL_EXTRA_VERTEX_IDS = np.array(
    [332, 6260, 2800, 4071, 583,
     3216, 3226, 3387, 6617, 6624, 6787], np.int64)

# joint index (into [24 smpl joints] + [11 extra landmarks]) per BODY25 slot
SMPL_TO_BODY25 = np.array(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
     25, 26, 27, 28, 29, 30, 31, 32, 33, 34], np.int64)


def body25_keypoints_or_core(joints, vertices):
    """Like body25_keypoints, but degrades to the core skeleton-only BODY25
    slots when the body lacks the full SMPL topology (e.g. the toy body).

    Returns (keypoints (B, S, 3), slot_indices (S,)) where slot_indices
    selects the matching columns of an OpenPose (N, 25, 3) array.
    """
    try:
        return body25_keypoints(joints, vertices), np.arange(25)
    except ValueError:
        core = np.nonzero(SMPL_TO_BODY25 < 24)[0]
        return joints[..., SMPL_TO_BODY25[core], :], core


def body25_keypoints(joints: jnp.ndarray, vertices: jnp.ndarray
                     ) -> jnp.ndarray:
    """(B, 24, 3) joints + (B, V, 3) verts -> (B, 25, 3) BODY25 keypoints.

    Requires the full SMPL topology (V == 6890); raises otherwise.
    """
    if vertices.shape[-2] < int(SMPL_EXTRA_VERTEX_IDS.max()) + 1:
        raise ValueError(
            "BODY25 keypoints need the full 6890-vertex SMPL body")
    extra = vertices[..., SMPL_EXTRA_VERTEX_IDS, :]     # (B, 11, 3)
    all_joints = jnp.concatenate([joints, extra], axis=-2)  # (B, 35, 3)
    return all_joints[..., SMPL_TO_BODY25, :]
