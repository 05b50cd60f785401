"""Deterministic synthetic body model for hermetic tests and benches.

The real ``SMPL_*.pkl`` assets are license-gated (user-downloaded in the
reference, install.sh + body_models.py), so tests cannot assume them. This
builds a small humanoid with the *real* SMPL kinematic tree (24 joints, same
parent table) and structurally valid tensors: rings of vertices centered on
each joint (so ``J_regressor @ v_template == joints`` exactly), smooth
distance-based skinning weights, and small deterministic blendshapes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .smpl import SMPLModel

__all__ = ["toy_smpl_model", "SMPL_PARENTS", "TOY_JOINTS"]

# the real SMPL kinematic tree (public model layout)
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12,
     13, 14, 16, 17, 18, 19, 20, 21], dtype=np.int64)

# approximate rest-pose ("T/A-pose-ish") joint locations, meters, y-up
TOY_JOINTS = np.array([
    [0.00, 0.00, 0.00],    # 0 pelvis
    [0.09, -0.07, 0.00],   # 1 L hip
    [-0.09, -0.07, 0.00],  # 2 R hip
    [0.00, 0.11, 0.00],    # 3 spine1
    [0.10, -0.45, 0.00],   # 4 L knee
    [-0.10, -0.45, 0.00],  # 5 R knee
    [0.00, 0.24, 0.00],    # 6 spine2
    [0.10, -0.84, -0.02],  # 7 L ankle
    [-0.10, -0.84, -0.02], # 8 R ankle
    [0.00, 0.30, 0.00],    # 9 spine3
    [0.12, -0.90, 0.10],   # 10 L foot
    [-0.12, -0.90, 0.10],  # 11 R foot
    [0.00, 0.47, 0.00],    # 12 neck
    [0.07, 0.40, 0.00],    # 13 L collar
    [-0.07, 0.40, 0.00],   # 14 R collar
    [0.00, 0.58, 0.02],    # 15 head
    [0.17, 0.42, 0.00],    # 16 L shoulder
    [-0.17, 0.42, 0.00],   # 17 R shoulder
    [0.43, 0.41, 0.00],    # 18 L elbow
    [-0.43, 0.41, 0.00],   # 19 R elbow
    [0.68, 0.40, 0.00],    # 20 L wrist
    [-0.68, 0.40, 0.00],   # 21 R wrist
    [0.76, 0.40, 0.00],    # 22 L hand
    [-0.76, 0.40, 0.00],   # 23 R hand
], dtype=np.float32)


def toy_smpl_model(ring_size: int = 8, num_betas: int = 10,
                   seed: int = 0, bone_rings: int = 0) -> SMPLModel:
    """Build the toy model. V = 24 * ring_size (+ 23 * bone_rings *
    ring_size) verts.

    ``bone_rings``: extra vertex rings along each bone segment with
    EXACT one-hot(parent-joint) skinning weights. A point rigidly
    attached to segment parent->child moves with the parent joint's
    world transform; with only joint rings, the KNN-baked weight voxel
    blends both end joints mid-bone, which contradicts any rigidly-
    deforming GT surface (e.g. the capsule synthetic body) by up to
    centimetres across poses — an irreducible correspondence blur.
    Default 0 keeps the original byte-identical model."""
    rng = np.random.RandomState(seed)
    J = 24
    joints = TOY_JOINTS.copy()
    parents = SMPL_PARENTS

    # one ring of verts centered on each joint, radius ~5 cm, oriented in a
    # deterministic plane per joint
    angles = 2 * np.pi * np.arange(ring_size) / ring_size
    verts = []
    for j in range(J):
        u = np.array([np.cos(0.7 * j), np.sin(0.9 * j), np.cos(1.3 * j + 1)])
        u /= np.linalg.norm(u)
        w = np.array([-u[1], u[0], 0.0])
        if np.linalg.norm(w) < 1e-3:
            w = np.array([1.0, 0.0, 0.0])
        w /= np.linalg.norm(w)
        v2 = np.cross(u, w)
        ring = (joints[j][None]
                + 0.05 * np.cos(angles)[:, None] * w[None]
                + 0.05 * np.sin(angles)[:, None] * v2[None])
        verts.append(ring)
    v_template = np.concatenate(verts, axis=0).astype(np.float32)  # (V, 3)
    V = v_template.shape[0]

    # J_regressor: mean of each joint's own ring → exact joint recovery
    J_regressor = np.zeros((J, V), dtype=np.float32)
    for j in range(J):
        J_regressor[j, j * ring_size:(j + 1) * ring_size] = 1.0 / ring_size

    # skinning weights: softmax of negative distance to joints (temp 0.02),
    # sharp enough that each ring follows its own joint
    d = np.linalg.norm(v_template[:, None] - joints[None], axis=-1)  # (V, J)
    logits = -d / 0.02
    logits -= logits.max(axis=1, keepdims=True)
    w = np.exp(logits)
    weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # small smooth blendshapes (deterministic; drawn at base V so the
    # bone_rings=0 model stays byte-identical)
    shapedirs = (0.01 * rng.randn(V, 3, num_betas)).astype(np.float32)
    posedirs = (0.001 * rng.randn((J - 1) * 9, V * 3)).astype(np.float32)

    if bone_rings > 0:
        extra_v, extra_w = [], []
        for b in range(1, J):
            p = int(parents[b])
            axis = joints[b] - joints[p]
            an = axis / max(np.linalg.norm(axis), 1e-9)
            w0 = np.array([-an[1], an[0], 0.0])
            if np.linalg.norm(w0) < 1e-3:
                w0 = np.array([1.0, 0.0, 0.0])
            w0 /= np.linalg.norm(w0)
            v2 = np.cross(an, w0)
            for k in range(1, bone_rings + 1):
                f = k / (bone_rings + 1.0)
                center = joints[p] * (1 - f) + joints[b] * f
                ring = (center[None]
                        + 0.05 * np.cos(angles)[:, None] * w0[None]
                        + 0.05 * np.sin(angles)[:, None] * v2[None])
                extra_v.append(ring)
                w_row = np.zeros((ring_size, J), np.float32)
                w_row[:, p] = 1.0        # rigid with the PARENT transform
                extra_w.append(w_row)
        ev = np.concatenate(extra_v, axis=0).astype(np.float32)
        ew = np.concatenate(extra_w, axis=0)
        Ve = ev.shape[0]
        v_template = np.concatenate([v_template, ev], axis=0)
        weights = np.concatenate([weights, ew], axis=0)
        J_regressor = np.concatenate(
            [J_regressor, np.zeros((J, Ve), np.float32)], axis=1)
        shapedirs = np.concatenate(
            [shapedirs, (0.01 * rng.randn(Ve, 3, num_betas))
             .astype(np.float32)], axis=0)
        pd = posedirs.reshape((J - 1) * 9, V, 3)
        pd_e = (0.001 * rng.randn((J - 1) * 9, Ve, 3)).astype(np.float32)
        posedirs = np.concatenate([pd, pd_e], axis=1) \
            .reshape((J - 1) * 9, (V + Ve) * 3)
        V = V + Ve

    # faces: stitch consecutive ring verts within each joint ring (a valid,
    # closed-ish triangle fan per ring — enough for mesh-distance tests)
    faces = []
    for j in range(J):
        base = j * ring_size
        for k in range(ring_size - 2):
            faces.append([base, base + k + 1, base + k + 2])
    faces = np.asarray(faces, dtype=np.int64)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        parents=parents,
        faces=faces,
    )
