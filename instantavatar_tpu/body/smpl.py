"""SMPL body model — pure-functional JAX implementation.

Re-implements the capability of the reference's vendored smplx fork
(/root/reference/instant_avatar/deformers/smplx/body_models.py:289-372,
lbs.py:152-248): linear blend skinning with shape/pose blendshapes and a
24-joint kinematic chain, returning the *extended* outputs the deformers
need — per-joint world transforms ``A`` and per-vertex transforms ``T``
(both with the global translation folded into the translation column).

TPU-first notes: everything is static-shape fp32 (matching the reference
forcing fp32 in the deformer path, snarf_deformer.py:63-69); the kinematic
chain is a static unrolled 24-step compose (J=24 known at trace time, no
scan overhead); all heavy math is einsum → MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SMPLModel", "SMPLOutput", "rodrigues", "rigid_transform_chain",
           "smpl_forward", "lbs"]

NUM_JOINTS = 24
NUM_BETAS = 10


class SMPLModel(NamedTuple):
    """Static model data (a pytree of arrays, jit-safe as a closure/static arg)."""

    v_template: jax.Array   # (V, 3)
    shapedirs: jax.Array    # (V, 3, n_betas)
    posedirs: jax.Array     # ((J-1)*9, V*3) — pose-blendshape basis
    J_regressor: jax.Array  # (J, V)
    lbs_weights: jax.Array  # (V, J)
    parents: np.ndarray     # (J,) int — static (drives the unrolled chain)
    faces: np.ndarray       # (F, 3) int — static topology

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]


class SMPLOutput(NamedTuple):
    vertices: jax.Array       # (B, V, 3) — posed verts incl. transl
    joints: jax.Array         # (B, J, 3) — posed joints incl. transl
    A: jax.Array              # (B, J, 4, 4) — per-joint world transforms (incl. transl)
    T: jax.Array              # (B, V, 4, 4) — per-vertex skinning transforms (incl. transl)
    v_shaped: jax.Array       # (B, V, 3) — template + shape offsets (rest pose)
    joints_rest: jax.Array    # (B, J, 3) — rest-pose joint locations
    shape_offsets: jax.Array  # (B, V, 3)
    pose_offsets: jax.Array   # (B, V, 3)


def rodrigues(rot_vecs: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) → rotation matrices (..., 3, 3).

    Numerically safe at ||θ|| → 0 (uses the exact series limit there).
    """
    sq = jnp.sum(rot_vecs * rot_vecs, axis=-1, keepdims=True)  # (..., 1)
    small = sq < 1e-16
    # mask the sqrt *input* so the unselected branch never produces NaN
    # cotangents (d sqrt(x)/dx at 0 is inf; where() alone doesn't block it)
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    axis = rot_vecs / angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([
        zeros, -z, y,
        z, zeros, -x,
        -y, x, zeros,
    ], axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    sin = jnp.sin(angle)[..., None]
    cos = jnp.cos(angle)[..., None]
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    R = eye + sin * K + (1.0 - cos) * (K @ K)
    # series limit: R ≈ I + K̂θ where K̂θ = skew(rot_vecs) itself
    K_raw = jnp.stack([
        zeros, -rot_vecs[..., 2], rot_vecs[..., 1],
        rot_vecs[..., 2], zeros, -rot_vecs[..., 0],
        -rot_vecs[..., 1], rot_vecs[..., 0], zeros,
    ], axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    R_small = eye + K_raw
    return jnp.where(small[..., None], R_small, R)


def _rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) → (..., 4, 4) homogeneous transforms."""
    shape = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)         # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), shape + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_transform_chain(rot_mats: jax.Array, joints: jax.Array,
                          parents: np.ndarray) -> tuple[jax.Array, jax.Array]:
    """Compose the kinematic chain.

    Args:
      rot_mats: (B, J, 3, 3) local joint rotations.
      joints:   (B, J, 3) rest-pose joint locations.
      parents:  (J,) static parent indices (parents[0] == -1).

    Returns:
      posed_joints: (B, J, 3) world joint locations.
      A: (B, J, 4, 4) skinning transforms, i.e. world transform with the
         rest-pose joint location removed (A_j = G_j · [[I, -j_rest],[0,1]]).
    """
    B, J = rot_mats.shape[:2]
    rel_t = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])
    local = _rt_to_mat(rot_mats, rel_t)  # (B, J, 4, 4)

    # static unrolled compose over the (small, fixed) tree
    world = [local[:, 0]]
    for j in range(1, J):
        world.append(world[int(parents[j])] @ local[:, j])
    G = jnp.stack(world, axis=1)  # (B, J, 4, 4)

    posed_joints = G[..., :3, 3]
    # remove rest joint location: A = G - pack(G @ [j_rest, 0])
    corr = (G[..., :3, :3] @ joints[..., :, None])[..., 0]  # (B, J, 3)
    A = G.at[..., :3, 3].add(-corr)
    return posed_joints, A


def lbs(model: SMPLModel, betas: jax.Array, full_pose: jax.Array):
    """Core LBS: shapes (B, n_betas), (B, J*3) → all intermediate tensors."""
    B = full_pose.shape[0]
    dtype = jnp.float32
    betas = jnp.broadcast_to(betas.astype(dtype), (B, model.shapedirs.shape[-1]))

    shape_offsets = jnp.einsum("bl,vcl->bvc", betas, model.shapedirs)
    v_shaped = model.v_template[None] + shape_offsets                 # (B, V, 3)
    joints_rest = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)

    rot_mats = rodrigues(full_pose.reshape(B, -1, 3).astype(dtype))  # (B, J, 3, 3)
    J = rot_mats.shape[1]
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = rigid_transform_chain(rot_mats, joints_rest, model.parents)

    T = jnp.einsum("vj,bjrc->bvrc", model.lbs_weights, A)            # (B, V, 4, 4)
    verts = jnp.einsum("bvrc,bvc->bvr", T[..., :3, :3], v_posed) + T[..., :3, 3]
    return (verts, posed_joints, A, T, v_shaped, joints_rest,
            shape_offsets, pose_offsets)


def smpl_forward(model: SMPLModel,
                 betas: jax.Array,
                 body_pose: jax.Array,
                 global_orient: jax.Array,
                 transl: jax.Array | None = None) -> SMPLOutput:
    """Full SMPL forward.

    Args:
      betas: (B, 10) or (1, 10) (broadcast over batch like the reference).
      body_pose: (B, (J-1)*3) axis-angle.
      global_orient: (B, 3) axis-angle root rotation.
      transl: (B, 3) global translation, added to vertices/joints and to the
        translation column of A and T (the reference fork's key extension,
        body_models.py:353-360).
    """
    body_pose = jnp.atleast_2d(body_pose)
    global_orient = jnp.atleast_2d(global_orient)
    B = body_pose.shape[0]
    full_pose = jnp.concatenate(
        [jnp.broadcast_to(global_orient, (B, 3)), body_pose], axis=-1)
    (verts, joints, A, T, v_shaped, joints_rest,
     shape_offsets, pose_offsets) = lbs(model, betas, full_pose)
    if transl is not None:
        t = jnp.atleast_2d(transl).astype(verts.dtype)
        verts = verts + t[:, None]
        joints = joints + t[:, None]
        A = A.at[..., :3, 3].add(t[:, None])
        T = T.at[..., :3, 3].add(t[:, None])
    return SMPLOutput(verts, joints, A, T, v_shaped, joints_rest,
                      shape_offsets, pose_offsets)
