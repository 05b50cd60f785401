"""SMPL golden-value and invariance tests (reference has none; SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from instantavatar_tpu.body import (SMPL_PARENTS, rigid_transform_chain,
                                    rodrigues, smpl_forward, toy_smpl_model)


@pytest.fixture(scope="module")
def model():
    return toy_smpl_model()


def test_rodrigues_matches_scipy():
    rng = np.random.RandomState(0)
    vecs = rng.randn(32, 3).astype(np.float32)
    ours = np.asarray(rodrigues(jnp.asarray(vecs)))
    ref = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rodrigues_zero_is_identity():
    R = np.asarray(rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-7)


def test_rodrigues_grad_finite_at_zero():
    g = jax.grad(lambda v: rodrigues(v).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_smpl_grad_finite_at_zero_pose(model):
    """Full-forward gradient at the exactly-zero pose (pose fitting starts
    here); caught NaN via the where/norm gradient leak in verification."""
    g = jax.grad(lambda p: smpl_forward(
        model, jnp.zeros((1, 10)), p, jnp.zeros((1, 3))).vertices.sum())(
        jnp.zeros((1, 69)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_chain_zero_pose_identity(model):
    """Zero pose ⇒ skinning transforms are exactly identity."""
    B = 2
    joints = jnp.broadcast_to(
        model.J_regressor @ model.v_template, (B, 24, 3))
    rot = jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3))
    posed, A = rigid_transform_chain(rot, joints, model.parents)
    np.testing.assert_allclose(np.asarray(posed), np.asarray(joints), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A), np.broadcast_to(np.eye(4), (B, 24, 4, 4)), atol=1e-5)


def test_chain_three_joint_manual():
    """Hand-composed 3-joint chain matches."""
    parents = np.array([-1, 0, 1])
    joints = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [2., 0., 0.]]])
    # rotate joint 1 by 90° about z; joints 0, 2 identity
    Rz = Rotation.from_euler("z", 90, degrees=True).as_matrix().astype(np.float32)
    rots = jnp.asarray(np.stack([np.eye(3, dtype=np.float32), Rz,
                                 np.eye(3, dtype=np.float32)])[None])
    posed, A = rigid_transform_chain(rots, joints, parents)
    # joint 2 orbits joint 1: (2,0,0) → joint1 + Rz @ (1,0,0) = (1,1,0)
    np.testing.assert_allclose(np.asarray(posed[0, 2]), [1., 1., 0.], atol=1e-5)
    np.testing.assert_allclose(np.asarray(posed[0, 1]), [1., 0., 0.], atol=1e-6)


def test_forward_zero_pose(model):
    B = 3
    betas = jnp.zeros((1, 10))
    out = smpl_forward(model, betas, jnp.zeros((B, 69)), jnp.zeros((B, 3)),
                       jnp.zeros((B, 3)))
    np.testing.assert_allclose(np.asarray(out.vertices),
                               np.broadcast_to(np.asarray(model.v_template),
                                               (B,) + model.v_template.shape),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.A), np.broadcast_to(np.eye(4), (B, 24, 4, 4)), atol=1e-5)


def test_transl_offsets_everything(model):
    t = jnp.asarray([[0.5, -1.0, 2.0]])
    out0 = smpl_forward(model, jnp.zeros((1, 10)), jnp.zeros((1, 69)),
                        jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    out1 = smpl_forward(model, jnp.zeros((1, 10)), jnp.zeros((1, 69)),
                        jnp.zeros((1, 3)), t)
    np.testing.assert_allclose(np.asarray(out1.vertices - out0.vertices),
                               np.broadcast_to(np.asarray(t)[:, None], out0.vertices.shape),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1.A[..., :3, 3] - out0.A[..., :3, 3]),
                               np.broadcast_to(np.asarray(t)[:, None], (1, 24, 3)),
                               atol=1e-6)


def test_global_orient_rigid_rotation(model):
    """Pure global_orient rotates the whole body rigidly about the root joint."""
    rv = np.array([0.3, -0.2, 0.9], dtype=np.float32)
    R = Rotation.from_rotvec(rv).as_matrix()
    out0 = smpl_forward(model, jnp.zeros((1, 10)), jnp.zeros((1, 69)),
                        jnp.zeros((1, 3)))
    out1 = smpl_forward(model, jnp.zeros((1, 10)), jnp.zeros((1, 69)),
                        jnp.asarray(rv)[None])
    root = np.asarray(out0.joints_rest[0, 0])
    expect = (np.asarray(out0.vertices[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(out1.vertices[0]), expect, atol=2e-5)


def test_T_skins_vertices(model):
    """vertices == T applied to (v_shaped + pose_offsets)."""
    rng = np.random.RandomState(1)
    pose = jnp.asarray(0.3 * rng.randn(2, 69).astype(np.float32))
    orient = jnp.asarray(0.3 * rng.randn(2, 3).astype(np.float32))
    betas = jnp.asarray(rng.randn(1, 10).astype(np.float32))
    out = smpl_forward(model, betas, pose, orient, jnp.zeros((2, 3)))
    v_posed = out.v_shaped + out.pose_offsets
    rebuilt = (jnp.einsum("bvrc,bvc->bvr", out.T[..., :3, :3], v_posed)
               + out.T[..., :3, 3])
    np.testing.assert_allclose(np.asarray(rebuilt), np.asarray(out.vertices),
                               atol=1e-5)


def test_jit_and_grad(model):
    """Forward is jittable; gradients flow into pose params (pose fitting)."""
    def loss(pose):
        out = smpl_forward(model, jnp.zeros((1, 10)), pose, jnp.zeros((1, 3)))
        return jnp.sum(out.vertices ** 2)

    g = jax.jit(jax.grad(loss))(jnp.full((1, 69), 0.1))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_toy_regressor_exact(model):
    j = np.asarray(model.J_regressor @ model.v_template)
    from instantavatar_tpu.body import TOY_JOINTS
    np.testing.assert_allclose(j, TOY_JOINTS, atol=1e-6)
    assert list(model.parents) == list(SMPL_PARENTS)
