"""Direct coverage for EdgeSampler, MocapDataset, and checkpoint graft —
surfaces previously exercised only indirectly through the CLI pipeline
(reference parity: surreal.py:103-133 inline sampling; eval.py checkpoint
surgery)."""
import numpy as np
import pytest

from instantavatar_tpu.data import AvatarDataset, make_synthetic_sequence
from instantavatar_tpu.data.datasets import MocapDataset
from instantavatar_tpu.data.samplers import EdgeSampler


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mocap_seq")
    return make_synthetic_sequence(root, n_frames=2, H=48, W=48)


def test_edge_sampler_ratios_and_locations():
    H = W = 64
    mask = np.zeros((H, W), np.float32)
    mask[16:48, 16:48] = 1.0
    rgb = np.linspace(0, 1, H * W * 3).reshape(H, W, 3).astype(np.float32)
    s = EdgeSampler(100, ratio_mask=0.6, ratio_edge=0.3, kernel_size=8,
                    rng=np.random.default_rng(0))
    assert (s.num_mask, s.num_edge, s.num_rand) == (60, 30, 10)
    m_s, rgb_s = s.sample(mask, rgb)
    assert m_s.shape == (100,) and rgb_s.shape == (100, 3)
    # the first 60 are mask-interior samples
    assert (m_s[:60] > 0.5).all()
    # edge samples sit within kernel_size of the mask boundary: their
    # distance-to-boundary is < kernel_size (morphological band)
    ys, xs = np.mgrid[0:H, 0:W]
    flat_idx = np.where(np.isclose(
        rgb.reshape(-1, 3)[:, 0][None], rgb_s[60:90, 0][:, None],
        atol=1e-9))[1]
    yy, xx = flat_idx // W, flat_idx % W
    d_out = np.maximum.reduce([16 - yy, yy - 47, 16 - xx, xx - 47])
    assert (d_out < 8).all()  # inside or within the band


def test_edge_sampler_rejects_bad_ratios():
    with pytest.raises(ValueError):
        EdgeSampler(10, ratio_mask=0.8, ratio_edge=0.4)


def test_mocap_dataset_default_edge_sampler(seq_dir):
    ds = MocapDataset(seq_dir, "train", start=0, end=1, num_samples=256)
    assert isinstance(ds.sampler, EdgeSampler)
    b = ds[0]
    assert b["rgb"].shape == (256, 3)
    assert b["rays_o"].shape == (256, 3)
    assert b["alpha"].shape == (256,)
    assert b["body_pose"].shape == (69,)
    # val split: full images, no sampler
    dv = MocapDataset(seq_dir, "val", start=0, end=0)
    assert dv.sampler is None
    assert dv[0]["rgb"].shape == (48 * 48, 3)


def test_graft_rebuilds_pytree_from_raw():
    from collections import namedtuple
    from instantavatar_tpu.train.harness import graft
    import jax.numpy as jnp
    NT = namedtuple("NT", ["a", "b"])
    target = {"x": NT(a=jnp.zeros((2,)), b=(jnp.ones((3,)), 5)),
              "y": [jnp.zeros((1,))]}
    raw = {"x": {"a": np.arange(2.0), "b": [np.full((3,), 7.0), 9]},
           "y": [np.array([3.0])]}
    out = graft(target, raw)
    assert isinstance(out["x"], NT)
    np.testing.assert_allclose(np.asarray(out["x"].a), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(out["x"].b[0]), 7.0)
    assert out["x"].b[1] == 9
    np.testing.assert_allclose(np.asarray(out["y"][0]), [3.0])


def test_capsule_gt_shading_is_rotation_invariant():
    """The capsule GT's Lambert shading must be attachable to a canonical
    field: colors along a ray must be invariant to a global rotation
    applied to (joints, bone rotations, ray). The legacy minimal-rotation
    light attachment violated this under yaw (R=I for bones parallel to
    the yaw axis) — training plateaued at 17 dB (r4, 540px); the full
    kinematic bone_rots fix makes -(R n_c)@(R l0) = -n_c@l0 exact."""
    import cv2
    import numpy as np

    from instantavatar_tpu.body import smpl_forward, toy_smpl_model
    from instantavatar_tpu.data.synthetic import render_capsule_frame

    model = toy_smpl_model(bone_rings=2)
    out = smpl_forward(model, np.zeros((1, 10), np.float32),
                       np.zeros((1, 69), np.float32),
                       np.zeros((1, 3), np.float32),
                       np.array([[0, 0, 3.0]], np.float32))
    joints = np.asarray(out.joints)[0]
    A = np.asarray(out.A)[0, :, :3, :3]
    parents = np.asarray(model.parents)
    H = W = 128
    f = float(W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    th = 0.45
    c, s = np.cos(th), np.sin(th)
    Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    i1, m1 = render_capsule_frame(joints, parents, K, H, W, radii=0.07,
                                  ss=3, use_jax=False, bone_rots=A)
    i2, m2 = render_capsule_frame(joints @ Ry.T, parents, K, H, W,
                                  radii=0.07, ss=3, use_jax=False,
                                  bone_rots=Ry @ A)
    m1e = cv2.erode((m1 > 0.999).astype(np.uint8), np.ones((5, 5), np.uint8))
    ys, xs = np.nonzero(m1e)
    ys, xs = ys[::2], xs[::2]
    d = np.stack([(xs + 0.5 - K[0, 2]) / f, (ys + 0.5 - K[1, 2]) / f,
                  np.ones_like(xs, float)], -1)
    d2 = d @ Ry.T
    u2 = d2[:, 0] / d2[:, 2] * f + K[0, 2] - 0.5
    v2 = d2[:, 1] / d2[:, 2] * f + K[1, 2] - 0.5
    ok = (u2 >= 1) & (u2 < W - 2) & (v2 >= 1) & (v2 < H - 2)
    ys, xs, u2, v2 = ys[ok], xs[ok], u2[ok], v2[ok]
    x0, y0 = np.floor(u2).astype(int), np.floor(v2).astype(int)
    fx, fy = u2 - x0, v2 - y0
    m2e = cv2.erode((m2 > 0.999).astype(np.uint8), np.ones((3, 3), np.uint8))
    ok2 = ((m2e[y0, x0] > 0) & (m2e[y0 + 1, x0 + 1] > 0)
           & (m2e[y0, x0 + 1] > 0) & (m2e[y0 + 1, x0] > 0))
    bil = (i2[y0, x0] * ((1 - fx) * (1 - fy))[:, None]
           + i2[y0, x0 + 1] * (fx * (1 - fy))[:, None]
           + i2[y0 + 1, x0] * ((1 - fx) * fy)[:, None]
           + i2[y0 + 1, x0 + 1] * (fx * fy)[:, None])
    err = np.abs(i1[ys, xs] - bil)[ok2]
    assert ok2.sum() > 50
    assert err.mean() < 0.008, err.mean()  # ~bilinear resample noise


def test_capsule_gt_jax_path_matches_numpy():
    """The jitted capsule tracer (used for >=128px frames) must match the
    f64 host tracer. On TPU the default-bf16 matmul precision corrupted
    the capsule discriminant (b^2 - a*c cancels to the r^2*baba ~ 1e-4
    scale) into periodic phantom bands — the r4 'slinky GT' quality
    plateau; every contraction in _capsule_shade_jax is now pinned to
    Precision.HIGHEST. This guards the path parity (and the pin, when
    run on TPU)."""
    import numpy as np

    from instantavatar_tpu.body import smpl_forward, toy_smpl_model
    from instantavatar_tpu.data.synthetic import render_capsule_frame

    model = toy_smpl_model(bone_rings=2)
    out = smpl_forward(model, np.zeros((1, 10), np.float32),
                       np.zeros((1, 69), np.float32),
                       np.zeros((1, 3), np.float32),
                       np.array([[0, 0, 3.0]], np.float32))
    joints = np.asarray(out.joints)[0]
    A = np.asarray(out.A)[0, :, :3, :3]
    parents = np.asarray(model.parents)
    H = W = 96
    f = float(W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    ij, mj = render_capsule_frame(joints, parents, K, H, W, radii=0.07,
                                  ss=3, use_jax=True, bone_rots=A)
    inp, mn = render_capsule_frame(joints, parents, K, H, W, radii=0.07,
                                   ss=3, use_jax=False, bone_rots=A)
    assert mn.mean() > 0.02  # body actually covers pixels
    assert np.abs(mj - mn).mean() < 1e-4
    assert np.abs(ij - inp).mean() < 1e-4
