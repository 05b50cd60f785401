"""Mesh extraction + preprocessing-script tests."""
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def test_marching_tetrahedra_sphere():
    from instantavatar_tpu.utils.marching_cubes import marching_tetrahedra
    n = 48
    ax = np.linspace(-1, 1, n)
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 0.6 - np.sqrt(x * x + y * y + z * z)  # inside positive
    spacing = 2.0 / (n - 1)
    verts, faces = marching_tetrahedra(vol, 0.0,
                                       spacing=(spacing,) * 3,
                                       origin=(-1.0, -1.0, -1.0))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert r.std() < 0.02


def test_field_to_mesh_and_obj(tmp_path):
    import jax.numpy as jnp
    from instantavatar_tpu.utils.marching_cubes import (field_to_mesh,
                                                        save_obj)

    def density(pts):
        return 10.0 * (0.4 - jnp.linalg.norm(pts - jnp.asarray([0.1, 0., 0.]),
                                             axis=-1))

    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    verts, faces = field_to_mesh(density, aabb, resolution=32)
    assert len(verts) > 50
    d = np.linalg.norm(verts - [0.1, 0, 0], axis=-1)
    np.testing.assert_allclose(d.mean(), 0.4, atol=0.05)
    out = tmp_path / "mesh.obj"
    save_obj(out, verts, faces)
    lines = out.read_text().splitlines()
    assert sum(l.startswith("v ") for l in lines) == len(verts)
    assert sum(l.startswith("f ") for l in lines) == len(faces)


def test_largest_mesh_component():
    from instantavatar_tpu.utils.marching_cubes import \
        largest_mesh_component
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],   # big: 2 tris
                      [2, 0, 0], [3, 0, 0], [2, 1, 0],
                      [9, 9, 9], [10, 9, 9], [9, 10, 9]], np.float32)
    # component A: faces sharing verts 0-5? make 0-2 and 0,1,3 connected
    faces = np.array([[0, 1, 2], [1, 3, 2], [6, 7, 8]], np.int32)
    v, f = largest_mesh_component(verts, faces)
    assert len(f) == 2 and len(v) == 4


def test_refine_smpl_script_recovers_translation(tmp_path):
    """End-to-end run of the refinement script on a synthetic sequence:
    keypoints generated from GT poses, initial transl perturbed — the
    optimized poses must move toward GT."""
    sys.path.insert(0, str(REPO))
    import jax.numpy as jnp
    from instantavatar_tpu.body import smpl_forward, toy_smpl_model
    from instantavatar_tpu.body.extra_joints import (SMPL_TO_BODY25,
                                                     body25_keypoints_or_core)
    from instantavatar_tpu.data import make_synthetic_sequence

    seq = make_synthetic_sequence(tmp_path / "seq", n_frames=3, H=64, W=64)
    toy = toy_smpl_model()
    raw = dict(np.load(seq / "poses.npz"))
    K = np.load(seq / "cameras.npz")["intrinsic"]

    out = smpl_forward(toy, jnp.asarray(raw["betas"]),
                       jnp.asarray(raw["body_pose"]),
                       jnp.asarray(raw["global_orient"]),
                       jnp.asarray(raw["transl"]))
    j, slots = body25_keypoints_or_core(out.joints, out.vertices)
    p = np.asarray(j) @ K.T
    p2d = p[..., :2] / p[..., 2:3]
    kp = np.zeros((3, 25, 3), np.float32)
    kp[:, slots, :2] = p2d
    kp[:, slots, 2] = 1.0
    np.save(seq / "keypoints.npy", kp)

    # perturb the stored poses
    rng = np.random.RandomState(0)
    gt_transl = raw["transl"].copy()
    raw["transl"] = raw["transl"] + 0.15 * rng.randn(3, 3).astype(np.float32)
    np.savez(seq / "poses.npz", **raw)
    err0 = np.abs(raw["transl"] - gt_transl).mean()

    res = subprocess.run(
        [sys.executable, str(REPO / "scripts/custom/refine_smpl.py"),
         "--data-dir", str(seq), "--smpl-path", "/nonexistent",
         "--iters", "150", "--lr", "0.02", "--w-temporal", "0"],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "PYTHONPATH": str(REPO),
             "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr[-2000:]
    opt = np.load(seq / "poses_optimized.npz")
    err1 = np.abs(opt["transl"] - gt_transl).mean()
    assert err1 < 0.5 * err0, (err0, err1, res.stdout[-500:])
