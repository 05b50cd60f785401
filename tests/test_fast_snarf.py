"""Fast-SNARF tests: grid-sample golden vs torch, KNN golden, Broyden
round-trip on the toy body, gradient paths (SURVEY §4, §7.2 step 6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantavatar_tpu.body import smpl_forward, toy_smpl_model
from instantavatar_tpu.deformers.fast_snarf import (SNARFDeformer,
                                                    get_predefined_rest_pose)
from instantavatar_tpu.ops.grid_sample import grid_sample_3d
from instantavatar_tpu.ops.knn import knn_points


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    vox = rng.randn(5, 4, 6, 7).astype(np.float32)
    coords = (rng.rand(50, 3) * 2.4 - 1.2).astype(np.float32)  # incl. border
    ours = np.asarray(grid_sample_3d(jnp.asarray(vox), jnp.asarray(coords)))
    ref = F.grid_sample(torch.from_numpy(vox)[None],
                        torch.from_numpy(coords).view(1, -1, 1, 1, 3),
                        align_corners=True, padding_mode="border",
                        mode="bilinear")[0, :, :, 0, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_knn_golden():
    rng = np.random.RandomState(1)
    pts = rng.randn(100, 3).astype(np.float32)
    verts = rng.randn(40, 3).astype(np.float32)
    dist, idx = knn_points(jnp.asarray(pts), jnp.asarray(verts), k=5,
                           chunk=32)
    full = ((pts[:, None] - verts[None]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(dist),
                               np.take_along_axis(full, ref_idx, 1),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def toy():
    return toy_smpl_model()


@pytest.fixture(scope="module")
def snarf(toy):
    return SNARFDeformer(toy, resolution=64, cano_pose="da_pose",
                         knn_chunk=4096)


@pytest.fixture(scope="module")
def canonical(snarf):
    return snarf.build_canonical(jnp.zeros((1, 10)))


def test_canonical_bake(snarf, canonical):
    d, h, w = snarf.vox_shape
    assert canonical.lbs_voxel.shape == (24, d, h, w)
    vox = np.asarray(canonical.lbs_voxel)
    np.testing.assert_allclose(vox.sum(0), 1.0, atol=1e-5)  # normalized
    assert (vox >= 0).all()


def test_rest_pose_identity_roundtrip(snarf, canonical):
    """With the pose equal to the canonical rest pose, tfs == identity and
    the search must return xc == xd for on-body points."""
    rest_pose = get_predefined_rest_pose("da_pose")
    frame = snarf.prepare(canonical, jnp.zeros((1, 10)), rest_pose[0],
                          jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(frame.tfs),
                               np.broadcast_to(np.eye(4), (24, 4, 4)),
                               atol=1e-4)
    xd = canonical.vs_template[::16]
    xc, valid, _ = snarf.search(canonical, frame, xd)
    assert bool(valid.any(-1).all()), "all on-body points should converge"
    best = np.asarray(jnp.argmax(valid, axis=-1))
    sel = np.asarray(xc)[np.arange(len(best)), best]
    np.testing.assert_allclose(sel, np.asarray(xd), atol=2e-3)


def test_posed_search_inverts_forward_skinning(snarf, canonical, toy):
    """Pose the body; forward-skin canonical surface points -> search must
    recover canonical correspondences (fwd(search(x)) ~ x)."""
    rng = np.random.RandomState(3)
    pose = jnp.asarray(0.3 * rng.randn(69).astype(np.float32))
    frame = snarf.prepare(canonical, jnp.zeros((1, 10)), pose,
                          jnp.zeros(3), jnp.zeros(3))
    xc_gt = canonical.vs_template[::16]
    xd = snarf.forward_skinning(canonical, frame.tfs, xc_gt)
    xc, valid, _ = snarf.search(canonical, frame, xd)
    assert float(valid.any(-1).mean()) > 0.95
    # verify round trip through the forward map for each valid candidate
    xd_rt = snarf.forward_skinning(canonical, frame.tfs, xc)
    err = jnp.linalg.norm(xd_rt - xd[:, None], axis=-1)
    err = jnp.where(valid, err, 0.0)
    assert float(err.max()) < 1e-3


def test_pruned_inits_match_full_search(snarf, canonical, toy):
    """n_init_active=4 must find the same canonical correspondences as the
    full 13-init search for on-body points (the true bone is almost always
    among the 4 nearest)."""
    rng = np.random.RandomState(7)
    pose = jnp.asarray(0.3 * rng.randn(69).astype(np.float32))
    frame = snarf.prepare(canonical, jnp.zeros((1, 10)), pose,
                          jnp.zeros(3), jnp.zeros(3))
    xc_gt = canonical.vs_template[::16]
    xd = snarf.forward_skinning(canonical, frame.tfs, xc_gt)

    pruned = SNARFDeformer(toy, resolution=64, cano_pose="da_pose",
                           n_init_active=4, knn_chunk=4096)
    xc_p, valid_p, _ = pruned.search(canonical, frame, xd)
    assert float(valid_p.any(-1).mean()) > 0.95
    xd_rt = pruned.forward_skinning(canonical, frame.tfs, xc_p)
    err = jnp.where(valid_p, jnp.linalg.norm(xd_rt - xd[:, None], axis=-1), 0.0)
    assert float(err.max()) < 1e-3


def test_filter_duplicates():
    xc = jnp.zeros((1, 3, 3)).at[0, 2].set(1.0)  # cands 0,1 identical
    valid = jnp.ones((1, 3), bool)
    out = SNARFDeformer._filter_duplicates(xc, valid)
    np.testing.assert_array_equal(np.asarray(out[0]), [False, True, True])


def test_field_fn_max_sigma_select(snarf, canonical):
    rest_pose = get_predefined_rest_pose("da_pose")
    frame = snarf.prepare(canonical, jnp.zeros((1, 10)), rest_pose[0],
                          jnp.zeros(3), jnp.zeros(3))

    def net(x):
        sigma = 100.0 - 10.0 * jnp.abs(x[..., 1])  # favors low |y|
        return jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]), x.shape), sigma

    field_fn = snarf.make_field_fn(canonical, frame, net, eval_mode=True)
    pts = canonical.vs_template[:32]
    rgb, sigma, ok = field_fn(pts)
    assert rgb.shape == (32, 3) and sigma.shape == (32,) and ok.shape == (32,)
    assert bool(ok.all())


def test_version1_gradients_flow_to_pose(snarf, canonical, toy):
    """The implicit-diff correction must carry gradients into the pose via
    tfs (this is what makes pose refinement possible with version=1)."""
    xc_gt = canonical.vs_template[::64]

    def loss(pose):
        frame = snarf.prepare(canonical, jnp.zeros((1, 10)), pose,
                              jnp.zeros(3), jnp.zeros(3))
        xd = snarf.forward_skinning(canonical, frame.tfs,
                                    jax.lax.stop_gradient(xc_gt))
        xc, valid = snarf.deform(canonical, frame, xd, eval_mode=False)
        best = jnp.argmax(valid, axis=-1)
        sel = jnp.take_along_axis(xc, best[:, None, None].repeat(3, -1),
                                  axis=1)[:, 0]
        return jnp.sum(jnp.where(valid.any(-1)[:, None],
                                 (sel - xc_gt) ** 2, 0.0))

    pose0 = jnp.asarray(0.2 * np.random.RandomState(5).randn(69),
                        jnp.float32)
    g = jax.grad(loss)(pose0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_version2_gradients(toy, canonical):
    snarf2 = SNARFDeformer(toy, resolution=64, cano_pose="da_pose",
                           version=2, knn_chunk=4096)

    def loss(transl):
        frame = snarf2.prepare(canonical, jnp.zeros((1, 10)),
                               jnp.zeros(69), jnp.zeros(3), transl)
        xd = canonical.vs_template[::64]
        xc, valid = snarf2.deform(canonical, frame, xd, eval_mode=False)
        return jnp.sum(jnp.where(valid[..., None], xc, 0.0) ** 2)

    g = jax.grad(loss)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_packed_cache_matches_full_search(snarf, canonical):
    """The packed inverse-warp cache (per-cell [xc, J_inv, valid] rows) +
    one cached-Newton step must reproduce the full per-sample Broyden
    correspondences for near-cell points."""
    rng = np.random.RandomState(11)
    pose = jnp.asarray(0.25 * rng.randn(69).astype(np.float32))
    frame = snarf.prepare(canonical, jnp.zeros((1, 10)), pose,
                          jnp.zeros(3), jnp.zeros(3))
    # posed surface points as "cell centers", nearby jittered points as
    # the actual samples
    centers = snarf.forward_skinning(canonical, frame.tfs,
                                     canonical.vs_template[::16])
    samples = centers + 0.01 * rng.randn(*centers.shape).astype(np.float32)

    rows = snarf.bake_packed_cache(canonical, frame, centers)
    C = centers.shape[0]
    K = rows.shape[-1] // snarf.ROW_FLOATS
    r = rows.reshape(C, K, snarf.ROW_FLOATS)
    xc0 = r[..., 0:3]
    Ji = r[..., 3:12].reshape(C, K, 3, 3)
    valid = r[..., 12] > 0.5
    # the cached-Newton refine (make_packed_cache_fns math, with the cell
    # center known exactly here)
    delta = samples - centers
    xc_fast = xc0 + jnp.einsum("mcrk,mk->mcr", Ji, delta)

    xd_fast = snarf.forward_skinning(canonical, frame.tfs, xc_fast)
    err = jnp.where(valid,
                    jnp.linalg.norm(xd_fast - samples[:, None], axis=-1),
                    0.0)
    assert float(valid.any(-1).mean()) > 0.9
    assert float(err.max()) < 5e-3, float(err.max())


def test_packed_cache_field_fns(snarf, canonical):
    """probe_fn must report occupancy only for cells with valid baked
    candidates; field_fn must evaluate the net at the refined canonical
    points."""
    rng = np.random.RandomState(3)
    frame = snarf.prepare(canonical, jnp.zeros((1, 10)),
                          jnp.asarray(0.1 * rng.randn(69), jnp.float32),
                          jnp.zeros(3), jnp.zeros(3))
    verts = snarf.forward_skinning(canonical, frame.tfs,
                                   canonical.vs_template[::8])
    vmin = np.asarray(verts).min(0) - 0.1
    vmax = np.asarray(verts).max(0) + 0.1
    aabb = jnp.asarray(np.stack([vmin, vmax]))
    G = 16
    # bake on the cells containing the posed verts
    rel = (verts - aabb[0]) / (aabb[1] - aabb[0])
    cell = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
    flat = (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2]
    flat_u = np.unique(np.asarray(flat))
    span = aabb[1] - aabb[0]
    ijk = np.stack([flat_u // (G * G), (flat_u // G) % G, flat_u % G],
                   -1).astype(np.float32)
    centers = np.asarray(aabb[0]) + (ijk + 0.5) / G * np.asarray(span)
    rows = snarf.bake_packed_cache(canonical, frame,
                                   jnp.asarray(centers))
    cache = jnp.zeros((G ** 3, rows.shape[-1])).at[flat_u].set(rows)

    def net(x):
        return jnp.ones((x.shape[0], 3)) * 0.5, jnp.linalg.norm(x, axis=-1)

    probe_fn, field_fn, occupancy_fn, field_fn_pts = \
        snarf.make_packed_cache_fns(cache, aabb, G, net, n_cand=1)
    occ, payload = probe_fn(verts)
    assert float(occ.mean()) > 0.8  # most vert cells baked valid
    rgb, sigma, ok = field_fn(verts, payload)
    assert rgb.shape == (verts.shape[0], 3)
    assert np.isfinite(np.asarray(sigma)[np.asarray(ok)]).all()
    # the split pair must agree with the fused probe pair
    occ2 = occupancy_fn(verts)
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(occ))
    rgb2, sigma2, ok2 = field_fn_pts(verts)
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ok2), np.asarray(ok))
    # far-away points: unoccupied
    far_pts = verts + 10.0
    occ_far, _ = probe_fn(far_pts)
    assert not bool(occ_far.any())
