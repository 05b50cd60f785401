"""Shared-corner-gather sampling (ops/grid_sample.py *_shared) and the
flat-render path that uses it (AvatarModel shared_corner_eval).

The fused flat render evaluates the canonical field at p^2 pixel-offset
variants per block sample; the shared samplers gather each feature
lattice's corner rows ONCE per sample (at the block-center variant's
cell) and lerp/extrapolate every variant against those rows — cutting
the dominant field-gather rows p^2-fold (xplane r4, PERF.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantavatar_tpu.ops.grid_sample import (
    grid_sample_2d_packed, grid_sample_2d_packed_shared,
    grid_sample_3d_packed, grid_sample_3d_packed_shared,
    pack_corners_2d, pack_corners_3d)


def test_shared_3d_matches_exact_at_ref():
    """The variant equal to the ref point reproduces the exact sampler
    bit-for-bit (same rows, same weights)."""
    rng = np.random.RandomState(0)
    vox = jnp.asarray(rng.randn(4, 9, 9, 9).astype(np.float32))
    packed = pack_corners_3d(vox)
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (5, 64, 3))
                         .astype(np.float32))
    exact = jax.vmap(
        lambda q: grid_sample_3d_packed(packed, (9, 9, 9), q))(coords)
    shared = grid_sample_3d_packed_shared(packed, (9, 9, 9), coords[2],
                                          coords)
    np.testing.assert_allclose(np.asarray(shared[2]), np.asarray(exact[2]),
                               atol=1e-6)


def test_shared_3d_exact_inside_ref_cell():
    """Variants that stay inside the ref point's cell interpolate off the
    identical corners -> exact (no extrapolation involved)."""
    rng = np.random.RandomState(1)
    vox = jnp.asarray(rng.randn(2, 9, 9, 9).astype(np.float32))
    packed = pack_corners_3d(vox)
    # cell size in [-1,1] coords is 2/(9-1) = 0.25; put refs at cell
    # centers and perturb < half a cell so variants never leave it
    base = jnp.asarray(rng.randint(0, 8, (32, 3)).astype(np.float32))
    ref = (base + 0.5) / 8.0 * 2.0 - 1.0                 # cell centers
    eps = jnp.asarray(rng.uniform(-0.1, 0.1, (4, 32, 3))
                      .astype(np.float32)) * 0.25
    variants = ref[None] + eps
    exact = jax.vmap(
        lambda q: grid_sample_3d_packed(packed, (9, 9, 9), q))(variants)
    shared = grid_sample_3d_packed_shared(packed, (9, 9, 9), ref, variants)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(exact),
                               atol=1e-5)


def test_shared_3d_extrapolation_is_linear():
    """On a globally-LINEAR feature voxel, extrapolating past the ref
    cell is exact — the shared sampler implements the cell's affine
    extension, not clamping."""
    d, h, w = jnp.meshgrid(jnp.arange(9.0), jnp.arange(9.0),
                           jnp.arange(9.0), indexing="ij")
    vox = (2.0 * w + 3.0 * h - d)[None]                  # (1, 9, 9, 9)
    packed = pack_corners_3d(vox)
    ref = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)
    variants = jnp.asarray([[[0.1, 0.1, 0.1]], [[0.4, 0.2, 0.15]]],
                           jnp.float32)                  # crosses cells
    shared = grid_sample_3d_packed_shared(packed, (9, 9, 9), ref, variants)
    exact = jax.vmap(
        lambda q: grid_sample_3d_packed(packed, (9, 9, 9), q))(variants)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(exact),
                               rtol=1e-5, atol=1e-4)


def test_shared_2d_matches_exact_at_ref():
    rng = np.random.RandomState(2)
    plane = jnp.asarray(rng.randn(9, 9, 6).astype(np.float32))
    packed = pack_corners_2d(plane.transpose(2, 0, 1))
    uv = jnp.asarray(rng.uniform(0, 1, (3, 50, 2)).astype(np.float32))
    exact = jax.vmap(
        lambda q: grid_sample_2d_packed(packed, (9, 9), q))(uv)
    shared = grid_sample_2d_packed_shared(packed, (9, 9), uv[1], uv)
    np.testing.assert_allclose(np.asarray(shared[1]), np.asarray(exact[1]),
                               atol=1e-6)


def test_field_apply_shared_matches_apply():
    """VoxelTriplaneField.apply_shared == apply for sub-cell variants
    (the production regime: canonical pixel offsets spread millimetres
    vs centimetre feature cells)."""
    from instantavatar_tpu.models import VoxelTriplaneField
    field = VoxelTriplaneField(voxel_res=16, plane_res=32)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    center = jnp.zeros((3,))
    scale = jnp.asarray(2.0)
    x_ref = jnp.asarray(rng.uniform(-0.8, 0.8, (128, 3))
                        .astype(np.float32))
    # variants well inside one voxel cell (2/16 / 8) AND one plane cell
    x = x_ref[None] + jnp.asarray(
        rng.uniform(-1, 1, (4, 128, 3)).astype(np.float32)) * (2.0 / 32 / 8)
    rgb_s, sig_s = field.apply_shared(params, x_ref, x, center, scale)
    rgb_e, sig_e = jax.vmap(
        lambda q: field.apply(params, q, center, scale))(x)
    # bf16 rows + f32 accumulation: agreement to bf16 resolution
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_e),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(sig_s), np.asarray(sig_e),
                               atol=2e-2)


@pytest.mark.parametrize("n_cand", [1, 2])
def test_packed_cache_field_fn_shared_variants(n_cand):
    """field_fn(pts_all=...) returns (Q, ...) results whose q-th row
    matches the plain tiled call at variant q."""
    from instantavatar_tpu.deformers.packed_cache import (
        ROW_FLOATS, make_packed_cache_fns)
    from instantavatar_tpu.models import VoxelTriplaneField
    rng = np.random.RandomState(4)
    G = 4
    K = 2
    field = VoxelTriplaneField(voxel_res=8, plane_res=16)
    params = field.init(jax.random.PRNGKey(1))
    center, scale = jnp.zeros((3,)), jnp.asarray(2.0)
    net = lambda x: field.apply(params, x, center, scale)
    net_shared = lambda xr, x: field.apply_shared(params, xr, x, center,
                                                  scale)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rows = rng.randn(G ** 3, K * ROW_FLOATS).astype(np.float32) * 0.1
    rows = rows.reshape(G ** 3, K, ROW_FLOATS)
    rows[..., 12] = (rng.rand(G ** 3, K) > 0.3).astype(np.float32)
    # identity-ish Jacobians so xc stays in-range
    rows[..., 3:12] = np.eye(3).reshape(1, 1, 9) * 0.5
    rows = jnp.asarray(rows.reshape(G ** 3, K * ROW_FLOATS))
    _, field_fn, _, _ = make_packed_cache_fns(
        rows, aabb, G, net, n_cand=n_cand, net_shared=net_shared)
    M, Q = 64, 3
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (M, 3)).astype(np.float32))
    pts_all = pts[None] + jnp.asarray(
        rng.uniform(-1, 1, (Q, M, 3)).astype(np.float32)) * 1e-3
    pts_all = pts_all.at[1].set(pts)                     # variant 1 == ref
    rows_m = jnp.take(rows, jnp.arange(M) % (G ** 3), axis=0)
    rgb_q, sig_q, ok_q = field_fn(pts, rows_m, None, pts_all=pts_all)
    assert rgb_q.shape == (Q, M, 3)
    assert sig_q.shape == (Q, M) and ok_q.shape == (Q, M)
    rgb_1, sig_1, ok_1 = field_fn(pts, rows_m)
    np.testing.assert_allclose(np.asarray(rgb_q[1]), np.asarray(rgb_1),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(sig_q[1]), np.asarray(sig_1),
                               atol=2e-2)
    np.testing.assert_array_equal(np.asarray(ok_q[1]), np.asarray(ok_1))
