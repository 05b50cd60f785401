"""Canonical-field tests: hash encoding properties + toy overfit (SURVEY §4:
the reference has no tests; these gate the TPU rebuild's field stack)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from instantavatar_tpu.models import (NGPField, TriPlaneField, VanillaNeRF,
                                      positional_encoding)
from instantavatar_tpu.ops.hashgrid import (HashGridConfig, hash_encode,
                                            init_hash_table,
                                            level_resolutions)

SMALL = HashGridConfig(n_levels=4, n_features=2, log2_hashmap_size=12,
                       base_resolution=4, per_level_scale=2.0)


@pytest.fixture(scope="module")
def table():
    return init_hash_table(jax.random.PRNGKey(0), SMALL)


def test_resolutions():
    cfg = HashGridConfig()
    res = level_resolutions(cfg)
    assert res[0] == 16 and len(res) == 16
    assert res[1] == 24  # 16 * 1.5
    assert all(b > a for a, b in zip(res, res[1:]))


def test_encode_shape_and_determinism(table):
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
    e1 = hash_encode(table, x, SMALL)
    e2 = hash_encode(table, x, SMALL)
    assert e1.shape == (100, SMALL.out_dim)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_encode_batch_shapes(table):
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 5, 3))
    e = hash_encode(table, x, SMALL)
    assert e.shape == (4, 5, SMALL.out_dim)


def test_encode_continuity(table):
    """Trilinear interpolation ⇒ encoding is Lipschitz in x."""
    x = jnp.asarray([[0.37, 0.52, 0.11]])
    eps = 1e-5
    e0 = hash_encode(table, x, SMALL)
    e1 = hash_encode(table, x + eps, SMALL)
    assert float(jnp.abs(e1 - e0).max()) < 1e-2


def test_encode_exact_at_cell_corner(table):
    """At an integer cell corner of the coarsest dense level the trilerp
    weight collapses onto a single table slot."""
    res = level_resolutions(SMALL)[0]  # 4, dense level
    x = jnp.asarray([[1.0 / res, 2.0 / res, 3.0 / res]])
    e = hash_encode(table, x, SMALL)
    stride = res + 1
    slot = 1 + 2 * stride + 3 * stride * stride
    np.testing.assert_allclose(np.asarray(e[0, :2]),
                               np.asarray(table[0, slot]), atol=1e-6)


def test_encode_grad_reaches_table(table):
    x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3))
    g = jax.grad(lambda t: hash_encode(t, x, SMALL).sum())(table)
    assert float(jnp.abs(g).sum()) > 0
    assert np.all(np.isfinite(np.asarray(g)))


def test_ngp_field_forward_and_grad():
    field = NGPField(grid=SMALL)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1, maxval=1)
    center = jnp.zeros(3)
    scale = jnp.full((3,), 2.5)
    color, sigma = jax.jit(field.apply, static_argnums=())(
        params, x, center, scale)
    assert color.shape == (128, 3) and sigma.shape == (128,)
    assert float(color.min()) >= 0 and float(color.max()) <= 1

    def loss(p):
        c, s = field.apply(p, x, center, scale)
        return (c ** 2).sum() + (s ** 2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert float(jnp.abs(g.table).sum()) > 0  # grads reach the hash table


def test_ngp_overfit_toy_density():
    """The field can overfit a simple 3-D occupancy (sphere) — end-to-end
    check that table grads + MLP training work (SURVEY §7.2 step 3)."""
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=14,
                                         base_resolution=4,
                                         per_level_scale=1.5))
    params = field.init(jax.random.PRNGKey(0))
    center = jnp.zeros(3)
    scale = jnp.full((3,), 2.0)

    key = jax.random.PRNGKey(42)
    x = jax.random.uniform(key, (4096, 3), minval=-1, maxval=1)
    target = (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            sigma = field.density(p, x, center, scale)
            return optax.sigmoid_binary_cross_entropy(sigma, target).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(200):
        params, state, loss = step(params, state)
    pred = jax.nn.sigmoid(field.density(params, x, center, scale)) > 0.5
    acc = float((pred == (target > 0.5)).mean())
    assert acc > 0.97, f"overfit accuracy {acc}"


def test_positional_encoding_shape_and_values():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    e = positional_encoding(x, 4)
    assert e.shape == (1, 3 * (2 * 4 + 1))
    np.testing.assert_allclose(np.asarray(e[0, :3]), np.asarray(x[0]))
    # first octave sin at pi*x
    np.testing.assert_allclose(float(e[0, 3]), np.sin(np.pi * 0.5), atol=1e-6)


def test_vanilla_nerf_forward():
    net = VanillaNeRF(use_viewdir=False, width=32)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    color, sigma = net.apply(params, x)
    assert color.shape == (17, 3) and sigma.shape == (17,)
    assert float(sigma.min()) >= 0  # relu'd


def test_triplane_forward_and_grad():
    field = TriPlaneField(features=8, res=32)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=-1, maxval=1)
    color, sigma = field.apply(params, x, jnp.zeros(3), jnp.full((3,), 2.0))
    assert color.shape == (33, 3) and sigma.shape == (33,)
    g = jax.grad(lambda p: field.apply(p, x, jnp.zeros(3),
                                       jnp.full((3,), 2.0))[1].sum())(params)
    assert float(jnp.abs(g.plane_xy).sum()) > 0


def test_triplane_bilinear_exact_at_pixel():
    from instantavatar_tpu.models.triplane import sample_plane_bilinear
    plane = jnp.arange(2 * 4 * 4, dtype=jnp.float32).reshape(2, 4, 4)
    # uv=(1/3, 2/3) with align-corners on a 4-wide plane hits pixel (u=1, v=2)
    out = sample_plane_bilinear(plane, jnp.asarray([[1 / 3, 2 / 3]]))
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(plane[:, 2, 1]), atol=1e-5)


def test_packed_samplers_match_unpacked():
    from instantavatar_tpu.ops.grid_sample import (grid_sample_2d_packed,
                                                   grid_sample_3d,
                                                   grid_sample_3d_packed,
                                                   pack_corners_2d,
                                                   pack_corners_3d)
    rng = np.random.RandomState(0)
    vox = jnp.asarray(rng.randn(5, 4, 6, 7).astype(np.float32))
    coords = jnp.asarray((rng.rand(64, 3) * 2.2 - 1.1).astype(np.float32))
    ref = grid_sample_3d(vox, coords)
    packed = grid_sample_3d_packed(pack_corners_3d(vox), (4, 6, 7), coords)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               atol=1e-5)

    plane = jnp.asarray(rng.randn(3, 8, 9).astype(np.float32))
    uv = jnp.asarray(rng.rand(64, 2).astype(np.float32))
    from instantavatar_tpu.models.triplane import sample_plane_bilinear
    ref2 = sample_plane_bilinear(plane, uv)
    packed2 = grid_sample_2d_packed(pack_corners_2d(plane), (8, 9), uv)
    np.testing.assert_allclose(np.asarray(packed2), np.asarray(ref2),
                               atol=1e-5)


def test_voxel_triplane_forward_and_grad():
    from instantavatar_tpu.models import VoxelTriplaneField
    field = VoxelTriplaneField(voxel_res=8, voxel_feats=4, plane_res=16,
                               plane_feats=4)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (65, 3), minval=-1,
                           maxval=1)
    color, sigma = field.apply(params, x, jnp.zeros(3), jnp.full((3,), 2.0))
    assert color.shape == (65, 3) and sigma.shape == (65,)
    g = jax.grad(lambda p: field.apply(p, x, jnp.zeros(3),
                                       jnp.full((3,), 2.0))[1].sum())(params)
    assert float(jnp.abs(g.voxel).sum()) > 0
    assert float(jnp.abs(g.plane_xy).sum()) > 0


def test_voxel_triplane_overfit_sphere():
    from instantavatar_tpu.models import VoxelTriplaneField
    field = VoxelTriplaneField(voxel_res=16, voxel_feats=4, plane_res=32,
                               plane_feats=8)
    params = field.init(jax.random.PRNGKey(0))
    center = jnp.zeros(3)
    scale = jnp.full((3,), 2.0)
    x = jax.random.uniform(jax.random.PRNGKey(42), (4096, 3), minval=-1,
                           maxval=1)
    target = (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)
    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(params, st):
        def lf(p):
            s = field.density(p, x, center, scale)
            return optax.sigmoid_binary_cross_entropy(s, target).mean()
        loss, g = jax.value_and_grad(lf)(params)
        u, st = opt.update(g, st)
        return optax.apply_updates(params, u), st, loss

    for _ in range(200):
        params, st, loss = step(params, st)
    pred = jax.nn.sigmoid(field.density(params, x, center, scale)) > 0.5
    acc = float((pred == (target > 0.5)).mean())
    assert acc > 0.97, acc


def test_trunc_exp():
    from instantavatar_tpu.models.ngp import trunc_exp
    x = jnp.asarray([-100.0, 0.0, 2.0, 100.0])
    y = trunc_exp(x)
    np.testing.assert_allclose(np.asarray(y[1:3]), [1.0, np.e ** 2],
                               rtol=1e-5)
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g[1]), 1.0, rtol=1e-5)
