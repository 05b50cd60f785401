"""Occupancy-grid tests: morphology, connected components, EMA update,
lookup semantics, mesh signed distance (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from instantavatar_tpu.ops.mesh_distance import signed_distance_to_mesh
from instantavatar_tpu.render.density_grid import (DensityGridState,
                                                   initialize_grid,
                                                   largest_component,
                                                   make_grid_state,
                                                   max_pool3d,
                                                   occupancy_lookup,
                                                   occupancy_regularizer,
                                                   update_grid)

AABB = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])


def _sphere_density(center=(0, 0, 0), r=0.5, amp=500.0):
    c = jnp.asarray(center)
    return lambda pts: jnp.where(jnp.linalg.norm(pts - c, axis=-1) < r,
                                 amp, 0.0)


def test_max_pool3d_dilates():
    x = jnp.zeros((8, 8, 8)).at[4, 4, 4].set(1.0)
    y = max_pool3d(x)
    assert float(y[3, 4, 5]) == 1.0 and float(y[4, 4, 4]) == 1.0
    assert float(y[2, 4, 4]) == 0.0
    assert float(y.sum()) == 27.0


def test_largest_component_keeps_biggest():
    occ = np.zeros((16, 16, 16), bool)
    occ[2:8, 2:8, 2:8] = True      # big blob (216 cells)
    occ[12:14, 12:14, 12:14] = True  # small blob (8 cells)
    out = np.asarray(largest_component(jnp.asarray(occ)))
    assert out[3, 3, 3] and not out[12, 12, 12]
    assert out.sum() == 6 ** 3


def test_largest_component_empty():
    out = largest_component(jnp.zeros((8, 8, 8), bool))
    assert not bool(out.any())


def test_update_grid_finds_sphere():
    state = make_grid_state(AABB, 32)
    fn = _sphere_density()
    for i in range(3):
        state, density, old = update_grid(state, fn,
                                          jax.random.PRNGKey(i))
    occ = np.asarray(state.occupancy)
    G = 32
    # center occupied, corner not
    assert occ[G // 2, G // 2, G // 2]
    assert not occ[1, 1, 1]
    # occupied volume ~ dilated sphere: (4/3)pi(0.5/2)^3 of the cube ~ 6.5%
    frac = occ.mean()
    assert 0.03 < frac < 0.25, frac


def test_update_grid_ema_decay():
    state = make_grid_state(AABB, 16)
    state, _, _ = update_grid(state, _sphere_density(), jax.random.PRNGKey(0))
    peak = float(state.density_cached.max())
    # density gone -> cache decays by 0.8 per update
    state, _, _ = update_grid(state, lambda p: jnp.zeros(p.shape[0]),
                              jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(state.density_cached.max()), 0.8 * peak,
                               rtol=1e-5)


def test_update_grid_density_differentiable():
    state = make_grid_state(AABB, 16)

    def loss(amp):
        fn = lambda pts: jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5,
                                   amp, 0.0)
        _, density, _ = update_grid(state, fn, jax.random.PRNGKey(0))
        return density.sum()

    g = jax.grad(loss)(100.0)
    assert np.isfinite(float(g)) and float(g) > 0


def test_occupancy_regularizer():
    density = jnp.full((8, 8, 8), 0.5)
    occ = jnp.zeros((8, 8, 8), bool).at[:4].set(True)
    reg_early = occupancy_regularizer(density, occ, jnp.int32(100), 20)
    reg_late = occupancy_regularizer(density, occ, jnp.int32(1000), 20)
    # unoccupied mean = 0.5 -> 20 * 0.5 = 10 (+ 0.25 warmup)
    np.testing.assert_allclose(float(reg_late), 10.0, rtol=1e-5)
    np.testing.assert_allclose(float(reg_early), 10.25, rtol=1e-5)


def test_initialize_grid_and_lookup():
    grid = initialize_grid(AABB, _sphere_density(), jax.random.PRNGKey(0),
                           grid_size=32)
    pts = jnp.asarray([[0., 0., 0.],      # inside sphere
                       [0.9, 0.9, 0.9],   # inside aabb, empty space
                       [2., 0., 0.]])     # outside aabb
    occ = np.asarray(occupancy_lookup(grid, pts))
    assert occ[0] and not occ[1] and not occ[2]


def test_signed_distance_tetra():
    """Signed distance against a regular tetrahedron: centroid inside
    (negative), far point positive with correct magnitude."""
    verts = jnp.asarray([[1., 1., 1.], [1., -1., -1.],
                         [-1., 1., -1.], [-1., -1., 1.]])
    # outward-oriented faces
    faces = np.asarray([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
    pts = jnp.asarray([[0., 0., 0.], [3., 3., 3.]])
    sd = np.asarray(signed_distance_to_mesh(pts, verts, faces, chunk=2))
    assert sd[0] < 0, sd
    # closest feature to (3,3,3) is vertex (1,1,1): dist = 2*sqrt(3)
    np.testing.assert_allclose(sd[1], 2 * np.sqrt(3), rtol=1e-5)


def test_signed_distance_on_surface_near_zero():
    verts = jnp.asarray([[1., 1., 1.], [1., -1., -1.],
                         [-1., 1., -1.], [-1., -1., 1.]])
    faces = np.asarray([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
    centroid_face0 = verts[np.asarray([0, 1, 2])].mean(axis=0, keepdims=True)
    sd = np.asarray(signed_distance_to_mesh(centroid_face0, verts, faces))
    np.testing.assert_allclose(sd, 0.0, atol=1e-5)
