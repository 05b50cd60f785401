"""Renderer unit tests: compositing math vs closed form, AABB clipping,
compaction, and an analytic-sphere end-to-end march (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from instantavatar_tpu.render import (Rays, compact_samples, composite,
                                      ray_aabb, render_rays, sample_z)


def test_composite_single_opaque_sample():
    sigma = jnp.asarray([[1e4]])
    rgb = jnp.asarray([[[0.2, 0.4, 0.6]]])
    z = jnp.asarray([[2.0]])
    delta = jnp.asarray([[0.1]])
    valid = jnp.ones((1, 1), bool)
    out = composite(sigma, rgb, z, delta, valid)
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [0.2, 0.4, 0.6],
                               atol=1e-4)
    np.testing.assert_allclose(float(out.depth[0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(float(out.alpha[0]), 1.0, atol=1e-4)


def test_composite_empty_ray_is_background():
    sigma = jnp.full((2, 8), -5.0)
    rgb = jnp.zeros((2, 8, 3))
    z = jnp.broadcast_to(jnp.linspace(0, 1, 8), (2, 8))
    out = composite(sigma, rgb, z, jnp.full((2, 1), 0.1),
                    jnp.ones((2, 8), bool), bg_color=jnp.asarray([1., 0., 0.5]))
    np.testing.assert_allclose(np.asarray(out.rgb),
                               np.tile([[1., 0., 0.5]], (2, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)


def test_composite_closed_form_two_samples():
    """Two samples: w0 = a0, w1 = a1 (1 - a0)."""
    s0, s1, d = 3.0, 5.0, 0.25
    sigma = jnp.asarray([[s0, s1]])
    rgb = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    z = jnp.asarray([[1.0, 1.25]])
    out = composite(sigma, rgb, z, jnp.asarray([[d]]),
                    jnp.ones((1, 2), bool), bg_color=jnp.zeros(3))
    a0 = 1 - np.exp(-s0 * d)
    a1 = 1 - np.exp(-s1 * d)
    w0, w1 = a0, a1 * (1 - a0)
    np.testing.assert_allclose(np.asarray(out.weights[0]), [w0, w1],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [w0, w1, 0.0],
                               atol=1e-5)


def test_composite_invalid_samples_ignored():
    sigma = jnp.asarray([[50.0, 50.0]])
    rgb = jnp.asarray([[[1., 0., 0.], [0., 1., 0.]]])
    z = jnp.asarray([[1.0, 2.0]])
    valid = jnp.asarray([[False, True]])
    out = composite(sigma, rgb, z, jnp.asarray([[0.5]]), valid,
                    bg_color=jnp.zeros(3))
    # only the second (green) sample contributes
    assert float(out.rgb[0, 1]) > 0.9 and float(out.rgb[0, 0]) < 1e-6


def test_ray_aabb():
    o = jnp.asarray([[0., 0., -5.], [0., 5., 0.]])
    d = jnp.asarray([[0., 0., 1.], [0., 0., 1.]])
    near, far = ray_aabb(o, d, jnp.asarray([-1., -1., -1.]),
                         jnp.asarray([1., 1., 1.]))
    np.testing.assert_allclose(np.asarray(near[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(far[0]), 6.0, atol=1e-5)
    assert float(far[1]) < float(near[1])  # miss


def test_sample_z_bounds_and_jitter():
    near = jnp.asarray([1.0, 2.0])
    far = jnp.asarray([3.0, 6.0])
    z, step = sample_z(near, far, 16, jax.random.PRNGKey(0))
    assert z.shape == (2, 16) and step.shape == (2, 1)
    assert float(z.min()) >= 1.0 and float(z[0].max()) <= 3.0
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)  # monotone
    z2, _ = sample_z(near, far, 16, None)
    np.testing.assert_allclose(np.asarray(z2[0, 0]), 1.0 + 0.5 * 2 / 16,
                               atol=1e-6)


def test_compact_samples():
    valid = jnp.asarray([[False, True, False, True, True],
                         [False, False, False, False, False]])
    idx, keep = compact_samples(valid, 3)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 4])
    assert np.asarray(keep[0]).all()
    assert not np.asarray(keep[1]).any()


def _sphere_field(radius=0.5, color=(0.9, 0.1, 0.3)):
    def field_fn(x):
        inside = jnp.linalg.norm(x, axis=-1) < radius
        sigma = jnp.where(inside, 500.0, -1e3)
        rgb = jnp.broadcast_to(jnp.asarray(color), x.shape)
        return rgb, sigma, jnp.ones(x.shape[:-1], bool)
    return field_fn


def test_render_rays_sphere_depth():
    """Rays through an opaque sphere at origin: depth ~ first intersection,
    alpha ~ 1; miss rays composite to background."""
    o = jnp.asarray([[0., 0., -3.], [0., 2., -3.]])   # hit center; miss
    d = jnp.asarray([[0., 0., 1.], [0., 0., 1.]])
    rays = Rays(o=o, d=d, near=jnp.asarray([0.1, 0.1]),
                far=jnp.asarray([6.0, 6.0]))
    out = render_rays(_sphere_field(), rays, n_steps=256,
                      bg_color=jnp.asarray([0., 0., 1.]))
    np.testing.assert_allclose(float(out.depth[0]), 2.5, atol=0.03)
    assert float(out.alpha[0]) > 0.99
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [0.9, 0.1, 0.3],
                               atol=0.01)
    assert float(out.alpha[1]) < 1e-3
    np.testing.assert_allclose(np.asarray(out.rgb[1]), [0., 0., 1.],
                               atol=1e-4)


def test_render_rays_occupancy_equivalent():
    """With an occupancy fn that brackets the sphere, compacted K=64
    rendering matches dense 256-step rendering closely."""
    n = 8
    key = jax.random.PRNGKey(3)
    o = jnp.concatenate([0.3 * jax.random.normal(key, (n, 2)),
                         jnp.full((n, 1), -3.0)], axis=-1)
    d = jnp.broadcast_to(jnp.asarray([0., 0., 1.]), (n, 3))
    rays = Rays(o=o, d=d, near=jnp.full((n,), 0.1), far=jnp.full((n,), 6.0))

    occ = lambda x: jnp.linalg.norm(x, axis=-1) < 0.6
    dense = render_rays(_sphere_field(), rays, n_steps=256)
    fast = render_rays(_sphere_field(), rays, n_steps=256, k_cap=64,
                       occupancy_fn=occ)
    np.testing.assert_allclose(np.asarray(fast.rgb), np.asarray(dense.rgb),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(fast.depth), np.asarray(dense.depth),
                               atol=0.05)
    # compaction actually reduced work
    assert int(fast.counter.max()) <= 64


def test_render_rays_grad_flows():
    def render_loss(shift):
        field = lambda x: (jnp.full(x.shape, 0.5),
                           500.0 * jnp.exp(-jnp.sum((x - shift) ** 2, -1)),
                           jnp.ones(x.shape[:-1], bool))
        rays = Rays(o=jnp.asarray([[0., 0., -2.]]),
                    d=jnp.asarray([[0., 0., 1.]]),
                    near=jnp.asarray([0.5]), far=jnp.asarray([4.0]))
        out = render_rays(field, rays, n_steps=64)
        return out.depth.sum()

    g = jax.grad(render_loss)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    assert abs(float(g[2])) > 1e-3  # moving the blob along z moves depth


def test_volume_renderer_sphere():
    """Coarse/fine hierarchical renderer reproduces the sphere scene (the
    reference's vestigial VolumeRenderer math, volume_renderer.py)."""
    from instantavatar_tpu.render.volume_renderer import (VolumeRenderer,
                                                          importance_sampling)
    vr = VolumeRenderer(n_coarse=32, n_fine=64)
    o = jnp.asarray([[0., 0., -3.]])
    d = jnp.asarray([[0., 0., 1.]])
    rays = Rays(o=o, d=d, near=jnp.asarray([0.1]), far=jnp.asarray([6.0]))
    out = vr(_sphere_field(), rays, bg_color=jnp.zeros(3))
    np.testing.assert_allclose(float(out["depth"][0]), 2.5, atol=0.05)
    assert float(out["alpha"][0]) > 0.99
    # fine pass concentrates samples: fine depth at least as accurate
    assert abs(float(out["depth"][0]) - 2.5) <= \
        abs(float(out["depth_coarse"][0]) - 2.5) + 0.02


def test_importance_sampling_concentrates():
    from instantavatar_tpu.render.volume_renderer import importance_sampling
    z = jnp.linspace(0.0, 1.0, 32)[None]
    w = jnp.zeros((1, 32)).at[0, 16].set(1.0)  # all mass at z~0.516
    zf = importance_sampling(z, w, 64, jax.random.PRNGKey(0))
    assert abs(float(zf.mean()) - float(z[0, 16])) < 0.05
    assert float(zf.std()) < 0.05


def test_ray_basis_reproduces_ray_grid():
    """make_ray_basis: the (4,3) pinhole generator must reproduce
    make_ray_grid's per-pixel origins and normalized directions exactly
    (the fused flat render computes dirs from it instead of gathering
    per-pixel rows)."""
    from instantavatar_tpu.data.rays import make_ray_basis, make_ray_grid
    H, W = 37, 53
    K = np.array([[200.0, 0, W / 2 + 3], [0, 180.0, H / 2 - 2], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, :3] = np.array([[0.0, -1.0, 0.0],
                            [1.0, 0.0, 0.0],
                            [0.0, 0.0, 1.0]])
    c2w[:3, 3] = [0.1, -0.2, 0.3]
    ro, rd = make_ray_grid(K, c2w, H, W)
    b = make_ray_basis(K, c2w)
    ys, xs = np.mgrid[0:H, 0:W]
    d_un = b[1] + xs[..., None] * b[2] + ys[..., None] * b[3]
    d = d_un / np.linalg.norm(d_un, axis=-1, keepdims=True)
    np.testing.assert_allclose(d, rd, atol=2e-6)
    np.testing.assert_allclose(np.broadcast_to(b[0], ro.shape), ro,
                               atol=1e-7)
