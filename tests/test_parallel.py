"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY §2.8/§4 —
the TPU-native analog of multi-node tests without a cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from instantavatar_tpu.body import toy_smpl_model
from instantavatar_tpu.deformers import SMPLDeformer
from instantavatar_tpu.models.ngp import NGPField
from instantavatar_tpu.ops.hashgrid import HashGridConfig
from instantavatar_tpu.parallel.data_parallel import (make_dp_train_step,
                                                      make_mesh,
                                                      make_multi_subject_step,
                                                      shard_batch,
                                                      stack_subjects)
from instantavatar_tpu.train import AvatarModel


def _tiny_avatar(toy):
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=10,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    return AvatarModel(toy, field,
                       SMPLDeformer(toy, threshold=0.12, knn_chunk=512),
                       n_steps=16, k_cap=None, grid_size=8,
                       noise_steps=0, optimizer=optax.adam(1e-2))


def _ray_batch(n_rays, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n_rays, 3).astype(np.float32) * 0.05 + [0, 0, 1.0]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.zeros((n_rays, 3)),
        "rays_d": jnp.asarray(d),
        "near": jnp.full((n_rays,), 2.0),
        "far": jnp.full((n_rays,), 4.0),
        "rgb": jnp.asarray(rng.rand(n_rays, 3).astype(np.float32)),
        "alpha": jnp.asarray((rng.rand(n_rays) > 0.5).astype(np.float32)),
        "bg_color": jnp.ones((n_rays, 3)),
        "betas": jnp.zeros((10,)),
        "body_pose": jnp.zeros((69,)),
        "global_orient": jnp.zeros((3,)),
        "transl": jnp.asarray([0.0, 0.0, 3.0]),
        "idx": jnp.int32(0),
    }


@pytest.fixture(scope="module")
def toy():
    return toy_smpl_model()


def test_mesh_shape():
    mesh = make_mesh(n_ray=4, n_subject=2)
    assert mesh.shape == {"subject": 2, "ray": 4}
    assert jax.device_count() == 8  # conftest forces 8 virtual devices


def test_dp_matches_single_chip(toy):
    """Gradient pmean over ray shards must equal the single-chip gradient
    on the full batch (same key => same stratified jitter pattern is NOT
    guaranteed across layouts, so compare with noise-free deterministic
    eval sampling via a fixed key per shard disabled: we check the
    *loss* on identical params instead, then that a DP step changes
    params identically when noise sources are removed)."""
    avatar = _tiny_avatar(toy)
    avatar.noise_steps = 0
    batch = _ray_batch(64)
    state = avatar.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))

    # single chip
    key = jax.random.PRNGKey(42)
    grads_s, losses_s, _ = jax.jit(
        lambda s, b, k: avatar.grads_and_losses(s, b, k, False))(
        state, batch, key)

    mesh = make_mesh(n_ray=8, n_subject=1)
    with mesh:
        sharded = shard_batch(mesh, batch)
        step = make_dp_train_step(avatar, mesh, with_grid_update=False)
        new_state, losses_dp = step(state, sharded, key)

    # DP loss is the mean of shard losses; with uniform rays it must be
    # close to the single-chip loss (jitter patterns differ per shard)
    assert np.isfinite(float(losses_dp["loss"]))
    assert abs(float(losses_dp["mse_loss"])
               - float(losses_s["mse_loss"])) < 0.05
    # params moved and are fully replicated
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     new_state.params, state.params))
    assert delta > 0


def test_dp_step_with_grid_update(toy):
    avatar = _tiny_avatar(toy)
    batch = _ray_batch(64)
    state = avatar.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    mesh = make_mesh(n_ray=8, n_subject=1)
    with mesh:
        sharded = shard_batch(mesh, batch)
        step = make_dp_train_step(avatar, mesh, with_grid_update=True)
        new_state, losses = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    # occupancy grid updated consistently (bool after pmean-vote)
    assert new_state.grid.occupancy.dtype == jnp.bool_


def test_multi_subject_independence(toy):
    """S subjects trained in one vmapped step must evolve identically to
    S separate single-subject steps (no cross-subject leakage)."""
    avatar = _tiny_avatar(toy)
    n_sub = 4
    states = [avatar.init(jax.random.PRNGKey(i), jnp.zeros((1, 10)))
              for i in range(n_sub)]
    batches = [_ray_batch(32, seed=i) for i in range(n_sub)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(n_sub)]

    # reference: independent single-subject steps
    singles = []
    for st, b, k in zip(states, batches, keys):
        new_st, _ = avatar.train_step(st, b, k)
        singles.append(new_st)

    mesh = make_mesh(n_ray=1, n_subject=4)
    stacked = stack_subjects(states)
    sbatches = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    skeys = jnp.stack(keys)
    with mesh:
        mstep = make_multi_subject_step(avatar, mesh)
        new_states, mlosses = mstep(stacked, sbatches, skeys)

    for i in range(n_sub):
        a = jax.tree.map(lambda x: np.asarray(x)[i], new_states.params)
        b = singles[i].params
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(la, np.asarray(lb), atol=2e-5)


def test_combined_subject_ray_mesh(toy):
    """Combined (2 subjects x 4 ray shards) step must match, per subject,
    an independent 1x4 ray-DP step on that subject's batch (same shard
    count => identical per-shard jitter keys => bit-identical math)."""
    avatar = _tiny_avatar(toy)
    n_sub, n_ray = 2, 4
    states = [avatar.init(jax.random.PRNGKey(i), jnp.zeros((1, 10)))
              for i in range(n_sub)]
    batches = [_ray_batch(32, seed=10 + i) for i in range(n_sub)]
    keys = [jax.random.PRNGKey(200 + i) for i in range(n_sub)]

    # reference: each subject on its own 1x4 ray-DP mesh (with grid update
    # so the grid_key path is exercised too)
    singles = []
    dp_mesh = make_mesh(n_ray=n_ray, n_subject=1,
                        devices=jax.devices()[:n_ray])
    with dp_mesh:
        dstep = make_dp_train_step(avatar, dp_mesh, with_grid_update=True)
        for st, b, k in zip(states, batches, keys):
            new_st, _ = dstep(st, shard_batch(dp_mesh, b), k)
            singles.append(jax.tree.map(np.asarray, new_st))

    mesh = make_mesh(n_ray=n_ray, n_subject=n_sub)
    assert mesh.shape == {"subject": n_sub, "ray": n_ray}
    stacked = stack_subjects(states)
    sbatches = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    skeys = jnp.stack(keys)
    with mesh:
        cstep = make_multi_subject_step(avatar, mesh,
                                        with_grid_update=True)
        new_states, closses = cstep(stacked, sbatches, skeys)

    assert np.isfinite(np.asarray(closses["loss"])).all()
    for i in range(n_sub):
        a = jax.tree.map(lambda x: np.asarray(x)[i], new_states.params)
        for la, lb in zip(jax.tree.leaves(a),
                          jax.tree.leaves(singles[i].params)):
            np.testing.assert_allclose(la, lb, atol=2e-5)
        # occupancy grids agree too (bit-identical update per shard)
        np.testing.assert_array_equal(
            np.asarray(new_states.grid.occupancy)[i],
            singles[i].grid.occupancy)


def test_dp_fused_render_matches_single_chip(toy, tmp_path):
    """dp_render_frame: the ray-sharded FUSED flat render (8 horizontal
    bands, per-band shifted ray basis, per-chip replicated bake) must
    reproduce the single-device fused render_frame exactly."""
    from instantavatar_tpu.data import AvatarDataset, PatchSampler, \
        make_synthetic_sequence
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.parallel.data_parallel import dp_render_frame

    seq = make_synthetic_sequence(tmp_path / "seq", n_frames=1, H=48, W=48)
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy, field,
        SNARFDeformer(toy, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    # opaque field so the transmittance-termination path is exercised
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})
    val = AvatarDataset(seq, "val", start=0, end=0)
    b = {k: v for k, v in val[0].items() if k not in ("rgb", "alpha")}

    grid = avatar.build_test_grid(state, b)
    img_single = avatar.render_frame(state, dict(b), chunk=1024,
                                     grid=grid, prune_rays=False,
                                     image_shape=(48, 48))

    mesh = make_mesh(n_ray=8)
    # default layout = "stride" (block-row round-robin, 5-row basis)
    out = dp_render_frame(avatar, mesh, state, b, grid, (48, 48),
                          chunk=1024)
    assert np.isfinite(out["rgb"]).all()
    np.testing.assert_allclose(out["rgb"],
                               np.asarray(img_single["rgb"]), atol=2e-3)
    np.testing.assert_allclose(out["alpha"],
                               np.asarray(img_single["alpha"]), atol=2e-3)
    # legacy contiguous-band layout must agree too
    out_b = dp_render_frame(avatar, mesh, state, b, grid, (48, 48),
                            chunk=1024, layout="band")
    np.testing.assert_allclose(out_b["rgb"],
                               np.asarray(img_single["rgb"]), atol=2e-3)


def test_dp_frame_renderer_production_loop(toy, tmp_path):
    """DPFrameRenderer (VERDICT r3 item 2): cached compiled programs (no
    per-frame re-jit), RenderSession bake reuse across a turntable,
    pipelined render_frames parity, and transparent overflow re-render."""
    from instantavatar_tpu.data import AvatarDataset, PatchSampler, \
        make_synthetic_sequence
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.parallel.data_parallel import DPFrameRenderer
    from instantavatar_tpu.train.model import RenderSession

    seq = make_synthetic_sequence(tmp_path / "seq", n_frames=1, H=48, W=48)
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy, field,
        SNARFDeformer(toy, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})
    val = AvatarDataset(seq, "val", start=0, end=0)
    b = {k: v for k, v in val[0].items() if k not in ("rgb", "alpha")}
    grid = avatar.build_test_grid(state, b)

    mesh = make_mesh(n_ray=8)
    rend = DPFrameRenderer(avatar, mesh, chunk=1024)

    # turntable: same body pose, spun global orientation -> the bake memo
    # must engage (one bake per pose) while every frame stays exact
    frames = [{**b, "global_orient": np.asarray(
        [0.0, 2 * np.pi * i / 3, 0.0], np.float32)} for i in range(3)]
    sess = RenderSession()
    outs = list(rend.render_frames(state, frames, grid=grid,
                                   image_shape=(48, 48), session=sess))
    assert len(outs) == 3
    assert sess.last_bake is not None  # bake memo engaged
    for f, o in zip(frames, outs):
        ref = avatar.render_frame(state, dict(f), chunk=1024, grid=grid,
                                  prune_rays=False, image_shape=(48, 48))
        np.testing.assert_allclose(o["rgb"], np.asarray(ref["rgb"]),
                                   atol=2e-3)
    # compiled-program cache: once budgets settle (one more frame may
    # recompile at the last high-water learned from frame 3), further
    # frames reuse cached programs — the r3 prototype re-jitted a fresh
    # closure every call (unbounded growth)
    list(rend.render_frames(state, frames, grid=grid,
                            image_shape=(48, 48), session=sess))
    n_programs = len(rend._compiled)
    more = list(rend.render_frames(state, frames * 2, grid=grid,
                                   image_shape=(48, 48), session=sess))
    assert len(more) == 6
    assert len(rend._compiled) == n_programs  # zero new traces

    # overflow: a pathologically small budget hint must transparently
    # re-render (not raise, not truncate)
    probe = RenderSession()
    rend.render_frame(state, frames[0], grid=grid,
                      image_shape=(48, 48), session=probe)
    hkey = next(iter(probe.samp_budget))
    tiny = RenderSession()
    tiny.samp_budget[hkey] = 1
    dispatches = []
    orig = rend._dispatch

    def spy(*a, **kw):
        dispatches.append(1)
        return orig(*a, **kw)
    rend._dispatch = spy
    out2 = rend.render_frame(state, frames[0], grid=grid,
                             image_shape=(48, 48), session=tiny)
    rend._dispatch = orig
    ref0 = avatar.render_frame(state, dict(frames[0]), chunk=1024,
                               grid=grid, prune_rays=False,
                               image_shape=(48, 48))
    assert len(dispatches) >= 2  # the overflow re-render actually fired
    np.testing.assert_allclose(out2["rgb"], np.asarray(ref0["rgb"]),
                               atol=2e-3)

    # u8 payload (quantized rgb+alpha fetch) through the sharded loop:
    # must match the f16 band render to u8 quantization
    out_u8 = rend.render_frame(state, frames[0], grid=grid,
                               image_shape=(48, 48), session=sess,
                               payload="u8")
    assert np.abs(out_u8["rgb"] - np.asarray(ref0["rgb"])).max() \
        <= 0.5 / 255 + 2e-3
    assert (out_u8["counter"] == 0).all()
