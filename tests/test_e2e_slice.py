"""End-to-end minimum slice (SURVEY §7.2 step 4): synthetic sequence on
disk -> real dataset pipeline -> SMPL deformer -> NGP field -> masked
marcher -> loss -> optimizer. Asserts learning actually happens."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from instantavatar_tpu.body import toy_smpl_model
from instantavatar_tpu.data import AvatarDataset, PatchSampler, \
    make_synthetic_sequence
from instantavatar_tpu.deformers import SMPLDeformer
from instantavatar_tpu.models.ngp import NGPField
from instantavatar_tpu.ops.hashgrid import HashGridConfig
from instantavatar_tpu.train import AvatarModel


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq")
    return make_synthetic_sequence(root, n_frames=4, H=48, W=48)


@pytest.fixture(scope="module")
def toy_model():
    return toy_smpl_model()


def _make_avatar(toy_model, k_cap=None):
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    deformer = SMPLDeformer(toy_model, threshold=0.12, knn_chunk=4096)
    return AvatarModel(toy_model, field, deformer,
                       n_steps=64, k_cap=k_cap, noise_steps=0,
                       optimizer=optax.adam(5e-3))


def test_dataset_loads_synthetic(seq_dir):
    ds = AvatarDataset(seq_dir, "train", start=0, end=3,
                       sampler=PatchSampler(num_patch=2, patch_size=16,
                                            rng=np.random.default_rng(0)))
    assert len(ds) == 4
    b = ds[0]
    assert b["rgb"].shape == (2, 16, 16, 3)
    assert b["rays_o"].shape == (2, 16, 16, 3)
    assert b["alpha"].shape == (2, 16, 16)
    assert b["near"].shape == (2, 16, 16)
    assert b["body_pose"].shape == (69,)
    # rays point roughly +z (camera at origin looking forward)
    assert float(b["rays_d"][..., 2].mean()) > 0.9


def test_dataset_eval_split_full_image(seq_dir):
    ds = AvatarDataset(seq_dir, "val", start=0, end=1)
    b = ds[0]
    assert b["rgb"].shape == (48 * 48, 3)
    # white background outside mask
    outside = b["alpha"] < 0.5
    np.testing.assert_allclose(b["rgb"][outside], 1.0, atol=1e-5)


def test_e2e_training_learns(seq_dir, toy_model):
    avatar = _make_avatar(toy_model)
    ds = AvatarDataset(seq_dir, "train", start=0, end=3,
                       sampler=PatchSampler(num_patch=2, patch_size=16,
                                            ratio_mask=1.0,
                                            rng=np.random.default_rng(1)))
    state = avatar.init(jax.random.PRNGKey(0), ds.smpl_params["betas"])

    key = jax.random.PRNGKey(42)
    first_loss = None
    for i in range(60):
        batch = {k: jnp.asarray(v) for k, v in ds[i % len(ds)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.train_step(state, batch, sub)
        if first_loss is None:
            first_loss = float(losses["mse_loss"])
    final_loss = float(losses["mse_loss"])
    assert np.isfinite(final_loss)
    assert final_loss < 0.6 * first_loss, (first_loss, final_loss)
    # the deformer actually found body samples
    assert float(losses["counter_avg"]) > 1.0


def test_e2e_grid_training_and_render_frame(seq_dir, toy_model):
    """Full production-shaped loop: step() dispatcher (grid update every
    N steps + occupancy regularizer) with k_cap compaction, then
    render_frame (test-grid init + chunked inference)."""
    avatar = _make_avatar(toy_model, k_cap=24)
    avatar.grid_update_interval = 10
    avatar.grid_size = 32
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=2, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(3)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    state = state._replace(grid=state.grid._replace(
        occupancy=jnp.ones((32, 32, 32), bool),
        density_cached=jnp.zeros((32, 32, 32))))
    key = jax.random.PRNGKey(11)
    for i in range(40):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.step(state, batch, sub)
    assert np.isfinite(float(losses["loss"]))
    # grid converged to a small occupied fraction (body only)
    frac = float(state.grid.occupancy.mean())
    assert 0.0 < frac < 0.5, frac
    # occupancy regularizer fired on update steps
    assert float(losses["counter_avg"]) <= 24

    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    out = avatar.render_frame(state, b, chunk=1024)
    assert out["rgb"].shape == (48 * 48, 3)
    assert np.isfinite(out["rgb"]).all()


@pytest.mark.slow
def test_e2e_snarf_training(seq_dir, toy_model):
    """Production deformer path: SNARF Broyden search end-to-end in the
    train loop (SURVEY §7.2 step 6)."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    snarf = SNARFDeformer(toy_model, resolution=32, cano_pose="da_pose",
                          knn_chunk=4096)
    avatar = AvatarModel(toy_model, field, snarf,
                         n_steps=64, k_cap=24, grid_size=32,
                         grid_update_interval=10, noise_steps=0,
                         optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=2, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(5)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    key = jax.random.PRNGKey(13)
    first = None
    for i in range(40):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.step(state, batch, sub)
        if first is None:
            first = float(losses["mse_loss"])
    final = float(losses["mse_loss"])
    assert np.isfinite(final)
    assert final < 0.9 * first, (first, final)
    assert float(losses["counter_avg"]) > 0.5  # SNARF finds body samples


def test_e2e_render_eval(seq_dir, toy_model):
    """Train briefly, then render a full val frame and compare inside-mask
    RGB against ground truth (coarse PSNR floor)."""
    avatar = _make_avatar(toy_model)
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=4, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(2)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    key = jax.random.PRNGKey(7)
    for i in range(150):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.train_step(state, batch, sub)

    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    out = avatar.eval_rays(state, b)
    mse = float(jnp.mean((out["rgb"] - b["rgb"]) ** 2))
    psnr = -10 * np.log10(mse)
    assert psnr > 13.0, psnr
    # alpha roughly tracks the mask
    iou_num = float(jnp.sum((out["alpha"] > 0.5) & (b["alpha"] > 0.5)))
    iou_den = float(jnp.sum((out["alpha"] > 0.5) | (b["alpha"] > 0.5)))
    assert iou_num / max(iou_den, 1.0) > 0.5


def test_e2e_smpl_init_per_frame_grids(seq_dir, toy_model):
    """demo-flow parity: per-frame body-seeded occupancy grids updated
    every step (reference smpl_init branch)."""
    from instantavatar_tpu.train.smpl_params import SMPLParams
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=10,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(toy_model, field,
                         SMPLDeformer(toy_model, threshold=0.12,
                                      knn_chunk=2048),
                         n_steps=32, k_cap=8, grid_size=16,
                         noise_steps=0, smpl_init=True,
                         optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=2, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(9)))
    smpl0 = SMPLParams.from_arrays(train.get_smpl_params())
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"],
                        smpl0)
    # stacked per-frame grids, body-seeded (some but not all cells on)
    assert state.grid.occupancy.shape == (4, 16, 16, 16)
    fracs = np.asarray(state.grid.occupancy.reshape(4, -1).mean(-1))
    assert (fracs > 0).all() and (fracs < 0.5).all()
    # grids differ across frames (different poses)
    assert not np.array_equal(np.asarray(state.grid.occupancy[0]),
                              np.asarray(state.grid.occupancy[3]))

    key = jax.random.PRNGKey(21)
    occ0 = np.asarray(state.grid.occupancy)
    for i in range(6):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.step(state, batch, sub)
    assert np.isfinite(float(losses["loss"]))
    # during the first 500 steps the seeded grids stay fixed
    np.testing.assert_array_equal(np.asarray(state.grid.occupancy), occ0)
    # eval picks the per-frame grid
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    out = avatar.eval_rays(state, b, avatar._frame_grid(state, b))
    assert np.isfinite(np.asarray(out["rgb"])).all()


@pytest.mark.slow
def test_packed_cache_render_matches_uncached(seq_dir, toy_model):
    """VERDICT r1 acceptance: the packed warp-cache render (fused
    occupancy+candidate gather, cached-Newton refine, cell-level max-sigma
    select) must pixel-match the uncached full-Broyden render path on a
    trained avatar."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))

    def make(use_cache, production=False, sampling="windows"):
        return AvatarModel(
            toy_model, field,
            SNARFDeformer(toy_model, resolution=32, cano_pose="da_pose",
                          knn_chunk=4096),
            n_steps=64, k_cap=16, grid_size=32, grid_update_interval=10,
            noise_steps=0, use_warp_cache=use_cache, cache_n_cand=4,
            eval_n_steps=64, n_windows=24,
            # dense cached sampling + huge margin degenerates the tight
            # spans to [near, far] so cached and uncached paths sample
            # identical z grids and the comparison isolates the warp
            # cache itself; production=True exercises the prepass
            # window/flat sampling actually used at speed
            eval_sampling=sampling if production else "dense",
            prepass_margin_steps=1.5 if production else 1e6,
            optimizer=optax.adam(5e-3))

    avatar = make(True)
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=4, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(8)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    key = jax.random.PRNGKey(17)
    for i in range(60):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, _ = avatar.step(state, batch, sub)

    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    img_full = make(False).render_frame(state, b, chunk=1024)["rgb"]
    assert np.isfinite(img_full).all()

    def match_psnr(img):
        assert np.isfinite(img).all()
        mse = float(np.mean((img - img_full) ** 2))
        return -10 * np.log10(max(mse, 1e-12))

    # identical z-sampling => the cache itself must be a near-exact
    # stand-in for the per-sample Broyden search
    img_cached = avatar.render_frame(state, b, chunk=1024)["rgb"]
    assert match_psnr(img_cached) > 30.0, match_psnr(img_cached)
    # production config (prepass-window sampling): z grids differ,
    # images must still closely agree
    img_prod = make(True, production=True).render_frame(
        state, b, chunk=1024)["rgb"]
    assert match_psnr(img_prod) > 25.0, match_psnr(img_prod)
    # flat (frame-global sample compaction, center-shared cache rows):
    # same prepass windows, segmented composite. The shared-row
    # approximation is resolution-dependent (block pixel spread ~p*z/f vs
    # the cell size) and this 48px scene is its harshest case — at
    # production resolutions the spread is millimetres. Bar matches the
    # windows-vs-full bar.
    img_flat = make(True, production=True, sampling="flat").render_frame(
        state, b, chunk=1024)["rgb"]
    assert match_psnr(img_flat) > 25.0, match_psnr(img_flat)
    mse = float(np.mean((img_flat - img_prod) ** 2))
    flat_vs_win = -10 * np.log10(max(mse, 1e-12))
    assert flat_vs_win > 25.0, flat_vs_win


@pytest.mark.slow
def test_train_warp_cache_learns_like_full_search(seq_dir, toy_model):
    """Opt-in cached-search training (train_warp_cache=True) must follow
    the full-search training trajectory: same init, same batches, similar
    val render after a few dozen steps (the cached-Newton correspondence
    is the same approximation the eval parity test bounds)."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))

    def make(cached):
        return AvatarModel(
            toy_model, field,
            SNARFDeformer(toy_model, resolution=32, cano_pose="da_pose",
                          knn_chunk=4096),
            n_steps=64, k_cap=16, grid_size=32, grid_update_interval=10,
            noise_steps=0, train_warp_cache=cached, eval_n_steps=64,
            n_windows=24, optimizer=optax.adam(5e-3))

    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=4, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(8)))
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}

    imgs = {}
    for cached in (False, True):
        avatar = make(cached)
        state = avatar.init(jax.random.PRNGKey(0),
                            train.smpl_params["betas"])
        key = jax.random.PRNGKey(17)
        losses = []
        for i in range(30):
            batch = {k: jnp.asarray(v)
                     for k, v in train[i % len(train)].items()}
            key, sub = jax.random.split(key)
            state, m = avatar.step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], (cached, losses[0], losses[-1])
        imgs[cached] = np.asarray(
            avatar.render_frame(state, b, chunk=1024)["rgb"])
    mse = float(np.mean((imgs[True] - imgs[False]) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 22.0, psnr


def test_smpl_deformer_flat_cache_matches_dense(seq_dir, toy_model):
    """VERDICT r2 weak #8: the fit-flow deformer (SMPL nearest-vertex)
    must render through the fused flat-cache path, and the cached render
    must closely match the cache-off dense march (the KNN inverse warp is
    affine per Voronoi cell, so the cached-Newton step is near-exact)."""
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))

    def make(use_cache):
        return AvatarModel(
            toy_model, field,
            SMPLDeformer(toy_model, threshold=0.12, knn_chunk=4096),
            n_steps=64, k_cap=16, grid_size=32, grid_update_interval=10,
            noise_steps=0, use_warp_cache=use_cache,
            eval_n_steps=64, n_windows=24, eval_sampling="flat",
            optimizer=optax.adam(5e-3))

    avatar = make(True)
    assert hasattr(avatar.deformer, "bake_packed_cache")
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=4, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(8)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    key = jax.random.PRNGKey(17)
    for i in range(25):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, _ = avatar.step(state, batch, sub)

    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    img_dense = make(False).render_frame(state, b, chunk=1024)["rgb"]
    img_flat = avatar.render_frame(state, b, chunk=1024)["rgb"]
    assert np.isfinite(img_dense).all() and np.isfinite(img_flat).all()
    mse = float(np.mean((img_flat - img_dense) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 25.0, psnr


def test_basis_only_batch_matches_full_rays(seq_dir, toy_model):
    """r5 host-traffic fix: in flat mode a numpy full-image batch is
    slimmed to the (4, 3) generator basis + scalar near/far (the ray
    tensors cost ~13 MB/frame of tunnel upload at 540px), and the fused
    program reconstructs the block-lattice prepass rays in-jit. The
    slimmed render must match the full-ray render."""
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SMPLDeformer(toy_model, threshold=0.12, knn_chunk=4096),
        n_steps=64, k_cap=16, grid_size=32, grid_update_interval=10,
        noise_steps=0, use_warp_cache=True,
        eval_n_steps=64, n_windows=24, eval_sampling="flat",
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=4, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(9)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    key = jax.random.PRNGKey(23)
    for i in range(25):
        batch = {k: jnp.asarray(v) for k, v in train[i % len(train)].items()}
        key, sub = jax.random.split(key)
        state, _ = avatar.step(state, batch, sub)

    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b_np = {k: v for k, v in val[0].items()}          # host numpy batch
    b_dev = {k: jnp.asarray(v) for k, v in val[0].items()}

    # the async record proves the numpy batch was actually slimmed
    rec = avatar._render_frame_async(state, b_np, chunk=1024,
                                     image_shape=(48, 48))
    assert "rays_o" not in rec["fbatch"] and "rays_d" not in rec["fbatch"]
    assert rec["fbatch"]["near"].ndim == 0
    assert rec["fbatch"]["bg_color"].shape == (3,)
    img_slim = avatar._finish_frame(rec)["rgb"]

    img_full = avatar.render_frame(state, b_dev, chunk=1024,
                                   image_shape=(48, 48))["rgb"]
    assert np.isfinite(img_slim).all() and np.isfinite(img_full).all()
    mse = float(np.mean((np.asarray(img_slim) - np.asarray(img_full)) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, psnr
    # basis-only batches refuse non-flat paths loudly
    b_basis_only = {k: v for k, v in b_np.items()
                    if k not in ("rays_o", "rays_d")}
    avatar2 = AvatarModel(
        toy_model, field,
        SMPLDeformer(toy_model, threshold=0.12, knn_chunk=4096),
        n_steps=64, k_cap=16, grid_size=32, noise_steps=0,
        use_warp_cache=True, eval_n_steps=64, eval_sampling="windows",
        optimizer=optax.adam(5e-3))
    with pytest.raises(ValueError, match="flat"):
        avatar2.render_frame(state, b_basis_only, chunk=1024,
                             image_shape=(48, 48))


def test_avatar_config_mutation_warns_after_dispatch(toy_model):
    """r5: AvatarModel rides jits as a static arg and pjit's cache hits
    on static-arg IDENTITY, so setattr after a trace silently reuses the
    stale program (an alpha_skip ablation measured bit-identical arms).
    The config locks at the first dispatch; later primitive mutation
    must warn loudly. Host-only knobs (eval_grid) stay silent."""
    import warnings
    avatar = _make_avatar(toy_model)
    avatar.term_T = 1e-4          # before any dispatch: silent
    avatar._lock_config()         # what the first dispatch does
    with pytest.warns(RuntimeWarning, match="fresh AvatarModel"):
        avatar.term_T = 0.5
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        avatar.eval_grid = "smpl_shell"   # host-only: no warning
        avatar.term_T = 0.5               # unchanged value: no warning


def test_build_pose_grid_shell(seq_dir, toy_model):
    """build_pose_grid (r5): posed-vertex shell eval grid (reference
    smpl_init semantics, density_grid.py:53-75) — ~100x cheaper per new
    pose than the 5-pass density sweep. Must cover the posed vertices,
    stay sparse, and render finite frames via eval_grid='smpl_shell'."""
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SMPLDeformer(toy_model, threshold=0.12, knn_chunk=4096),
        n_steps=64, k_cap=16, grid_size=32, noise_steps=0,
        use_warp_cache=True, eval_n_steps=64, eval_sampling="flat",
        eval_grid="smpl_shell", optimizer=optax.adam(5e-3))
    ds = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: v for k, v in ds[0].items() if k not in ("rgb", "alpha")}
    state = avatar.init(jax.random.PRNGKey(0), ds.smpl_params["betas"])

    grid = avatar.build_pose_grid(state, b)
    occ = np.asarray(grid.occupancy)
    frac = float(occ.mean())
    assert 0.0 < frac < 0.4, frac
    # every posed vertex's cell is occupied
    dstate = avatar._prepare(state.deformer_cano, b)
    verts = np.asarray(dstate.verts_smpl)
    aabb = np.asarray(grid.aabb)
    G = avatar.grid_size
    ijk = np.clip(((verts - aabb[0]) / (aabb[1] - aabb[0]) * G), 0,
                  G - 1).astype(int)
    assert occ[ijk[:, 0], ijk[:, 1], ijk[:, 2]].all()
    # the render path picks the shell grid via eval_grid
    out = avatar.render_frame(state, b, chunk=1024, image_shape=(48, 48))
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_flat_no_tile_matches_tiled_rows(seq_dir, toy_model):
    """The r5 default flat eval feeds the (S,)-shaped cache rows straight
    into the per-pixel-offset Newton einsum (packed_cache field_fn
    pts_all); it must reproduce the r4 path that materialized
    (p^2*S, K*13) row tiles — same math, different layout (the tile
    broadcast cost ~8 ms/frame at 540px, xplane r4)."""
    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))

    def make(tile):
        return AvatarModel(
            toy_model, field,
            SMPLDeformer(toy_model, threshold=0.12, knn_chunk=4096),
            n_steps=64, k_cap=16, grid_size=32, grid_update_interval=10,
            noise_steps=0, eval_n_steps=64, eval_sampling="flat",
            flat_tile_rows=tile, optimizer=optax.adam(5e-3))

    avatar = make(False)
    state = avatar.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    # opaque-biased field: untrained but body-shaped workload (bench.py)
    fp = state.params["field"]
    state = state._replace(params={**state.params,
                                   "field": fp._replace(
                                       sigma_b=fp.sigma_b[:-1] + (
                                           fp.sigma_b[-1].at[0].set(50.0),))})
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    # image_shape 48x48 selects the p=3 block lattice -> 9 pixel offsets
    img_new = avatar.render_frame(state, b, chunk=1024,
                                  image_shape=(48, 48))["rgb"]
    img_old = make(True).render_frame(state, b, chunk=1024,
                                      image_shape=(48, 48))["rgb"]
    assert np.isfinite(img_new).all() and np.isfinite(img_old).all()
    np.testing.assert_allclose(img_new, img_old, atol=2e-3)


def test_render_session_keys_budgets_by_resolution(seq_dir, toy_model,
                                                   tmp_path):
    """VERDICT r2 weak #5: budget hints must not live as hidden state on
    AvatarModel. Alternating resolutions through one RenderSession must
    (a) leave the model itself untouched (stateless descriptor), (b) key
    the learned budgets per (n_rays, prepass) so resolutions don't thrash
    each other, and (c) reproduce identical images when a resolution is
    revisited."""
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.train.model import RenderSession
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])

    small = make_synthetic_sequence(tmp_path / "small", n_frames=1,
                                    H=24, W=24)
    val_a = AvatarDataset(seq_dir, "val", start=0, end=0)
    val_b = AvatarDataset(small, "val", start=0, end=0)
    b_a = {k: jnp.asarray(v) for k, v in val_a[0].items()}
    b_b = {k: jnp.asarray(v) for k, v in val_b[0].items()}

    attrs_before = dict(vars(avatar))
    sess = RenderSession()
    out_a1 = avatar.render_frame(state, b_a, chunk=1024,
                                 image_shape=(48, 48), session=sess)
    out_b = avatar.render_frame(state, b_b, chunk=1024,
                                image_shape=(24, 24), session=sess)
    out_a2 = avatar.render_frame(state, b_a, chunk=1024,
                                 image_shape=(48, 48), session=sess)
    # (a) the model descriptor gained no hidden attributes
    assert vars(avatar) == attrs_before
    # (b) each resolution learned its own budget entry
    assert len(sess.cell_budget) == 2
    keys_n = sorted(k[0] for k in sess.cell_budget)
    assert keys_n == [24 * 24, 48 * 48]
    # (c) revisiting resolution A reproduces the image bit-for-bit even
    # after B's render updated the session in between
    np.testing.assert_allclose(out_a1["rgb"], out_a2["rgb"], atol=1e-5)
    assert np.isfinite(out_b["rgb"]).all()


def test_fused_size_hop_dodges_backend_compiler_crash(seq_dir, toy_model):
    """libtpu's regalloc RET_CHECKs on the fused render at specific
    flat-stream sizes (live_range_finder.cc:29, reproduced at
    samp_budget=393216/540px on v5e — content-independent). The render
    must hop to the next chunk multiple (pure padding, identical image),
    remember the bad size process-wide, and never retry it."""
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.train import model as model_mod
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}

    img_ref = avatar.render_frame(state, b, chunk=1024,
                                  image_shape=(48, 48))["rgb"]

    # spy pass: find the size the first dispatch would use
    sizes = []
    orig = type(avatar)._render_frame_fused

    def spy(st, fb, gr, budget, chunk, cell_budget=None,
            prepass_shape=None, samp_budget=None, **kw):
        sizes.append(samp_budget)
        return orig(avatar, st, fb, gr, budget, chunk, cell_budget,
                    prepass_shape, samp_budget, **kw)
    avatar._render_frame_fused = spy
    avatar.render_frame(state, b, chunk=1024, image_shape=(48, 48))
    bad = sizes[0]
    assert bad is not None

    # crash pass: the first-choice size "fails to compile"
    calls = []

    def crashing(st, fb, gr, budget, chunk, cell_budget=None,
                 prepass_shape=None, samp_budget=None, **kw):
        calls.append(samp_budget)
        if samp_budget == bad:
            raise RuntimeError(
                "INTERNAL: AOT PJRT error: RET_CHECK failure "
                "(live_range_finder.cc:29) [synthetic test crash]")
        return orig(avatar, st, fb, gr, budget, chunk, cell_budget,
                    prepass_shape, samp_budget, **kw)
    avatar._render_frame_fused = crashing
    try:
        img_hop = avatar.render_frame(state, b, chunk=1024,
                                      image_shape=(48, 48))["rgb"]
        # padding only — image identical to the unhopped render
        np.testing.assert_allclose(img_hop, img_ref, atol=1e-5)
        assert any(k[2] == bad for k in model_mod._BAD_FUSED_SIZES)
        # second render must skip the bad size without another attempt
        n_before = len(calls)
        avatar.render_frame(state, b, chunk=1024, image_shape=(48, 48))
        assert bad not in calls[n_before:]
    finally:
        del avatar._render_frame_fused
        model_mod._BAD_FUSED_SIZES.clear()


def test_bake_reuse_across_turntable_frames(seq_dir, toy_model):
    """Cross-frame bake reuse: global orientation and translation cancel
    in the world->SMPL transform, so turntable frames (same body pose)
    must reuse the previous frame's warp cache/sigma table — and produce
    EXACTLY the images a fresh per-frame render produces. A pose change
    must invalidate the memo (different key -> rebake branch)."""
    from instantavatar_tpu.deformers import SNARFDeformer
    from instantavatar_tpu.train.model import RenderSession
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=1,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b0 = val[0]  # numpy batch: content-keyed
    # 3-frame turntable (same pose object, spun orientation) + 1 frame
    # with a DIFFERENT body pose
    frames = [dict(b0),
              {**b0, "global_orient": b0["global_orient"]
               + np.array([0, 0.6, 0], np.float32)},
              {**b0, "global_orient": b0["global_orient"]
               + np.array([0, 1.2, 0], np.float32)},
              {**b0, "body_pose": b0["body_pose"]
               + 0.1 * np.ones(69, np.float32)}]
    sess = RenderSession()
    seq_imgs = [np.asarray(o["rgb"]) for o in avatar.render_frames(
        state, [dict(f) for f in frames], chunk=1024, depth=2,
        image_shape=(48, 48), session=sess)]
    assert sess.last_bake is not None  # memo engaged
    # fresh single-frame renders (independent sessions: no reuse)
    for f, img_seq in zip(frames, seq_imgs):
        img_ref = avatar.render_frame(state, dict(f), chunk=1024,
                                      image_shape=(48, 48))["rgb"]
        np.testing.assert_allclose(img_seq, np.asarray(img_ref),
                                   atol=1e-5)


def test_flat_render_budget_invariance_under_overflow(seq_dir, toy_model):
    """The flat render must be budget-INVARIANT: undersized initial
    sample/cell budgets only trigger transparent re-renders, never change
    the image. Regression for the compound-overflow bug where a
    cell-budget re-render surfaced a NEW sample-stream overflow that was
    shipped unchecked (truncated streams rendered visibly wrong bands)."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))

    def make(spr):
        return AvatarModel(
            toy_model, field,
            SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                          knn_chunk=4096),
            n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
            eval_sampling="flat", n_windows=12, eval_n_steps=16,
            samples_per_ray=spr, optimizer=optax.adam(5e-3))

    train = AvatarDataset(seq_dir, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    av_ref = make(12.0)  # n_windows-sized: can never overflow
    state = av_ref.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    # opaque field => many kept samples => small budgets overflow
    fp = state.params["field"]
    sb = list(fp.sigma_b)
    sb[-1] = sb[-1].at[0].set(100.0)
    state = state._replace(params={**state.params,
                                   "field": fp._replace(sigma_b=tuple(sb))})
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}
    img_ref = av_ref.render_frame(state, b, chunk=1024,
                                  image_shape=(48, 48))["rgb"]
    for spr in (2.0, 4.0):
        img = make(spr).render_frame(state, b, chunk=1024,
                                     image_shape=(48, 48))["rgb"]
        np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                                   atol=1e-5)


def test_render_frames_pipelined_matches_single(seq_dir, toy_model):
    """The pipelined multi-frame renderer must produce the same images as
    frame-by-frame render_frame."""
    avatar = _make_avatar(toy_model, k_cap=16)
    train = AvatarDataset(seq_dir, "train", start=0, end=3,
                          sampler=PatchSampler(num_patch=2, patch_size=16,
                                               ratio_mask=1.0,
                                               rng=np.random.default_rng(4)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    val = AvatarDataset(seq_dir, "val", start=0, end=1)
    batches = [{k: jnp.asarray(v) for k, v in val[i].items()}
               for i in range(2)]
    singles = [avatar.render_frame(state, b, chunk=1024) for b in batches]
    piped = list(avatar.render_frames(state, batches, chunk=1024))
    assert len(piped) == 2
    for s, p in zip(singles, piped):
        np.testing.assert_allclose(s["rgb"], p["rgb"], atol=1e-5)


def test_crash_classifier_is_narrow():
    """Only the known libtpu regalloc RET_CHECK signature may trigger the
    size hop; any other INTERNAL error must surface immediately instead
    of burning 16 failed ~90 s compiles (VERDICT r3 weak #4)."""
    from instantavatar_tpu.train.model import _is_backend_compiler_crash
    assert _is_backend_compiler_crash(RuntimeError(
        "INTERNAL: AOT PJRT error: RET_CHECK failure "
        "(platforms/xla/service/jellyfish/live_range_finder.cc:29)"))
    # unrelated INTERNAL runtime errors: not a compiler crash
    assert not _is_backend_compiler_crash(RuntimeError(
        "INTERNAL: Failed to execute XLA Runtime executable"))
    assert not _is_backend_compiler_crash(RuntimeError(
        "INTERNAL: tpu_compile_helper: out of memory allocating buffer"))
    assert not _is_backend_compiler_crash(RuntimeError("RESOURCE_EXHAUSTED"))


def test_unrelated_internal_error_surfaces_immediately(seq_dir, toy_model):
    """An INTERNAL error without the RET_CHECK signature must propagate
    from the fused render on the FIRST attempt — no size hopping."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}

    calls = []

    def always_internal(*a, **kw):
        calls.append(1)
        raise RuntimeError("INTERNAL: Failed to execute XLA Runtime "
                           "executable [synthetic test error]")
    avatar._render_frame_fused = always_internal
    try:
        with pytest.raises(RuntimeError, match="XLA Runtime executable"):
            avatar.render_frame(state, b, chunk=1024, image_shape=(48, 48))
    finally:
        del avatar._render_frame_fused
    assert len(calls) == 1  # no hops were attempted


def test_finish_frame_warns_when_overflow_loop_exhausted(seq_dir, toy_model):
    """A pathologically oscillating budget must never ship a truncated
    frame silently: when 4 re-render passes still overflow, _finish_frame
    warns loudly (VERDICT r3 weak #3)."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}

    rec = avatar._render_frame_async(state, b, chunk=1024,
                                     image_shape=(48, 48))
    out, _, n_occ = type(avatar)._unpack_frame(rec["buf"])
    buf = rec["buf"]

    # force a persistent sample-stream overflow: every unpack reports a
    # hit count ABOVE the latest budget (an oscillating/growing workload
    # the 4-pass loop can never satisfy)
    rerenders = []
    last = {"b": rec.get("samp_budget") or 8192}

    def fake_hopped(*a, **kw):
        rerenders.append(a[7])  # samp_budget positional slot
        last["b"] = a[7]
        return buf, None, a[7]
    avatar._unpack_frame = lambda b_: (out, last["b"] * 2, n_occ)
    avatar._call_fused_size_hopped = fake_hopped
    try:
        with pytest.warns(RuntimeWarning, match="still overflowed"):
            got = avatar._finish_frame(rec)
    finally:
        del avatar._unpack_frame
        del avatar._call_fused_size_hopped
    assert len(rerenders) == 4  # the loop did try its 4 passes
    np.testing.assert_allclose(got["rgb"], out["rgb"], atol=0)


def test_multi_step_matches_sequential(seq_dir, toy_model):
    """train_multi_step (K steps in one dispatch, grid cadence via
    lax.cond on the device step counter) must produce the same state as
    K sequential avatar.step calls with the same batches/keys."""
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(toy_model, field,
                         SMPLDeformer(toy_model, threshold=0.12,
                                      knn_chunk=4096),
                         n_steps=32, k_cap=8, grid_size=8, noise_steps=0,
                         grid_update_interval=2,
                         optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=1,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state0 = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    K = 4
    batches = [train[i % 2] for i in range(K)]
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    # sequential reference
    st_seq = state0
    for i in range(K):
        b = {k: jnp.asarray(v) for k, v in batches[i].items()}
        st_seq, losses_seq = avatar.step(st_seq, b, keys[i], step=i)

    # one multi-step dispatch
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in batches[0]}
    st_multi, losses_multi = avatar.train_multi_step(state0, stacked, keys)

    assert int(st_multi.step) == int(st_seq.step)
    for a, b in zip(jax.tree.leaves(st_seq.params),
                    jax.tree.leaves(st_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_seq.grid.occupancy),
                                  np.asarray(st_multi.grid.occupancy))
    np.testing.assert_allclose(float(losses_multi["loss"]),
                               float(losses_seq["loss"]), atol=1e-5)


def test_multi_step_grouped_prefetch_roundtrip(seq_dir, toy_model):
    """iterate_grouped feeds train_multi_step: leading-K leaves, tail
    group smaller, contents matching the per-index getter."""
    from instantavatar_tpu.utils.prefetch import DevicePrefetcher
    train = AvatarDataset(seq_dir, "train", start=0, end=1,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    fixed = [train[i % 2] for i in range(5)]
    pf = DevicePrefetcher(lambda i: fixed[i])
    got = list(pf.iterate_grouped(range(5), group=2))
    assert [g["idx"].shape[0] for g in got] == [2, 2, 1]
    np.testing.assert_allclose(np.asarray(got[1]["rgb"][0]),
                               np.asarray(fixed[2]["rgb"]), atol=1e-7)


def test_u8_payload_matches_f16(seq_dir, toy_model):
    """payload="u8" (quantized rgb+alpha fetch, 4 B/ray vs 12 — the
    animate/novel_view/bench fetch path) must match the default f16
    payload to u8 quantization (<= 0.5/255 per channel) and carry the
    same n_hit/n_occ overflow counters through its 8-byte trailer."""
    from instantavatar_tpu.deformers import SNARFDeformer
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy_model, field,
        SNARFDeformer(toy_model, resolution=16, cano_pose="da_pose",
                      knn_chunk=4096),
        n_steps=32, k_cap=8, grid_size=16, noise_steps=0,
        eval_sampling="flat", n_windows=12, eval_n_steps=16,
        optimizer=optax.adam(5e-3))
    train = AvatarDataset(seq_dir, "train", start=0, end=0,
                          sampler=PatchSampler(num_patch=1, patch_size=16,
                                               rng=np.random.default_rng(0)))
    state = avatar.init(jax.random.PRNGKey(0), train.smpl_params["betas"])
    val = AvatarDataset(seq_dir, "val", start=0, end=0)
    b = {k: jnp.asarray(v) for k, v in val[0].items()}

    out16 = avatar.render_frame(state, b, chunk=1024, image_shape=(48, 48))
    out8 = avatar.render_frame(state, b, chunk=1024, image_shape=(48, 48),
                               payload="u8")
    # f16 itself quantizes (~2^-11 at 1.0); allow u8 half-step + f16 eps
    assert np.abs(out8["rgb"] - out16["rgb"]).max() <= 0.5 / 255 + 1e-3
    assert np.abs(out8["alpha"] - out16["alpha"]).max() <= 0.5 / 255 + 1e-3
    # depth/counter are not shipped in u8 mode
    assert out8["depth"].shape == out16["depth"].shape
    assert (out8["counter"] == 0).all()

    # the u8 trailer must decode the same overflow counters the f16
    # extra row carries (digit encodings differ: base 256 vs 1024)
    rec16 = avatar._render_frame_async(state, b, chunk=1024,
                                       image_shape=(48, 48))
    rec8 = avatar._render_frame_async(state, b, chunk=1024,
                                      image_shape=(48, 48), payload="u8")
    _, h16, o16 = avatar._unpack_frame(rec16["buf"])
    _, h8, o8 = avatar._unpack_frame(rec8["buf"])
    assert (h8, o8) == (h16, o16)
    # and the u8 buffer really is ~3x smaller
    assert np.asarray(rec8["buf"]).nbytes * 2.9 \
        <= np.asarray(rec16["buf"]).nbytes
