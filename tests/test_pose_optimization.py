"""Pose-optimization tests: SMPL embedding lookup, grouped optimizer,
fit-from-perturbed-pose improves photometric loss AND moves params toward
ground truth (the fit.py / eval.py refine flows, SURVEY §3.3/§3.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantavatar_tpu.body import toy_smpl_model
from instantavatar_tpu.data import AvatarDataset, PatchSampler, \
    make_synthetic_sequence
from instantavatar_tpu.deformers import SMPLDeformer
from instantavatar_tpu.models.ngp import NGPField
from instantavatar_tpu.ops.hashgrid import HashGridConfig
from instantavatar_tpu.train import AvatarModel
from instantavatar_tpu.train.optim import make_optimizer, poly_decay_schedule
from instantavatar_tpu.train.smpl_params import (SMPLParams, lookup_frame,
                                                 tv_loss)


def test_lookup_frame():
    p = SMPLParams(betas=jnp.ones((1, 10)),
                   global_orient=jnp.arange(12.).reshape(4, 3),
                   body_pose=jnp.zeros((4, 69)),
                   transl=jnp.arange(12.).reshape(4, 3) * 10)
    f = lookup_frame(p, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(f["global_orient"]), [6., 7., 8.])
    np.testing.assert_allclose(np.asarray(f["transl"]), [60., 70., 80.])
    assert f["betas"].shape == (10,)


def test_tv_loss_zero_for_constant():
    p = SMPLParams(betas=jnp.zeros((1, 10)),
                   global_orient=jnp.ones((4, 3)),
                   body_pose=jnp.ones((4, 69)),
                   transl=jnp.ones((4, 3)))
    assert float(tv_loss(p)) == 0.0


def test_poly_decay_schedule():
    sched = poly_decay_schedule(1e-2, max_epochs=10, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(25)) == pytest.approx(1e-2 * 0.5 ** 1.5)


def test_optimizer_freeze_field():
    import optax
    opt = make_optimizer(lr=1e-2, smpl_lr=1e-3, freeze_field=True)
    params = {"field": {"w": jnp.ones(3)},
              "smpl": SMPLParams(jnp.ones((1, 10)), jnp.ones((2, 3)),
                                 jnp.ones((2, 69)), jnp.ones((2, 3)))}
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, st, params)
    assert float(jnp.abs(updates["field"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["smpl"].transl).sum()) > 0.0


@pytest.mark.slow
def test_fit_recovers_perturbed_pose(tmp_path):
    """The core fit.py capability: start from wrong per-frame transl, and
    joint optimization must reduce pose error while fitting the field."""
    root = make_synthetic_sequence(tmp_path / "seq", n_frames=3, H=48, W=48)
    toy = toy_smpl_model()
    ds = AvatarDataset(root, "train", start=0, end=2,
                       sampler=PatchSampler(num_patch=4, patch_size=16,
                                            ratio_mask=1.0,
                                            rng=np.random.default_rng(0)))
    gt = ds.get_smpl_params()
    rng = np.random.RandomState(0)
    init = dict(gt)
    init["transl"] = gt["transl"] + 0.06 * rng.randn(*gt["transl"].shape) \
        .astype(np.float32)
    smpl0 = SMPLParams.from_arrays(init)

    field = NGPField(grid=HashGridConfig(n_levels=8, log2_hashmap_size=13,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy, field, SMPLDeformer(toy, threshold=0.12, knn_chunk=4096),
        n_steps=64, k_cap=None, noise_steps=0,
        optimize_smpl=True,
        optimizer=make_optimizer(lr=5e-3, smpl_lr=5e-3))
    state = avatar.init(jax.random.PRNGKey(0), gt["betas"], smpl0)

    err0 = float(np.abs(np.asarray(smpl0.transl) - gt["transl"]).mean())
    key = jax.random.PRNGKey(1)
    # feed the raw (un-refined) dataset batches; the model swaps in its
    # own optimized params by idx
    for i in range(220):
        batch = {k: jnp.asarray(v) for k, v in ds[i % len(ds)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.train_step(state, batch, sub)
    err1 = float(np.abs(np.asarray(state.params["smpl"].transl)
                        - gt["transl"]).mean())
    assert np.isfinite(float(losses["loss"]))
    assert err1 < 0.85 * err0, (err0, err1)


def test_refine_freezes_field(tmp_path):
    """eval.py refine flow: field params must stay bit-identical while
    SMPL params move."""
    root = make_synthetic_sequence(tmp_path / "seq2", n_frames=2, H=32,
                                   W=32)
    toy = toy_smpl_model()
    ds = AvatarDataset(root, "train", start=0, end=1,
                       sampler=PatchSampler(num_patch=2, patch_size=8,
                                            ratio_mask=1.0,
                                            rng=np.random.default_rng(1)))
    gt = ds.get_smpl_params()
    smpl0 = SMPLParams.from_arrays(gt)
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=10,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy, field, SMPLDeformer(toy, threshold=0.12, knn_chunk=1024),
        n_steps=32, k_cap=None,
        optimize_smpl=True, is_refine=True,
        optimizer=make_optimizer(lr=1e-2, smpl_lr=1e-3, freeze_field=True))
    state = avatar.init(jax.random.PRNGKey(0), gt["betas"], smpl0)
    table0 = np.asarray(state.params["field"].table)

    key = jax.random.PRNGKey(2)
    for i in range(5):
        batch = {k: jnp.asarray(v) for k, v in ds[i % len(ds)].items()}
        key, sub = jax.random.split(key)
        state, _ = avatar.train_step(state, batch, sub)
    np.testing.assert_array_equal(np.asarray(state.params["field"].table),
                                  table0)
    moved = np.abs(np.asarray(state.params["smpl"].transl)
                   - gt["transl"]).sum()
    assert moved > 0


def test_unknown_loss_weight_raises():
    toy = toy_smpl_model()
    with pytest.raises(ValueError, match="unknown loss weight"):
        AvatarModel(toy, loss_weights={"w_bogus": 1.0})
    with pytest.raises(ValueError, match="lpips_fn"):
        AvatarModel(toy, loss_weights={"w_lpips": 0.01})


def test_fitting_trains_with_patch_losses(tmp_path):
    """The SNARF_NGP_fitting objective (reference NGPLoss,
    utils/loss.py:27-46): all five terms — rgb/alpha/reg + patch LPIPS +
    depth regularizer — must appear in the logged losses and the total
    must reduce."""
    from instantavatar_tpu.losses.lpips import load_lpips

    root = make_synthetic_sequence(tmp_path / "seqL", n_frames=2, H=48,
                                   W=48)
    toy = toy_smpl_model()
    ds = AvatarDataset(root, "train", start=0, end=1,
                       sampler=PatchSampler(num_patch=2, patch_size=16,
                                            ratio_mask=1.0,
                                            rng=np.random.default_rng(3)))
    gt = ds.get_smpl_params()
    field = NGPField(grid=HashGridConfig(n_levels=4, log2_hashmap_size=10,
                                         base_resolution=4,
                                         per_level_scale=1.6))
    avatar = AvatarModel(
        toy, field, SMPLDeformer(toy, threshold=0.12, knn_chunk=1024),
        n_steps=32, k_cap=None, noise_steps=0,
        optimize_smpl=True,
        loss_weights={"w_rgb": 1.0, "w_alpha": 0.1, "w_reg": 0.1,
                      "w_lpips": 0.01, "w_depth_reg": 0.01},
        lpips_fn=load_lpips("vgg", allow_random=True),
        optimizer=make_optimizer(lr=5e-3, smpl_lr=1e-4))
    state = avatar.init(jax.random.PRNGKey(0), gt["betas"],
                        SMPLParams.from_arrays(gt))

    key = jax.random.PRNGKey(7)
    hist = []
    for i in range(30):
        batch = {k: jnp.asarray(v) for k, v in ds[i % len(ds)].items()}
        key, sub = jax.random.split(key)
        state, losses = avatar.train_step(state, batch, sub)
        hist.append(float(losses["loss"]))
    assert "loss_lpips" in losses and "loss_depth_reg" in losses
    assert np.isfinite(float(losses["loss_lpips"]))
    assert np.isfinite(float(losses["loss_depth_reg"]))
    assert np.mean(hist[-5:]) < np.mean(hist[:5]), hist
