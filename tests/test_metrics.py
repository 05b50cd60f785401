"""Metric tests: PSNR exact, SSIM vs known values/properties, LPIPS
architecture (random-trunk fallback), Evaluator surface (eval.py:14-33)."""
import jax
import jax.numpy as jnp
import numpy as np

from instantavatar_tpu.utils.metrics import Evaluator, psnr, ssim


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_psnr_identical_is_large():
    a = jnp.full((4, 4, 3), 0.5)
    assert float(psnr(a, a)) > 100


def test_ssim_identical_is_one():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    noisy1 = jnp.clip(img + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), img.shape), 0, 1)
    noisy2 = jnp.clip(img + 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), img.shape), 0, 1)
    s1, s2 = float(ssim(img, noisy1)), float(ssim(img, noisy2))
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_matches_torchmetrics():
    """Golden check against torchmetrics' SSIM (the reference's metric)."""
    try:
        from torchmetrics import StructuralSimilarityIndexMeasure
    except Exception:
        import pytest
        pytest.skip("torchmetrics unavailable")
    import torch
    rng = np.random.RandomState(0)
    a = rng.rand(1, 3, 40, 40).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(*a.shape).astype(np.float32), 0, 1)
    ref = float(StructuralSimilarityIndexMeasure(data_range=1.0)(
        torch.from_numpy(b), torch.from_numpy(a)))
    ours = float(ssim(jnp.asarray(b.transpose(0, 2, 3, 1)),
                      jnp.asarray(a.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_lpips_random_trunk():
    from instantavatar_tpu.losses.lpips import load_lpips
    lp = load_lpips("vgg", allow_random=True)
    a = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    d_ab = float(lp(a, b)[0])
    d_aa = float(lp(a, a)[0])
    assert d_ab > d_aa >= 0.0
    assert np.isfinite(d_ab)


def test_lpips_alex_random_trunk():
    from instantavatar_tpu.losses.lpips import load_lpips
    lp = load_lpips("alex", allow_random=True)
    a = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    d = float(lp(a, jnp.roll(a, 5, axis=1))[0])
    assert np.isfinite(d) and d > 0


def test_lpips_missing_weights_raises():
    import pytest
    from instantavatar_tpu.losses.lpips import load_lpips
    with pytest.raises(FileNotFoundError):
        load_lpips("vgg", weights_path=None, allow_random=False)


def test_evaluator_surface():
    ev = Evaluator(lpips_fn=None)
    pred = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    out = ev(pred, pred)
    assert out["psnr"] > 60 and abs(out["ssim"] - 1.0) < 1e-4


def test_torch_reader_reads_reference_heads():
    """Torch-free .pth reader must decode the legacy-format LPIPS head
    bundles exactly (vs the shipped npz extracted by
    scripts/extract_lpips_heads.py)."""
    from pathlib import Path

    from instantavatar_tpu.losses import lpips as L
    from instantavatar_tpu.utils.torch_reader import load_torch_weights

    src = Path("/root/reference/third_parties/lpips/weights/v0.1/vgg.pth")
    if not src.exists():
        import pytest
        pytest.skip("reference weights not mounted")
    state = load_torch_weights(str(src))
    shipped = np.load(L._WEIGHTS_DIR / "lpips_heads_vgg.npz")
    for i in range(5):
        np.testing.assert_array_equal(
            np.asarray(state[f"lin{i}.model.1.weight"]).reshape(-1),
            shipped[f"head{i}"])


def test_torch_reader_zip_format(tmp_path):
    import pytest
    torch = pytest.importorskip("torch")
    from instantavatar_tpu.utils.torch_reader import load_torch_weights
    sd = {"w": torch.arange(12, dtype=torch.float32).reshape(3, 4),
          "b": torch.tensor([True, False])}
    p = tmp_path / "m.pth"
    torch.save(sd, str(p))
    back = load_torch_weights(str(p))
    np.testing.assert_array_equal(back["w"], sd["w"].numpy())
    np.testing.assert_array_equal(back["b"], sd["b"].numpy())


def test_lpips_uses_shipped_exact_heads():
    from instantavatar_tpu.losses import lpips as L
    lp = L.load_lpips("vgg", allow_random=True)
    shipped = np.load(L._WEIGHTS_DIR / "lpips_heads_vgg.npz")
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(lp.params.heads[i]),
                                      shipped[f"head{i}"])
    if (L._WEIGHTS_DIR / "lpips_trunk_vgg.npz").exists():
        # a provisioned trunk at the drop location => fully matched
        assert lp.numerically_matched
    else:
        # random trunk => NOT matched; Evaluator must skip + say why
        assert not lp.numerically_matched
        ev = Evaluator()
        if ev.lpips_fn is None:
            assert ev.lpips_skip_reason


def _fake_trunk_state(net: str) -> dict:
    """Synthesize a torchvision-features-shaped state dict (torch OIHW)."""
    rng = np.random.RandomState(0)
    if net == "vgg":
        # 13 convs at torchvision features indices
        idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                 512, 512, 512]
        ksize = [3] * 13
    else:
        idx = [0, 3, 6, 8, 10]
        chans = [64, 192, 384, 256, 256]
        ksize = [11, 5, 3, 3, 3]
    state = {}
    c_in = 3
    for i, c, k in zip(idx, chans, ksize):
        # He-scaled so activations stay finite through the deep stack
        state[f"features.{i}.weight"] = (
            rng.randn(c, c_in, k, k) * np.sqrt(2.0 / (k * k * c_in))
        ).astype(np.float32)
        state[f"features.{i}.bias"] = (0.1 * rng.randn(c)).astype(
            np.float32)
        c_in = c
    return state


def test_lpips_trunk_npz_round_trip(tmp_path):
    """Provisioning round trip (VERDICT r2 item 8): a torchvision-format
    trunk npz loads with numerically_matched=True and the converted HWIO
    weights match the source OIHW tensors exactly. The same loader runs
    on the real file the moment one is dropped at
    losses/weights/lpips_trunk_{net}.npz."""
    from instantavatar_tpu.losses import lpips as L
    for net in ("vgg", "alex"):
        state = _fake_trunk_state(net)
        p = tmp_path / f"trunk_{net}.npz"
        np.savez(p, **state)
        lp = L.load_lpips(net, weights_path=str(p))
        assert lp.numerically_matched
        keys = sorted((k for k in state if k.endswith("weight")),
                      key=lambda k: int(k.split(".")[1]))
        assert len(lp.params.convs) == len(keys)
        for (w, b), k in zip(lp.params.convs, keys):
            np.testing.assert_array_equal(
                np.asarray(w), state[k].transpose(2, 3, 1, 0))
            np.testing.assert_array_equal(
                np.asarray(b), state[k.replace("weight", "bias")])
        # the full distance pipeline runs on the provisioned trunk
        # (64px: alexnet's stride-4 stem collapses smaller inputs to
        # zero-size taps, as in the reference)
        img = jnp.asarray(np.random.RandomState(1)
                          .rand(1, 64, 64, 3).astype(np.float32))
        assert np.isfinite(float(lp(img, 1.0 - img)[0]))


def test_lpips_drop_location_activates_eval():
    """When a real trunk file is provisioned at the drop location, the
    Evaluator's lpips column turns on automatically (skips until then)."""
    import pytest

    from instantavatar_tpu.losses import lpips as L
    if not (L._WEIGHTS_DIR / "lpips_trunk_alex.npz").exists():
        pytest.skip("no provisioned LPIPS alex trunk "
                    "(drop losses/weights/lpips_trunk_alex.npz)")
    ev = Evaluator()
    assert ev.lpips_fn is not None
    m = ev(np.random.RandomState(0).rand(32, 32, 3).astype(np.float32),
           np.random.RandomState(1).rand(32, 32, 3).astype(np.float32))
    assert "lpips" in m and np.isfinite(m["lpips"])


def test_lpips_bgr_flip_changes_distance():
    """LPIPS flips BGR->RGB internally (reference loss.py:28); a
    channel-asymmetric image pair must yield a different distance when the
    flip is disabled."""
    from instantavatar_tpu.losses.lpips import load_lpips
    lp = load_lpips("vgg", allow_random=True)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    b = a.at[..., 0].set(0.0)  # kill only the blue (cv2) channel
    d_bgr = float(lp(a, b)[0])
    lp.expect_bgr = False
    d_rgb = float(lp(a, b)[0])
    assert np.isfinite(d_bgr) and np.isfinite(d_rgb)
    assert abs(d_bgr - d_rgb) > 1e-6
