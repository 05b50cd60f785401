"""Native data-engine tests: build, decode parity vs the Python path,
patch-sampling semantics, full-frame compositing."""
import numpy as np
import pytest

from instantavatar_tpu.data import AvatarDataset, make_synthetic_sequence


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    root = tmp_path_factory.mktemp("nativeseq")
    return make_synthetic_sequence(root / "seq", n_frames=3, H=48, W=48)


@pytest.fixture(scope="module")
def cache(seq):
    pytest.importorskip("ctypes")
    from instantavatar_tpu.data.native_loader import NativeSequenceCache
    import glob
    imgs = sorted(glob.glob(f"{seq}/images/*.png"))
    msks = sorted(glob.glob(f"{seq}/masks/*.npy"))
    return NativeSequenceCache(imgs, msks, downscale=1, n_threads=4)


def test_native_decode_matches_python(seq, cache):
    """Native PNG+npy decode must match the cv2/numpy path bit-closely."""
    import cv2
    img = cv2.imread(f"{seq}/images/0000.png")[..., :3] / 255.0
    msk = np.load(f"{seq}/masks/0000.npy")
    rgb, alpha = cache.full_frame(0)
    # native composites over white: rgb = img * m + (1 - m)
    expect = img * msk[..., None] + (1 - msk[..., None])
    np.testing.assert_allclose(rgb, expect, atol=2.5 / 255)
    np.testing.assert_allclose(alpha, msk, atol=1e-5)


def test_native_patch_sampling(cache):
    rgb, alpha, bg, coords = cache.sample_patches(
        1, n_patches=4, patch_size=16, ratio_mask=1.0, seed=7)
    assert rgb.shape == (4, 16, 16, 3)
    assert alpha.shape == (4, 16, 16)
    assert coords.shape == (4, 2)
    # mask-centered patches must contain body pixels
    assert (alpha.reshape(4, -1).max(axis=1) > 0).all()
    # composite identity where mask==1 and ==bg where mask==0
    m = alpha[..., None]
    assert np.isfinite(rgb).all()
    outside = alpha < 1e-6
    np.testing.assert_allclose(rgb[outside], bg[outside], atol=1e-6)
    # deterministic given the seed
    rgb2, *_ = cache.sample_patches(1, 4, 16, 1.0, seed=7)
    np.testing.assert_array_equal(rgb, rgb2)


def test_native_full_frame_matches_dataset(seq, cache):
    ds = AvatarDataset(seq, "val", start=0, end=2)
    b = ds[2]
    rgb, alpha = cache.full_frame(2)
    np.testing.assert_allclose(rgb.reshape(-1, 3), b["rgb"], atol=2.5 / 255)
    np.testing.assert_allclose(alpha.reshape(-1), b["alpha"], atol=1e-5)


def test_dataset_native_path(seq):
    """AvatarDataset(native=True) produces batches with the same schema
    and statistics as the Python path and trains-compatible dtypes."""
    from instantavatar_tpu.data import PatchSampler
    rng = np.random.default_rng(0)
    ds_py = AvatarDataset(seq, "train", start=0, end=2,
                          sampler=PatchSampler(2, 16, rng=rng))
    ds_nat = AvatarDataset(seq, "train", start=0, end=2,
                           sampler=PatchSampler(2, 16),
                           native=True)
    assert ds_nat._native is not None
    a, b = ds_py[0], ds_nat[0]
    for k in a:
        assert a[k].shape == b[k].shape, k
        assert np.asarray(a[k]).dtype == np.asarray(b[k]).dtype, k
    # body pixels exist in native patches and composite correctly
    assert b["alpha"].max() > 0
    outside = b["alpha"] < 1e-6
    np.testing.assert_allclose(b["rgb"][outside], b["bg_color"][outside],
                               atol=1e-6)
    # eval split: native full frame equals python full frame
    v_py = AvatarDataset(seq, "val", start=0, end=0)[0]
    v_nat = AvatarDataset(seq, "val", start=0, end=0, native=True)[0]
    np.testing.assert_allclose(v_nat["rgb"], v_py["rgb"], atol=2.5 / 255)
