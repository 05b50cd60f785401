"""Direct coverage for EdgeSampler, MocapDataset, and checkpoint graft —
surfaces previously exercised only indirectly through the CLI pipeline
(reference parity: surreal.py:103-133 inline sampling; eval.py checkpoint
surgery)."""
import numpy as np
import pytest

from instantavatar_tpu.data import AvatarDataset, make_synthetic_sequence
from instantavatar_tpu.data.datasets import MocapDataset
from instantavatar_tpu.data.samplers import EdgeSampler


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mocap_seq")
    return make_synthetic_sequence(root, n_frames=2, H=48, W=48)


def test_edge_sampler_ratios_and_locations():
    H = W = 64
    mask = np.zeros((H, W), np.float32)
    mask[16:48, 16:48] = 1.0
    rgb = np.linspace(0, 1, H * W * 3).reshape(H, W, 3).astype(np.float32)
    s = EdgeSampler(100, ratio_mask=0.6, ratio_edge=0.3, kernel_size=8,
                    rng=np.random.default_rng(0))
    assert (s.num_mask, s.num_edge, s.num_rand) == (60, 30, 10)
    m_s, rgb_s = s.sample(mask, rgb)
    assert m_s.shape == (100,) and rgb_s.shape == (100, 3)
    # the first 60 are mask-interior samples
    assert (m_s[:60] > 0.5).all()
    # edge samples sit within kernel_size of the mask boundary: their
    # distance-to-boundary is < kernel_size (morphological band)
    ys, xs = np.mgrid[0:H, 0:W]
    flat_idx = np.where(np.isclose(
        rgb.reshape(-1, 3)[:, 0][None], rgb_s[60:90, 0][:, None],
        atol=1e-9))[1]
    yy, xx = flat_idx // W, flat_idx % W
    d_out = np.maximum.reduce([16 - yy, yy - 47, 16 - xx, xx - 47])
    assert (d_out < 8).all()  # inside or within the band


def test_edge_sampler_rejects_bad_ratios():
    with pytest.raises(ValueError):
        EdgeSampler(10, ratio_mask=0.8, ratio_edge=0.4)


def test_mocap_dataset_default_edge_sampler(seq_dir):
    ds = MocapDataset(seq_dir, "train", start=0, end=1, num_samples=256)
    assert isinstance(ds.sampler, EdgeSampler)
    b = ds[0]
    assert b["rgb"].shape == (256, 3)
    assert b["rays_o"].shape == (256, 3)
    assert b["alpha"].shape == (256,)
    assert b["body_pose"].shape == (69,)
    # val split: full images, no sampler
    dv = MocapDataset(seq_dir, "val", start=0, end=0)
    assert dv.sampler is None
    assert dv[0]["rgb"].shape == (48 * 48, 3)


def test_graft_rebuilds_pytree_from_raw():
    from collections import namedtuple
    from instantavatar_tpu.train.harness import graft
    import jax.numpy as jnp
    NT = namedtuple("NT", ["a", "b"])
    target = {"x": NT(a=jnp.zeros((2,)), b=(jnp.ones((3,)), 5)),
              "y": [jnp.zeros((1,))]}
    raw = {"x": {"a": np.arange(2.0), "b": [np.full((3,), 7.0), 9]},
           "y": [np.array([3.0])]}
    out = graft(target, raw)
    assert isinstance(out["x"], NT)
    np.testing.assert_allclose(np.asarray(out["x"].a), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(out["x"].b[0]), 7.0)
    assert out["x"].b[1] == 9
    np.testing.assert_allclose(np.asarray(out["y"][0]), [3.0])
