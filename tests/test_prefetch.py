"""Packed-transfer input pipeline (utils/prefetch.py): round-trip and
ordering guarantees. The latency win itself is measured on the real
tunnel (PERF.md)."""
import numpy as np

from instantavatar_tpu.utils.prefetch import (DevicePrefetcher,
                                              make_unpacker, pack_batch)


def _batch(i):
    rng = np.random.RandomState(i)
    return {
        "rays_o": rng.randn(4, 32, 32, 3).astype(np.float32),
        "rgb": rng.rand(4, 32, 32, 3).astype(np.float32),
        "alpha": rng.rand(4, 32, 32).astype(np.float32),
        "near": np.float32(2.5),
        "betas": rng.randn(10).astype(np.float32),
        "idx": np.int32(i),
    }


def test_pack_unpack_roundtrip():
    b = _batch(3)
    blob, ints, meta = pack_batch(b)
    out = make_unpacker(meta)(blob, ints)
    assert set(out) == set(b)
    for k, v in b.items():
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(v))
        assert out[k].shape == np.shape(v)
    assert out["idx"].dtype == np.int32


def test_prefetcher_order_and_content():
    for transfer in ("packed", "tree"):
        pf = DevicePrefetcher(_batch, transfer=transfer)
        got = list(pf.iterate(range(5)))
        assert len(got) == 5
        for i, out in enumerate(got):
            np.testing.assert_array_equal(np.asarray(out["idx"]), i)
            np.testing.assert_allclose(np.asarray(out["rgb"]),
                                       _batch(i)["rgb"], atol=1e-7)


def test_unpacker_cached_per_schema():
    pf = DevicePrefetcher(_batch, transfer="packed")
    list(pf.iterate(range(3)))
    assert len(pf._unpackers) == 1  # one schema -> one jit
