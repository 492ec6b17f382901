"""Native host loader tests: parity with the numpy fallback and with the
device-side index preprocessing."""

import numpy as np
import jax.numpy as jnp
import pytest

from fbtt_embedding_tpu import native
from fbtt_embedding_tpu.ops.indexing import decompose_indices, rowidx_from_offsets


def test_generate_batch_shapes_and_determinism():
    idx, offs, w = native.generate_batch(7, 5000, 2, 16, 4, alpha=1.2,
                                         weighted=True)
    assert idx.shape == (2 * 16 * 4,)
    assert offs.shape == (2 * 16 + 1,)
    assert w.shape == idx.shape
    assert offs[-1] == idx.size
    assert idx.min() >= 0 and idx.max() < 5000
    idx2, _, _ = native.generate_batch(7, 5000, 2, 16, 4, alpha=1.2)
    np.testing.assert_array_equal(idx, idx2)


def test_zipf_skew():
    idx, _, _ = native.generate_batch(0, 10_000, 1, 64, 16, alpha=1.5)
    # Zipf traffic: a small head of rows should dominate
    _, counts = np.unique(idx, return_counts=True)
    top = np.sort(counts)[::-1]
    assert top[0] > idx.size * 0.05


def test_decompose_matches_device_path():
    idx, _, _ = native.generate_batch(1, 200 * 220 * 250, 1, 32, 8)
    p = [200, 220, 250]
    host = native.decompose_indices_np(idx, p)
    dev = np.stack([np.asarray(v)
                    for v in decompose_indices(jnp.asarray(idx), p)])
    np.testing.assert_array_equal(host, dev)


def test_expand_offsets_matches_device_path():
    rng = np.random.default_rng(0)
    lens = rng.integers(0, 6, size=3 * 17)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    nnz = int(offs[-1])
    r_h, t_h = native.expand_offsets_np(offs, 3, 17)
    r_d, t_d = rowidx_from_offsets(jnp.asarray(offs), nnz, 3, 17)
    np.testing.assert_array_equal(r_h, np.asarray(r_d))
    np.testing.assert_array_equal(t_h, np.asarray(t_d))


def test_prefetch_loader():
    loader = native.PrefetchLoader(1000, 1, 8, 2, num_batches=3, seed=5)
    batches = list(loader)
    assert len(batches) == 3
    # deterministic per-position seeds
    loader2 = native.PrefetchLoader(1000, 1, 8, 2, num_batches=3, seed=5)
    for (a, _, _), (b, _, _) in zip(batches, loader2):
        np.testing.assert_array_equal(a, b)
