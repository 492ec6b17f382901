"""Index decomposition and CSR expansion unit tests."""

import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu.ops.indexing import (
    decompose_indices,
    rowidx_from_offsets,
    tt_strides,
)


def test_tt_strides():
    np.testing.assert_array_equal(tt_strides([200, 220, 250]),
                                  [220 * 250, 250, 1])
    np.testing.assert_array_equal(tt_strides([7, 9]), [9, 1])


def test_decompose_roundtrip():
    p = [7, 9, 11]
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 7 * 9 * 11, size=100)
    parts = decompose_indices(jnp.asarray(idx), p)
    strides = tt_strides(p)
    recon = sum(np.asarray(parts[t]).astype(np.int64) * strides[t]
                for t in range(3))
    np.testing.assert_array_equal(recon, idx)
    for t in range(3):
        assert (np.asarray(parts[t]) < p[t]).all()
        assert (np.asarray(parts[t]) >= 0).all()


def test_rowidx_from_offsets():
    # 2 tables x 3 rows; bag lengths [2, 0, 1, 3, 1, 0]
    offsets = jnp.asarray([0, 2, 2, 3, 6, 7, 7])
    rowidx, tableidx = rowidx_from_offsets(offsets, 7, 2, 3)
    np.testing.assert_array_equal(np.asarray(rowidx), [0, 0, 2, 0, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(tableidx), [0, 0, 0, 1, 1, 1, 1])
