"""torch_compat: the reference's torch-tensor surface over the JAX module.

The adapter must (a) produce bitwise the same math as the underlying JAX
module, (b) speak torch tensors end to end (forward, backward, state
dict), (c) run the reference's documented flows (fused sparse training
with a cache, dense mode with external updates).
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fbtt_embedding_tpu.models.tt_embedding import (
    TTEmbeddingBag as JaxTTEmbeddingBag,
)
from fbtt_embedding_tpu.torch_compat import OptimType, TTEmbeddingBag
from tests.utils import generate_sparse_feature, tt_test_shapes


def _make(sparse=True, use_cache=False, **kw):
    p, q, r, E, D = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D, tt_ranks=r,
        tt_p_shapes=p, tt_q_shapes=q, sparse=sparse, use_cache=use_cache,
        cache_size=16 if use_cache else 0,
        hashtbl_size=E if use_cache else 0,
        learning_rate=0.01, weight_dist="uniform", seed=3, **kw)
    return emb, (p, q, r, E, D)


def test_forward_matches_jax_module_and_returns_torch():
    emb, (p, q, r, E, D) = _make()
    jemb = JaxTTEmbeddingBag(
        num_embeddings=E, embedding_dim=D, tt_ranks=r,
        tt_p_shapes=p, tt_q_shapes=q, sparse=True, use_cache=False,
        learning_rate=0.01, weight_dist="uniform", seed=3)
    rng = np.random.default_rng(5)
    b = 8
    indices, offsets = generate_sparse_feature(rng, b, E, 4, 2)
    got = emb(torch.from_numpy(np.asarray(indices)),
              torch.from_numpy(np.asarray(offsets)))
    assert isinstance(got, torch.Tensor)
    assert got.shape == (b, D)
    expect = jemb(indices, offsets)
    np.testing.assert_allclose(got.numpy(), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_sparse_training_converges_with_cache():
    emb, (p, q, r, E, D) = _make(sparse=True, use_cache=True)
    rng = np.random.default_rng(7)
    b, L = 16, 4
    target = torch.zeros((b, D))
    losses = []
    for step in range(25):
        idx = torch.from_numpy(
            (rng.zipf(1.5, size=b * L) % E).astype(np.int64))
        offs = torch.arange(0, b * L + 1, L, dtype=torch.int64)
        out = emb(idx, offs)
        d = 2.0 * (out - target) / b
        assert emb.backward(d) is None  # fused update, reference contract
        losses.append(float(((out - target) ** 2).mean()))
        if step == 9:
            emb.cache_populate()
    assert losses[-1] < losses[0] * 0.5
    assert emb.cache_hit_rate() > 0.5


def test_dense_mode_returns_torch_grads_and_applies():
    emb, (p, q, r, E, D) = _make(sparse=False)
    rng = np.random.default_rng(9)
    b = 8
    indices, offsets = generate_sparse_feature(rng, b, E, 4, 2)
    idx_t = torch.from_numpy(np.asarray(indices))
    off_t = torch.from_numpy(np.asarray(offsets))
    out = emb(idx_t, off_t)
    d_cores, d_cache = emb.backward(torch.ones_like(out))
    assert all(isinstance(g, torch.Tensor) for g in d_cores)
    assert d_cache is None  # no cache configured
    before = [c.clone() for c in emb.tt_cores]
    emb.apply_core_grads(d_cores)
    after = emb.tt_cores
    assert any(not torch.equal(a, b_) for a, b_ in zip(after, before))


def test_state_dict_torch_save_roundtrip():
    emb, (p, q, r, E, D) = _make()
    rng = np.random.default_rng(11)
    indices, offsets = generate_sparse_feature(rng, 8, E, 4, 2)
    idx_t = torch.from_numpy(np.asarray(indices))
    off_t = torch.from_numpy(np.asarray(offsets))
    expect = emb(idx_t, off_t)

    sd = emb.state_dict()
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    buf = io.BytesIO()
    torch.save(sd, buf)
    buf.seek(0)
    emb2, _ = _make()
    emb2.load_state_dict(torch.load(buf, weights_only=True))
    got = emb2(idx_t, off_t)
    np.testing.assert_allclose(got.numpy(), expect.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_full_weight_matches_embedding_bag_oracle():
    # The reference's own test pattern (tt_embeddings_test.py:95-103):
    # full_weight() into a torch EmbeddingBag reproduces forward.
    emb, (p, q, r, E, D) = _make(optimizer=OptimType.SGD)
    w = emb.full_weight()
    assert isinstance(w, torch.Tensor) and w.shape == (E, D)
    bag = torch.nn.EmbeddingBag(E, D, _weight=w, mode="sum",
                                include_last_offset=True)
    rng = np.random.default_rng(13)
    indices, offsets = generate_sparse_feature(rng, 8, E, 4, 2)
    idx_t = torch.from_numpy(np.asarray(indices).astype(np.int64))
    off_t = torch.from_numpy(np.asarray(offsets).astype(np.int64))
    with torch.no_grad():
        expect = bag(idx_t, off_t)
    got = emb(idx_t, off_t)
    np.testing.assert_allclose(got.numpy(), expect.numpy(),
                               rtol=2e-4, atol=2e-4)
