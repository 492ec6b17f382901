"""Native optimizer semantics (``optim_semantics="native"``).

The reference declares nine OptimType names but implements two behaviors —
LAMB/ADAM/LARS/rowwise all route to its Adagrad kernel
(``tt_embeddings_ops.py:248-266``). Default ("reference") mode matches
that (covered by tests/test_optimizer_matrix.py); this file checks the
opt-in native mode against independent NumPy replicas of each update.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu import (
    OptimType,
    TTEmbeddingBag,
    TTEmbeddingParams,
    make_fused_train_step,
    native_optim_init,
)
from tests.utils import generate_sparse_feature, tt_test_shapes

BETA1, BETA2 = 0.9, 0.999
MOMENTUM, ETA = 0.9, 0.001


def _make_pair(optimizer, seed=0, semantics="native", **kw):
    p, q, r, E, D = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=r, optimizer=optimizer, learning_rate=0.01,
        use_cache=False, weight_dist="uniform", seed=seed,
        optim_semantics=semantics, **kw,
    )
    # A dense-mode twin exposes the exact full-core grads the fused
    # update consumes.
    dense = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=r, optimizer=optimizer, learning_rate=0.01,
        sparse=False, use_cache=False, weight_dist="uniform", seed=seed,
    )
    return emb, dense, (E, D)


def _np_state(emb):
    return [np.asarray(s) for s in emb.optimizer_state]


def _run_steps(emb, dense, E, n_steps=3, seed=1):
    """Drive both modules with identical traffic; returns per-step
    (cores_before, grads, cores_after, state_after)."""
    rng = np.random.default_rng(seed)
    log = []
    for _ in range(n_steps):
        indices, offsets = generate_sparse_feature(rng, 8, E, 4, 2)
        d_out = rng.normal(size=(8, emb.embedding_dim)).astype(np.float32)
        cores_before = [np.asarray(c) for c in emb.tt_cores]
        dense.tt_cores = [jnp.asarray(c) for c in cores_before]
        dense(indices, offsets)
        grads, _ = dense.backward(jnp.asarray(d_out))
        emb(indices, offsets)
        emb.backward(jnp.asarray(d_out))
        log.append((
            cores_before,
            [np.asarray(g) for g in grads],
            [np.asarray(c) for c in emb.tt_cores],
            _np_state(emb),
        ))
    return log


def test_native_rowwise_adagrad_matches_replica():
    emb, dense, (E, _) = _make_pair(OptimType.EXACT_ROWWISE_ADAGRAD)
    state = [np.zeros(c.shape[:-1] + (1,), np.float32) for c in emb.tt_cores]
    for cores_b, grads, cores_a, state_a in _run_steps(emb, dense, E):
        for i, (c, g) in enumerate(zip(cores_b, grads)):
            state[i] = state[i] + np.mean(g * g, axis=-1, keepdims=True)
            want = c - 0.01 * g / (np.sqrt(state[i]) + emb.eps)
            np.testing.assert_allclose(cores_a[i], want, rtol=2e-5,
                                       atol=2e-7)
            np.testing.assert_allclose(state_a[i], state[i], rtol=2e-5,
                                       atol=1e-9)


def test_native_adam_matches_replica():
    emb, dense, (E, _) = _make_pair(OptimType.ADAM)
    n = emb.tt_ndim
    m = [np.zeros_like(np.asarray(c)) for c in emb.tt_cores]
    v = [np.zeros_like(np.asarray(c)) for c in emb.tt_cores]
    t = 0
    for cores_b, grads, cores_a, state_a in _run_steps(emb, dense, E):
        t += 1
        for i, (c, g) in enumerate(zip(cores_b, grads)):
            m[i] = BETA1 * m[i] + (1 - BETA1) * g
            v[i] = BETA2 * v[i] + (1 - BETA2) * g * g
            mhat = m[i] / (1 - BETA1 ** t)
            vhat = v[i] / (1 - BETA2 ** t)
            want = c - 0.01 * mhat / (np.sqrt(vhat) + emb.eps)
            np.testing.assert_allclose(cores_a[i], want, rtol=2e-5,
                                       atol=2e-7)
            np.testing.assert_allclose(state_a[i], m[i], rtol=2e-5,
                                       atol=1e-9)
            np.testing.assert_allclose(state_a[n + i], v[i], rtol=2e-5,
                                       atol=1e-9)
        assert int(state_a[2 * n]) == t


def test_native_partial_rowwise_adam_matches_replica():
    emb, dense, (E, _) = _make_pair(OptimType.PARTIAL_ROWWISE_ADAM)
    m = [np.zeros_like(np.asarray(c)) for c in emb.tt_cores]
    v = [np.zeros(c.shape[:-1] + (1,), np.float32) for c in emb.tt_cores]
    t = 0
    for cores_b, grads, cores_a, _ in _run_steps(emb, dense, E):
        t += 1
        for i, (c, g) in enumerate(zip(cores_b, grads)):
            m[i] = BETA1 * m[i] + (1 - BETA1) * g
            v[i] = BETA2 * v[i] + (1 - BETA2) * np.mean(
                g * g, axis=-1, keepdims=True)
            mhat = m[i] / (1 - BETA1 ** t)
            vhat = v[i] / (1 - BETA2 ** t)
            want = c - 0.01 * mhat / (np.sqrt(vhat) + emb.eps)
            np.testing.assert_allclose(cores_a[i], want, rtol=2e-5,
                                       atol=2e-7)


def test_native_lamb_matches_replica():
    emb, dense, (E, _) = _make_pair(OptimType.LAMB)
    m = [np.zeros_like(np.asarray(c)) for c in emb.tt_cores]
    v = [np.zeros_like(np.asarray(c)) for c in emb.tt_cores]
    t = 0
    for cores_b, grads, cores_a, _ in _run_steps(emb, dense, E):
        t += 1
        for i, (c, g) in enumerate(zip(cores_b, grads)):
            m[i] = BETA1 * m[i] + (1 - BETA1) * g
            v[i] = BETA2 * v[i] + (1 - BETA2) * g * g
            u = (m[i] / (1 - BETA1 ** t)) / (
                np.sqrt(v[i] / (1 - BETA2 ** t)) + emb.eps)
            wn = np.linalg.norm(c)
            un = np.linalg.norm(u)
            ratio = wn / (un + 1e-12) if (wn > 0 and un > 0) else 1.0
            want = c - 0.01 * ratio * u
            np.testing.assert_allclose(cores_a[i], want, rtol=4e-5,
                                       atol=4e-7)


def test_native_lars_matches_replica():
    emb, dense, (E, _) = _make_pair(OptimType.LARS_SGD)
    mom = [np.zeros_like(np.asarray(c)) for c in emb.tt_cores]
    for cores_b, grads, cores_a, _ in _run_steps(emb, dense, E):
        for i, (c, g) in enumerate(zip(cores_b, grads)):
            wn = np.linalg.norm(c)
            gn = np.linalg.norm(g)
            local = ETA * wn / (gn + 1e-12) if (wn > 0 and gn > 0) else 1.0
            mom[i] = MOMENTUM * mom[i] + local * g
            want = c - 0.01 * mom[i]
            np.testing.assert_allclose(cores_a[i], want, rtol=4e-5,
                                       atol=4e-7)


def test_native_sgd_and_adagrad_match_reference_mode():
    # The two behaviors the reference DOES implement are identical in
    # native mode — byte-for-byte.
    for optim in (OptimType.SGD, OptimType.EXACT_ADAGRAD):
        ref, _, (E, _) = _make_pair(optim, semantics="reference")
        nat, _, _ = _make_pair(optim, semantics="native")
        rng = np.random.default_rng(7)
        for _ in range(2):
            indices, offsets = generate_sparse_feature(rng, 8, E, 4, 2)
            d_out = rng.normal(size=(8, ref.embedding_dim)).astype(
                np.float32)
            ref(indices, offsets)
            ref.backward(jnp.asarray(d_out))
            nat(indices, offsets)
            nat.backward(jnp.asarray(d_out))
        for a, b in zip(ref.tt_cores, nat.tt_cores):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_fused_step_matches_module():
    # make_fused_train_step(optim_semantics="native") == the module path.
    p, q, r, E, D = tt_test_shapes(3)
    emb, _, _ = _make_pair(OptimType.ADAM, seed=3)
    params = TTEmbeddingParams(
        # copies: the fused step donates its buffers, the module keeps its
        tt_cores=tuple(jnp.array(c) for c in emb.tt_cores),
        optimizer_state=tuple(native_optim_init(OptimType.ADAM,
                                                emb.tt_cores)),
        cache=None,
    )
    b = 8
    step = make_fused_train_step(
        p, q, [1] + r + [1], 1, b, optimizer=OptimType.ADAM,
        optim_semantics="native",
    )
    rng = np.random.default_rng(9)
    for _ in range(2):
        indices, offsets = generate_sparse_feature(rng, b, E, 4, 2)
        d_out = rng.normal(size=(1, b, D)).astype(np.float32)
        out, params = step(
            params, jnp.asarray(indices, jnp.int32),
            jnp.asarray(offsets, jnp.int32), jnp.asarray(d_out),
            (jnp.float32(0.01), jnp.float32(emb.eps)),
        )
        emb(indices, offsets)
        emb.backward(jnp.asarray(d_out[0]))
    for a, b_ in zip(params.tt_cores, emb.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)
    n = emb.tt_ndim
    assert int(params.optimizer_state[2 * n]) == 2


def test_native_state_dict_roundtrip():
    emb, dense, (E, _) = _make_pair(OptimType.ADAM, seed=5)
    _run_steps(emb, dense, E, n_steps=1)
    # through NumPy, as a serialized checkpoint would be (live-array
    # sharing would alias the donated training buffers)
    state = {k: np.asarray(v) for k, v in emb.state_dict().items()}
    emb2, _, _ = _make_pair(OptimType.ADAM, seed=6)
    emb2.load_state_dict(state)
    assert len(emb2.optimizer_state) == 2 * emb.tt_ndim + 1
    for a, b in zip(emb.optimizer_state, emb2.optimizer_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Training continues identically from the restored state.
    rng = np.random.default_rng(11)
    indices, offsets = generate_sparse_feature(rng, 8, E, 4, 2)
    d_out = rng.normal(size=(8, emb.embedding_dim)).astype(np.float32)
    for m in (emb, emb2):
        m(indices, offsets)
        m.backward(jnp.asarray(d_out))
    for a, b in zip(emb.tt_cores, emb2.tt_cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_adam_converges_and_cache_composes():
    # End-to-end: native ADAM with the LFU cache on — loss decreases and
    # the cache backward (reference family) composes without shape errors.
    p, q, r, E, D = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=r, optimizer=OptimType.ADAM, learning_rate=0.005,
        use_cache=True, cache_size=8, hashtbl_size=E,
        weight_dist="uniform", seed=8, optim_semantics="native",
    )
    rng = np.random.default_rng(12)
    target = rng.normal(size=(D,)).astype(np.float32)
    losses = []
    for step_i in range(12):
        idx = (rng.zipf(1.5, size=32) % E).astype(np.int64)
        offs = np.arange(0, 33, 4, dtype=np.int64)
        out = emb(idx, offs)
        d = 2.0 * (out - target[None]) / out.shape[0]
        emb.backward(jnp.asarray(np.asarray(d)))
        losses.append(float(np.mean(np.asarray(out - target[None]) ** 2)))
        if step_i == 5:
            emb.cache_populate()
    assert losses[-1] < losses[0]


def test_native_rejects_unknown_semantics():
    p, q, r, E, D = tt_test_shapes(3)
    with pytest.raises(AssertionError):
        TTEmbeddingBag(
            num_embeddings=E, embedding_dim=D, tt_p_shapes=p,
            tt_q_shapes=q, tt_ranks=r, optim_semantics="torch",
        )


def test_native_sharded_fused_step_matches_single_device():
    """Native ADAM on the 8-device mesh == the single-device fused step."""
    import jax

    from fbtt_embedding_tpu.parallel.mesh import make_mesh
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, rfull = [8, 8, 8], [4, 4, 4], [1, 8, 8, 1]
    E, D = 512, 64
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    B, L = 16, 2
    nnz = B * L
    rng = np.random.default_rng(21)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    opt_state = native_optim_init(OptimType.ADAM, cores)
    idx_np = rng.integers(0, E, size=nnz).astype(np.int32)
    d_out = jnp.asarray(rng.normal(size=(1, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy, TTEmbeddingParams(cores, opt_state, None))

    sh_step = make_sharded_fused_train_step(
        mesh, p, q, rfull, 1, B, L, optimizer=OptimType.ADAM,
        optim_semantics="native")
    ref_step = make_fused_train_step(
        p, q, rfull, 1, B, optimizer=OptimType.ADAM,
        optim_semantics="native")

    prm_s, prm_r = params(), params()
    for step_i in range(2):
        shift = (idx_np + step_i) % E
        out_s, prm_s = sh_step(
            prm_s, jnp.asarray(shift.reshape(1, B, L)), d_out, lr_eps)
        offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
        out_r, prm_r = ref_step(
            prm_r, jnp.asarray(shift), offsets, d_out, lr_eps)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
    n = len(cores)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.optimizer_state[:2 * n],
                     prm_r.optimizer_state[:2 * n]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    assert int(prm_s.optimizer_state[2 * n]) == 2
