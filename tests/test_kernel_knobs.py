"""A/B knobs of the span-blocked kernels are result-equivalent.

The flat kernels expose measured-equivalent compute strategies
(``FBTT_TRIP``: lane-concat vs static-sliced per-span dots;
``FBTT_ACC_T``: transposed backward accumulator) and the cache update
exposes ``FBTT_HOT_SCATTER`` (windowed hot scatter vs plain XLA
scatter). Each knob is a *scheduling* choice — results must match the
default path. ``FBTT_SEG`` and ``FBTT_TRIP_SB`` are read at trace time
(adaptive by nnz on TPU) and covered below; ``FBTT_SPAN_BLOCK`` (the
padding size) is import-time and runs at its default here plus in the
TPU perf battery.

These run the interpret-mode kernels on CPU over a shape with
multi-span segments so every trip strategy actually executes multiple
spans per block.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_flat_pipeline import make_case


def _run_flat_apply(monkeypatch, env):
    from fbtt_embedding_tpu.ops.pallas.tt_flat import flat_train_apply

    for k, v in env.items():
        if v is None:
            monkeypatch.delenv(k, raising=False)
        else:
            monkeypatch.setenv(k, v)

    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    b, L = 16, 8  # nnz=128, avg span length ~6 => multi-span segments
    rfull, E, D, cores, indices, rowidx, _, w, d_out = make_case(
        p, q, ranks, b, L, weights=True, seed=3)
    out, grads = flat_train_apply(
        cores, p, q, rfull, b, indices, rowidx, None, w, None, d_out,
        interpret=True)
    return np.asarray(out), [np.asarray(g) for g in grads]


def test_trip_modes_match(monkeypatch):
    """``dots`` == ``concat``: spans within a block are disjoint row
    ranges so the masked terms are exact zeros — but the concat runs one
    dot over the sb*bw_in axis while ``dots`` reduces bw_in at a time,
    so the reduction tree differs => tight allclose, not bitwise."""
    out_d, grads_d = _run_flat_apply(monkeypatch, {"FBTT_TRIP": "dots"})
    out_c, grads_c = _run_flat_apply(monkeypatch, {"FBTT_TRIP": "concat"})
    np.testing.assert_allclose(out_d, out_c, rtol=1e-5, atol=1e-7)
    for gd, gc in zip(grads_d, grads_c):
        np.testing.assert_allclose(gd, gc, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("sb", ["1", "2", "4", "8"])
def test_trip_sb_widths_match(sb, monkeypatch):
    """``FBTT_TRIP_SB`` (per-trip span count, adaptive at large nnz)
    only regroups which spans share a trip; every out-of-span term is an
    exact zero, so all widths agree to reduction-order tolerance."""
    out_s, grads_s = _run_flat_apply(monkeypatch, {"FBTT_TRIP_SB": sb})
    out_0, grads_0 = _run_flat_apply(monkeypatch, {"FBTT_TRIP_SB": None})
    np.testing.assert_allclose(out_s, out_0, rtol=1e-5, atol=1e-7)
    for gs, g0 in zip(grads_s, grads_0):
        np.testing.assert_allclose(gs, g0, rtol=1e-5, atol=1e-7)


def test_seg_sizes_match(monkeypatch):
    """``FBTT_SEG`` (segment size, adaptive by nnz on TPU) only changes
    the grid decomposition; segment boundaries never split a span's
    masked contribution (each row belongs to exactly one span in every
    segment), so results agree to reduction-order tolerance."""
    out_s, grads_s = _run_flat_apply(monkeypatch, {"FBTT_SEG": "512"})
    out_0, grads_0 = _run_flat_apply(monkeypatch, {"FBTT_SEG": None})
    np.testing.assert_allclose(out_s, out_0, rtol=1e-5, atol=1e-7)
    for gs, g0 in zip(grads_s, grads_0):
        np.testing.assert_allclose(gs, g0, rtol=1e-5, atol=1e-7)


def test_pair_fusion_matches(monkeypatch):
    """``FBTT_PAIR=1`` (first-pass pair-product fusion: forward gathers
    Z1 from a [T*p0*p1, q0*q1*r2] pair table directly in the s2 space,
    skipping the pass-1 kernel and the s1->s2 permute) computes the same
    contractions as the kernel pass — reduction order differs (table
    einsum vs per-span masked dots) => allclose."""
    out_p, grads_p = _run_flat_apply(monkeypatch, {"FBTT_PAIR": "1"})
    out_0, grads_0 = _run_flat_apply(monkeypatch, {"FBTT_PAIR": "0"})
    np.testing.assert_allclose(out_p, out_0, rtol=1e-5, atol=1e-7)
    for gp, g0 in zip(grads_p, grads_0):
        np.testing.assert_allclose(gp, g0, rtol=1e-5, atol=1e-7)


def test_pair_fusion_matches_ndim4_vjp(monkeypatch):
    """Pair fusion through the custom_vjp path at tt_ndim=4 (a middle
    pass remains after the fused pair gather, exercising the perm chain
    offsets), with a dead mask (sentinel pair rows must stay zero)."""
    import jax
    import jax.numpy as jnp
    from fbtt_embedding_tpu.ops.pallas.tt_flat import make_flat_vjp

    p, q, ranks = [5, 6, 7, 4], [2, 2, 4, 2], [8, 8, 8]
    b, L = 8, 6
    rfull, E, D, cores, indices, rowidx, _, w, d_out = make_case(
        p, q, ranks, b, L, weights=True, seed=11)
    dead = (np.arange(b * L) % 7 == 0)

    def run(pair):
        monkeypatch.setenv("FBTT_PAIR", pair)
        # the factory is lru_cached but the knob is read per-call inside
        # fwd_impl (trace time), so the cached closure is knob-transparent
        fn = make_flat_vjp(
            tuple(p), tuple(q), tuple(rfull), 1, b, False, True, True,
            True, live_is_mask=True)
        out, vjp = jax.vjp(
            lambda cs: fn(cs, indices, rowidx, None, w,
                          jnp.asarray(dead)), cores)
        return np.asarray(out), [np.asarray(g) for g in vjp(d_out)[0]]

    out_p, grads_p = run("1")
    out_0, grads_0 = run("0")
    np.testing.assert_allclose(out_p, out_0, rtol=1e-5, atol=1e-7)
    for gp, g0 in zip(grads_p, grads_0):
        np.testing.assert_allclose(gp, g0, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dg0", ["fused", "onehot"])
def test_dg0_modes_match(monkeypatch, dg0):
    """``FBTT_DG0``: dG0 fused into the innermost accum kernel
    (per-segment HIGHEST-precision one-hot dots into a VMEM accumulator)
    vs the XLA one-hot GEMM — same contraction, per-segment partial-sum
    order differs => allclose."""
    out_f, grads_f = _run_flat_apply(monkeypatch, {"FBTT_DG0": dg0})
    out_0, grads_0 = _run_flat_apply(monkeypatch, {"FBTT_DG0": None})
    np.testing.assert_allclose(out_f, out_0, rtol=1e-6, atol=1e-7)
    for gf, g0 in zip(grads_f, grads_0):
        np.testing.assert_allclose(gf, g0, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("acc_t", ["0", "1"])
def test_acc_t_modes_match(monkeypatch, acc_t):
    """Transposed vs natural backward accumulator layouts agree (same
    contractions, possibly different reduction order => allclose)."""
    out_a, grads_a = _run_flat_apply(monkeypatch, {"FBTT_ACC_T": acc_t})
    out_0, grads_0 = _run_flat_apply(monkeypatch, {"FBTT_ACC_T": None})
    np.testing.assert_allclose(out_a, out_0, rtol=1e-6, atol=1e-7)
    for ga, g0 in zip(grads_a, grads_0):
        np.testing.assert_allclose(ga, g0, rtol=1e-6, atol=1e-7)


def _cached_sgd(monkeypatch, hot):
    from fbtt_embedding_tpu.ops.cache import (
        cache_backward_sgd,
        make_cache_state,
    )

    if hot is None:
        monkeypatch.delenv("FBTT_HOT_SCATTER", raising=False)
    else:
        monkeypatch.setenv("FBTT_HOT_SCATTER", hot)

    rng = np.random.default_rng(7)
    C, D, B, nnz = 512, 16, 8, 64
    state = make_cache_state(
        hashtbl_size=C, cache_size=C, embedding_dim=D, num_embeddings=C)
    state = state.replace(
        weight=jnp.asarray(rng.normal(size=(C, D)).astype(np.float32)))
    # Mix of cached hits (with duplicates, concentrated at low LFU ranks
    # like real traffic) and misses (-1).
    loc = rng.integers(0, 40, size=nnz).astype(np.int32)
    loc[::5] = -1
    locations = jnp.asarray(loc)
    rowidx = jnp.asarray((np.arange(nnz) % B).astype(np.int32))
    d_out = jnp.asarray(rng.normal(size=(1, B, D)).astype(np.float32))
    new = cache_backward_sgd(state, d_out, locations, rowidx, 0.05)
    return np.asarray(new.weight)


def test_hot_scatter_matches_plain(monkeypatch):
    """Windowed hot scatter == plain XLA scatter-add (duplicates fold in
    a different order => allclose at fp32 tolerance)."""
    w_hot = _cached_sgd(monkeypatch, "1")
    w_plain = _cached_sgd(monkeypatch, "0")
    np.testing.assert_allclose(w_hot, w_plain, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("mode", ["0", "1", "auto"])
def test_fused_apply_gate_parses(monkeypatch, mode):
    """FBTT_FUSED_APPLY={0,1,auto} must never break step construction —
    it only picks between two exact-equivalent schedules."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        make_fused_train_step,
    )

    monkeypatch.setenv("FBTT_FUSED_APPLY", mode)
    step = make_fused_train_step(
        [8, 8, 8], [4, 2, 2], [1, 8, 8, 1], 1, 16, OptimType.SGD)
    assert callable(step)


def test_knob_registry_covers_every_env_read():
    """utils.knobs is the source of truth: every FBTT_* env var read
    anywhere in the package must be registered (and reads must route
    through the registry, which asserts on unknown names)."""
    import re
    from pathlib import Path

    from fbtt_embedding_tpu.utils import knobs

    pkg = Path(knobs.__file__).resolve().parents[1]
    found = set()
    for f in pkg.rglob("*.py"):
        for m in re.finditer(r'"(FBTT_[A-Z0-9_]+)"', f.read_text()):
            found.add(m.group(1))
    for f in pkg.rglob("*.cpp"):
        pass  # C ABI exports are fbtt_* lowercase, not env vars
    registered = set(knobs.PERF_KNOBS) | set(knobs.CONFIG_ENV)
    assert found <= registered, found - registered
    # and the perf knobs are all actually read somewhere
    assert set(knobs.PERF_KNOBS) <= found, set(knobs.PERF_KNOBS) - found


def test_knobs_describe_and_unknown_guard():
    import pytest

    from fbtt_embedding_tpu.utils import knobs

    out = knobs.describe()
    for name in knobs.PERF_KNOBS:
        assert name in out
    with pytest.raises(AssertionError):
        knobs.get_str("FBTT_NOT_A_KNOB")


@pytest.mark.parametrize("spp", ["1", "2", "4"])
def test_spp_grid_batching_matches(spp, monkeypatch):
    """``FBTT_SPP`` (segments per program) only batches which segments
    share a grid step; each sub-segment keeps its own span masks and
    row slices, so results are bitwise-equal to spp=1."""
    out_s, grads_s = _run_flat_apply(
        monkeypatch, {"FBTT_SPP": spp, "FBTT_SEG": "32"})
    out_1, grads_1 = _run_flat_apply(
        monkeypatch, {"FBTT_SPP": "1", "FBTT_SEG": "32"})
    np.testing.assert_array_equal(out_s, out_1)
    for gs, g1 in zip(grads_s, grads_1):
        np.testing.assert_array_equal(gs, g1)
