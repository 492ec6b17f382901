"""Failure detection: fail fast, name the failure, keep the hot path hot.

The reference has no failure detection at all (SURVEY §5: single process,
single GPU, silent NaN propagation); its CUDA kernels read out-of-range
ids as undefined behavior. On TPU the failure modes that matter in
production are different — non-finite values silently poisoning the
whole parameter pytree (one bad gradient step corrupts every core
because the fused optimizers update full cores), and multi-chip/host
replicas drifting apart (a dropped collective or desynced RNG) — and
the TPU-idiomatic detection is different too: flags computed *in-graph*
(one scalar per step, no host sync on the hot path) with host-side
asserts that name the offending leaf only when a check is actually
requested.

Three layers:

* ``finite_flag(tree)`` — jit-compatible scalar ``bool``: every leaf of
  the pytree is finite. Fold it into a train step's outputs and check
  it however often the deployment can afford.
* ``assert_finite(tree)`` / ``guard_step(step_fn, every=k)`` — eager
  host-side check naming the first non-finite leaf by its pytree path;
  the wrapper form samples every ``k``-th step so the dispatch pipeline
  stays async between checks.
* ``assert_replicas_agree(mesh, axis, value)`` — cross-replica drift
  detector: max |value − mean_over(axis)| via ``shard_map`` + ``pmean``,
  for values that data-parallel training requires to be bitwise-shared
  (step counters, learning rates, psum'd grads after apply).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp


class NonFiniteError(RuntimeError):
    """A guarded pytree contains NaN/Inf; ``leaf_path`` names where."""

    def __init__(self, leaf_path: str, stats: str):
        self.leaf_path = leaf_path
        super().__init__(
            f"non-finite values at pytree leaf '{leaf_path}' ({stats})")


class ReplicaDivergenceError(RuntimeError):
    """Replicated values disagree across a mesh axis."""


def _leaf_finite(x) -> jnp.ndarray:
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.asarray(True)
    return jnp.all(jnp.isfinite(x))


def finite_flag(tree: Any) -> jnp.ndarray:
    """Scalar bool: every floating leaf of ``tree`` is finite.

    Jit-compatible and cheap (a reduction per leaf, fused by XLA);
    integer/bool leaves (index tables, LFU counts) are skipped.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return functools.reduce(
        jnp.logical_and, [_leaf_finite(x) for x in leaves])


def assert_finite(tree: Any, what: str = "params") -> None:
    """Eager check; raises :class:`NonFiniteError` naming the first bad
    leaf by pytree path (e.g. ``params.tt_cores[1]``). Forces a device
    sync — use directly in tests/debugging, or via :func:`guard_step`
    with a sampling period on the training loop.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            continue
        if not bool(jnp.all(jnp.isfinite(arr))):
            n_nan = int(jnp.isnan(arr).sum())
            n_inf = int(jnp.isinf(arr).sum())
            raise NonFiniteError(
                what + jax.tree_util.keystr(path),
                f"{n_nan} NaN, {n_inf} Inf of {arr.size}")


def guard_step(step_fn: Callable, every: int = 1) -> Callable:
    """Wrap a train step ``(params, *args) -> (out, new_params)`` so the
    parameter pytree is checked for non-finites every ``every`` calls.

    The check reads ONE in-graph scalar (:func:`finite_flag`, jitted
    alongside nothing else — it dispatches as its own tiny program), so
    between sampled steps the pipeline stays fully async. On failure the
    eager path re-walks the pytree to name the leaf.
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    flag = jax.jit(finite_flag)
    count = {"n": 0}

    @functools.wraps(step_fn)
    def guarded(params, *args, **kwargs):
        out, new_params = step_fn(params, *args, **kwargs)
        count["n"] += 1
        if count["n"] % every == 0 and not bool(flag(new_params)):
            assert_finite(new_params)  # raises with the leaf named
            raise NonFiniteError("<unlocated>", "flag tripped")  # pragma: no cover
        return out, new_params

    return guarded


def assert_replicas_agree(
    mesh,
    axis: str,
    value: jnp.ndarray,
    atol: float = 0.0,
    what: str = "value",
) -> None:
    """Check a replicated array is actually identical across ``axis``.

    Detects the silent multi-chip failure class — replicas drifting
    after a dropped sync (desynced data pipeline, a missed psum, RNG
    divergence). ``value`` must be replicated over the mesh; the check
    computes ``max |value - pmean(value)|`` per replica and raises
    :class:`ReplicaDivergenceError` when it exceeds ``atol``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(*(None for _ in jnp.shape(value))) if jnp.ndim(value) else P()

    def check(v):
        d = jnp.abs(v - jax.lax.pmean(v, axis))
        if jnp.ndim(v):
            d = jnp.max(d)
        return jax.lax.pmax(d, axis)  # replicated over the checked axis

    drift = shard_map(
        check, mesh=mesh, in_specs=(spec,), out_specs=P(),
        check_vma=False,
    )(jnp.asarray(value))
    d = float(drift)
    if d > atol:
        raise ReplicaDivergenceError(
            f"'{what}' diverges across mesh axis '{axis}': "
            f"max drift {d:.3e} > atol {atol:.3e}")
