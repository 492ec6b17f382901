"""Fused backward + optimizer updates for TT cores.

TPU-native replacement for the reference's fused backward kernels
(``tt_embeddings_backward_{sgd,adagrad}_cuda``,
``tt_embeddings_cuda.cu:654-752``): one compiled program recomputes the
forward partials, forms core gradients, and applies the optimizer update
over the *entire* cores (reference semantics — full-element update, not
touched-rows-only: ``update_tt_cores_{sgd,adagrad}_kernel``,
``tt_embeddings_cuda.cu:379-417``).

Functional style: instead of in-place mutation the step functions return new
cores / optimizer state; wrap with ``jax.jit(..., donate_argnums=...)`` so
XLA updates the HBM buffers in place — same memory behavior, deterministic
(no atomics; the gather transpose is a scatter-add).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fbtt_embedding_tpu.ops.lookup import tt_dense_backward


def sgd_step(
    tt_cores: Sequence[jnp.ndarray],
    grads: Sequence[jnp.ndarray],
    learning_rate,
) -> Tuple[jnp.ndarray, ...]:
    """w <- w - lr * g over full cores (``tt_embeddings_cuda.cu:379-395``)."""
    return tuple(
        c - jnp.asarray(learning_rate, c.dtype) * g
        for c, g in zip(tt_cores, grads)
    )


def adagrad_step(
    tt_cores: Sequence[jnp.ndarray],
    optimizer_state: Sequence[jnp.ndarray],
    grads: Sequence[jnp.ndarray],
    learning_rate,
    eps,
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Full-element Adagrad: s += g^2; w -= lr * g / (sqrt(s) + eps).

    Matches ``update_tt_cores_adagrad_kernel``
    (``tt_embeddings_cuda.cu:397-417``) — per-element state, not row-wise.
    """
    new_cores = []
    new_state = []
    for c, s, g in zip(tt_cores, optimizer_state, grads):
        s2 = s + g * g
        new_state.append(s2)
        new_cores.append(
            c - jnp.asarray(learning_rate, c.dtype) * g
            / (jnp.sqrt(s2) + jnp.asarray(eps, c.dtype))
        )
    return tuple(new_cores), tuple(new_state)


def tt_sgd_backward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    d_output: jnp.ndarray,
    learning_rate,
    precision=None,
) -> Tuple[jnp.ndarray, ...]:
    """Fused backward + SGD: returns updated cores.

    Functional analog of ``tt_sgd_backward`` (``tt_embeddings.cpp:134``).
    Deterministic (sort-free segment reductions), i.e. this is the
    ``EXACT_SGD`` the reference only promises (``tt_embeddings_ops.py:20-23``).
    """
    grads = tt_dense_backward(
        tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
        indices, rowidx, tableidx, d_output, precision=precision,
    )
    return sgd_step(tt_cores, grads, learning_rate)


def tt_adagrad_backward(
    tt_cores: Sequence[jnp.ndarray],
    optimizer_state: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    d_output: jnp.ndarray,
    learning_rate,
    eps,
    precision=None,
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Fused backward + full-element Adagrad: returns (cores, state).

    Functional analog of ``tt_adagrad_backward`` (``tt_embeddings.cpp:135``).
    """
    grads = tt_dense_backward(
        tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
        indices, rowidx, tableidx, d_output, precision=precision,
    )
    return adagrad_step(tt_cores, optimizer_state, grads, learning_rate, eps)
