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


# --------------------------------------------------------------------------
# Native optimizer semantics (opt-in, ``optim_semantics="native"``).
#
# The reference declares nine OptimType names but implements two behaviors:
# SGD and full-element Adagrad — LAMB/ADAM/LARS/rowwise enums silently route
# to the Adagrad kernel (``tt_embeddings_ops.py:248-266``). The default
# ("reference") dispatch here matches that. Native mode instead gives every
# enum its true math over the full cores:
#
#   EXACT_ROWWISE_ADAGRAD   s_row += mean(g^2 over the core row);
#                           w -= lr * g / (sqrt(s_row) + eps)
#                           (FBGEMM rowwise-adagrad semantics; a "row" is a
#                           core's p_i slice [T, p_i, :] — the axis sparse
#                           gradients select on)
#   ADAM                    bias-corrected full-element Adam
#   PARTIAL_ROWWISE_ADAM    full-element first moment, row-wise second
#                           moment (FBGEMM partial-rowwise layout)
#   LAMB                    Adam direction scaled by a per-core trust ratio
#                           ||w||_F / ||update||_F
#   PARTIAL_ROWWISE_LAMB    LAMB with the row-wise second moment
#   LARS_SGD                momentum SGD with per-core local LR
#                           eta * ||w||_F / ||g||_F
#
# State is a FLAT tuple of arrays (pytree-compatible with
# ``TTEmbeddingParams.optimizer_state``); momentum optimizers append a
# scalar int32 step counter as the last entry. Cache rows keep the
# reference's update family (SGD / full or row-wise Adagrad) in native mode
# — per-parameter-group optimizers, documented at the module kwarg.

NATIVE_HPARAM_DEFAULTS = {
    "beta1": 0.9,       # ADAM/LAMB first-moment decay
    "beta2": 0.999,     # ADAM/LAMB second-moment decay
    "momentum": 0.9,    # LARS momentum
    "eta": 0.001,       # LARS trust coefficient
}


def _row_mean_sq(g: jnp.ndarray) -> jnp.ndarray:
    """Mean of g^2 over a core's trailing (rank*q*rank) axis, keepdims."""
    return jnp.mean(g * g, axis=-1, keepdims=True)


def native_optim_init(optimizer, tt_cores) -> Tuple[jnp.ndarray, ...]:
    """Zero optimizer state for ``native_optim_step`` (flat tuple).

    Layouts: SGD () placeholders; (EXACT_)ADAGRAD one full buffer per
    core; EXACT_ROWWISE_ADAGRAD one ``[T, p_i, 1]`` buffer per core;
    ADAM/LAMB ``(m x n, v x n, step)``; PARTIAL_ROWWISE_* ``(m x n,
    v_row x n, step)``; LARS_SGD one momentum buffer per core.
    """
    from fbtt_embedding_tpu.models.tt_embedding import OptimType

    name = optimizer.value if hasattr(optimizer, "value") else str(optimizer)

    # Fresh buffers per use — reusing one zeros tuple for both moments
    # would donate the same buffer twice under donate_argnums.
    def full():
        return tuple(jnp.zeros_like(c) for c in tt_cores)

    def row():
        return tuple(
            jnp.zeros(c.shape[:-1] + (1,), c.dtype) for c in tt_cores
        )

    step0 = (jnp.zeros((), jnp.int32),)
    if name in (OptimType.SGD.value, OptimType.EXACT_SGD.value):
        return tuple(jnp.zeros((0,), jnp.float32) for _ in tt_cores)
    if name == OptimType.EXACT_ADAGRAD.value:
        return full()
    if name == OptimType.EXACT_ROWWISE_ADAGRAD.value:
        return row()
    if name in (OptimType.ADAM.value, OptimType.LAMB.value):
        return full() + full() + step0
    if name in (OptimType.PARTIAL_ROWWISE_ADAM.value,
                OptimType.PARTIAL_ROWWISE_LAMB.value):
        return full() + row() + step0
    if name == OptimType.LARS_SGD.value:
        return full()
    raise ValueError(f"unknown OptimType: {optimizer}")


def rowwise_adagrad_step(tt_cores, optimizer_state, grads, lr, eps):
    """Row-wise Adagrad over core rows: one accumulator per [T, p_i]."""
    new_cores, new_state = [], []
    for c, s, g in zip(tt_cores, optimizer_state, grads):
        s2 = s + _row_mean_sq(g)
        new_state.append(s2)
        new_cores.append(
            c - jnp.asarray(lr, c.dtype) * g
            / (jnp.sqrt(s2) + jnp.asarray(eps, c.dtype)))
    return tuple(new_cores), tuple(new_state)


def _adam_direction(m, v, g, t, beta1, beta2, eps, rowwise_v):
    """Updated (m, v) and the bias-corrected Adam direction."""
    m2 = beta1 * m + (1.0 - beta1) * g
    gsq = _row_mean_sq(g) if rowwise_v else g * g
    v2 = beta2 * v + (1.0 - beta2) * gsq
    tf = t.astype(jnp.float32)
    mhat = m2 / (1.0 - beta1 ** tf)
    vhat = v2 / (1.0 - beta2 ** tf)
    return m2, v2, mhat / (jnp.sqrt(vhat) + eps)


def adam_like_step(tt_cores, optimizer_state, grads, lr, eps,
                   beta1=0.9, beta2=0.999, rowwise_v=False, lamb=False):
    """Shared ADAM / LAMB / PARTIAL_ROWWISE_* update.

    ``rowwise_v``: second moment per core row instead of per element.
    ``lamb``: scale each core's Adam direction by the trust ratio
    ``||w||_F / ||direction||_F`` (ratio 1 when either norm is 0).
    """
    n = len(tt_cores)
    ms, vs, t = optimizer_state[:n], optimizer_state[n:2 * n], \
        optimizer_state[2 * n]
    t2 = t + 1
    new_cores, new_m, new_v = [], [], []
    for c, m, v, g in zip(tt_cores, ms, vs, grads):
        m2, v2, u = _adam_direction(
            m, v, g, t2, beta1, beta2, eps, rowwise_v)
        if lamb:
            wn = jnp.linalg.norm(c)
            un = jnp.linalg.norm(u)
            ratio = jnp.where((wn > 0.0) & (un > 0.0), wn / (un + 1e-12),
                              1.0)
            u = u * ratio
        new_m.append(m2)
        new_v.append(v2)
        new_cores.append(c - jnp.asarray(lr, c.dtype) * u)
    return tuple(new_cores), tuple(new_m) + tuple(new_v) + (t2,)


def lars_step(tt_cores, optimizer_state, grads, lr,
              momentum=0.9, eta=0.001):
    """LARS: per-core local LR ``eta * ||w|| / ||g||``, momentum SGD."""
    new_cores, new_mom = [], []
    for c, mom, g in zip(tt_cores, optimizer_state, grads):
        wn = jnp.linalg.norm(c)
        gn = jnp.linalg.norm(g)
        local = jnp.where((wn > 0.0) & (gn > 0.0), eta * wn / (gn + 1e-12),
                          1.0)
        mom2 = momentum * mom + local * g
        new_mom.append(mom2)
        new_cores.append(c - jnp.asarray(lr, c.dtype) * mom2)
    return tuple(new_cores), tuple(new_mom)


def native_optim_step(optimizer, tt_cores, optimizer_state, grads, lr, eps,
                      hparams=None):
    """Apply ``optimizer``'s true semantics; returns ``(cores, state)``.

    ``hparams``: static dict overriding ``NATIVE_HPARAM_DEFAULTS`` keys.
    """
    from fbtt_embedding_tpu.models.tt_embedding import OptimType

    hp = dict(NATIVE_HPARAM_DEFAULTS)
    if hparams:
        hp.update(hparams)
    name = optimizer.value if hasattr(optimizer, "value") else str(optimizer)
    if name in (OptimType.SGD.value, OptimType.EXACT_SGD.value):
        return sgd_step(tt_cores, grads, lr), tuple(optimizer_state)
    if name == OptimType.EXACT_ADAGRAD.value:
        return adagrad_step(tt_cores, optimizer_state, grads, lr, eps)
    if name == OptimType.EXACT_ROWWISE_ADAGRAD.value:
        return rowwise_adagrad_step(tt_cores, optimizer_state, grads, lr,
                                    eps)
    if name in (OptimType.ADAM.value, OptimType.PARTIAL_ROWWISE_ADAM.value):
        return adam_like_step(
            tt_cores, optimizer_state, grads, lr, eps,
            beta1=hp["beta1"], beta2=hp["beta2"],
            rowwise_v=name == OptimType.PARTIAL_ROWWISE_ADAM.value)
    if name in (OptimType.LAMB.value, OptimType.PARTIAL_ROWWISE_LAMB.value):
        return adam_like_step(
            tt_cores, optimizer_state, grads, lr, eps,
            beta1=hp["beta1"], beta2=hp["beta2"],
            rowwise_v=name == OptimType.PARTIAL_ROWWISE_LAMB.value,
            lamb=True)
    if name == OptimType.LARS_SGD.value:
        return lars_step(tt_cores, optimizer_state, grads, lr,
                         momentum=hp["momentum"], eta=hp["eta"])
    raise ValueError(f"unknown OptimType: {optimizer}")


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
