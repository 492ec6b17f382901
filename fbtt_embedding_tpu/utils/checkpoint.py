"""Checkpoint / resume for TT-embedding state.

The reference has no explicit save/load code — its cores are
``nn.Parameter``s and the cache/optimizer tables are registered buffers, so
``state_dict()`` round-trips through standard PyTorch
(``tt_embeddings_ops.py:512-598``, SURVEY §5). Here the whole trainable
state is one pytree (:class:`~fbtt_embedding_tpu.models.tt_embedding.
TTEmbeddingParams`), so checkpointing is a pytree save/restore:

  * :func:`save` / :func:`restore` — Orbax (production path: async-capable,
    multi-host aware, versioned).
  * :func:`save_npz` / :func:`restore_npz` — dependency-free single-file
    fallback for quick experiments.

Both round-trip any pytree of arrays (``TTEmbeddingParams``, DLRM params,
optimizer states, cache tables).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _pad_empty(x):
    # Orbax refuses zero-size arrays (e.g. the SGD path's empty optimizer
    # state); stand in a 1-element placeholder, undone on restore.
    if hasattr(x, "size") and x.size == 0:
        return jnp.zeros((1,), x.dtype)
    return x


def save(path: str, state: Any) -> None:
    """Write ``state`` (any pytree of arrays) to ``path`` via Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(_pad_empty, state), force=True)


def restore(path: str, like: Any = None) -> Any:
    """Restore a pytree from ``path``.

    ``like`` (optional) is an abstract/concrete pytree of the same
    structure used to restore with correct shardings and dtypes — pass the
    current state (e.g. ``module.params``) when available.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        abstract = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(_pad_empty(x)), like
        )
        restored = ckptr.restore(path, item=abstract)
        return jax.tree.map(
            lambda r, orig: (
                jnp.zeros(orig.shape, orig.dtype)
                if hasattr(orig, "size") and orig.size == 0 else r
            ),
            restored, like,
        )


def save_npz(path: str, state: Any) -> None:
    """Single-file .npz checkpoint of any pytree (host-gathered)."""
    leaves, _ = jax.tree.flatten(state)
    np.savez(path, *[np.asarray(leaf) for leaf in leaves])


def restore_npz(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_npz`; ``like`` provides the
    tree structure (and device placement via ``jnp.asarray``)."""
    with np.load(path) as data:
        arrays = [data[k] for k in data.files]
    leaves, treedef = jax.tree.flatten(like)
    assert len(arrays) == len(leaves), (
        f"checkpoint has {len(arrays)} leaves, expected {len(leaves)}"
    )
    return jax.tree.unflatten(
        treedef, [jnp.asarray(a) for a in arrays]
    )
