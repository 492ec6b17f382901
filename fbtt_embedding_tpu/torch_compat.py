"""PyTorch-facing adapter: the reference's module surface on torch tensors.

The reference (``/root/reference/tt_embeddings_ops.py:421-934``) is a
``torch.nn.Module``; its users hold torch ``indices``/``offsets`` and
expect torch outputs. This module lets such code switch to the TPU
framework by changing one import: the classes here take and return
**torch CPU tensors** while all compute runs through the JAX/TPU module
(:class:`fbtt_embedding_tpu.models.tt_embedding.TableBatchedTTEmbeddingBag`)
on the default JAX device. Conversion crosses the host boundary via
numpy — the same H2D/D2H transfer a CUDA module pays for CPU-resident
batches — so there is no double copy on the device side.

Semantics notes vs the reference:

* ``sparse=True`` (the reference default): ``backward(d_output)``
  applies the fused optimizer update in place and returns ``None``, as
  the reference's autograd hook does. The adapter is therefore NOT a
  ``torch.autograd`` participant — call ``backward`` explicitly with
  the pooled-output cotangent (``d_output = grad of loss wrt forward
  output``), exactly what the reference's ``TTLookupFunction.backward``
  receives.
* ``sparse=False``: ``backward`` returns ``(d_tt_cores, d_cache_weight)``
  as torch tensors, for stepping with an external ``torch.optim``
  optimizer via ``load_core_grads_into`` or manual updates.
* ``state_dict()``/``load_state_dict()`` speak torch tensors, so
  ``torch.save``/``torch.load`` round-trips work unchanged.

torch is an optional dependency of the framework: importing this module
requires it, nothing else does.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import torch

from fbtt_embedding_tpu.models.tt_embedding import (
    OptimType,
    TableBatchedTTEmbeddingBag as _JaxTableBatched,
)

__all__ = ["OptimType", "TableBatchedTTEmbeddingBag", "TTEmbeddingBag"]


def _to_np(t) -> np.ndarray:
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _to_torch(a) -> torch.Tensor:
    # np.asarray of a jax.Array is a read-only view; copy so the torch
    # tensor owns writable memory (torch warns on non-writable buffers)
    return torch.from_numpy(np.array(a))


class TableBatchedTTEmbeddingBag:
    """Reference ``TableBatchedTTEmbeddingBag`` surface on torch tensors
    (``tt_embeddings_ops.py:421-886``); compute on the JAX device."""

    def __init__(
        self,
        num_tables: int,
        num_embeddings: int,
        embedding_dim: int,
        tt_ranks: List[int],
        tt_p_shapes: Optional[List[int]] = None,
        tt_q_shapes: Optional[List[int]] = None,
        optimizer: OptimType = OptimType.SGD,
        learning_rate: float = 0.1,
        eps: float = 1.0e-10,
        sparse: bool = True,
        use_cache: bool = False,
        cache_size: int = 0,
        hashtbl_size: int = 0,
        weight_dist: str = "approx-normal",
        enforce_embedding_dim: bool = False,
        **extra,
    ) -> None:
        self._m = _JaxTableBatched(
            num_tables, num_embeddings, embedding_dim, tt_ranks,
            tt_p_shapes, tt_q_shapes, optimizer, learning_rate, eps,
            sparse, use_cache, cache_size, hashtbl_size, weight_dist,
            enforce_embedding_dim, **extra,
        )

    # -- reference module attributes users read -------------------------
    @property
    def tt_p_shapes(self):
        return self._m.tt_p_shapes

    @property
    def tt_q_shapes(self):
        return self._m.tt_q_shapes

    @property
    def tt_ranks(self):
        return self._m.tt_ranks

    @property
    def num_tables(self):
        return self._m.num_tables

    @property
    def tt_cores(self) -> List[torch.Tensor]:
        return [_to_torch(c) for c in self._m.tt_cores]

    @property
    def warmup(self) -> bool:
        return self._m.warmup

    # -- forward / backward ---------------------------------------------
    def forward(self, indices: torch.Tensor, offsets: torch.Tensor,
                warmup: Optional[bool] = None) -> torch.Tensor:
        """``warmup`` passes through to the JAX module: ``None`` (default)
        defers to ``self.warmup`` — the reference's effective behavior
        (it ignores the argument); an explicit bool overrides cache
        probing for this call (the reference's documented intent)."""
        out = self._m.forward(_to_np(indices), _to_np(offsets),
                              warmup=warmup)
        return _to_torch(out)

    __call__ = forward

    def backward(self, d_output: torch.Tensor):
        res = self._m.backward(_to_np(d_output))
        if res is None:
            return None
        d_cores, d_cache = res
        return (
            [_to_torch(g) for g in d_cores],
            None if d_cache is None else _to_torch(d_cache),
        )

    def apply_core_grads(self, d_cores, d_cache=None, lr: float = None):
        """Convenience for ``sparse=False`` users: SGD-step the cores
        (and cache rows) with externally produced gradients — what the
        reference leaves to ``torch.optim`` over its ``nn.Parameter``
        cores."""
        import jax.numpy as jnp

        step = self._m.learning_rate if lr is None else lr
        self._m.tt_cores = [
            c - step * jnp.asarray(_to_np(g))
            for c, g in zip(self._m.tt_cores, d_cores)
        ]
        if d_cache is not None and self._m.cache is not None:
            self._m.cache = self._m.cache.replace(
                weight=self._m.cache.weight
                - step * jnp.asarray(_to_np(d_cache)))

    # -- cache control (reference surface) -------------------------------
    def cache_populate(self) -> None:
        self._m.cache_populate()

    def update_cache(self, indices: torch.Tensor) -> None:
        self._m.update_cache(_to_np(indices))

    def reset_cache(self) -> None:
        self._m.reset_cache()

    def cache_hit_rate(self) -> float:
        return self._m.cache_hit_rate()

    # -- misc API ---------------------------------------------------------
    def full_weight(self) -> torch.Tensor:
        return _to_torch(self._m.full_weight())

    def set_learning_rate(self, lr: float) -> None:
        self._m.set_learning_rate(lr)

    def get_params(self) -> List[torch.Tensor]:
        return [_to_torch(c) for c in self._m.get_params()]

    def state_dict(self) -> dict:
        return {k: _to_torch(v) for k, v in self._m.state_dict().items()}

    def load_state_dict(self, state: dict) -> None:
        self._m.load_state_dict({k: _to_np(v) for k, v in state.items()})


class TTEmbeddingBag(TableBatchedTTEmbeddingBag):
    """Single-table wrapper (reference ``tt_embeddings_ops.py:889-934``):
    forward returns ``[B, D]``."""

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        tt_ranks: List[int],
        tt_p_shapes: Optional[List[int]] = None,
        tt_q_shapes: Optional[List[int]] = None,
        optimizer: OptimType = OptimType.SGD,
        learning_rate: float = 0.1,
        eps: float = 1.0e-10,
        sparse: bool = True,
        use_cache: bool = True,
        cache_size: int = 0,
        hashtbl_size: int = 0,
        weight_dist: str = "approx-normal",
        enforce_embedding_dim: bool = False,
        **extra,
    ) -> None:
        super().__init__(
            1, num_embeddings, embedding_dim, tt_ranks, tt_p_shapes,
            tt_q_shapes, optimizer, learning_rate, eps, sparse, use_cache,
            cache_size, hashtbl_size, weight_dist, enforce_embedding_dim,
            **extra,
        )

    def forward(self, indices: torch.Tensor, offsets: torch.Tensor,
                warmup: Optional[bool] = None) -> torch.Tensor:
        return super().forward(indices, offsets, warmup)[0]

    __call__ = forward
