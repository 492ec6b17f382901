"""fbtt_embedding_tpu — TPU-native tensor-train embedding engine.

A from-scratch JAX/XLA/Pallas implementation of TT-compressed EmbeddingBag
training (capabilities of facebookresearch/FBTT-Embedding, re-designed
TPU-first): batched TT-core contraction on the MXU, deterministic
segment-reduction backward with fused SGD/Adagrad, a software LFU cache of
decompressed hot rows, and a sharding layer for multi-chip meshes.
"""

from fbtt_embedding_tpu.models.tt_embedding import (
    FoldedServingParams,
    OptimType,
    TTEmbeddingBag,
    TTEmbeddingParams,
    TableBatchedTTEmbeddingBag,
    make_bucketed_serving_fn,
    make_folded_serving_fn,
    make_fused_train_step,
    make_serving_fn,
    refold_cache,
    tt_embedding_forward,
)
from fbtt_embedding_tpu.ops.contraction import tt_matrix_to_full, tt_rows
from fbtt_embedding_tpu.ops.fused_optim import (
    native_optim_init,
    native_optim_step,
)
from fbtt_embedding_tpu.ops.lookup import (
    pooled_tt_lookup,
    tt_dense_backward,
    tt_embedding_bag_forward,
    tt_forward,
)
from fbtt_embedding_tpu.utils.decompose import tt_decompose
from fbtt_embedding_tpu.utils.shapes import suggested_tt_shapes
from fbtt_embedding_tpu import native
from fbtt_embedding_tpu.utils import checkpoint
from fbtt_embedding_tpu.utils import guard

__version__ = "0.1.0"

__all__ = [
    "OptimType",
    "TTEmbeddingBag",
    "TableBatchedTTEmbeddingBag",
    "TTEmbeddingParams",
    "tt_embedding_forward",
    "make_fused_train_step",
    "make_serving_fn",
    "make_folded_serving_fn",
    "make_bucketed_serving_fn",
    "refold_cache",
    "FoldedServingParams",
    "tt_matrix_to_full",
    "tt_rows",
    "tt_forward",
    "tt_embedding_bag_forward",
    "tt_dense_backward",
    "pooled_tt_lookup",
    "native_optim_init",
    "native_optim_step",
    "suggested_tt_shapes",
    "tt_decompose",
    "native",
    "checkpoint",
    "guard",
]
