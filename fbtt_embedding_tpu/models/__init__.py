"""Model-facing modules: TT EmbeddingBag layers and the DLRM reference model."""
