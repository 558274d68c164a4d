from .block_sparse import (
    block_sparse_flash_attention,
    block_sparse_flash_attention_paired,
    block_sparse_flash_attention_grouped,
    block_sparse_attention_reference,
)
from .flash import dense_attention

__all__ = [
    "block_sparse_flash_attention",
    "block_sparse_flash_attention_paired",
    "block_sparse_flash_attention_grouped",
    "block_sparse_attention_reference",
    "dense_attention",
]
