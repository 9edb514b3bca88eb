from .bank import MemoryBank, build_memory_bank, extract_patches
from .sharded import make_ring_retrieval, shard_bank

__all__ = [
    "MemoryBank",
    "build_memory_bank",
    "extract_patches",
    "make_ring_retrieval",
    "shard_bank",
]
