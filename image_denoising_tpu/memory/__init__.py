from .bank import MemoryBank, build_memory_bank, extract_patches

__all__ = ["MemoryBank", "build_memory_bank", "extract_patches"]
