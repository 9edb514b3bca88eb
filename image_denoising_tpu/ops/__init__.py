from .rng import OperationSeed
from .space_to_depth import space_to_depth, depth_to_space
from .neighbor import generate_mask_pair, generate_subimages, subsample_pair
from .noise import AugmentNoise

__all__ = [
    "OperationSeed",
    "space_to_depth",
    "depth_to_space",
    "generate_mask_pair",
    "generate_subimages",
    "subsample_pair",
    "AugmentNoise",
]
