from .datasets import (AvatarDataModule, AvatarDataset, MocapDataset,
                       load_smpl_param)
from .rays import make_ray_grid, near_far_from_transl
from .samplers import EdgeSampler, PatchSampler
from .synthetic import make_synthetic_sequence

__all__ = [
    "AvatarDataModule", "AvatarDataset", "MocapDataset",
    "load_smpl_param",
    "make_ray_grid", "near_far_from_transl",
    "EdgeSampler", "PatchSampler",
    "make_synthetic_sequence",
]
