from .mlp import VanillaNeRF, VanillaNeRFParams, positional_encoding
from .ngp import NGPField, NGPParams, bbox_center_scale
from .triplane import TriPlaneField, TriPlaneParams
from .voxel_triplane import VoxelTriplaneField, VoxelTriplaneParams

__all__ = [
    "NGPField", "NGPParams", "bbox_center_scale",
    "VanillaNeRF", "VanillaNeRFParams", "positional_encoding",
    "TriPlaneField", "TriPlaneParams",
    "VoxelTriplaneField", "VoxelTriplaneParams",
]
