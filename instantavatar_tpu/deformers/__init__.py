from .smpl_deformer import (SMPLDeformer, SMPLDeformerState,
                            get_bbox_from_verts, nearest_vertex,
                            rigid_inverse)

__all__ = [
    "SMPLDeformer", "SMPLDeformerState", "get_bbox_from_verts",
    "nearest_vertex", "rigid_inverse",
]
