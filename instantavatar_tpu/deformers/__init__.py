from .fast_snarf import (SNARFDeformer, SnarfCanonical, SnarfFrame,
                         get_predefined_rest_pose)
from .smpl_deformer import (SMPLDeformer, SMPLDeformerState,
                            get_bbox_from_verts, nearest_vertex,
                            rigid_inverse)

__all__ = [
    "SNARFDeformer", "SnarfCanonical", "SnarfFrame",
    "get_predefined_rest_pose",
    "SMPLDeformer", "SMPLDeformerState", "get_bbox_from_verts",
    "nearest_vertex", "rigid_inverse",
]
