from .loader import find_model_file, load_smpl_model
from .smpl import (NUM_BETAS, NUM_JOINTS, SMPLModel, SMPLOutput, lbs,
                   rigid_transform_chain, rodrigues, smpl_forward)
from .toy import SMPL_PARENTS, TOY_JOINTS, toy_smpl_model

__all__ = [
    "NUM_BETAS", "NUM_JOINTS", "SMPLModel", "SMPLOutput", "lbs",
    "rigid_transform_chain", "rodrigues", "smpl_forward",
    "load_smpl_model", "find_model_file",
    "toy_smpl_model", "SMPL_PARENTS", "TOY_JOINTS",
]
