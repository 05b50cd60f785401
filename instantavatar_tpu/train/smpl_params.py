"""Per-frame optimizable SMPL parameters.

Parity with the reference's ``SMPLParamEmbedding``
(/root/reference/instant_avatar/models/structures/body_model_param.py):
per-frame global_orient/body_pose/transl plus shared betas (always looked
up at index 0), stored as plain arrays in the parameter pytree (the
functional analog of ``nn.Embedding.from_pretrained(freeze=False)``), and
the (unused upstream, kept for parity) temporal total-variation smoother.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SMPLParams", "lookup_frame", "tv_loss"]


class SMPLParams(NamedTuple):
    betas: jax.Array          # (1, 10) shared across frames
    global_orient: jax.Array  # (F, 3)
    body_pose: jax.Array      # (F, 69)
    transl: jax.Array         # (F, 3)

    @classmethod
    def from_arrays(cls, params: dict) -> "SMPLParams":
        return cls(
            betas=jnp.asarray(np.asarray(params["betas"]).reshape(1, -1)),
            global_orient=jnp.asarray(params["global_orient"]),
            body_pose=jnp.asarray(params["body_pose"]),
            transl=jnp.asarray(params["transl"]))

    def to_arrays(self) -> dict:
        return {
            "betas": np.asarray(self.betas),
            "global_orient": np.asarray(self.global_orient),
            "body_pose": np.asarray(self.body_pose),
            "transl": np.asarray(self.transl),
        }


def lookup_frame(params: SMPLParams, idx: jax.Array) -> dict:
    """Per-frame parameter slice (betas shared, body_model_param.py:17)."""
    return {
        "betas": params.betas[0],
        "global_orient": jnp.take(params.global_orient, idx, axis=0),
        "body_pose": jnp.take(params.body_pose, idx, axis=0),
        "transl": jnp.take(params.transl, idx, axis=0),
    }


def tv_loss(params: SMPLParams) -> jax.Array:
    """Temporal smoothness over consecutive frames
    (body_model_param.py:23-34; defined but unused by the reference's
    training loop — provided for the same optional use)."""
    loss = 0.0
    for x in (params.global_orient, params.body_pose, params.transl):
        loss = loss + jnp.mean(jnp.abs(x[1:] - x[:-1]))
    return loss
