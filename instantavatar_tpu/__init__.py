"""instantavatar_tpu — TPU-native neural avatar framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tijiang13/InstantAvatar (monocular-video → animatable avatar in ~1 minute):
Instant-NGP hash-grid radiance field, occupancy-grid-accelerated volume
rendering, Fast-SNARF articulated deformation, SMPL body model, pose
optimization, and evaluation — built TPU-first (static shapes, masked
computation, pallas kernels for the hot ops, `jax.sharding` meshes for
multi-chip scaling).
"""

__version__ = "0.1.0"
