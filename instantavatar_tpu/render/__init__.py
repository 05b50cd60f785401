from .compositing import CompositeOutput, composite
from .raymarcher import (Rays, RenderOutput, compact_samples, ray_aabb,
                         render_rays, sample_z)

__all__ = [
    "CompositeOutput", "composite",
    "Rays", "RenderOutput", "compact_samples", "ray_aabb", "render_rays",
    "sample_z",
]
