from .data_parallel import (DPFrameRenderer, dp_render_frame,
                            make_dp_render, make_dp_train_step, make_mesh,
                            make_multi_subject_step, shard_batch,
                            stack_subjects)

__all__ = [
    "DPFrameRenderer", "dp_render_frame",
    "make_dp_render", "make_dp_train_step", "make_mesh",
    "make_multi_subject_step", "shard_batch", "stack_subjects",
]
