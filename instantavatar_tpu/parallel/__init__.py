from .data_parallel import (make_dp_render, make_dp_train_step, make_mesh,
                            make_multi_subject_step, shard_batch,
                            stack_subjects)

__all__ = [
    "make_dp_render", "make_dp_train_step", "make_mesh",
    "make_multi_subject_step", "shard_batch", "stack_subjects",
]
