"""Device-mesh parallelism (replaces the reference's Accelerate/DDP/NCCL layer).

The reference's only distribution strategy is data parallelism via torch DDP
(SURVEY.md §2d). Here the equivalent is a jax.sharding.Mesh with a 'data'
axis (gradients all-reduced over ICI by XLA) plus an optional 'band' axis
that shards the folded sub-band batch — the model's natural width dimension.
"""

from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .dist import (
    initialize_distributed,
    is_main_process,
    process_count,
    gather_for_metrics,
    broadcast_from_main,
    reduce_scalar_sum,
    wait_for_everyone,
    device_specific_seed,
    scale_lr,
)
