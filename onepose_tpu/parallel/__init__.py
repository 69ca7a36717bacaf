"""SPMD parallelism: one mesh abstraction for the whole framework.

Axes (SURVEY.md §2.3 plan):
- "data":   data parallelism over the batch axis (training) or the frame
            axis (batched inference / mapping).
- "points": sequence/context parallelism over the 3D-point axis of the
            matcher (and the leaf axis, which follows it). Cross-attention
            2D<->3D and the dual-softmax become compiler-inserted
            all-gather/psum collectives over this axis.

Single chip is the trivial 1x1 mesh; nothing else in the codebase needs to
know the device count.
"""

from onepose_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    points_sharding,
    replicated,
    shard_batch,
)
