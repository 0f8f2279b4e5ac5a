"""Multi-chip scaling via jax.sharding.

The reference is strictly single-process/single-accelerator (SURVEY §2.7:
no DP/TP/PP, no collectives; its only 'interconnect' is the NNDMA engine
moving bytes DDR<->ORAM). On TPU, scaling is a first-class subsystem:
data-parallel batch sharding for serving throughput, tensor-parallel
channel sharding for large models, all via GSPMD over a Mesh with XLA
inserting the ICI collectives.
"""

from thingino_accel_tpu.parallel.mesh import (
    make_mesh, param_sharding_rules, shard_params, batch_sharding,
)
from thingino_accel_tpu.parallel.shard import (
    make_sharded_detector, make_sharded_forward,
    make_sharded_train_step,
)
from thingino_accel_tpu.parallel.pipeline import (
    PipelinedEngine, split_graph,
)

__all__ = [
    "make_mesh", "param_sharding_rules", "shard_params", "batch_sharding",
    "make_sharded_detector", "make_sharded_forward",
    "make_sharded_train_step", "PipelinedEngine", "split_graph",
]
