"""Graph IR: what importers produce and the engine consumes."""

from thingino_accel_tpu.ir.graph import (
    Graph,
    TensorInfo,
    Node,
    QuantInfo,
    from_mars,
)
from thingino_accel_tpu.ir import passes

__all__ = ["Graph", "TensorInfo", "Node", "QuantInfo", "from_mars", "passes"]
