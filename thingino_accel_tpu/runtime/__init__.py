"""Runtime: the TPU engine replacing the reference's interpreter loop."""

from thingino_accel_tpu.runtime.engine import Engine, EngineOptions

__all__ = ["Engine", "EngineOptions"]
