"""Runtime: the TPU engine replacing the reference's interpreter loop."""

from thingino_accel_tpu.runtime.engine import Engine, EngineOptions
from thingino_accel_tpu.runtime.ingest import (
    auto_ingest_format, batch_minor_format, ingest)
from thingino_accel_tpu.runtime.serving import (
    InferenceTimeout, MultiStreamBatcher, StreamServer)

__all__ = ["Engine", "EngineOptions", "auto_ingest_format",
           "batch_minor_format", "ingest", "InferenceTimeout",
           "MultiStreamBatcher", "StreamServer"]
