"""Compute ops.

- ``quant``: requantization math, replicating the reference's two distinct
  rounding rules bit-for-bit.
- ``reference``: jnp implementations of every layer semantic — the parity
  oracle, and also the fallback execution path (runs fine under jit).
- ``conv``: MXU-native conv paths (int8 shift+matmul decomposition,
  Pallas kernels).
- ``nms``: fixed-shape on-device class-aware NMS.
"""

from thingino_accel_tpu.ops.quant import (
    RoundMode, requantize, quantize, dequantize,
)
from thingino_accel_tpu.ops import reference
from thingino_accel_tpu.ops import conv

__all__ = ["RoundMode", "requantize", "quantize", "dequantize",
           "reference", "conv"]
