"""Convolution dispatch: reference (XLA shift+matmul) vs Pallas kernels.

The XLA path (``ops.reference.conv2d_int8``) is already MXU-native and
bit-exact; the Pallas path (``ops.pallas_kernels``) fuses the requantize
epilogue into the matmul tiles to cut HBM traffic, mirroring what the
reference's hand-written MXU kernels do for the T41
(``src/mars/mxu_conv.c``). Selection mirrors the reference's ``USE_MXU``
compile-time switch (``src/mars/mars_runtime.c:50-52``) but is a runtime
flag here.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from thingino_accel_tpu.ops import reference as R
from thingino_accel_tpu.ops.quant import RoundMode

# Backend flag: "xla" (default, exact, fast) | "pallas" (fused epilogue).
_BACKEND = os.environ.get("TAT_CONV_BACKEND", "xla")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown conv backend {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def conv2d_int8(*args, backend: Optional[str] = None, **kwargs) -> jax.Array:
    be = backend or _BACKEND
    if be == "pallas":
        from thingino_accel_tpu.ops import pallas_kernels as PK
        return PK.conv2d_int8(*args, **kwargs)
    return R.conv2d_int8(*args, **kwargs)


conv2d_f32 = R.conv2d_f32
depthwise_conv2d_int8 = R.depthwise_conv2d_int8
depthwise_conv2d_f32 = R.depthwise_conv2d_f32
grouped_conv2d_int8 = R.grouped_conv2d_int8
