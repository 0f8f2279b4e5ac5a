"""Device ingest layout for camera frames.

The serving pipeline's input edge has a layout seam: host frames arrive
``[B, H, W, 3]`` row-major, but XLA's chosen stem-conv emitter on TPU
(``EmitInputBatchInLanes``) wants the batch dimension in the 128-wide
lane dimension — minor-to-major ``{0, 3, 2, 1}``. Feeding a row-major
device buffer costs a relayout copy of every batch inside the compiled
program (~11 us/frame at batch 128 on a v5e, ``docs/KERNELS.md``).

The host->device DMA has to write every byte exactly once either way,
so the fix is free: place the ingest buffer in the layout the program
wants (``jax.device_put`` with an explicit ``Format``) and the in-graph
copy disappears. This is the TPU analog of the reference feeding the
NNA its native NDHWC32 tile order instead of converting on device
(``include/mars.h:47-56``; NNDMA descriptors write ORAM in kernel
consumption order, ``src/nna_dma.c:130-165``).

Measured (v5e, yolov5s fast tier @640 b128): 4,030 -> 4,266 fps e2e
just by ingesting frames batch-minor. The two in-graph alternatives —
``with_layout_constraint`` on the quantized input, or forcing the head
convs to write the decode-preferred layout — both measured SLOWER
(3,956 / 3,771 fps): XLA places the forced relayout worse than its own
choice. Only the ingest-side fix wins, because it moves the work off
the device entirely.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import layout as XL
from jax.sharding import SingleDeviceSharding

__all__ = [
    "batch_minor_format",
    "auto_ingest_format",
    "ingest",
]


def _device(device=None):
    return device if device is not None else jax.devices()[0]


def batch_minor_format(ndim: int = 4, device=None) -> XL.Format:
    """The batch-minor ingest format for ``[B, spatial..., C]`` frames:
    major-to-minor ``(1, 2, ..., ndim-1, 0)`` — batch rides the TPU
    lane dimension. This is what XLA picks for the conv-stem pipelines
    here (verified == :func:`auto_ingest_format` on the bench
    pipeline); use the AUTO query for arbitrary programs."""
    m2m = tuple(range(1, ndim)) + (0,)
    return XL.Format(XL.Layout(major_to_minor=m2m),
                     SingleDeviceSharding(_device(device)))


def auto_ingest_format(fn, *example_args, arg_index: int = 0) -> XL.Format:
    """Ask XLA for its preferred input layout: compile ``fn`` with AUTO
    input layouts and read back the format of ``arg_index``.

    ``fn`` is the raw (unjitted) callable. This costs one extra
    compile; for the standard detector pipelines the answer is
    :func:`batch_minor_format`."""
    c = jax.jit(fn, in_shardings=XL.Format(XL.Layout.AUTO)).lower(
        *example_args).compile()
    flat = jax.tree_util.tree_leaves(c.input_formats)
    return flat[arg_index]


def ingest(frames: np.ndarray, fmt: Optional[XL.Format] = None,
           device=None) -> jax.Array:
    """Place host frames on device in the ingest layout (the camera-DMA
    write — one H2D transfer, no on-device relayout afterwards)."""
    if fmt is None:
        fmt = batch_minor_format(np.ndim(frames), device)
    try:
        return jax.device_put(frames, fmt)
    except Exception:
        # backend without custom-layout support (e.g. some CPU builds):
        # plain placement — correctness is unchanged, only the on-device
        # relayout copy comes back
        return jax.device_put(frames, _device(device))
