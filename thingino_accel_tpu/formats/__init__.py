"""Model interchange formats.

- ``mars``: the `.mars` binary graph format (reader + writer), the primary
  interchange format of the reference stack (``include/mars.h``).
- ``packing``: NNA packed-layout codecs (NMHWSOIB2 weights, NDHWC32
  features) used inside `.mars`/`.mgk` files.
- ``onnx``: dependency-free ONNX importer (hand-rolled protobuf wire
  decoding, like the reference's prost-based ``mars-compiler/src/onnx_parser.rs``).
- ``mgk``: offline `.mgk` (ELF shared object) parser — metadata + weight
  extraction only, never executes model code
  (role of ``mgk-decompiler/``).
"""

from thingino_accel_tpu.formats.mars import (
    MarsModel,
    MarsTensor,
    MarsLayer,
    read_mars,
    write_mars,
    DType,
    Format,
    LayerType,
    Activation,
    Padding,
)
from thingino_accel_tpu.formats.packing import (
    pack_nmhwsoib2,
    unpack_nmhwsoib2,
    pack_ndhwc32,
    unpack_ndhwc32,
)

__all__ = [
    "MarsModel", "MarsTensor", "MarsLayer", "read_mars", "write_mars",
    "DType", "Format", "LayerType", "Activation", "Padding",
    "pack_nmhwsoib2", "unpack_nmhwsoib2", "pack_ndhwc32", "unpack_ndhwc32",
]
