"""thingino-accel-tpu: a TPU-native neural-network inference framework.

A ground-up rebuild of the capabilities of opensensor/thingino-accel (an
int8/f32 CNN+GRU inference stack for the Ingenic T41 NNA) as an idiomatic
JAX/XLA/Pallas framework for TPU:

- ``formats``  — model interchange: `.mars` reader/writer, ONNX importer,
  `.mgk` (ELF) offline parser.  (reference: ``include/mars.h``,
  ``mars-compiler/``, ``mgk-decompiler/``)
- ``ir``       — the graph IR the importers produce and the engine consumes.
- ``ops``      — compute: jnp reference ops (the parity oracle, mirroring
  ``src/mars/mars_runtime.c`` layer semantics) and Pallas/MXU int8 kernels
  (mirroring ``src/mars/mxu_conv.c``'s role).
- ``runtime``  — the engine: IR -> single jitted XLA program, weight
  residency, batched serving.  (reference: ``src/mars/mars_runtime.c``)
- ``models``   — model-family support: YOLO pre/post-processing + NMS,
  AEC GRU audio model, model zoo.
- ``parallel`` — multi-chip scaling via jax.sharding Mesh (dp/tp), absent
  from the single-chip reference but first-class here.
- ``training`` — quantization-aware fine-tuning (the reference is
  inference-only; QAT closes the loop for producing int8 models).
- ``api``      — C-API-shaped shim preserving nna_*/mars_* call shapes
  (reference: ``include/nna.h``, ``include/nna_model.h``,
  ``include/mars_runtime.h``).
"""

from thingino_accel_tpu.version import __version__

__all__ = ["__version__"]
