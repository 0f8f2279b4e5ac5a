"""Quantization-aware training (the reference is inference-only; QAT
closes the loop from f32 training to the int8 engine)."""

from thingino_accel_tpu.training.qat import (
    fake_quant, make_train_step, export_int8,
)

__all__ = ["fake_quant", "make_train_step", "export_int8"]
