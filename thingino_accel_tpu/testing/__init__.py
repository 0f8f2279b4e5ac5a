"""Testing utilities: the reference-runtime emulator (parity oracle)."""

from thingino_accel_tpu.testing.refemu import RefEmulator

__all__ = ["RefEmulator"]
