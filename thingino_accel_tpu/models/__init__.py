"""Model-family support: YOLO pre/post + zoo + AEC audio model."""

from thingino_accel_tpu.models import yolo, zoo

__all__ = ["yolo", "zoo"]
