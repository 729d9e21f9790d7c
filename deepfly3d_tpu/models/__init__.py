"""Neural network models (Flax/JAX, TPU-first)."""

from deepfly3d_tpu.models.hourglass import HourglassNet, HourglassSpec

__all__ = ["HourglassNet", "HourglassSpec"]
