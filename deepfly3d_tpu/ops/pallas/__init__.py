"""Pallas TPU kernels for the pipeline's hot memory-bound ops.

Each kernel has a pure-XLA fallback used as its numeric oracle in tests and
as the code path on non-TPU backends (kernels run in interpret mode there).
"""

from deepfly3d_tpu.ops.pallas.kernels import (
    decode_heatmaps_pallas,
    preprocess_u8_pallas,
    upsample2x_add_pallas,
)

__all__ = [
    "decode_heatmaps_pallas",
    "preprocess_u8_pallas",
    "upsample2x_add_pallas",
]
