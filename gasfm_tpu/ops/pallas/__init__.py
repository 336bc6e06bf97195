"""Pallas TPU kernels for the sparse-aggregation hot path."""

from gasfm_tpu.ops.pallas.segment_kernels import (
    gather_rows_kernel,
    kernels_applicable,
    segment_max_kernel,
    segment_sum_kernel,
)

__all__ = [
    "gather_rows_kernel",
    "kernels_applicable",
    "segment_max_kernel",
    "segment_sum_kernel",
]
