"""Compute ops: masked segment reductions, segment-softmax attention.

XLA reference implementations live here; fused Pallas TPU kernels in
:mod:`gasfm_tpu.ops.pallas` implement the same contracts."""

from gasfm_tpu.ops.gatv2 import gatv2_attend
from gasfm_tpu.ops.segment import (
    gather_segments,
    masked_mean,
    segment_count,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "gatv2_attend",
    "gather_segments",
    "masked_mean",
    "segment_count",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "segment_sum",
]
