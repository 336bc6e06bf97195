"""Masked segment reductions over padded edge arrays (XLA reference path).

This is the kernel surface of the framework: every aggregation in both model
families decomposes into the ops here (see reference L5,
code/utils/sparse_utils.py — ``sparse_mean`` etc. — and the PyG
scatter/segment-softmax kernels behind GATv2Conv).

Conventions (shared with :mod:`gasfm_tpu.graph`):
- Padded edges carry segment id == num_segments (one past the last valid
  segment) and are dropped by XLA's scatter-add out-of-bounds semantics; an
  explicit ``edge_mask`` can additionally be supplied for safety with
  non-finite padding data.
- Empty segments produce 0 for sum/mean/weighted ops (matching the
  ``to_dense()`` of the reference's sparse results) and ``-inf`` masked to 0
  for max unless requested otherwise.

The Pallas TPU kernels in :mod:`gasfm_tpu.ops.pallas` implement fused
versions of the same contracts and are validated against these.
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Edge-partitioned execution context
#
# When tracing inside a shard_map over an "edge" mesh axis, each device holds
# a contiguous shard of the edge arrays while the per-view/per-point/global
# tables are replicated. Setting the context makes every cross-edge reduction
# in this module finish with the matching XLA collective (psum / pmax over
# the edge axis), which is exactly the distributed-segment-softmax recipe of
# SURVEY section 5 (partial max / exp-sum / weighted-sum triples combined
# across chips over ICI).
# ---------------------------------------------------------------------------

_EDGE_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "gasfm_edge_axis", default=None
)


@contextlib.contextmanager
def edge_partitioned(axis_name: str):
    """Enable edge-axis collectives for reductions traced in this scope."""
    token = _EDGE_AXIS.set(axis_name)
    try:
        yield
    finally:
        _EDGE_AXIS.reset(token)


def current_edge_axis() -> Optional[str]:
    return _EDGE_AXIS.get()


@contextlib.contextmanager
def edge_replicated():
    """Temporarily disable edge-axis collectives: for reductions over
    *replicated* per-view/per-point tables (e.g. the view->global and
    point->global attention pools), where a psum would double-count by the
    number of edge shards."""
    token = _EDGE_AXIS.set(None)
    try:
        yield
    finally:
        _EDGE_AXIS.reset(token)


def all_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum across the edge shards (identity outside edge-partitioned scope)."""
    axis = _EDGE_AXIS.get()
    return x if axis is None else jax.lax.psum(x, axis)


def _all_max(x: jnp.ndarray) -> jnp.ndarray:
    axis = _EDGE_AXIS.get()
    return x if axis is None else jax.lax.pmax(x, axis)


def _mask_data(data: jnp.ndarray, edge_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if edge_mask is None:
        return data
    shape = edge_mask.shape + (1,) * (data.ndim - 1)
    return jnp.where(edge_mask.reshape(shape), data, jnp.zeros_like(data))


def segment_sum(
    data: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sum of `data` rows per segment. Out-of-range ids are dropped."""
    data = _mask_data(data, edge_mask)
    local = jax.ops.segment_sum(
        data, seg_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    return all_sum(local)


def segment_count(
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    ones = jnp.ones(seg_ids.shape, dtype=dtype)
    return segment_sum(ones, seg_ids, num_segments, edge_mask, indices_are_sorted)


def segment_mean(
    data: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Empty-aware mean: empty segments yield 0.

    Parity: reference ``sparse_mean`` (code/utils/sparse_utils.py:91-131)
    whose sparse result densifies to 0 at empty rows/columns.
    """
    s = segment_sum(data, seg_ids, num_segments, edge_mask, indices_are_sorted)
    cnt = segment_count(seg_ids, num_segments, edge_mask, indices_are_sorted, dtype=s.dtype)
    cnt = cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.zeros_like(s))


def segment_max(
    data: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    neutral: float = -jnp.inf,
) -> jnp.ndarray:
    """Max per segment; empty segments yield `neutral`."""
    if edge_mask is not None:
        shape = edge_mask.shape + (1,) * (data.ndim - 1)
        data = jnp.where(edge_mask.reshape(shape), data, jnp.full_like(data, neutral))
    local = jax.ops.segment_max(
        data, seg_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    return _all_max(local)


def segment_softmax(
    logits: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Numerically-stable softmax over each segment of per-edge logits.

    logits: (E,) or (E, H). Returns weights of the same shape; padded edges
    get weight 0; edges of empty segments get 0.
    """
    # The max-shift cancels analytically in softmax, so stopping its gradient
    # is exact (and pmax has no differentiation rule anyway).
    m = segment_max(
        jax.lax.stop_gradient(logits), seg_ids, num_segments, edge_mask, indices_are_sorted
    )
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))  # empty segments
    shifted = logits - m[seg_ids.clip(0, num_segments - 1)]
    p = jnp.exp(shifted)
    if edge_mask is not None:
        shape = edge_mask.shape + (1,) * (p.ndim - 1)
        p = jnp.where(edge_mask.reshape(shape), p, jnp.zeros_like(p))
    denom = segment_sum(p, seg_ids, num_segments, None, indices_are_sorted)
    denom_g = denom[seg_ids.clip(0, num_segments - 1)]
    w = jnp.where(denom_g > 0, p / jnp.maximum(denom_g, 1e-38), jnp.zeros_like(p))
    if edge_mask is not None:
        shape = edge_mask.shape + (1,) * (w.ndim - 1)
        w = jnp.where(edge_mask.reshape(shape), w, jnp.zeros_like(w))
    return w


def gather_segments(table: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Broadcast per-segment rows back to edges; padded ids clip harmlessly
    (consumers must mask)."""
    return table[seg_ids.clip(0, num_segments - 1)]


def masked_mean(data: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Mean over `axis` counting only mask-true rows; 0 if none."""
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    m = mask.reshape(shape).astype(data.dtype)
    s = all_sum(jnp.sum(data * m, axis=axis))
    cnt = all_sum(jnp.sum(m, axis=axis))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.zeros_like(s))
