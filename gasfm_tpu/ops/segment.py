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
import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SegmentWindows(NamedTuple):
    """Per-chunk point-window metadata for the blocked edge layout
    (gasfm_tpu/graph/view_graph.py): ``block`` is the (E // CHUNK,)
    non-decreasing point-block index per aligned edge chunk; ``row_ok``
    masks segments whose block is never visited (their kernel output is
    undefined — XLA semantics demand the reduction's neutral value there);
    ``nlive`` is the traced count of chunks holding at least one valid
    edge (a PREFIX in this layout — all-padding chunks are a strict
    suffix), letting the fused kernels skip dead chunks' compute entirely
    (None = treat every chunk as live)."""

    block: jnp.ndarray  # (E // CHUNK,) int32
    row_ok: Optional[jnp.ndarray]  # (num_segments,) bool or None
    nlive: Optional[jnp.ndarray] = None  # () int32 live-chunk count or None


# ---------------------------------------------------------------------------
# Kernel dispatch
#
# XLA lowers row scatters on TPU to serialized loops (~30 GB/s measured on
# the segment sums of this workload, vs ~800 GB/s HBM); the Pallas one-hot
# matmul kernels in gasfm_tpu/ops/pallas/segment_kernels.py are the fast
# path. Mode "auto" enables them on TPU backends for chunk-aligned f32
# arrays; "interpret" forces the kernels through the Pallas interpreter on
# any backend (used by tests to validate the dispatch path end-to-end);
# "off" keeps pure XLA.
# ---------------------------------------------------------------------------

_KERNEL_MODE = os.environ.get("GASFM_KERNEL_MODE", "auto")
_DENSE_MAX_SEGMENTS = 1024  # camera-side tables; beyond this XLA wins


def set_kernel_mode(mode: str) -> None:
    assert mode in ("auto", "off", "interpret")
    global _KERNEL_MODE
    _KERNEL_MODE = mode


def get_kernel_mode() -> str:
    return _KERNEL_MODE


def _kernels_enabled() -> bool:
    if _KERNEL_MODE == "off":
        return False
    if _KERNEL_MODE == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _kernel_interpret() -> bool:
    return _KERNEL_MODE == "interpret"


# Matmul precision of the Pallas one-hot gather/scatter kernels. "bf16" runs
# the large (CHUNK x W) @ (W x D) one-hot matmuls with bfloat16 operands and
# float32 accumulation — the one-hot operand is exact in bf16, feature
# operands round to 8 mantissa bits (~4e-3 relative), and the MXU runs ~4x
# faster than f32 on v5e. "f32" (default) keeps full parity with the XLA
# reference path. Like the kernel mode, this is read at trace time.
_KERNEL_PRECISION = os.environ.get("GASFM_KERNEL_PRECISION", "f32")


def set_kernel_precision(precision: str) -> None:
    assert precision in ("f32", "bf16")
    global _KERNEL_PRECISION
    _KERNEL_PRECISION = precision


def get_kernel_precision() -> str:
    return _KERNEL_PRECISION


def _kernel_eligible(data: jnp.ndarray, seg_ids: jnp.ndarray) -> bool:
    # Edge-count gate is 128-alignment: the dense kernels pick their own
    # edge tile (segment_kernels._edge_tile), the windowed ones derive the
    # per-graph chunk from the window metadata's row count.
    return (
        _kernels_enabled()
        and data.ndim == 2
        and data.dtype == jnp.float32
        and data.shape[0] == seg_ids.shape[0]
        and data.shape[0] % 128 == 0
        and data.shape[1] >= 1
    )

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


#: Table-sharding context (SURVEY section 5's boundary exchange): when set,
#: the POINT-side attention combines exchange only the first/last window
#: partials with neighbor shards (ops/pallas/fused_attn.
#: exchange_boundary_windows) instead of psumming full tables, the
#: point->global pool reduces owned rows per shard and combines its softmax
#: triple across shards, and outputs gathering the full point table pay ONE
#: masked psum per step. Holds the (N,) bool OWNED-rows mask computed per
#: shard by parallel.edge_sharding.compute_owned_points. Camera-side tables
#: stay replicated (they are small and every shard's edges touch them).
_TABLE_SHARD_OWNED: contextvars.ContextVar[Optional[jnp.ndarray]] = (
    contextvars.ContextVar("gasfm_table_shard_owned", default=None)
)


@contextlib.contextmanager
def table_sharded(owned_pts: jnp.ndarray):
    token = _TABLE_SHARD_OWNED.set(owned_pts)
    try:
        yield
    finally:
        _TABLE_SHARD_OWNED.reset(token)


def table_shard_owned() -> Optional[jnp.ndarray]:
    """The owned point-row mask, or None when table sharding is off."""
    return _TABLE_SHARD_OWNED.get()


def is_table_sharded() -> bool:
    return _TABLE_SHARD_OWNED.get() is not None


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


# ---------------------------------------------------------------------------
# Gradient transposes of the edge-shard collectives
#
# Two reduction flavors with DIFFERENT exact transposes, distinguished by how
# the reduction's *output cotangent* arrives during the per-shard backward
# (this is exactly shard_map's varying/invariant bookkeeping, done manually
# because the train steps run with check_vma=False):
#
# - ``all_sum`` (INTERIOR: view/point/global tables consumed downstream by
#   per-edge gathers/broadcasts). The output cotangent on shard i is a
#   shard-local PARTIAL (assembled from shard i's edges via the gather
#   transposes). The exact transpose must deliver the FULL cotangent
#   ``psum_j(partial_j)`` to the shard-local summand: an edge's features
#   influence the table row once, and the row influences EVERY shard's
#   downstream edges. Dropping the psum here (an identity transpose, the
#   round-3 rule) keeps only the "diagonal" gradient paths — loss edges on
#   shard i backing onto upstream edges of shard i — and silently loses all
#   cross-shard coupling: measured 93/162 corrupted leaves (up to 58%
#   relative) the moment a scene's valid edges span more than one shard
#   (tests/test_parallel.py::TestCrossShardGradients).
#
# - ``all_sum_final`` (FINAL: the loss/metric scalars, consumed invariantly
#   or returned). The output cotangent is the REPLICATED seed — identical on
#   every shard, not a partial — so the exact transpose delivers it
#   UNCHANGED. Re-psumming it (jax's native psum transpose, the round-1
#   rule) scales every upstream gradient by the edge-shard count.
#
# With interior=psum-of-partials and final=identity, every parameter
# gradient leaves the per-shard backward as a shard-local partial, and the
# train steps' single trailing ``psum(grads, edge_axis)`` is exact for ANY
# edge sharding — chunk-aligned or not. The Pallas attention kernels'
# custom VJPs implement the same interior rule by psumming their incoming
# table cotangents at backward entry (gp/gc in fused_attn/fused_dual_attn/
# fused_layer_step).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_interior(x, axis):
    return jax.lax.psum(x, axis)


def _psum_interior_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _psum_interior_bwd(axis, _, g):
    # Partial cotangents in -> full cotangent delivered to the local summand.
    return (jax.lax.psum(g, axis),)


_psum_interior.defvjp(_psum_interior_fwd, _psum_interior_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_replicated(x, axis):
    return jax.lax.psum(x, axis)


def _psum_replicated_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _psum_replicated_bwd(axis, _, g):
    # Replicated (seed) cotangent in -> delivered unchanged.
    return (g,)


_psum_replicated.defvjp(_psum_replicated_fwd, _psum_replicated_bwd)


def all_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Interior cross-shard sum (identity outside edge-partitioned scope):
    for reductions whose output feeds back into per-edge computation. See
    the transpose discussion above."""
    axis = _EDGE_AXIS.get()
    return x if axis is None else _psum_interior(x, axis)


def all_sum_final(x: jnp.ndarray) -> jnp.ndarray:
    """Final cross-shard sum: for loss/metric scalars whose cotangent is the
    replicated seed (or that are not differentiated at all). See above."""
    axis = _EDGE_AXIS.get()
    return x if axis is None else _psum_replicated(x, axis)


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
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    """Sum of `data` rows per segment. Out-of-range ids are dropped."""
    data = _mask_data(data, edge_mask)
    local = _dispatch_segment_sum(data, seg_ids, num_segments, indices_are_sorted, window)
    return all_sum(local)


def _dispatch_segment_sum(data, seg_ids, num_segments, indices_are_sorted, window):
    squeeze = data.ndim == 1
    lifted = data[:, None] if squeeze else data
    if _kernel_eligible(lifted, seg_ids):
        from gasfm_tpu.ops.pallas.segment_kernels import (
            segment_sum_kernel,
            windowed_segment_sum,
        )

        ids2d = seg_ids.astype(jnp.int32)[:, None]
        if window is not None:
            out = windowed_segment_sum(
                lifted, ids2d, window.block, num_segments, _kernel_interpret()
            )
            if window.row_ok is not None:
                out = jnp.where(window.row_ok[:, None], out, 0.0)
            return out[:, 0] if squeeze else out
        if num_segments <= _DENSE_MAX_SEGMENTS:
            out = segment_sum_kernel(lifted, ids2d, num_segments, _kernel_interpret())
            return out[:, 0] if squeeze else out
    return jax.ops.segment_sum(
        data, seg_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_count(
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    dtype=jnp.float32,
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    ones = jnp.ones(seg_ids.shape, dtype=dtype)
    return segment_sum(ones, seg_ids, num_segments, edge_mask, indices_are_sorted, window)


def segment_mean(
    data: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    """Empty-aware mean: empty segments yield 0.

    Parity: reference ``sparse_mean`` (code/utils/sparse_utils.py:91-131)
    whose sparse result densifies to 0 at empty rows/columns.
    """
    s = segment_sum(data, seg_ids, num_segments, edge_mask, indices_are_sorted, window)
    cnt = segment_count(
        seg_ids, num_segments, edge_mask, indices_are_sorted, dtype=s.dtype, window=window
    )
    cnt = cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.zeros_like(s))


def segment_max(
    data: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    neutral: float = -jnp.inf,
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    """Max per segment; empty segments yield `neutral`."""
    if edge_mask is not None:
        shape = edge_mask.shape + (1,) * (data.ndim - 1)
        data = jnp.where(edge_mask.reshape(shape), data, jnp.full_like(data, neutral))
    local = _dispatch_segment_max(data, seg_ids, num_segments, indices_are_sorted, neutral, window)
    return _all_max(local)


def _dispatch_segment_max(data, seg_ids, num_segments, indices_are_sorted, neutral, window):
    squeeze = data.ndim == 1
    lifted = data[:, None] if squeeze else data
    # The kernels' neutral must be finite (-inf breaks the max tree in VMEM
    # padding lanes); -1e30 densifies back to the caller's neutral below.
    if _kernel_eligible(lifted, seg_ids) and lifted.shape[1] <= 8:
        from gasfm_tpu.ops.pallas.segment_kernels import (
            segment_max_kernel,
            windowed_segment_max,
        )

        ids2d = seg_ids.astype(jnp.int32)[:, None]
        finite_data = jnp.maximum(lifted, -1e30)
        if window is not None:
            out = windowed_segment_max(
                finite_data, ids2d, window.block, num_segments, -1e30, _kernel_interpret()
            )
            if window.row_ok is not None:
                out = jnp.where(window.row_ok[:, None], out, -1e30)
        elif num_segments <= _DENSE_MAX_SEGMENTS:
            out = segment_max_kernel(finite_data, ids2d, num_segments, -1e30, _kernel_interpret())
        else:
            out = None
        if out is not None:
            out = jnp.where(out <= -1e30, neutral, out)
            return out[:, 0] if squeeze else out
    out = jax.ops.segment_max(
        data, seg_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    # Contract parity with the kernel path above: empty segments yield the
    # caller's `neutral`, not the XLA identity (-inf) — otherwise the same
    # program silently splits behavior on which backend it dispatched to.
    if jnp.issubdtype(out.dtype, jnp.floating):
        out = jnp.where(out <= -1e30, jnp.asarray(neutral, out.dtype), out)
    return out


def segment_softmax(
    logits: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax over each segment of per-edge logits.

    logits: (E,) or (E, H). Returns weights of the same shape; padded edges
    get weight 0; edges of empty segments get 0.
    """
    # The max-shift cancels analytically in softmax, so stopping its gradient
    # is exact (and pmax has no differentiation rule anyway).
    m = segment_max(
        jax.lax.stop_gradient(logits), seg_ids, num_segments, edge_mask,
        indices_are_sorted, window=window,
    )
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))  # empty segments
    shifted = logits - jax.lax.stop_gradient(
        gather_segments(m, seg_ids, num_segments, window=window)
    )
    # Valid edges have shifted <= 0 (m is their segment max); the
    # stop-gradient cap only affects masked/padded edges, whose exp would
    # otherwise overflow to inf and poison the backward with 0 * inf = NaN.
    # (A plain minimum would zero the gradient of every segment's argmax
    # edge at the 0 tie.)
    p = jnp.exp(shifted - jax.lax.stop_gradient(jnp.maximum(shifted, 0.0)))
    if edge_mask is not None:
        shape = edge_mask.shape + (1,) * (p.ndim - 1)
        p = jnp.where(edge_mask.reshape(shape), p, jnp.zeros_like(p))
    denom = segment_sum(p, seg_ids, num_segments, None, indices_are_sorted, window=window)
    denom_g = gather_segments(denom, seg_ids, num_segments, window=window)
    w = jnp.where(denom_g > 0, p / jnp.maximum(denom_g, 1e-38), jnp.zeros_like(p))
    if edge_mask is not None:
        shape = edge_mask.shape + (1,) * (w.ndim - 1)
        w = jnp.where(edge_mask.reshape(shape), w, jnp.zeros_like(w))
    return w


def gather_segments(
    table: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    """Broadcast per-segment rows back to edges. On the XLA path padded ids
    clip to the last row; on the kernel path they yield zero rows — consumers
    must mask either way.

    The kernel path matters for the *backward* pass: the VJP of an XLA
    gather is a row scatter-add (~30 GB/s on TPU); the Pallas pairs
    (windowed / dense one-hot) keep both directions on the MXU."""
    squeeze = table.ndim == 1
    lifted = table[:, None] if squeeze else table
    if (
        _kernels_enabled()
        and lifted.ndim == 2
        and lifted.dtype == jnp.float32
        and seg_ids.shape[0] % 128 == 0
    ):
        from gasfm_tpu.ops.pallas.segment_kernels import (
            gather_rows_kernel,
            windowed_gather,
        )

        ids2d = seg_ids.astype(jnp.int32)[:, None]
        if window is not None:
            out = windowed_gather(lifted, ids2d, window.block, _kernel_interpret())
            return out[:, 0] if squeeze else out
        if num_segments <= _DENSE_MAX_SEGMENTS:
            out = gather_rows_kernel(lifted, ids2d, _kernel_interpret())
            return out[:, 0] if squeeze else out
    return table[seg_ids.clip(0, num_segments - 1)]


def masked_mean(data: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Mean over `axis` counting only mask-true rows; 0 if none."""
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    m = mask.reshape(shape).astype(data.dtype)
    s = all_sum(jnp.sum(data * m, axis=axis))
    cnt = all_sum(jnp.sum(m, axis=axis))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.zeros_like(s))
