"""Pallas TPU kernels for the sparse-aggregation hot path.

Why: XLA lowers row-wise scatter-add / gather with dynamic indices to
serialized row loops on TPU (~2.7 ms for a 30k x 32 segment-sum on v5e,
measured); the equivalent one-hot matmul in XLA materializes the one-hot in
HBM and is no faster. These kernels build the one-hot selection masks
*in VMEM* tile-by-tile and feed the MXU, turning both segment reduction and
row gather into dense matmuls with zero HBM overhead for the masks:

    segment_sum:  out[s] = sum_e data[e] * [ids[e] == s]
                  (grid: segment tiles x edge chunks, accumulate over chunks)
    gather_rows:  out[e] = sum_s table[s] * [ids[e] == s]
                  (grid: edge chunks x segment tiles, accumulate over tiles)
    segment_max:  masked elementwise max per tile (VPU).

Padded edges carry ids == num_segments (one past the last segment) and fall
outside every tile -> dropped for free, matching the XLA-path convention
(gasfm_tpu/ops/segment.py). Gradients are wired as custom VJPs: the
transpose of segment-sum is gather and vice versa.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# segment sum
# ---------------------------------------------------------------------------


def _segment_sum_kernel(ids_ref, data_ref, out_ref, *, s_tile: int):
    s_idx = pl.program_id(0)
    e_idx = pl.program_id(1)

    @pl.when(e_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (chunk, 1) int32
    seg_range = s_idx * s_tile + jax.lax.broadcasted_iota(jnp.int32, (1, s_tile), 1)
    onehot = (ids == seg_range).astype(data_ref.dtype)  # (chunk, s_tile)
    out_ref[:] += jax.lax.dot_general(
        onehot,
        data_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # onehot^T @ data
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("num_segments", "chunk", "s_tile", "interpret"))
def _segment_sum_raw(
    data: jnp.ndarray,  # (E, d) float32, padding rows already zeroed
    ids: jnp.ndarray,  # (E, 1) int32
    num_segments: int,
    chunk: int,
    s_tile: int,
    interpret: bool = False,
) -> jnp.ndarray:
    E, d = data.shape
    assert E % chunk == 0
    s_pad = _round_up(num_segments, s_tile)
    grid = (s_pad // s_tile, E // chunk)
    out = pl.pallas_call(
        functools.partial(_segment_sum_kernel, s_tile=s_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda s, e: (e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda s, e: (e, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_tile, d), lambda s, e: (s, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, d), jnp.float32),
        interpret=interpret,
    )(ids, data)
    return out[:num_segments]


# ---------------------------------------------------------------------------
# row gather (table -> edges)
# ---------------------------------------------------------------------------


def _gather_rows_kernel(ids_ref, table_ref, out_ref, *, s_tile: int):
    e_idx = pl.program_id(0)
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (chunk, 1)
    seg_range = s_idx * s_tile + jax.lax.broadcasted_iota(jnp.int32, (1, s_tile), 1)
    onehot = (ids == seg_range).astype(table_ref.dtype)  # (chunk, s_tile)
    out_ref[:] += jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("chunk", "s_tile", "interpret"))
def _gather_rows_raw(
    table: jnp.ndarray,  # (S, d) float32
    ids: jnp.ndarray,  # (E, 1) int32; out-of-range ids yield zero rows
    chunk: int,
    s_tile: int,
    interpret: bool = False,
) -> jnp.ndarray:
    S, d = table.shape
    E = ids.shape[0]
    assert E % chunk == 0
    s_pad = _round_up(S, s_tile)
    if s_pad != S:
        table = jnp.pad(table, ((0, s_pad - S), (0, 0)))
    grid = (E // chunk, s_pad // s_tile)
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, s_tile=s_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda e, s: (e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, d), lambda e, s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, d), lambda e, s: (e, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, d), jnp.float32),
        interpret=interpret,
    )(ids, table)
    return out


# ---------------------------------------------------------------------------
# segment max (no VJP needed: only consumed under stop_gradient in softmax)
# ---------------------------------------------------------------------------


def _segment_max_kernel(ids_ref, data_ref, out_ref, *, s_tile: int, neutral: float):
    # out layout is (d, s_pad): keeps the per-tile reduction lane-aligned
    # (no in-kernel transposes); the caller transposes the small result.
    s_idx = pl.program_id(0)
    e_idx = pl.program_id(1)

    @pl.when(e_idx == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, neutral)

    ids = ids_ref[:]  # (chunk, 1)
    seg_range = s_idx * s_tile + jax.lax.broadcasted_iota(jnp.int32, (1, s_tile), 1)
    match = ids == seg_range  # (chunk, s_tile)
    data = data_ref[:]  # (chunk, d)
    d = data.shape[1]
    # (chunk, s_tile, d) intermediates would be large; loop over d (small).
    for j in range(d):
        col = data[:, j : j + 1]  # (chunk, 1)
        masked = jnp.where(match, col, neutral)  # (chunk, s_tile)
        tile_max = jnp.max(masked, axis=0, keepdims=True)  # (1, s_tile)
        out_ref[j : j + 1, :] = jnp.maximum(out_ref[j : j + 1, :], tile_max)


@functools.partial(jax.jit, static_argnames=("num_segments", "chunk", "s_tile", "neutral", "interpret"))
def _segment_max_raw(
    data: jnp.ndarray,  # (E, d); padding rows must already hold `neutral`
    ids: jnp.ndarray,  # (E, 1)
    num_segments: int,
    chunk: int,
    s_tile: int,
    neutral: float = -1e30,
    interpret: bool = False,
) -> jnp.ndarray:
    E, d = data.shape
    assert E % chunk == 0
    s_pad = _round_up(num_segments, s_tile)
    grid = (s_pad // s_tile, E // chunk)
    out = pl.pallas_call(
        functools.partial(_segment_max_kernel, s_tile=s_tile, neutral=neutral),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda s, e: (e, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda s, e: (e, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, s_tile), lambda s, e: (0, s), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, s_pad), jnp.float32),
        interpret=interpret,
    )(ids, data)
    return out.T[:num_segments]


# ---------------------------------------------------------------------------
# Differentiable wrappers (custom VJP: transpose(segment_sum) = gather)
# ---------------------------------------------------------------------------

from gasfm_tpu.graph.view_graph import CHUNK as _CHUNK  # default tile size

_S_TILE = 512


def kernels_applicable(E: int, chunk: int = _CHUNK) -> bool:
    return E % chunk == 0


def _edge_tile(E: int) -> int:
    """Edge-chunk tile for the DENSE kernels (where the chunk is a pure
    tiling granularity, not a layout property): the process default when it
    divides E, else the largest 128-multiple tile that does. Lets graphs
    built with any per-graph chunk (view_graph.ViewGraph.chunk) use the
    dense kernels without a layout contract."""
    for c in (_CHUNK, 1024, 512, 256, 128):
        if E % c == 0:
            return c
    raise AssertionError(f"edge count {E} not a multiple of 128")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_kernel(data, ids2d, num_segments, interpret=False):
    return _segment_sum_raw(
        data, ids2d, num_segments, _edge_tile(data.shape[0]), _S_TILE,
        interpret=interpret,
    )


def _ss_fwd(data, ids2d, num_segments, interpret=False):
    return segment_sum_kernel(data, ids2d, num_segments, interpret), ids2d


def _ss_bwd(num_segments, interpret, ids2d, g):
    # d/d data = gather(g, ids); out-of-range ids (padding) receive zeros.
    return (gather_rows_kernel(g, ids2d, interpret), None)


segment_sum_kernel.defvjp(_ss_fwd, _ss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_kernel(table, ids2d, interpret=False):
    return _gather_rows_raw(
        table, ids2d, _edge_tile(ids2d.shape[0]), _S_TILE, interpret=interpret
    )


def _gr_fwd(table, ids2d, interpret=False):
    return gather_rows_kernel(table, ids2d, interpret), (ids2d, table.shape[0])


def _gr_bwd(interpret, res, g):
    ids2d, S = res
    return (segment_sum_kernel(g, ids2d, S, interpret), None)


gather_rows_kernel.defvjp(_gr_fwd, _gr_bwd)


def segment_max_kernel(data, ids2d, num_segments, neutral=-1e30, interpret=False):
    return _segment_max_raw(
        data, ids2d, num_segments, _edge_tile(data.shape[0]), _S_TILE,
        neutral=neutral, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Windowed kernels for the blocked point-major edge layout
# (gasfm_tpu/graph/view_graph.py): every aligned CHUNK of edges carries point
# ids from ONE window of WINDOW consecutive segments, whose block index is
# scalar-prefetched per chunk. Work drops from E x S_pad to E x WINDOW —
# measured 8x cheaper than the full one-hot form at S=4096 — and the output
# block per chunk is known statically enough for Pallas to keep it resident
# in VMEM across the (non-decreasing) per-chunk block sequence.
#
# Out-of-window ids (edge padding carries id == num_segments) match no
# one-hot column and are dropped for free. Blocks never visited by any chunk
# are left unwritten — callers mask them via the graph's pt_block_visited.
# ---------------------------------------------------------------------------

from gasfm_tpu.graph.view_graph import WINDOW as _WINDOW  # noqa: E402


def _wseg_sum_kernel(wb_ref, ids_ref, data_ref, out_ref):
    c = pl.program_id(0)
    wb = wb_ref[c]
    prev = wb_ref[jnp.maximum(c - 1, 0)]

    @pl.when(jnp.logical_or(c == 0, prev != wb))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (chunk, 1) int32
    local = ids - wb * _WINDOW
    seg_range = jax.lax.broadcasted_iota(jnp.int32, (1, _WINDOW), 1)
    onehot = (local == seg_range).astype(data_ref.dtype)  # (chunk, WINDOW)
    out_ref[:] += jax.lax.dot_general(
        onehot,
        data_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # onehot^T @ data
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def _wseg_sum_raw(
    data: jnp.ndarray,  # (E, d) float32
    ids: jnp.ndarray,  # (E, 1) int32
    wb: jnp.ndarray,  # (E // CHUNK,) int32 non-decreasing block per chunk
    num_segments: int,
    interpret: bool = False,
) -> jnp.ndarray:
    E, d = data.shape
    chunk = E // wb.shape[0]  # per-graph chunk, from the wb row count
    assert E % chunk == 0
    s_pad = _round_up(num_segments, _WINDOW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_WINDOW, d), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _wseg_sum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, d), jnp.float32),
        interpret=interpret,
    )(wb, ids, data)
    # Window blocks never visited by any chunk are never written by the
    # kernel (uninitialized memory); sum semantics demand exact zeros there.
    visited = jnp.zeros((s_pad // _WINDOW,), dtype=bool).at[wb].set(True)
    out = jnp.where(jnp.repeat(visited, _WINDOW)[:, None], out, 0.0)
    return out[:num_segments]


def _wseg_max_kernel(wb_ref, ids_ref, data_ref, out_ref, *, neutral: float):
    # Transposed (d, WINDOW) output tile: keeps the reduction lane-aligned.
    c = pl.program_id(0)
    wb = wb_ref[c]
    prev = wb_ref[jnp.maximum(c - 1, 0)]

    @pl.when(jnp.logical_or(c == 0, prev != wb))
    def _():
        out_ref[:] = jnp.full_like(out_ref, neutral)

    ids = ids_ref[:]  # (chunk, 1)
    local = ids - wb * _WINDOW
    seg_range = jax.lax.broadcasted_iota(jnp.int32, (1, _WINDOW), 1)
    match = local == seg_range  # (chunk, WINDOW)
    data = data_ref[:]  # (chunk, d)
    for j in range(data.shape[1]):
        col = data[:, j : j + 1]
        masked = jnp.where(match, col, neutral)
        tile_max = jnp.max(masked, axis=0, keepdims=True)  # (1, WINDOW)
        out_ref[j : j + 1, :] = jnp.maximum(out_ref[j : j + 1, :], tile_max)


@functools.partial(jax.jit, static_argnames=("num_segments", "neutral", "interpret"))
def _wseg_max_raw(
    data: jnp.ndarray,  # (E, d); padding rows must already hold `neutral`
    ids: jnp.ndarray,  # (E, 1)
    wb: jnp.ndarray,  # (E // CHUNK,)
    num_segments: int,
    neutral: float = -1e30,
    interpret: bool = False,
) -> jnp.ndarray:
    E, d = data.shape
    chunk = E // wb.shape[0]  # per-graph chunk, from the wb row count
    assert E % chunk == 0
    s_pad = _round_up(num_segments, _WINDOW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (d, _WINDOW), lambda c, wb_ref: (0, wb_ref[c]), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_wseg_max_kernel, neutral=neutral),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, s_pad), jnp.float32),
        interpret=interpret,
    )(wb, ids, data)
    # Unvisited window blocks are uninitialized memory; max semantics demand
    # the neutral value there.
    visited = jnp.zeros((s_pad // _WINDOW,), dtype=bool).at[wb].set(True)
    out = jnp.where(jnp.repeat(visited, _WINDOW)[None, :], out, neutral)
    return out.T[:num_segments]


def _wgather_kernel(wb_ref, ids_ref, table_ref, out_ref):
    c = pl.program_id(0)
    ids = ids_ref[:]  # (chunk, 1)
    local = ids - wb_ref[c] * _WINDOW
    seg_range = jax.lax.broadcasted_iota(jnp.int32, (1, _WINDOW), 1)
    onehot = (local == seg_range).astype(table_ref.dtype)
    out_ref[:] = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wgather_raw(
    table: jnp.ndarray,  # (S, d) float32
    ids: jnp.ndarray,  # (E, 1) int32; out-of-window ids yield zero rows
    wb: jnp.ndarray,  # (E // CHUNK,)
    interpret: bool = False,
) -> jnp.ndarray:
    S, d = table.shape
    E = ids.shape[0]
    chunk = E // wb.shape[0]  # per-graph chunk, from the wb row count
    assert E % chunk == 0
    s_pad = _round_up(S, _WINDOW)
    if s_pad != S:
        table = jnp.pad(table, ((0, s_pad - S), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_WINDOW, d), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, d), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _wgather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, d), jnp.float32),
        interpret=interpret,
    )(wb, ids, table)


# Differentiable wrappers: transpose(windowed segment-sum) = windowed gather.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_segment_sum(data, ids2d, wb, num_segments, interpret=False):
    return _wseg_sum_raw(data, ids2d, wb, num_segments, interpret=interpret)


def _wss_fwd(data, ids2d, wb, num_segments, interpret=False):
    return windowed_segment_sum(data, ids2d, wb, num_segments, interpret), (ids2d, wb)


def _wss_bwd(num_segments, interpret, res, g):
    ids2d, wb = res
    return (windowed_gather(g, ids2d, wb, interpret), None, None)


windowed_segment_sum.defvjp(_wss_fwd, _wss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def windowed_gather(table, ids2d, wb, interpret=False):
    return _wgather_raw(table, ids2d, wb, interpret=interpret)


def _wg_fwd(table, ids2d, wb, interpret=False):
    return windowed_gather(table, ids2d, wb, interpret), (ids2d, wb, table.shape[0])


def _wg_bwd(interpret, res, g):
    ids2d, wb, S = res
    return (windowed_segment_sum(g, ids2d, wb, S, interpret), None, None)


windowed_gather.defvjp(_wg_fwd, _wg_bwd)


def windowed_segment_max(data, ids2d, wb, num_segments, neutral=-1e30, interpret=False):
    return _wseg_max_raw(data, ids2d, wb, num_segments, neutral=neutral, interpret=interpret)
