"""Fused projection-feature edge update as single Pallas TPU kernels.

The edge update of both model families is the 4-way gather-broadcast

    out_e = (pe_e + ps[pt_e] + pv[cam_e] + pg) / 4

(parity: reference ``GraphAttnSfMProjectionFeatureUpdate``,
code/models/layers.py:873-956, and ``SetOfSetProjectionFeatureUpdate``,
layers.py:129-147). The composite path costs two gather kernels forward and
two segment-sum kernels + a column reduction backward, with the E-sized
gathered tables round-tripping HBM. Here both directions are ONE kernel:

    forward:  per edge chunk, gather the point-window tile and the whole
              (small) camera table via one-hot MXU matmuls in VMEM and emit
              the combined average directly.
    backward: per edge chunk, emit d pe = g/4 and accumulate the three table
              gradients (windowed point blocks / camera table / global row)
              in resident VMEM tiles.

Out-of-range ids (edge padding carries pt id == N, cam id == M over
zero-padded table rows) contribute zero rows, matching
``gasfm_tpu.ops.segment.gather_segments`` kernel-path semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _id_row(ref, c):
    """Row c % 8 of the (8, CHUNK) lane-packed id block as (1, CHUNK).

    TPU block shapes need sublane-divisible leading dims, so the id rows are
    blocked 8 at a time (index c // 8 — Mosaic re-fetches only when the
    block index changes, i.e. once per 8 chunks). Ref-level pl.ds indexing:
    value-level dynamic_slice is not lowered by Pallas TPU."""
    return ref[pl.ds(c % 8, 1), :]


def _fwd_kernel(wb_ref, pids_ref, cids_ref, pe_ref, ps_ref, pv_ref, pg_ref, out_ref,
                *, W: int, Wc: int, mm_dtype):
    c = pl.program_id(0)
    # Lane-packed (1, CHUNK) id rows; transposed one-hots (see
    # fused_dual_attn / BENCHLOG section 8 — the (E, 1) column form is
    # 128x padded by HBM tiling and its DMA dominated this kernel).
    local_row = _id_row(pids_ref, c) - wb_ref[c] * W  # (1, CHUNK)
    ohT_pt = (local_row == jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)).astype(mm_dtype)
    ohT_cam = (_id_row(cids_ref, c) == jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)).astype(
        mm_dtype
    )
    out_ref[:] = (
        pe_ref[:]
        + jax.lax.dot_general(ohT_pt, ps_ref[:].astype(mm_dtype),
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(ohT_cam, pv_ref[:].astype(mm_dtype),
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + pg_ref[:]
    ) * 0.25


@functools.partial(jax.jit, static_argnames=("W", "Wc", "mm", "interpret"))
def _fwd_raw(pe, ps_pad, pv_pad, pg, pids2d, cids2d, wb, W, Wc, mm="f32", interpret=False):
    E, D = pe.shape
    chunk = pids2d.shape[1]  # per-graph chunk
    assert E % chunk == 0
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    _rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != _rows8:
        # Id rows blocked (8, CHUNK): pad the row count to a sublane multiple
        # (padded rows are DMA'd with their block but never read).
        pids2d = jnp.pad(pids2d, ((0, _rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, _rows8 - cids2d.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, Wc=Wc, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        interpret=interpret,
    )(wb, pids2d, cids2d, pe, ps_pad, pv_pad, pg)


def _bwd_kernel(wb_ref, pids_ref, cids_ref, g_ref, dpe_ref, dps_ref, dpv_ref, dpg_ref,
                *, W: int, Wc: int, mm_dtype):
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        dps_ref[:] = jnp.zeros_like(dps_ref)

    @pl.when(c == 0)
    def _():
        dpv_ref[:] = jnp.zeros_like(dpv_ref)
        dpg_ref[:] = jnp.zeros_like(dpg_ref)

    local_row = _id_row(pids_ref, c) - wb * W  # (1, CHUNK)
    ohT_pt = (local_row == jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)).astype(mm_dtype)
    ohT_cam = (_id_row(cids_ref, c) == jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)).astype(
        mm_dtype
    )
    g4 = g_ref[:] * 0.25
    g4_mm = g4.astype(mm_dtype)
    dpe_ref[:] = g4
    dps_ref[:] += jax.lax.dot_general(
        ohT_pt, g4_mm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpv_ref[:] += jax.lax.dot_general(
        ohT_cam, g4_mm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpg_ref[0:1, :] += jnp.sum(g4, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("s_pad", "W", "Wc", "mm", "interpret"))
def _bwd_raw(g, pids2d, cids2d, wb, s_pad, W, Wc, mm="f32", interpret=False):
    E, D = g.shape
    chunk = pids2d.shape[1]  # per-graph chunk
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    _rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != _rows8:
        # Id rows blocked (8, CHUNK): pad the row count to a sublane multiple
        # (padded rows are DMA'd with their block but never read).
        pids2d = jnp.pad(pids2d, ((0, _rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, _rows8 - cids2d.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, Wc=Wc, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E, D), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((Wc, D), jnp.float32),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
        ],
        interpret=interpret,
    )(wb, pids2d, cids2d, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_edge_combine(pe, ps, pv, pg, pids2d, cids2d, wb, num_pts, num_cams, W,
                       interpret=False, mm="f32"):
    """(pe + ps[pt] + pv[cam] + pg) / 4 with zero rows for out-of-range ids.

    ps: (num_pts, D) point table; pv: (num_cams, D) camera table; pg: (1, D).
    W: static point-window width. The camera table is one-hot-matched at
    width Wc = round_up(num_cams, 128); the trash id num_cams either lands on
    a zero-padded row.
    """
    out, _ = _fec_run(pe, ps, pv, pg, pids2d, cids2d, wb, num_pts, num_cams, W, interpret, mm)
    return out


def _fec_run(pe, ps, pv, pg, pids2d, cids2d, wb, num_pts, num_cams, W, interpret, mm):
    s_pad = _round_up(num_pts, W)
    Wc = _round_up(max(num_cams, 1), 128)
    ps_pad = ps if ps.shape[0] == s_pad else jnp.pad(ps, ((0, s_pad - ps.shape[0]), (0, 0)))
    pv_pad = pv if pv.shape[0] == Wc else jnp.pad(pv, ((0, Wc - pv.shape[0]), (0, 0)))
    out = _fwd_raw(pe, ps_pad, pv_pad, pg, pids2d, cids2d, wb, W, Wc, mm=mm,
                   interpret=interpret)
    return out, (pids2d, cids2d, wb, s_pad, Wc)


def _fec_fwd(pe, ps, pv, pg, pids2d, cids2d, wb, num_pts, num_cams, W, interpret, mm="f32"):
    out, res = _fec_run(pe, ps, pv, pg, pids2d, cids2d, wb, num_pts, num_cams, W, interpret, mm)
    return out, res


def _fec_bwd(num_pts, num_cams, W, interpret, mm, res, g):
    pids2d, cids2d, wb, s_pad, Wc = res
    dpe, dps_full, dpv_full, dpg8 = _bwd_raw(
        g, pids2d, cids2d, wb, s_pad, W, Wc, mm=mm, interpret=interpret
    )
    visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
    dps_full = jnp.where(jnp.repeat(visited, W)[:, None], dps_full, 0.0)
    return (dpe, dps_full[:num_pts], dpv_full[:num_cams], dpg8[0:1], None, None, None)


fused_edge_combine.defvjp(_fec_fwd, _fec_bwd)
