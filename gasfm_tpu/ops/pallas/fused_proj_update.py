"""Packed-layout fused projection update: the whole GASFM edge update

    out_e = ( lin_proj([en_e | skip_e]) + ps[pt_e] + pv[cam_e] + pg ) / 4
            (+ residual_e)

as ONE Pallas kernel per direction over lane-packed edge streams
(ops/pallas/packing.py: 4 edges per 128-lane row).

Parity: reference ``GraphAttnSfMProjectionFeatureUpdate``
(code/models/layers.py:873-956) plus the init-skip concat and the residual
add of ``GraphAttnSfMLayer`` (layers.py:236-263). The XLA composite costs,
per layer: the (E, De+D2) concat, a degenerate-K matmul, two gather kernels
and a full extra traversal for the residual — all on 4x lane-padded
streams. Here:

- ``lin_proj`` splits into its en rows and skip rows and both run in packed
  space as block-diagonal matmuls (full 128-lane MXU utilization; the
  (E, De+D2) concat is never materialized).
- The table gathers build per-quarter transposed one-hots from the
  lane-packed id rows and place each (Q, D) gather into its lane group
  (packing.place_quarters), so gathered values are produced packed.
- The residual is a packed add in the epilogue (backward: d_res = g,
  returned without kernel work).

The backward emits shard-local partial table/weight gradients; under edge
partitioning the trailing global grad psum of the sharded train step makes
them exact (same contract as ops/pallas/fused_update.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gasfm_tpu.ops.pallas.fused_dual_attn import _wb_with_nlive
from gasfm_tpu.ops.pallas.packing import (
    PACK,
    blockdiag,
    lane_group,
    place_quarters,
    sum_diag_blocks,
    sum_lane_groups,
    tile_row,
)

def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _id_row(ref, c):
    """Row c % 8 of the (8, CHUNK) lane-packed id block as (1, CHUNK)."""
    return ref[pl.ds(c % 8, 1), :]


def _quarter_ohts(idrow, width: int, mm_dtype):
    """Per-quarter transposed one-hots [(width, Q)] from a (1, CHUNK) id row.

    Quarter k of the chunk occupies lanes [k*Q, (k+1)*Q) of the id row.
    Mosaic keeps a lane offset on sliced vregs (even vreg-aligned slices)
    and rejects broadcasting from it, so each quarter is rolled to lane
    offset 0 before slicing (same route as packing.unpack_tile).
    """
    from jax.experimental.pallas import tpu as pltpu

    chunk = idrow.shape[1]
    q = chunk // PACK
    iota = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0)
    out = []
    for k in range(PACK):
        r = pltpu.roll(idrow, chunk - k * q, 1) if k else idrow
        ids_k = r[:, 0:q]  # (1, Q) at lane offset 0
        out.append((ids_k == iota).astype(mm_dtype))
    return out


def _fwd_kernel(wb_ref, pids_ref, cids_ref, en_ref, *rest,
                W: int, Wc: int, D: int, mm_dtype, has_skip: bool, has_res: bool):
    i = 0
    skip2_ref = rest[i] if has_skip else None
    i += has_skip
    res_ref = rest[i] if has_res else None
    i += has_res
    we_ref, c0_ref = rest[i], rest[i + 1]
    i += 2
    wuv_ref = rest[i] if has_skip else None
    i += has_skip
    ps_ref, pv_ref, out_ref = rest[i], rest[i + 1], rest[i + 2]

    c = pl.program_id(0)
    wb = wb_ref[c]
    live = c < wb_ref[pl.num_programs(0)]  # dead-chunk skip

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live)
    def _compute():
        # lin_proj in packed space: (Q, PACK*De) @ blockdiag -> (Q, PACK*D).
        # Streams may be stored bf16 (packing.stream_dtype): upcast on
        # load, downcast on store; math stays f32.
        pe = jax.lax.dot_general(
            en_ref[:].astype(jnp.float32), we_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + c0_ref[:]
        if has_skip:
            pe2 = pe + jax.lax.dot_general(
                skip2_ref[:].astype(jnp.float32), wuv_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            pe2 = pe

        idrow_pt = _id_row(pids_ref, c) - wb * W
        idrow_cam = _id_row(cids_ref, c)
        ohts_pt = _quarter_ohts(idrow_pt, W, mm_dtype)
        ohts_cam = _quarter_ohts(idrow_cam, Wc, mm_dtype)
        quarters = []
        for k in range(PACK):
            g_k = jax.lax.dot_general(
                ohts_pt[k], ps_ref[:].astype(mm_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                ohts_cam[k], pv_ref[:].astype(mm_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Q, D)
            quarters.append(g_k)
        out = (pe2 + place_quarters(quarters)) * 0.25
        if has_res:
            out += res_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(wb_ref, pids_ref, cids_ref, en_ref, *rest,
                W: int, Wc: int, D: int, mm_dtype, has_skip: bool):
    i = 0
    skip2_ref = rest[i] if has_skip else None
    i += has_skip
    we_ref = rest[i]
    i += 1
    wuv_ref = rest[i] if has_skip else None
    i += has_skip
    g_ref = rest[i]
    i += 1
    den_ref = rest[i]
    i += 1
    dskip2_ref = rest[i] if has_skip else None
    i += has_skip
    dps_ref, dpv_ref, dwe_ref = rest[i], rest[i + 1], rest[i + 2]
    i += 3
    dwuv_ref = rest[i] if has_skip else None
    i += has_skip
    dsum_ref = rest[i]

    c = pl.program_id(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first_w)
    def _():
        dps_ref[:] = jnp.zeros_like(dps_ref)

    @pl.when(c == 0)
    def _():
        dpv_ref[:] = jnp.zeros_like(dpv_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        if has_skip:
            dwuv_ref[:] = jnp.zeros_like(dwuv_ref)
        dsum_ref[:] = jnp.zeros_like(dsum_ref)

    live = c < wb_ref[pl.num_programs(0)]  # dead-chunk skip

    @pl.when(jnp.logical_not(live))
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)
        if has_skip:
            dskip2_ref[:] = jnp.zeros_like(dskip2_ref)

    @pl.when(live)
    def _compute():
        g4 = g_ref[:].astype(jnp.float32) * 0.25  # (Q, PACK*D)
        den_ref[:] = jax.lax.dot_general(
            g4, we_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(den_ref.dtype)
        if has_skip:
            dskip2_ref[:] = jax.lax.dot_general(
                g4, wuv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dskip2_ref.dtype)
        # Weight grads accumulate block-diagonally; the wrapper contracts the
        # diagonal blocks (packing.sum_diag_blocks).
        dwe_ref[:] += jax.lax.dot_general(
            en_ref[:].astype(jnp.float32), g4,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_skip:
            dwuv_ref[:] += jax.lax.dot_general(
                skip2_ref[:].astype(jnp.float32), g4,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dsum_ref[0:1, :] += jnp.sum(g4, axis=0, keepdims=True)

        idrow_pt = _id_row(pids_ref, c) - wb * W
        idrow_cam = _id_row(cids_ref, c)
        ohts_pt = _quarter_ohts(idrow_pt, W, mm_dtype)
        ohts_cam = _quarter_ohts(idrow_cam, Wc, mm_dtype)
        for k in range(PACK):
            g4_k = lane_group(g4, k, D).astype(mm_dtype)  # (Q, D), offset-0 via roll
            dps_ref[:] += jax.lax.dot_general(
                ohts_pt[k], g4_k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpv_ref[:] += jax.lax.dot_general(
                ohts_cam[k], g4_k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _pad_ids(pids2d, cids2d):
    rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != rows8:
        pids2d = jnp.pad(pids2d, ((0, rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, rows8 - cids2d.shape[0]), (0, 0)))
    return pids2d, cids2d


@functools.partial(
    jax.jit,
    static_argnames=("W", "Wc", "D", "interpret", "mm", "has_skip", "has_res"),
)
def _fwd_raw(en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps_pad, pv_pad,
             pids2d, cids2d, wb, nlive, W, Wc, D, interpret, mm, has_skip,
             has_res):
    rows, pde = en_p.shape
    chunk = pids2d.shape[1]  # per-graph chunk
    q = chunk // PACK
    nchunks = rows // q
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    pids2d, cids2d = _pad_ids(pids2d, cids2d)
    pd_out = PACK * D

    def _stream(width):
        return pl.BlockSpec((q, width), lambda c, wb_ref: (c, 0),
                            memory_space=pltpu.VMEM)

    fixed = lambda c, wb_ref: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        _stream(pde),
    ]
    operands = [pids2d, cids2d, en_p]
    if has_skip:
        in_specs.append(_stream(skip2_p.shape[1]))
        operands.append(skip2_p)
    if has_res:
        in_specs.append(_stream(pd_out))
        operands.append(res_p)
    in_specs += [
        pl.BlockSpec((pde, pd_out), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pd_out), fixed, memory_space=pltpu.VMEM),
    ]
    operands += [we_bd, c0]
    if has_skip:
        in_specs.append(pl.BlockSpec((wuv_bd.shape[0], pd_out), fixed,
                                     memory_space=pltpu.VMEM))
        operands.append(wuv_bd)
    in_specs += [
        pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, D), fixed, memory_space=pltpu.VMEM),
    ]
    operands += [ps_pad, pv_pad]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=in_specs,
        out_specs=_stream(pd_out),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, Wc=Wc, D=D, mm_dtype=mm_dtype,
                          has_skip=has_skip, has_res=has_res),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, pd_out), en_p.dtype),
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), *operands)


@functools.partial(
    jax.jit,
    static_argnames=("W", "Wc", "D", "s_pad", "interpret", "mm", "has_skip"),
)
def _bwd_raw(g_p, en_p, skip2_p, we_bd, wuv_bd, pids2d, cids2d, wb, nlive,
             W, Wc, D, s_pad, interpret, mm, has_skip):
    rows, pde = en_p.shape
    chunk = pids2d.shape[1]  # per-graph chunk
    q = chunk // PACK
    nchunks = rows // q
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    pids2d, cids2d = _pad_ids(pids2d, cids2d)
    pd_out = PACK * D
    d2p = skip2_p.shape[1] if has_skip else 0

    def _stream(width):
        return pl.BlockSpec((q, width), lambda c, wb_ref: (c, 0),
                            memory_space=pltpu.VMEM)

    fixed = lambda c, wb_ref: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        _stream(pde),
    ]
    operands = [pids2d, cids2d, en_p]
    if has_skip:
        in_specs.append(_stream(d2p))
        operands.append(skip2_p)
    in_specs.append(pl.BlockSpec((pde, pd_out), fixed, memory_space=pltpu.VMEM))
    operands.append(we_bd)
    if has_skip:
        in_specs.append(pl.BlockSpec((d2p, pd_out), fixed, memory_space=pltpu.VMEM))
        operands.append(wuv_bd)
    in_specs.append(_stream(pd_out))
    operands.append(g_p)

    out_specs = [_stream(pde)]
    out_shapes = [jax.ShapeDtypeStruct((rows, pde), en_p.dtype)]
    if has_skip:
        out_specs.append(_stream(d2p))
        out_shapes.append(jax.ShapeDtypeStruct((rows, d2p), skip2_p.dtype))
    out_specs += [
        pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, D), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((pde, pd_out), fixed, memory_space=pltpu.VMEM),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((s_pad, D), jnp.float32),
        jax.ShapeDtypeStruct((Wc, D), jnp.float32),
        jax.ShapeDtypeStruct((pde, pd_out), jnp.float32),
    ]
    if has_skip:
        out_specs.append(pl.BlockSpec((d2p, pd_out), fixed, memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((d2p, pd_out), jnp.float32))
    out_specs.append(pl.BlockSpec((8, pd_out), fixed, memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((8, pd_out), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, Wc=Wc, D=D, mm_dtype=mm_dtype,
                          has_skip=has_skip),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), *operands)


def make_packed_proj_update(has_skip: bool, has_res: bool, mm: str):
    """Custom-VJP packed projection update, specialized statically.

    Differentiable in (en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg).
    When has_skip/has_res are False the corresponding arguments are ignored
    (pass None) and their cotangents return as None.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
    def update(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
               pids2d, cids2d, wb, nlive, num_pts, num_cams, W, interpret):
        out, _ = _run(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
                      pids2d, cids2d, wb, nlive, num_pts, num_cams, W,
                      interpret)
        return out

    def _run(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
             pids2d, cids2d, wb, nlive, num_pts, num_cams, W, interpret):
        D = w_e.shape[1]
        s_pad = _round_up(num_pts, W)
        Wc = _round_up(max(num_cams, 1), 128)
        ps_pad = ps if ps.shape[0] == s_pad else jnp.pad(
            ps, ((0, s_pad - ps.shape[0]), (0, 0)))
        pv_pad = pv if pv.shape[0] == Wc else jnp.pad(
            pv, ((0, Wc - pv.shape[0]), (0, 0)))
        we_bd = blockdiag(w_e)
        # Per-edge constants fold together: bias + global row (their
        # cotangents are both the edge-sum of g/4, emitted once as dsum).
        c0 = tile_row(b.reshape(1, D) + pg.reshape(1, D))
        wuv_bd = blockdiag(w_uv) if has_skip else None
        out = _fwd_raw(en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps_pad, pv_pad,
                       pids2d, cids2d, wb, nlive, W, Wc, D, interpret, mm,
                       has_skip, has_res)
        res = (en_p, skip2_p, w_e, w_uv, pids2d, cids2d, wb, nlive)
        return out, res

    def _fwd(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
             pids2d, cids2d, wb, nlive, num_pts, num_cams, W, interpret):
        return _run(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
                    pids2d, cids2d, wb, nlive, num_pts, num_cams, W,
                    interpret)

    def _bwd(num_pts, num_cams, W, interpret, res, g):
        en_p, skip2_p, w_e, w_uv, pids2d, cids2d, wb, nlive = res
        D = w_e.shape[1]
        s_pad = _round_up(num_pts, W)
        Wc = _round_up(max(num_cams, 1), 128)
        we_bd = blockdiag(w_e)
        wuv_bd = blockdiag(w_uv) if has_skip else None
        outs = _bwd_raw(g, en_p, skip2_p, we_bd, wuv_bd, pids2d, cids2d, wb,
                        nlive, W, Wc, D, s_pad, interpret, mm, has_skip)
        i = 0
        den_p = outs[i]
        i += 1
        dskip2_p = outs[i] if has_skip else None
        i += has_skip
        dps_full, dpv_full, dwe_bd = outs[i], outs[i + 1], outs[i + 2]
        i += 3
        dwuv_bd = outs[i] if has_skip else None
        i += has_skip
        dsum8 = outs[i]

        De = en_p.shape[1] // PACK
        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        dps_full = jnp.where(jnp.repeat(visited, W)[:, None], dps_full, 0.0)
        dsum = sum_lane_groups(dsum8[0:1], D)  # (1, D): d(bias) == d(pg)
        dw_e = sum_diag_blocks(dwe_bd, De, D)
        dw_uv = (
            sum_diag_blocks(dwuv_bd, skip2_p.shape[1] // PACK, D)
            if has_skip else None
        )
        return (
            den_p,
            dskip2_p,
            g if has_res else None,
            dw_e,
            dsum.reshape(-1),
            dw_uv,
            dps_full[:num_pts],
            dpv_full[:num_cams],
            dsum,
            None, None, None, None,
        )

    update.defvjp(_fwd, _bwd)
    return update


_CACHE = {}


def packed_edge_update(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
                       pids2d, cids2d, wb, num_pts, num_cams, W,
                       interpret=False, nlive=None):
    """Dispatch: ``((en@w_e [+ skip2@w_uv] + b) + ps[pt] + pv[cam] + pg)/4
    [+ res]`` over lane-packed edge streams.

    en_p: (E/PACK, PACK*De); skip2_p: (E/PACK, PACK*D2) or None;
    res_p: (E/PACK, PACK*D) residual stream or None; w_e: (De, D); b: (D,);
    w_uv: (D2, D) or None; ps: (num_pts, D); pv: (num_cams, D); pg: (1, D).
    Ids as in the other packed kernels (lane-packed rows; masked edges carry
    out-of-window point ids and the camera trash id).
    """
    from gasfm_tpu.ops.segment import get_kernel_precision

    key = (skip2_p is not None, res_p is not None, get_kernel_precision())
    fn = _CACHE.get(key)
    if fn is None:
        fn = make_packed_proj_update(*key)
        _CACHE[key] = fn
    if nlive is None:
        nlive = jnp.asarray(wb.shape[0], dtype=jnp.int32)
    return fn(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
              pids2d, cids2d, wb, nlive, num_pts, num_cams, W, interpret)
