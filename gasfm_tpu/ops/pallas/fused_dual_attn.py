"""Dual-direction fused GATv2 segment attention: ONE Pallas kernel per
forward/backward computing BOTH per-layer aggregations — edges->points
(windowed over the blocked point-major layout) and edges->cameras (dense
one-hot over the small camera table) — in a single grid sweep over edges.

Motivation: each direction alone uses D = n_feat_proj ~ 32 of the 128 VPU
lanes and pays the full per-chunk fixed cost (id decode, one-hot build,
grid/DMA overhead) twice. The two directions share the chunk sweep and the
head-space machinery: heads 0..Hp-1 are point-side, Hp..Hp+Hc-1 camera-side,
and the (CHUNK, HP) logits/max/exp/softmax arrays are computed once for all
heads. Everything lane-shaped stays PER-DIRECTION — inputs, outputs and
cotangents keep their natural (., Dp) / (., Dc) shapes at the HBM boundary,
so the wrapper adds NO packing concats/slices/pads on E-sized or
table-sized arrays (measured: packing at the boundary cost more XLA glue
than the fused kernel saved).

Math per direction is identical to gasfm_tpu/ops/pallas/fused_attn.py
(online softmax with a per-head per-chunk max shift — exact, since any
per-segment-constant shift cancels between numerator and denominator; the
shift gradient is exactly zero by softmax shift invariance, matching the
stop_gradient convention of gasfm_tpu/ops/segment.py). Semantics parity
target: two calls of gasfm_tpu/ops/gatv2.gatv2_attend (itself matching PyG
GATv2Conv on the reference's star graphs, code/models/layers.py:266-458).

Conventions:
- Point ids: blocked point-major (every aligned CHUNK of edges draws its
  point ids from one WINDOW-wide id window, scalar-prefetched block per
  chunk, non-decreasing). Masked/padding edges carry a point id outside
  every window.
- Camera ids: unsorted, dense table of width Wc = round_up(n_cams+1, 128);
  masked/padding edges carry the trash id n_cams (its row is sliced off).
- Padding edges hold arbitrary finite features; they are excluded from the
  chunk max via the point-window membership test (padding edges are exactly
  the out-of-window ones in this layout), and their p <= 1 lands either on
  a zero one-hot row (point side) or the trash row (camera side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gasfm_tpu.ops.pallas.fused_attn import (
    combine_attention_shards,
    exchange_boundary_add,
    exchange_boundary_windows,
)
from gasfm_tpu.ops.pallas.packing import PACK, repack_tile, unpack_tile

_NEG = -1e30


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _wb_with_nlive(wb, nlive):
    """Append the live-chunk count to the scalar-prefetch wb array (kernels
    read it as wb_ref[num_programs]; index maps never reach it). In the
    blocked layout all-padding chunks form a strict suffix, so kernels skip
    the compute of chunks c >= nlive entirely (identical outputs: dead
    edges' ids are out of every window / on the camera trash row, so their
    contribution is exactly zero). nlive=None marks every chunk live."""
    if nlive is None:
        nlive = jnp.asarray(wb.shape[0], dtype=jnp.int32)
    return jnp.concatenate([wb, nlive.astype(jnp.int32).reshape(1)])


def _id_row(ref, c):
    """Row c % 8 of the (8, CHUNK) lane-packed id block as (1, CHUNK).

    TPU block shapes need sublane-divisible leading dims, so the id rows are
    blocked 8 at a time (index c // 8 — Mosaic re-fetches only when the
    block index changes, i.e. once per 8 chunks). Ref-level pl.ds indexing:
    value-level dynamic_slice is not lowered by Pallas TPU."""
    return ref[pl.ds(c % 8, 1), :]


def _dir_selector(H: int, C: int, HP: int, head0: int) -> np.ndarray:
    """(H*C, HP) 0/1 matrix: lane -> head column ``head0 + h``."""
    s = np.zeros((H * C, HP), dtype=np.float32)
    for h in range(H):
        s[h * C : (h + 1) * C, head0 + h] = 1.0
    return s


def _head_masks(Hp: int, Hc: int, HP: int):
    mp = np.zeros((1, HP), np.float32)
    mp[0, :Hp] = 1.0
    mc = np.zeros((1, HP), np.float32)
    mc[0, Hp : Hp + Hc] = 1.0
    return mp, mc


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _dual_fwd_kernel(
    wb_ref, pids_ref, cids_ref, xlp_ref, xlc_ref, xrp_ref, xrc_ref,
    attp_ref, attc_ref, sselp_ref, sselc_ref, hm_ref,
    outp_ref, outc_ref, mdp_ref, mdc_ref, mrun_scr,
    *, W: int, Wc: int, HP: int, slope: float, finalize: bool = True,
    mm_dtype=jnp.float32,
):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    last_w = jnp.logical_or(c == nc - 1, wb_ref[jnp.minimum(c + 1, nc - 1)] != wb)

    @pl.when(c == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdc_ref.shape, 0)
        mdc_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        mrun_scr[:] = jnp.full_like(mrun_scr, _NEG)

    @pl.when(first_w)
    def _():
        outp_ref[:] = jnp.zeros_like(outp_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdp_ref.shape, 0)
        mdp_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        # Point-head columns of the running shift reset per window; camera
        # columns persist across the whole sweep.
        mrun_scr[0:1, :] = jnp.where(hm_ref[0:1, :] > 0, _NEG, mrun_scr[0:1, :])

    live = c < wb_ref[nc]  # dead-chunk skip (see _wb_with_nlive)

    @pl.when(live)
    def _compute():
        # Ids arrive as ONE lane-packed (1, CHUNK) row per chunk — the (E, 1)
        # column form is physically padded to 128 lanes by the T(8,128) HBM
        # tiling and its DMA alone cost ~0.3 us/chunk per id stream (BENCHLOG
        # section 8). The one-hot is built TRANSPOSED, (W, CHUNK): every
        # contraction works from ohT directly, and the per-edge in-window
        # column is recovered with one narrow MXU pass.
        local_row = _id_row(pids_ref, c) - wb * W  # (1, CHUNK)
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        match_p = local_row == seg_iota
        ohT_p = match_p.astype(jnp.float32)  # (W, CHUNK)
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        match_c = _id_row(cids_ref, c) == cam_iota
        ohT_c = match_c.astype(jnp.float32)  # (Wc, CHUNK)
        # Big one-hot matmuls optionally run with bf16 operands (one-hot exact,
        # features rounded) and f32 accumulation — f32 matmuls run at a fraction
        # of the MXU's native bf16 rate on v5e. Small matmuls stay f32.
        ohT_p_mm = match_p.astype(mm_dtype)
        ohT_c_mm = match_c.astype(mm_dtype)

        xlp = xlp_ref[:]  # (CHUNK, Dp)
        xlc = xlc_ref[:]  # (CHUNK, Dc)
        z_p = xlp + jax.lax.dot_general(
            ohT_p_mm, xrp_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z_c = xlc + jax.lax.dot_general(
            ohT_c_mm, xrc_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gz_p = jnp.where(z_p >= 0, z_p, slope * z_p)
        gz_c = jnp.where(z_c >= 0, z_c, slope * z_c)
        # Shared head-space logits: point heads in columns 0..Hp-1, camera heads
        # in Hp..Hp+Hc-1 (each selector writes its own columns; sum merges).
        logits = jax.lax.dot_general(
            gz_p * attp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            gz_c * attc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, HP)

        # Chunk-max shift shared by both directions; padding edges (exactly the
        # out-of-window point ids in this layout) are masked out of the max.
        # inwin as a (CHUNK, 1) column via one narrow MXU pass over ohT.
        inwin = jax.lax.dot_general(
            ohT_p, jnp.ones((W, 1), jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) > 0.5  # (CHUNK, 1)
        m_vec = jnp.max(jnp.where(inwin, logits, _NEG), axis=0, keepdims=True)  # (1, HP)

        # WINDOW-constant shift: softmax is shift-invariant per segment, and a
        # per-(head, window) scalar shift (running window max; camera columns run
        # globally) is segment-constant for every segment it covers — exact, and
        # an order of magnitude cheaper than per-segment online-max corrections:
        # when the running max rises, the accumulators rescale by per-HEAD
        # scalars (two narrow ssel expansions + broadcasts) instead of
        # (HP, W)-shaped exp/matmul corrections, and new contributions need no
        # correction at all (p is computed at the post-update running shift, so
        # p <= 1 for valid edges; the min clamp only binds for padding edges).
        m_old = mrun_scr[0:1, :]  # (1, HP)
        m_new = jnp.maximum(m_old, m_vec)
        scale_row = jnp.exp(m_old - m_new)  # (1, HP), == 1 when max unchanged
        mrun_scr[0:1, :] = m_new
        p = jnp.exp(jnp.minimum(logits - m_new, 0.0))  # (CHUNK, HP)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (HP, HP), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (HP, HP), 1)
        ).astype(jnp.float32)
        scale_col = jax.lax.dot_general(
            eye, scale_row, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HP, 1)
        m_col = jax.lax.dot_general(
            eye, m_new, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HP, 1)

        p_dp = jax.lax.dot_general(
            p, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, Dp)
        p_dc = jax.lax.dot_general(
            p, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, Dc)

        scale_p_d = jax.lax.dot_general(
            scale_row, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Dp)
        scale_c_d = jax.lax.dot_general(
            scale_row, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Dc)
        outp_ref[:] = outp_ref[:] * scale_p_d + jax.lax.dot_general(
            ohT_p_mm, (p_dp * xlp).astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outc_ref[:] = outc_ref[:] * scale_c_d + jax.lax.dot_general(
            ohT_c_mm, (p_dc * xlc).astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        mdp_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, W))
        mdp_ref[HP : 2 * HP, :] = mdp_ref[HP : 2 * HP, :] * scale_col + jax.lax.dot_general(
            p, ohT_p, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mdc_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, Wc))
        mdc_ref[HP : 2 * HP, :] = mdc_ref[HP : 2 * HP, :] * scale_col + jax.lax.dot_general(
            p, ohT_c, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if finalize:
        @pl.when(last_w)
        def _():
            den = mdp_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, sselp_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outp_ref[:] = outp_ref[:] * inv_wd

        @pl.when(c == nc - 1)
        def _():
            den = mdc_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, sselc_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outc_ref[:] = outc_ref[:] * inv_wd


@functools.partial(jax.jit, static_argnames=("W", "Wc", "Hp", "Hc", "slope", "interpret",
                                             "finalize", "mm"))
def _dual_fwd_raw(xlp, xlc, xrp, xrc, attp, attc, pids2d, cids2d, wb, nlive,
                  W, Wc, Hp, Hc, slope, interpret=False, finalize=True, mm="f32"):
    E, Dp = xlp.shape
    Dc = xlc.shape[1]
    chunk = pids2d.shape[1]  # per-graph chunk (id rows are (E/chunk, chunk))
    assert E % chunk == 0 and Dp % Hp == 0 and Dc % Hc == 0
    HP = _round_up(Hp + Hc, 8)
    s_pad = xrp.shape[0]
    assert s_pad % W == 0 and xrc.shape[0] == Wc
    sselp = jnp.asarray(_dir_selector(Hp, Dp // Hp, HP, 0))
    sselc = jnp.asarray(_dir_selector(Hc, Dc // Hc, HP, Hp))
    hm = jnp.asarray(np.concatenate(_head_masks(Hp, Hc, HP), axis=0))

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
            pl.BlockSpec((chunk, Dp), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, Dc), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, W), lambda c, wb_ref: (0, wb_ref[c]), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, Wc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, HP), jnp.float32)],
    )
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    outp, outc, mdp, mdc = pl.pallas_call(
        functools.partial(_dual_fwd_kernel, W=W, Wc=Wc, HP=HP, slope=slope,
                          finalize=finalize, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, Wc), jnp.float32),
        ],
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), pids2d, cids2d, xlp, xlc, xrp, xrc, attp,
      attc, sselp, sselc, hm)
    return outp, outc, mdp, mdc


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dual_bwd_kernel(
    wb_ref, pids_ref, cids_ref, xlp_ref, xlc_ref, xrp_ref, xrc_ref,
    attp_ref, attc_ref, sselp_ref, sselc_ref, hm_ref,
    mdtp_ref, mdtc_ref, mwinp_ref, mcam_ref, outp_ref, outc_ref, gp_ref, gc_ref,
    dxlp_ref, dxlc_ref, dxrp_ref, dxrc_ref, dattp_ref, dattc_ref,
    packp_scr, packc_scr,
    *, W: int, Wc: int, HP: int, slope: float, mm_dtype=jnp.float32,
):
    # The per-edge gathers of each direction (query xr, dnum, dden) are
    # PACKED into one (CHUNK, W) x (W, 2D+HP) MXU pass: each one-hot matmul
    # costs a full 128-lane pass regardless of operand width, so packing
    # collapses the dominant backward cost. The packed operand is per-window
    # constant and built once per window into a scratch; `mdT` arrives
    # pre-transposed (s_pad, 2HP) from the wrapper. The softmax shift is
    # WINDOW-constant (see _dual_fwd_kernel), so it needs no per-edge
    # gather at all — it arrives as one (1, HP) row per window/table
    # (mwinp point side, mcam camera side).
    Dp = xlp_ref.shape[1]
    Dc = xlc_ref.shape[1]
    c = pl.program_id(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(c == 0)
    def _():
        dattp_ref[:] = jnp.zeros_like(dattp_ref)
        dattc_ref[:] = jnp.zeros_like(dattc_ref)
        dxrc_ref[:] = jnp.zeros_like(dxrc_ref)
        den = mdtc_ref[:, HP : 2 * HP]  # (Wc, HP)
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
        inv_wd = jax.lax.dot_general(
            inv, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Wc, Dc)
        g = gc_ref[:]
        go = jax.lax.dot_general(
            g * outc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Wc, HP)
        packc_scr[:, 0:Dc] = xrc_ref[:]
        packc_scr[:, Dc : 2 * Dc] = g * inv_wd
        packc_scr[:, 2 * Dc : 2 * Dc + HP] = -go * inv

    @pl.when(first_w)
    def _():
        dxrp_ref[:] = jnp.zeros_like(dxrp_ref)
        den = mdtp_ref[:, HP : 2 * HP]  # (W, HP)
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
        inv_wd = jax.lax.dot_general(
            inv, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, Dp)
        g = gp_ref[:]
        go = jax.lax.dot_general(
            g * outp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, HP)
        packp_scr[:, 0:Dp] = xrp_ref[:]
        packp_scr[:, Dp : 2 * Dp] = g * inv_wd
        packp_scr[:, 2 * Dp : 2 * Dp + HP] = -go * inv

    live = c < wb_ref[pl.num_programs(0)]  # dead-chunk skip

    @pl.when(jnp.logical_not(live))
    def _():
        dxlp_ref[:] = jnp.zeros_like(dxlp_ref)
        dxlc_ref[:] = jnp.zeros_like(dxlc_ref)

    @pl.when(live)
    def _compute():
        local_row = _id_row(pids_ref, c) - wb * W  # (1, CHUNK) lane-packed id row
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        match_p = local_row == seg_iota
        ohT_p = match_p.astype(jnp.float32)
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        match_c = _id_row(cids_ref, c) == cam_iota
        ohT_c = match_c.astype(jnp.float32)
        ohT_p_mm = match_p.astype(mm_dtype)
        ohT_c_mm = match_c.astype(mm_dtype)

        xlp = xlp_ref[:]
        xlc = xlc_ref[:]
        gep = jax.lax.dot_general(
            ohT_p_mm, packp_scr[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gec = jax.lax.dot_general(
            ohT_c_mm, packc_scr[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z_p = xlp + gep[:, 0:Dp]
        z_c = xlc + gec[:, 0:Dc]
        dnum_e_p = gep[:, Dp : 2 * Dp]
        dnum_e_c = gec[:, Dc : 2 * Dc]
        hm = hm_ref[:]
        dden_e = (gep[:, 2 * Dp : 2 * Dp + HP] * hm[0:1, :]
                  + gec[:, 2 * Dc : 2 * Dc + HP] * hm[1:2, :])
        # Window-constant shift rows (f32 always — exp amplifies max rounding).
        m_e = (mwinp_ref[pl.ds(wb % 8, 1), :] * hm[0:1, :]
               + mcam_ref[0:1, :] * hm[1:2, :])  # (1, HP), broadcasts over CHUNK

        gz_p = jnp.where(z_p >= 0, z_p, slope * z_p)
        gz_c = jnp.where(z_c >= 0, z_c, slope * z_c)
        logits = jax.lax.dot_general(
            gz_p * attp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            gz_c * attc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(jnp.minimum(logits - m_e, 0.0))

        dl = p * (
            jax.lax.dot_general(
                xlp * dnum_e_p, sselp_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xlc * dnum_e_c, sselc_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + dden_e
        )  # (CHUNK, HP)
        dl_dp = jax.lax.dot_general(
            dl, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, Dp)
        dl_dc = jax.lax.dot_general(
            dl, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, Dc)
        dz_p = dl_dp * attp_ref[:] * jnp.where(z_p >= 0, 1.0, slope)
        dz_c = dl_dc * attc_ref[:] * jnp.where(z_c >= 0, 1.0, slope)
        p_dp = jax.lax.dot_general(
            p, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_dc = jax.lax.dot_general(
            p, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dxlp_ref[:] = p_dp * dnum_e_p + dz_p
        dxlc_ref[:] = p_dc * dnum_e_c + dz_c
        dxrp_ref[:] += jax.lax.dot_general(
            ohT_p_mm, dz_p.astype(mm_dtype), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxrc_ref[:] += jax.lax.dot_general(
            ohT_c_mm, dz_c.astype(mm_dtype), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dattp_ref[0:1, :] += jnp.sum(dl_dp * gz_p, axis=0, keepdims=True)
        dattc_ref[0:1, :] += jnp.sum(dl_dc * gz_c, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("W", "Wc", "Hp", "Hc", "slope", "interpret",
                                             "mm"))
def _dual_bwd_raw(xlp, xlc, xrp, xrc, attp, attc, pids2d, cids2d, wb, nlive,
                  mdp, mdc, outp, outc, gp, gc, W, Wc, Hp, Hc, slope,
                  interpret=False, mm="f32"):
    E, Dp = xlp.shape
    chunk = pids2d.shape[1]  # per-graph chunk
    Dc = xlc.shape[1]
    HP = _round_up(Hp + Hc, 8)
    s_pad = xrp.shape[0]
    sselp = jnp.asarray(_dir_selector(Hp, Dp // Hp, HP, 0))
    sselc = jnp.asarray(_dir_selector(Hc, Dc // Hc, HP, Hp))
    hm = jnp.asarray(np.concatenate(_head_masks(Hp, Hc, HP), axis=0))
    # Pre-transposed (segments, 2*HP) max/den tables: the kernel's packed
    # per-window gather operand wants segment-major rows.
    mdtp = mdp.T
    mdtc = mdc.T
    # Window-constant softmax shifts (one (1, HP) row per point window /
    # one for the camera table), extracted from the max rows of md — they
    # are column-constant within each window by construction.
    n_blocks = s_pad // W
    mwinp = mdp[0:HP, ::W].T  # (n_blocks, HP)
    mwinp = jnp.pad(mwinp, ((0, _round_up(n_blocks, 8) - n_blocks), (0, 0)))
    mcam = jnp.pad(mdc[0:HP, 0:1].T, ((0, 7), (0, 0)))  # (8, HP), row 0 valid

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
            pl.BlockSpec((chunk, Dp), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, Dc), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2 * HP), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, 2 * HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, HP), lambda c, wb_ref: (wb_ref[c] // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, Dp), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, Dc), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Dp), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Dc), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, 2 * Dp + HP), jnp.float32),
            pltpu.VMEM((Wc, 2 * Dc + HP), jnp.float32),
        ],
    )
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    dxlp, dxlc, dxrp, dxrc, dattp8, dattc8 = pl.pallas_call(
        functools.partial(_dual_bwd_kernel, W=W, Wc=Wc, HP=HP, slope=slope,
                          mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E, Dp), jnp.float32),
            jax.ShapeDtypeStruct((E, Dc), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
            jax.ShapeDtypeStruct((8, Dp), jnp.float32),
            jax.ShapeDtypeStruct((8, Dc), jnp.float32),
        ],
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), pids2d, cids2d, xlp, xlc, xrp, xrc, attp,
      attc, sselp, sselc, hm, mdtp, mdtc, mwinp, mcam, outp, outc, gp, gc)
    return dxlp, dxlc, dxrp, dxrc, dattp8, dattc8


# ---------------------------------------------------------------------------
# differentiable public wrapper
# ---------------------------------------------------------------------------


def make_fused_dual_attend(Hp: int, Hc: int, mm: str = "f32",
                           table_sharded: bool = False):
    """Custom-VJP dual attention for (Hp point heads, Hc camera heads).

    ``edge_axis``: mesh axis name under edge partitioning (None single-shard).
    With an axis, the local kernel runs unfinalized and both directions'
    (num, m, den) triples combine across shards via pmax/psum over ICI
    (fused_attn.combine_attention_shards); the backward kernel needs no
    change — fed global (m, den, out), each shard emits its exact local
    cotangent contribution."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
    def attend(xl_p, xl_c, xr_p, xr_c, att_p, att_c, pids2d, cids2d, wb, nlive,
               n_pts, n_cams, W, Wc, slope, interpret, edge_axis):
        (op, oc), _ = _run_fwd(xl_p, xl_c, xr_p, xr_c, att_p, att_c, pids2d,
                               cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
                               interpret, edge_axis)
        return op, oc

    def _run_fwd(xl_p, xl_c, xr_p, xr_c, att_p, att_c, pids2d, cids2d, wb,
                 nlive, n_pts, n_cams, W, Wc, slope, interpret, edge_axis):
        s_pad = _round_up(n_pts, W)
        xr_p_pad = xr_p if xr_p.shape[0] == s_pad else jnp.pad(
            xr_p, ((0, s_pad - xr_p.shape[0]), (0, 0))
        )
        xr_c_pad = xr_c if xr_c.shape[0] == Wc else jnp.pad(
            xr_c, ((0, Wc - xr_c.shape[0]), (0, 0))
        )
        outp, outc, mdp, mdc = _dual_fwd_raw(
            xl_p, xl_c, xr_p_pad, xr_c_pad, att_p, att_c, pids2d, cids2d, wb,
            nlive, W, Wc, Hp, Hc, slope, interpret=interpret,
            finalize=edge_axis is None, mm=mm,
        )
        if edge_axis is not None:
            HP = _round_up(Hp + Hc, 8)
            if table_sharded:
                # Sub-linear boundary exchange for the point direction
                # (camera tables below stay fully combined — they are small
                # and every shard's edges touch them).
                outp, mdp = exchange_boundary_windows(
                    outp, mdp, HP, Hp, xl_p.shape[1] // Hp, edge_axis, wb, W
                )
            else:
                outp, mdp = combine_attention_shards(
                    outp, mdp, HP, Hp, xl_p.shape[1] // Hp, edge_axis, wb=wb, W=W
                )
            # Camera heads live in md columns Hp..Hp+Hc-1; roll them to the
            # front so the combiner's [:H] slice picks the right rows.
            mdc_r = jnp.concatenate([
                mdc[Hp : Hp + Hc], mdc[HP + Hp : HP + Hp + Hc]
            ], axis=0)
            outc, mdc_g = combine_attention_shards(
                outc, mdc_r, Hc, Hc, xl_c.shape[1] // Hc, edge_axis
            )
            # Rebuild the (2*HP, Wc) layout the backward kernel expects.
            mdc = jnp.zeros_like(mdc)
            mdc = mdc.at[Hp : Hp + Hc].set(mdc_g[:Hc])
            mdc = mdc.at[HP + Hp : HP + Hp + Hc].set(mdc_g[Hc : 2 * Hc])
        res = (xl_p, xl_c, xr_p_pad, xr_c_pad, att_p, att_c, pids2d, cids2d,
               wb, nlive, outp, outc, mdp, mdc)
        return (outp[:n_pts], outc[:n_cams]), res

    def _fwd(xl_p, xl_c, xr_p, xr_c, att_p, att_c, pids2d, cids2d, wb, nlive,
             n_pts, n_cams, W, Wc, slope, interpret, edge_axis):
        out, res = _run_fwd(xl_p, xl_c, xr_p, xr_c, att_p, att_c, pids2d,
                            cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
                            interpret, edge_axis)
        return out, res

    def _bwd(n_pts, n_cams, W, Wc, slope, interpret, edge_axis, res, g):
        gp_out, gc_out = g
        (xl_p, xl_c, xr_p_pad, xr_c_pad, att_p, att_c, pids2d, cids2d, wb,
         nlive, outp, outc, mdp, mdc) = res
        s_pad = xr_p_pad.shape[0]
        gp = gp_out if gp_out.shape[0] == s_pad else jnp.pad(
            gp_out, ((0, s_pad - gp_out.shape[0]), (0, 0))
        )
        if edge_axis is not None:
            # Interior transpose rule (ops/segment.py): the output tables
            # are consumed by downstream edges, so the per-shard partial
            # cotangents must be completed before computing edge-side
            # cotangents. Table-sharded: only the two neighbors touch my
            # windows, so a boundary exchange replaces the full-table psum.
            if table_sharded:
                gp = exchange_boundary_add(gp, edge_axis, wb, W)
            else:
                gp = jax.lax.psum(gp, edge_axis)
            gc_out = jax.lax.psum(gc_out, edge_axis)
        gc = gc_out if gc_out.shape[0] == Wc else jnp.pad(
            gc_out, ((0, Wc - gc_out.shape[0]), (0, 0))
        )
        dxlp, dxlc, dxrp_full, dxrc_full, dattp8, dattc8 = _dual_bwd_raw(
            xl_p, xl_c, xr_p_pad, xr_c_pad, att_p, att_c, pids2d, cids2d, wb,
            nlive, mdp, mdc, outp, outc, gp, gc, W, Wc, Hp, Hc, slope,
            interpret=interpret, mm=mm,
        )
        # Unvisited point window blocks are never written (uninitialized).
        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        dxrp_full = jnp.where(jnp.repeat(visited, W)[:, None], dxrp_full, 0.0)
        return (
            dxlp, dxlc,
            dxrp_full[:n_pts], dxrc_full[:n_cams],
            dattp8[0:1], dattc8[0:1],
            None, None, None, None,
        )

    attend.defvjp(_fwd, _bwd)
    return attend


_DUAL_CACHE = {}


def fused_dual_attend(Hp, Hc, xl_p, xl_c, xr_p, xr_c, att_p, att_c,
                      pids2d, cids2d, wb, n_pts, n_cams, W, Wc,
                      slope=0.2, interpret=False, edge_axis=None, nlive=None):
    """Dual fused segment attention specialized per head counts.

    xl_p: (E, Dp) point-side source-transformed edge features (head-major).
    xl_c: (E, Dc) camera-side source-transformed edge features.
    xr_p: (n_pts, Dp), xr_c: (n_cams, Dc) per-segment query transforms.
    att_p: (1, Dp), att_c: (1, Dc) flat attention vectors.
    pids2d/cids2d: (E // CHUNK, CHUNK) int32 ids, one lane-packed row per
        chunk (the (E, 1) column form is 128x padded by HBM tiling); masked
        edges must carry an out-of-window point id and the camera trash id
        ``n_cams``.
    wb: (E // CHUNK,) non-decreasing point window-block per chunk.
    W: point window width; Wc: camera table width, a multiple of 128 with
        Wc >= n_cams + 1 (trash row sliced off).
    Returns (out_pt (n_pts, Dp), out_cam (n_cams, Dc)).
    """
    from gasfm_tpu.ops.segment import get_kernel_precision

    from gasfm_tpu.ops.segment import is_table_sharded

    key = (Hp, Hc, get_kernel_precision(), is_table_sharded())
    fn = _DUAL_CACHE.get(key)
    if fn is None:
        fn = make_fused_dual_attend(*key)
        _DUAL_CACHE[key] = fn
    if nlive is None:
        nlive = jnp.asarray(wb.shape[0], dtype=jnp.int32)
    return fn(xl_p, xl_c, xr_p, xr_c, att_p, att_c, pids2d, cids2d, wb,
              nlive, n_pts, n_cams, W, Wc, slope, interpret, edge_axis)


# ---------------------------------------------------------------------------
# Fused layer frontend: LayerNorm + ReLU + both source transforms + dual
# attention in ONE kernel per forward/backward.
#
# Per GASFM layer the edge stream is LN'd (over the feature dim), ReLU'd,
# then linearly transformed twice (point-side / camera-side GATv2 source
# maps) before the aggregations — in XLA that is 3+ full HBM traversals of
# the (E, De) stream forward and more backward, plus the LN reductions that
# use only De of the 128 lanes (~75 GB/s measured). Here the whole prologue
# runs in VMEM per chunk (LN stats are lane reductions; the transforms are
# (CHUNK, De) @ (De, D) MXU matmuls) and the normalized features are written
# out ONCE for the downstream edge update. Backward recomputes the prologue
# per chunk and emits d_e plus all parameter cotangents (LN scale/bias,
# source kernels/biases, attention vectors) as grid-accumulated outputs.
# ---------------------------------------------------------------------------


def _front_fwd_kernel(
    wb_ref, pids_ref, cids_ref, e_ref, lng_ref, lnb_ref,
    wlp_ref, blp_ref, wlc_ref, blc_ref, xrp_ref, xrc_ref,
    attp_ref, attc_ref, sselp_ref, sselc_ref, hm_ref,
    en_ref, outp_ref, outc_ref, mdp_ref, mdc_ref, mrun_scr,
    *, W: int, Wc: int, HP: int, slope: float, eps: float, finalize: bool = True,
    mm_dtype=jnp.float32, packed: bool = False, raw_prologue: bool = False,
):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    last_w = jnp.logical_or(c == nc - 1, wb_ref[jnp.minimum(c + 1, nc - 1)] != wb)

    @pl.when(c == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdc_ref.shape, 0)
        mdc_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        mrun_scr[:] = jnp.full_like(mrun_scr, _NEG)

    @pl.when(first_w)
    def _():
        outp_ref[:] = jnp.zeros_like(outp_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdp_ref.shape, 0)
        mdp_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        # Point columns of the running window shift reset per window; camera
        # columns persist (see _dual_fwd_kernel).
        mrun_scr[0:1, :] = jnp.where(hm_ref[0:1, :] > 0, _NEG, mrun_scr[0:1, :])

    live = c < wb_ref[nc]  # dead-chunk skip

    @pl.when(jnp.logical_not(live))
    def _():
        en_ref[:] = jnp.zeros_like(en_ref)

    @pl.when(live)
    def _compute():
        # ---- prologue: LN (flax semantics) + ReLU + the two source transforms.
        # Packed mode: the raw edge stream arrives as a lane-packed
        # (CHUNK/4, 4*De) tile (4 edges per row — see ops/pallas/packing.py) and
        # the normalized stream is written back packed; the unpack/repack costs
        # ~0.12 us/chunk vs the 4x DMA the padded (CHUNK, De) form pays.
        # Streams may be stored bf16 (packing.stream_dtype): upcast on
        # load, downcast on store; math stays f32.
        e = (unpack_tile(e_ref[:].astype(jnp.float32)) if packed
             else e_ref[:].astype(jnp.float32))  # (CHUNK, De)
        if raw_prologue:
            # No LN / ReLU: the source transforms consume the raw stream —
            # the final-aggregation semantics (AxialAttentionAggregator
            # .prepare, reference layers.py:723-870 final global update).
            en = e
            en_ref[:] = e_ref[:]
        else:
            # LN lane means as (De, De) all-ones/De MXU passes — reduction
            # plus lane broadcast in one cheap matmul (round-4 ablation,
            # scripts/merged_ablate.py: the largest single fwd-kernel item).
            ones_dd = jnp.full((e.shape[1], e.shape[1]), 1.0 / e.shape[1], jnp.float32)
            mean = jax.lax.dot_general(
                e, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            var = jax.lax.dot_general(
                e * e, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - mean * mean
            xhat = (e - mean) * jax.lax.rsqrt(var + eps)
            xn = xhat * lng_ref[:] + lnb_ref[:]
            en = jnp.maximum(xn, 0.0)
            en_ref[:] = (repack_tile(en) if packed else en).astype(en_ref.dtype)
        xlp = jnp.dot(en, wlp_ref[:], preferred_element_type=jnp.float32) + blp_ref[:]
        xlc = jnp.dot(en, wlc_ref[:], preferred_element_type=jnp.float32) + blc_ref[:]

        # ---- dual attention (identical to _dual_fwd_kernel from here;
        # lane-packed (1, CHUNK) id rows, transposed one-hots).
        local_row = _id_row(pids_ref, c) - wb * W
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        match_p = local_row == seg_iota
        ohT_p = match_p.astype(jnp.float32)
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        match_c = _id_row(cids_ref, c) == cam_iota
        ohT_c = match_c.astype(jnp.float32)
        ohT_p_mm = match_p.astype(mm_dtype)
        ohT_c_mm = match_c.astype(mm_dtype)

        z_p = xlp + jax.lax.dot_general(
            ohT_p_mm, xrp_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z_c = xlc + jax.lax.dot_general(
            ohT_c_mm, xrc_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gz_p = jnp.where(z_p >= 0, z_p, slope * z_p)
        gz_c = jnp.where(z_c >= 0, z_c, slope * z_c)
        logits = jax.lax.dot_general(
            gz_p * attp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            gz_c * attc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        inwin = jax.lax.dot_general(
            ohT_p, jnp.ones((W, 1), jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) > 0.5  # (CHUNK, 1)
        m_vec = jnp.max(jnp.where(inwin, logits, _NEG), axis=0, keepdims=True)

        # Window-constant shift (see _dual_fwd_kernel for the derivation).
        m_old = mrun_scr[0:1, :]
        m_new = jnp.maximum(m_old, m_vec)
        scale_row = jnp.exp(m_old - m_new)
        mrun_scr[0:1, :] = m_new
        p = jnp.exp(jnp.minimum(logits - m_new, 0.0))
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (HP, HP), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (HP, HP), 1)
        ).astype(jnp.float32)
        scale_col = jax.lax.dot_general(
            eye, scale_row, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_col = jax.lax.dot_general(
            eye, m_new, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        p_dp = jax.lax.dot_general(
            p, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_dc = jax.lax.dot_general(
            p, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        scale_p_d = jax.lax.dot_general(
            scale_row, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scale_c_d = jax.lax.dot_general(
            scale_row, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outp_ref[:] = outp_ref[:] * scale_p_d + jax.lax.dot_general(
            ohT_p_mm, (p_dp * xlp).astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outc_ref[:] = outc_ref[:] * scale_c_d + jax.lax.dot_general(
            ohT_c_mm, (p_dc * xlc).astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        mdp_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, W))
        mdp_ref[HP : 2 * HP, :] = mdp_ref[HP : 2 * HP, :] * scale_col + jax.lax.dot_general(
            p, ohT_p, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mdc_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, Wc))
        mdc_ref[HP : 2 * HP, :] = mdc_ref[HP : 2 * HP, :] * scale_col + jax.lax.dot_general(
            p, ohT_c, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if finalize:
        @pl.when(last_w)
        def _():
            den = mdp_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, sselp_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outp_ref[:] = outp_ref[:] * inv_wd

        @pl.when(c == nc - 1)
        def _():
            den = mdc_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, sselc_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outc_ref[:] = outc_ref[:] * inv_wd


@functools.partial(jax.jit, static_argnames=("W", "Wc", "Hp", "Hc", "slope", "eps", "interpret",
                                             "finalize", "mm", "packed", "raw_prologue"))
def _front_fwd_raw(e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                   pids2d, cids2d, wb, nlive, W, Wc, Hp, Hc, slope, eps,
                   interpret=False, finalize=True, mm="f32", packed=False,
                   raw_prologue=False):
    chunk = pids2d.shape[1]  # per-graph chunk
    if packed:
        _rows, _pd = e.shape
        De = _pd // PACK
        E = _rows * PACK
    else:
        E, De = e.shape
    Dp = wlp.shape[1]
    Dc = wlc.shape[1]
    assert E % chunk == 0 and Dp % Hp == 0 and Dc % Hc == 0
    HP = _round_up(Hp + Hc, 8)
    s_pad = xrp.shape[0]
    assert s_pad % W == 0 and xrc.shape[0] == Wc
    sselp = jnp.asarray(_dir_selector(Hp, Dp // Hp, HP, 0))
    sselc = jnp.asarray(_dir_selector(Hc, Dc // Hc, HP, Hp))
    hm = jnp.asarray(np.concatenate(_head_masks(Hp, Hc, HP), axis=0))

    fixed = lambda c, wb_ref: (0, 0)  # noqa: E731
    _rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != _rows8:
        # Id rows blocked (8, CHUNK): pad the row count to a sublane multiple
        # (padded rows are DMA'd with their block but never read).
        pids2d = jnp.pad(pids2d, ((0, _rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, _rows8 - cids2d.shape[0]), (0, 0)))
    if packed:
        stream_spec = pl.BlockSpec(
            (chunk // PACK, PACK * De), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM
        )
        stream_shape = jax.ShapeDtypeStruct((E // PACK, PACK * De), e.dtype)
    else:
        stream_spec = pl.BlockSpec((chunk, De), lambda c, wb_ref: (c, 0),
                                   memory_space=pltpu.VMEM)
        stream_shape = jax.ShapeDtypeStruct((E, De), e.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            stream_spec,
            pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((De, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((De, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            stream_spec,
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, W), lambda c, wb_ref: (0, wb_ref[c]), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, Wc), fixed, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, HP), jnp.float32)],
    )
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    en, outp, outc, mdp, mdc = pl.pallas_call(
        functools.partial(_front_fwd_kernel, W=W, Wc=Wc, HP=HP, slope=slope, eps=eps,
                          finalize=finalize, mm_dtype=mm_dtype, packed=packed,
                          raw_prologue=raw_prologue),
        grid_spec=grid_spec,
        out_shape=[
            stream_shape,
            jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, Wc), jnp.float32),
        ],
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), pids2d, cids2d, e, lng, lnb, wlp, blp, wlc,
      blc, xrp, xrc, attp, attc, sselp, sselc, hm)
    return en, outp, outc, mdp, mdc


def _front_bwd_kernel(
    wb_ref, pids_ref, cids_ref, e_ref, lng_ref, lnb_ref,
    wlp_ref, blp_ref, wlc_ref, blc_ref, xrp_ref, xrc_ref,
    attp_ref, attc_ref, sselp_ref, sselc_ref, hm_ref,
    mdtp_ref, mdtc_ref, mwinp_ref, mcam_ref, outp_ref, outc_ref, gp_ref, gc_ref, gen_ref,
    de_ref, dlng_ref, dlnb_ref, dwlp_ref, dblp_ref, dwlc_ref, dblc_ref,
    dxrp_ref, dxrc_ref, dattp_ref, dattc_ref,
    packp_scr, packc_scr,
    *, W: int, Wc: int, HP: int, slope: float, eps: float, mm_dtype=jnp.float32,
    packed: bool = False, raw_prologue: bool = False,
):
    # Packed per-window gather operand [xr | dnum | dden] — see
    # _dual_bwd_kernel (the window-constant softmax shift needs no gather).
    Dp = (packp_scr.shape[1] - HP) // 2
    Dc = (packc_scr.shape[1] - HP) // 2
    c = pl.program_id(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(c == 0)
    def _():
        dattp_ref[:] = jnp.zeros_like(dattp_ref)
        dattc_ref[:] = jnp.zeros_like(dattc_ref)
        dlng_ref[:] = jnp.zeros_like(dlng_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dwlp_ref[:] = jnp.zeros_like(dwlp_ref)
        dblp_ref[:] = jnp.zeros_like(dblp_ref)
        dwlc_ref[:] = jnp.zeros_like(dwlc_ref)
        dblc_ref[:] = jnp.zeros_like(dblc_ref)
        dxrc_ref[:] = jnp.zeros_like(dxrc_ref)
        den = mdtc_ref[:, HP : 2 * HP]  # (Wc, HP)
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
        inv_wd = jax.lax.dot_general(
            inv, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = gc_ref[:]
        go = jax.lax.dot_general(
            g * outc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Wc, HP)
        packc_scr[:, 0:Dc] = xrc_ref[:]
        packc_scr[:, Dc : 2 * Dc] = g * inv_wd
        packc_scr[:, 2 * Dc : 2 * Dc + HP] = -go * inv

    @pl.when(first_w)
    def _():
        dxrp_ref[:] = jnp.zeros_like(dxrp_ref)
        den = mdtp_ref[:, HP : 2 * HP]  # (W, HP)
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
        inv_wd = jax.lax.dot_general(
            inv, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = gp_ref[:]
        go = jax.lax.dot_general(
            g * outp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, HP)
        packp_scr[:, 0:Dp] = xrp_ref[:]
        packp_scr[:, Dp : 2 * Dp] = g * inv_wd
        packp_scr[:, 2 * Dp : 2 * Dp + HP] = -go * inv

    live = c < wb_ref[pl.num_programs(0)]  # dead-chunk skip

    @pl.when(jnp.logical_not(live))
    def _():
        de_ref[:] = jnp.zeros_like(de_ref)

    @pl.when(live)
    def _compute():
        # ---- recompute the prologue (streams may be bf16: upcast on load).
        e = (unpack_tile(e_ref[:].astype(jnp.float32)) if packed
             else e_ref[:].astype(jnp.float32))  # (CHUNK, De)
        De = e.shape[1]
        if raw_prologue:
            en = e
        else:
            # LN lane means as all-ones/De MXU passes (see _front_fwd_kernel).
            ones_dd = jnp.full((De, De), 1.0 / De, jnp.float32)
            mean = jax.lax.dot_general(
                e, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            var = jax.lax.dot_general(
                e * e, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - mean * mean
            rstd = jax.lax.rsqrt(var + eps)
            xhat = (e - mean) * rstd
            xn = xhat * lng_ref[:] + lnb_ref[:]
            en = jnp.maximum(xn, 0.0)
        xlp = jnp.dot(en, wlp_ref[:], preferred_element_type=jnp.float32) + blp_ref[:]
        xlc = jnp.dot(en, wlc_ref[:], preferred_element_type=jnp.float32) + blc_ref[:]

        # ---- recompute attention internals and per-edge cotangents (identical
        # math to _dual_bwd_kernel).
        local_row = _id_row(pids_ref, c) - wb * W  # (1, CHUNK) lane-packed id row
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        match_p = local_row == seg_iota
        ohT_p = match_p.astype(jnp.float32)
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        match_c = _id_row(cids_ref, c) == cam_iota
        ohT_c = match_c.astype(jnp.float32)
        ohT_p_mm = match_p.astype(mm_dtype)
        ohT_c_mm = match_c.astype(mm_dtype)

        gep = jax.lax.dot_general(
            ohT_p_mm, packp_scr[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gec = jax.lax.dot_general(
            ohT_c_mm, packc_scr[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z_p = xlp + gep[:, 0:Dp]
        z_c = xlc + gec[:, 0:Dc]
        dnum_e_p = gep[:, Dp : 2 * Dp]
        dnum_e_c = gec[:, Dc : 2 * Dc]
        hm = hm_ref[:]
        dden_e = (gep[:, 2 * Dp : 2 * Dp + HP] * hm[0:1, :]
                  + gec[:, 2 * Dc : 2 * Dc + HP] * hm[1:2, :])
        # Window-constant shift rows (f32 always — exp amplifies max rounding).
        m_e = (mwinp_ref[pl.ds(wb % 8, 1), :] * hm[0:1, :]
               + mcam_ref[0:1, :] * hm[1:2, :])  # (1, HP), broadcasts over CHUNK
        gz_p = jnp.where(z_p >= 0, z_p, slope * z_p)
        gz_c = jnp.where(z_c >= 0, z_c, slope * z_c)
        logits = jax.lax.dot_general(
            gz_p * attp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            gz_c * attc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(jnp.minimum(logits - m_e, 0.0))

        dl = p * (
            jax.lax.dot_general(
                xlp * dnum_e_p, sselp_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xlc * dnum_e_c, sselc_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + dden_e
        )
        dl_dp = jax.lax.dot_general(
            dl, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl_dc = jax.lax.dot_general(
            dl, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz_p = dl_dp * attp_ref[:] * jnp.where(z_p >= 0, 1.0, slope)
        dz_c = dl_dc * attc_ref[:] * jnp.where(z_c >= 0, 1.0, slope)
        p_dp = jax.lax.dot_general(
            p, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_dc = jax.lax.dot_general(
            p, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dxlp = p_dp * dnum_e_p + dz_p  # (CHUNK, Dp)
        dxlc = p_dc * dnum_e_c + dz_c
        dxrp_ref[:] += jax.lax.dot_general(
            ohT_p_mm, dz_p.astype(mm_dtype), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxrc_ref[:] += jax.lax.dot_general(
            ohT_c_mm, dz_c.astype(mm_dtype), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dattp_ref[0:1, :] += jnp.sum(dl_dp * gz_p, axis=0, keepdims=True)
        dattc_ref[0:1, :] += jnp.sum(dl_dc * gz_c, axis=0, keepdims=True)

        # ---- prologue backward.
        gen = (unpack_tile(gen_ref[:].astype(jnp.float32)) if packed
               else gen_ref[:].astype(jnp.float32))
        d_en = (
            jax.lax.dot_general(
                dxlp, wlp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                dxlc, wlc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + gen
        )  # (CHUNK, De)
        dwlp_ref[:] += jax.lax.dot_general(
            en, dxlp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dblp_ref[0:1, :] += jnp.sum(dxlp, axis=0, keepdims=True)
        dwlc_ref[:] += jax.lax.dot_general(
            en, dxlc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dblc_ref[0:1, :] += jnp.sum(dxlc, axis=0, keepdims=True)

        if raw_prologue:
            # en == e: the stream cotangent is d_en directly (dlng/dlnb
            # stay at their zero initialization — the LN params are dummies).
            de = d_en
        else:
            d_xn = jnp.where(xn > 0, d_en, 0.0)
            dlng_ref[0:1, :] += jnp.sum(d_xn * xhat, axis=0, keepdims=True)
            dlnb_ref[0:1, :] += jnp.sum(d_xn, axis=0, keepdims=True)
            d_xhat = d_xn * lng_ref[:]
            mean_dxhat = jax.lax.dot_general(
                d_xhat, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            mean_dxhat_xhat = jax.lax.dot_general(
                d_xhat * xhat, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            de = rstd * (d_xhat - mean_dxhat - xhat * mean_dxhat_xhat)
        de_ref[:] = (repack_tile(de) if packed else de).astype(de_ref.dtype)


@functools.partial(jax.jit, static_argnames=("W", "Wc", "Hp", "Hc", "slope", "eps", "interpret",
                                             "mm", "packed", "raw_prologue"))
def _front_bwd_raw(e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                   pids2d, cids2d, wb, nlive, mdp, mdc, outp, outc, gp, gc,
                   gen, W, Wc, Hp, Hc, slope, eps, interpret=False, mm="f32",
                   packed=False, raw_prologue=False):
    chunk = pids2d.shape[1]  # per-graph chunk
    if packed:
        _rows, _pd = e.shape
        De = _pd // PACK
        E = _rows * PACK
    else:
        E, De = e.shape
    Dp = wlp.shape[1]
    Dc = wlc.shape[1]
    HP = _round_up(Hp + Hc, 8)
    s_pad = xrp.shape[0]
    sselp = jnp.asarray(_dir_selector(Hp, Dp // Hp, HP, 0))
    sselc = jnp.asarray(_dir_selector(Hc, Dc // Hc, HP, Hp))
    hm = jnp.asarray(np.concatenate(_head_masks(Hp, Hc, HP), axis=0))
    # Pre-transposed (segments, 2*HP) max/den tables for the packed gather.
    mdtp = mdp.T
    mdtc = mdc.T
    # Window-constant softmax shift rows (see _dual_bwd_raw).
    n_blocks = s_pad // W
    mwinp = mdp[0:HP, ::W].T  # (n_blocks, HP)
    mwinp = jnp.pad(mwinp, ((0, _round_up(n_blocks, 8) - n_blocks), (0, 0)))
    mcam = jnp.pad(mdc[0:HP, 0:1].T, ((0, 7), (0, 0)))  # (8, HP), row 0 valid

    fixed = lambda c, wb_ref: (0, 0)  # noqa: E731
    _rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != _rows8:
        # Id rows blocked (8, CHUNK): pad the row count to a sublane multiple
        # (padded rows are DMA'd with their block but never read).
        pids2d = jnp.pad(pids2d, ((0, _rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, _rows8 - cids2d.shape[0]), (0, 0)))
    if packed:
        stream_spec = pl.BlockSpec(
            (chunk // PACK, PACK * De), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM
        )
        stream_shape = jax.ShapeDtypeStruct((E // PACK, PACK * De), e.dtype)
    else:
        stream_spec = pl.BlockSpec((chunk, De), lambda c, wb_ref: (c, 0),
                                   memory_space=pltpu.VMEM)
        stream_shape = jax.ShapeDtypeStruct((E, De), e.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            stream_spec,
            pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((De, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((De, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dc, HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2 * HP), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, 2 * HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, HP), lambda c, wb_ref: (wb_ref[c] // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, HP), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            stream_spec,
        ],
        out_specs=[
            stream_spec,
            pl.BlockSpec((8, De), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, De), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((De, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((De, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Dp), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Dp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Dc), fixed, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, 2 * Dp + HP), jnp.float32),
            pltpu.VMEM((Wc, 2 * Dc + HP), jnp.float32),
        ],
    )
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    outs = pl.pallas_call(
        functools.partial(_front_bwd_kernel, W=W, Wc=Wc, HP=HP, slope=slope, eps=eps,
                          mm_dtype=mm_dtype, packed=packed,
                          raw_prologue=raw_prologue),
        grid_spec=grid_spec,
        out_shape=[
            stream_shape,
            jax.ShapeDtypeStruct((8, De), jnp.float32),
            jax.ShapeDtypeStruct((8, De), jnp.float32),
            jax.ShapeDtypeStruct((De, Dp), jnp.float32),
            jax.ShapeDtypeStruct((8, Dp), jnp.float32),
            jax.ShapeDtypeStruct((De, Dc), jnp.float32),
            jax.ShapeDtypeStruct((8, Dc), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
            jax.ShapeDtypeStruct((8, Dp), jnp.float32),
            jax.ShapeDtypeStruct((8, Dc), jnp.float32),
        ],
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), pids2d, cids2d, e, lng, lnb, wlp, blp, wlc,
      blc, xrp, xrc, attp, attc, sselp, sselc, hm, mdtp, mdtc, mwinp, mcam,
      outp, outc, gp, gc, gen)
    return outs


def make_fused_frontend(Hp: int, Hc: int, eps: float, mm: str = "f32",
                        packed: bool = False, table_sharded: bool = False,
                        raw_prologue: bool = False):
    """Custom-VJP fused layer frontend (LN + ReLU + source transforms + dual
    attention). Differentiable in (e, ln scale/bias, both source
    kernels/biases, both attention vectors, both query tables).

    ``edge_axis``: see :func:`make_fused_dual_attend` — LN/ReLU are per-edge
    (shard-local); only the attention triples combine across shards.

    ``packed``: the raw edge stream ``e`` arrives lane-packed
    (E/PACK, PACK*De) and ``en`` (with its cotangent) keeps that layout; the
    table-sided arguments/outputs are unchanged (ops/pallas/packing.py)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20, 21))
    def front(e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
              pids2d, cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
              interpret, edge_axis):
        (en, op, oc), _ = _run(e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c,
                               att_p, att_c, pids2d, cids2d, wb, nlive, n_pts,
                               n_cams, W, Wc, slope, interpret, edge_axis)
        return en, op, oc

    def _run(e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
             pids2d, cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
             interpret, edge_axis):
        s_pad = _round_up(n_pts, W)
        xr_p_pad = xr_p if xr_p.shape[0] == s_pad else jnp.pad(
            xr_p, ((0, s_pad - xr_p.shape[0]), (0, 0))
        )
        xr_c_pad = xr_c if xr_c.shape[0] == Wc else jnp.pad(
            xr_c, ((0, Wc - xr_c.shape[0]), (0, 0))
        )
        en, outp, outc, mdp, mdc = _front_fwd_raw(
            e, lng, lnb, wlp, blp, wlc, blc, xr_p_pad, xr_c_pad, att_p, att_c,
            pids2d, cids2d, wb, nlive, W, Wc, Hp, Hc, slope, eps,
            interpret=interpret, finalize=edge_axis is None, mm=mm,
            packed=packed, raw_prologue=raw_prologue,
        )
        if edge_axis is not None:
            HP = _round_up(Hp + Hc, 8)
            if table_sharded:
                outp, mdp = exchange_boundary_windows(
                    outp, mdp, HP, Hp, wlp.shape[1] // Hp, edge_axis, wb, W
                )
            else:
                outp, mdp = combine_attention_shards(
                    outp, mdp, HP, Hp, wlp.shape[1] // Hp, edge_axis, wb=wb, W=W
                )
            mdc_r = jnp.concatenate([
                mdc[Hp : Hp + Hc], mdc[HP + Hp : HP + Hp + Hc]
            ], axis=0)
            outc, mdc_g = combine_attention_shards(
                outc, mdc_r, Hc, Hc, wlc.shape[1] // Hc, edge_axis
            )
            mdc = jnp.zeros_like(mdc)
            mdc = mdc.at[Hp : Hp + Hc].set(mdc_g[:Hc])
            mdc = mdc.at[HP + Hp : HP + Hp + Hc].set(mdc_g[Hc : 2 * Hc])
        res = (e, lng, lnb, wlp, blp, wlc, blc, xr_p_pad, xr_c_pad, att_p,
               att_c, pids2d, cids2d, wb, nlive, outp, outc, mdp, mdc)
        return (en, outp[:n_pts], outc[:n_cams]), res

    def _fwd(e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
             pids2d, cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
             interpret, edge_axis):
        out, res = _run(e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p,
                        att_c, pids2d, cids2d, wb, nlive, n_pts, n_cams, W,
                        Wc, slope, interpret, edge_axis)
        return out, res

    def _bwd(n_pts, n_cams, W, Wc, slope, interpret, edge_axis, res, g):
        gen, gp_out, gc_out = g
        (e, lng, lnb, wlp, blp, wlc, blc, xr_p_pad, xr_c_pad, att_p, att_c,
         pids2d, cids2d, wb, nlive, outp, outc, mdp, mdc) = res
        s_pad = xr_p_pad.shape[0]
        gp = gp_out if gp_out.shape[0] == s_pad else jnp.pad(
            gp_out, ((0, s_pad - gp_out.shape[0]), (0, 0))
        )
        if edge_axis is not None:
            # Interior transpose rule (ops/segment.py); `gen` is per-edge
            # (shard-local). Table-sharded point side: boundary exchange.
            if table_sharded:
                gp = exchange_boundary_add(gp, edge_axis, wb, W)
            else:
                gp = jax.lax.psum(gp, edge_axis)
            gc_out = jax.lax.psum(gc_out, edge_axis)
        gc = gc_out if gc_out.shape[0] == Wc else jnp.pad(
            gc_out, ((0, Wc - gc_out.shape[0]), (0, 0))
        )
        (de, dlng8, dlnb8, dwlp, dblp8, dwlc, dblc8, dxrp_full, dxrc_full,
         dattp8, dattc8) = _front_bwd_raw(
            e, lng, lnb, wlp, blp, wlc, blc, xr_p_pad, xr_c_pad, att_p, att_c,
            pids2d, cids2d, wb, nlive, mdp, mdc, outp, outc, gp, gc, gen,
            W, Wc, Hp, Hc, slope, eps, interpret=interpret, mm=mm, packed=packed,
            raw_prologue=raw_prologue,
        )
        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        dxrp_full = jnp.where(jnp.repeat(visited, W)[:, None], dxrp_full, 0.0)
        return (
            de, dlng8[0:1], dlnb8[0:1], dwlp, dblp8[0:1], dwlc, dblc8[0:1],
            dxrp_full[:n_pts], dxrc_full[:n_cams], dattp8[0:1], dattc8[0:1],
            None, None, None, None,
        )

    front.defvjp(_fwd, _bwd)
    return front


_FRONT_CACHE = {}


def fused_frontend(Hp, Hc, eps, e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c,
                   att_p, att_c, pids2d, cids2d, wb, n_pts, n_cams, W, Wc,
                   slope=0.2, interpret=False, edge_axis=None, packed=False,
                   nlive=None, raw_prologue=False):
    """LN + ReLU + both GATv2 source transforms + dual attention, fused.

    e: (E, De) RAW edge features — or lane-packed (E/PACK, PACK*De) when
    ``packed`` (ops/pallas/packing.py; e_norm then keeps that layout);
    lng/lnb: (1, De) LayerNorm scale/bias;
    wlp/blp, wlc/blc: source linear maps (De, Dp)/(1, Dp) and (De, Dc)/(1, Dc);
    remaining arguments as in :func:`fused_dual_attend`.
    Returns (e_norm = relu(LN(e)), out_pt (n_pts, Dp), out_cam (n_cams, Dc)).
    """
    from gasfm_tpu.ops.segment import get_kernel_precision

    from gasfm_tpu.ops.segment import is_table_sharded

    key = (Hp, Hc, float(eps), get_kernel_precision(), packed,
           is_table_sharded(), raw_prologue)
    fn = _FRONT_CACHE.get(key)
    if fn is None:
        fn = make_fused_frontend(*key)
        _FRONT_CACHE[key] = fn
    if nlive is None:
        nlive = jnp.asarray(wb.shape[0], dtype=jnp.int32)
    return fn(e, lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
              pids2d, cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
              interpret, edge_axis)
