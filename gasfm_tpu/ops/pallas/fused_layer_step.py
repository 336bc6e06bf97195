"""Merged inter-layer kernel: layer l's projection update + layer (l+1)'s
frontend (LN + ReLU + source transforms + dual attention) as ONE Pallas
launch per forward/backward over lane-packed edge streams.

Why: the projection update (ops/pallas/fused_proj_update.py) and the next
layer's frontend (ops/pallas/fused_dual_attn.py) sweep the same chunks,
build the SAME transposed one-hots from the same id rows, and hand a full
edge stream (e_l) across HBM between two kernel launches. The update's
output feeds nothing but the next frontend (plus the next update's
residual), so both fuse cleanly:

    e_l      = (lin_proj_l([en_l | skip]) + ps_l[pt] + pv_l[cam] + pg_l)/4
               (+ e_{l-1})                       -- update part, packed
    en_{l+1} = relu(LN_{l+1}(e_l))               -- frontend part
    aggs     = dual GATv2 attention over en_{l+1}-transformed edges

Per chunk this saves one kernel launch chain, one full packed-stream
write+read, and one duplicate pair of one-hot builds forward AND backward
(the backward additionally skips recomputing the update: the saved e_l
stream is one of its inputs).

Parity: reference code/models/layers.py:150-263 (layer residual/update
sequencing) + 873-956 (projection update) + 266-458 (the attention
aggregators' source half); the math is identical to composing
packed_edge_update with fused_frontend — asserted by tests/test_packed.py.

The model drives this via the deferred-update protocol in
models/layers.GraphAttnLayer: layer l hands its update ingredients (plain
arrays) to layer l+1, whose call runs this kernel with its own LN/source
params — every flax parameter stays inside its own layer's compact call.
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
from gasfm_tpu.ops.pallas.fused_dual_attn import (
    _dir_selector,
    _head_masks,
    _id_row,
    _NEG,
    _wb_with_nlive,
)
from gasfm_tpu.ops.pallas.packing import (
    PACK,
    blockdiag,
    repack_tile,
    sum_diag_blocks,
    sum_lane_groups,
    tile_row,
    unpack_tile,
)


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _fwd_kernel(
    wb_ref, pids_ref, cids_ref,
    en_ref, *rest,
    W: int, Wc: int, HP: int, slope: float, eps: float,
    finalize: bool, mm_dtype, has_skip: bool, has_res: bool,
    raw_prologue: bool = False,
):
    i = 0
    skip2_ref = rest[i] if has_skip else None
    i += has_skip
    res_ref = rest[i] if has_res else None
    i += has_res
    (we_ref, c0_ref) = rest[i], rest[i + 1]
    i += 2
    wuv_ref = rest[i] if has_skip else None
    i += has_skip
    (ps_ref, pv_ref, lng_ref, lnb_ref, wlpc_ref, blpc_ref,
     xrp_ref, xrc_ref, attpc_ref, sselpc_ref, hm_ref,
     el_ref, ennext_ref, outp_ref, outc_ref, mdp_ref, mdc_ref,
     mrun_scr, mega_scr) = rest[i:]

    # Direction-stacked mega-passes: each MXU pass costs ~0.17 us of serial
    # latency INDEPENDENT of output width up to 128 lanes (measured,
    # scripts/matmul_width_probe.py — chained passes, N=32 == N=128), so the
    # point and camera directions' narrow contractions stack into single
    # wide passes over a (W+Wc, CHUNK) combined one-hot:
    #   - ONE gather pass produces [xr_p-gather | xr_c-gather | update-table
    #     gather | in-window flag] from a per-window (W+Wc, 128) operand,
    #   - logits / p-expansion / num-scatter / den-scatter each run once
    #     over lane-concatenated [point | camera] feature spaces.
    De = ps_ref.shape[1]
    Dpc = wlpc_ref.shape[1]  # Dp + Dc
    Dp = xrp_ref.shape[1]
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    last_w = jnp.logical_or(c == nc - 1, wb_ref[jnp.minimum(c + 1, nc - 1)] != wb)
    # Dead-chunk skip: wb_ref carries the live-chunk count as an extra
    # trailing element (wb_ref[nc]). In the blocked layout all-padding
    # chunks form a strict suffix (block runs pad to < CHUNK, the rest is
    # the bucketed cap), every dead chunk repeats the last block id (so
    # first_w/last_w stay consistent), and dead edges carry out-of-window
    # ids — their contribution is exactly zero, so skipping the compute is
    # an identity change. At the bench scene 11-17% of chunks are dead
    # (cap bucketing + block padding); see BENCHLOG round 4.
    live = c < wb_ref[nc]

    @pl.when(c == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdc_ref.shape, 0)
        mdc_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        mrun_scr[:] = jnp.full_like(mrun_scr, _NEG)
        # Global rows of the mega gather operand (camera direction).
        mega_scr[:] = jnp.zeros_like(mega_scr)
        mega_scr[W : W + Wc, Dp : Dpc] = xrc_ref[:]
        mega_scr[W : W + Wc, Dpc : Dpc + De] = pv_ref[:]

    @pl.when(first_w)
    def _():
        outp_ref[:] = jnp.zeros_like(outp_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdp_ref.shape, 0)
        mdp_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        mrun_scr[0:1, :] = jnp.where(hm_ref[0:1, :] > 0, _NEG, mrun_scr[0:1, :])
        # Window rows of the mega gather operand (point direction).
        mega_scr[0:W, 0:Dp] = xrp_ref[:]
        mega_scr[0:W, Dpc : Dpc + De] = ps_ref[:]
        mega_scr[0:W, Dpc + De : Dpc + De + 1] = jnp.ones((W, 1), jnp.float32)

    @pl.when(jnp.logical_not(live))
    def _():
        # Dead chunks' edge-output blocks still round-trip to HBM: give
        # them finite contents (downstream kernels read them as padding).
        el_ref[:] = jnp.zeros_like(el_ref)
        ennext_ref[:] = jnp.zeros_like(ennext_ref)

    @pl.when(live)
    def _compute():
        # ---- shared transposed one-hots, stacked along segments.
        local_row = _id_row(pids_ref, c) - wb * W
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        match_p = local_row == seg_iota
        ohT_p = match_p.astype(jnp.float32)
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        match_c = _id_row(cids_ref, c) == cam_iota
        ohT_c = match_c.astype(jnp.float32)
        ohT_pc = jnp.concatenate([ohT_p, ohT_c], axis=0)  # (W+Wc, CHUNK)
        ohT_pc_mm = ohT_pc.astype(mm_dtype)

        # ---- ONE mega gather pass: z-gathers + update gathers + inwin flag.
        gath = jax.lax.dot_general(
            ohT_pc_mm, mega_scr[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, Dpc + De + 1) lanes (phys 128)
        mega_w = mega_scr.shape[1]
        g_upd = pltpu.roll(gath, mega_w - Dpc, 1)[:, 0:De]
        inwin = pltpu.roll(gath, mega_w - (Dpc + De), 1)[:, 0:1] > 0.5

        # ---- update part: e_l in unpacked space, written packed. Streams
        # may be stored bf16 (packing.stream_dtype): upcast on load,
        # downcast on store; all math stays f32.
        core_p = jax.lax.dot_general(
            en_ref[:].astype(jnp.float32), we_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + c0_ref[:]
        if has_skip:
            core_p2 = core_p + jax.lax.dot_general(
                skip2_ref[:].astype(jnp.float32), wuv_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            core_p2 = core_p
        e_l = (unpack_tile(core_p2) + g_upd) * 0.25
        if has_res:
            e_l += unpack_tile(res_ref[:].astype(jnp.float32))
        el_ref[:] = repack_tile(e_l).astype(el_ref.dtype)

        # ---- frontend part over the lane-concatenated [point | camera] space.
        # LayerNorm statistics as (De, De) all-ones/De MXU passes: a lane
        # reduction PLUS its broadcast back across the feature lanes costs
        # one cheap matmul instead of a log-step VPU shuffle chain — the
        # single largest item of the round-4 forward ablation
        # (scripts/merged_ablate.py: -1.9 us of 7.3 us/chunk).
        if raw_prologue:
            # No LN / ReLU: the frontend consumes the freshly materialized
            # e_l raw — the final-aggregation semantics (see
            # fused_dual_attn raw_prologue).
            en = e_l
            ennext_ref[:] = el_ref[:]
        else:
            ones_dd = jnp.full((De, De), 1.0 / De, jnp.float32)
            mean = jax.lax.dot_general(
                e_l, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            var = jax.lax.dot_general(
                e_l * e_l, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - mean * mean
            xhat = (e_l - mean) * jax.lax.rsqrt(var + eps)
            xn = xhat * lng_ref[:] + lnb_ref[:]
            en = jnp.maximum(xn, 0.0)
            ennext_ref[:] = repack_tile(en).astype(ennext_ref.dtype)
        xl_pc = jnp.dot(en, wlpc_ref[:], preferred_element_type=jnp.float32) + blpc_ref[:]

        z_pc = xl_pc + gath[:, 0:Dpc]
        gz = jnp.where(z_pc >= 0, z_pc, slope * z_pc)
        logits = jax.lax.dot_general(
            gz * attpc_ref[:], sselpc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, HP)

        m_vec = jnp.max(jnp.where(inwin, logits, _NEG), axis=0, keepdims=True)
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

        p_dpc = jax.lax.dot_general(
            p, sselpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, Dpc)
        scale_pc_d = jax.lax.dot_general(
            scale_row, sselpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Dpc)

        num_stack = jax.lax.dot_general(
            ohT_pc_mm, (p_dpc * xl_pc).astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W+Wc, Dpc)
        outp_ref[:] = outp_ref[:] * scale_pc_d[:, 0:Dp] + num_stack[0:W, 0:Dp]
        out_c_new = pltpu.roll(num_stack[W : W + Wc, :], Dpc - Dp, 1)[:, 0 : Dpc - Dp]
        outc_ref[:] = (
            outc_ref[:] * pltpu.roll(scale_pc_d, Dpc - Dp, 1)[:, 0 : Dpc - Dp]
            + out_c_new
        )

        den_stack = jax.lax.dot_general(
            p, ohT_pc, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HP, W+Wc)
        mdp_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, W))
        mdp_ref[HP : 2 * HP, :] = (
            mdp_ref[HP : 2 * HP, :] * scale_col + den_stack[:, 0:W]
        )
        mdc_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, Wc))
        mdc_ref[HP : 2 * HP, :] = (
            mdc_ref[HP : 2 * HP, :] * scale_col
            + pltpu.roll(den_stack, (W + Wc) - W, 1)[:, 0:Wc]
        )

    if finalize:
        @pl.when(last_w)
        def _():
            den = mdp_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, sselpc_ref[0:Dp, :], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outp_ref[:] = outp_ref[:] * inv_wd

        @pl.when(c == nc - 1)
        def _():
            den = mdc_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, sselpc_ref[Dp:Dpc, :], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outc_ref[:] = outc_ref[:] * inv_wd


def _bwd_kernel(
    wb_ref, pids_ref, cids_ref,
    en_ref, *rest,
    W: int, Wc: int, HP: int, slope: float, eps: float,
    mm_dtype, has_skip: bool, has_res: bool,
    raw_prologue: bool = False,
):
    # Direction-stacked passes, mirroring _fwd_kernel: ONE per-edge gather
    # over a column-disjoint (W+Wc, 2*Dpc+HP) per-window operand
    # [xr_p | xr_c | dnum_p | dnum_c | dden(head-disjoint)], and single
    # wide passes for dl / dl_d / p_d / dz-scatter / dps+dpv-scatter /
    # d_en / dwl / dbl / datt.
    i = 0
    skip2_ref = rest[i] if has_skip else None
    i += has_skip
    (el_ref, we_ref) = rest[i], rest[i + 1]
    i += 2
    wuv_ref = rest[i] if has_skip else None
    i += has_skip
    (lng_ref, lnb_ref, wlpc_ref, blpc_ref,
     xrp_ref, xrc_ref, attpc_ref, sselpc_ref, hm_ref,
     mdtp_ref, mdtc_ref, mwinp_ref, mcam_ref, outp_ref, outc_ref,
     gp_ref, gc_ref, gen_ref, gel_ref) = rest[i : i + 19]
    i += 19
    den_out_ref = rest[i]
    i += 1
    dskip2_ref = rest[i] if has_skip else None
    i += has_skip
    dres_ref = rest[i] if has_res else None
    i += has_res
    (dps_ref, dpv_ref, dwe_ref) = rest[i], rest[i + 1], rest[i + 2]
    i += 3
    dwuv_ref = rest[i] if has_skip else None
    i += has_skip
    (dsum_ref, dlng_ref, dlnb_ref, dwlpc_ref, dblpc_ref,
     dxrp_ref, dxrc_ref, dattpc_ref, pack_scr) = rest[i:]

    De = wlpc_ref.shape[0]
    Dpc = wlpc_ref.shape[1]
    Dp = xrp_ref.shape[1]
    Dc = Dpc - Dp
    PW = pack_scr.shape[1]  # 2*Dpc + HP
    c = pl.program_id(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    live = c < wb_ref[pl.num_programs(0)]  # dead-chunk skip (see _fwd_kernel)

    @pl.when(c == 0)
    def _():
        dattpc_ref[:] = jnp.zeros_like(dattpc_ref)
        dlng_ref[:] = jnp.zeros_like(dlng_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dwlpc_ref[:] = jnp.zeros_like(dwlpc_ref)
        dblpc_ref[:] = jnp.zeros_like(dblpc_ref)
        dxrc_ref[:] = jnp.zeros_like(dxrc_ref)
        dpv_ref[:] = jnp.zeros_like(dpv_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        if has_skip:
            dwuv_ref[:] = jnp.zeros_like(dwuv_ref)
        dsum_ref[:] = jnp.zeros_like(dsum_ref)
        pack_scr[:] = jnp.zeros_like(pack_scr)
        den = mdtc_ref[:, HP : 2 * HP]
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
        inv_wd = jax.lax.dot_general(
            inv, sselpc_ref[Dp:Dpc, :], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = gc_ref[:]
        go = jax.lax.dot_general(
            g * outc_ref[:], sselpc_ref[Dp:Dpc, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pack_scr[W : W + Wc, Dp:Dpc] = xrc_ref[:]
        pack_scr[W : W + Wc, Dpc + Dp : 2 * Dpc] = g * inv_wd
        pack_scr[W : W + Wc, 2 * Dpc : 2 * Dpc + HP] = -go * inv

    @pl.when(first_w)
    def _():
        dxrp_ref[:] = jnp.zeros_like(dxrp_ref)
        dps_ref[:] = jnp.zeros_like(dps_ref)
        den = mdtp_ref[:, HP : 2 * HP]
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
        inv_wd = jax.lax.dot_general(
            inv, sselpc_ref[0:Dp, :], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = gp_ref[:]
        go = jax.lax.dot_general(
            g * outp_ref[:], sselpc_ref[0:Dp, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pack_scr[0:W, 0:Dp] = xrp_ref[:]
        pack_scr[0:W, Dpc : Dpc + Dp] = g * inv_wd
        pack_scr[0:W, 2 * Dpc : 2 * Dpc + HP] = -go * inv

    @pl.when(jnp.logical_not(live))
    def _():
        den_out_ref[:] = jnp.zeros_like(den_out_ref)
        if has_skip:
            dskip2_ref[:] = jnp.zeros_like(dskip2_ref)
        if has_res:
            dres_ref[:] = jnp.zeros_like(dres_ref)

    @pl.when(live)
    def _compute():
        _bwd_body(
            wb, c, pids_ref, cids_ref, en_ref, skip2_ref, el_ref, we_ref,
            wuv_ref, lng_ref, lnb_ref, wlpc_ref, blpc_ref, xrp_ref, xrc_ref,
            attpc_ref, sselpc_ref, hm_ref, mwinp_ref, mcam_ref,
            gen_ref, gel_ref, den_out_ref, dskip2_ref, dres_ref,
            dps_ref, dpv_ref, dwe_ref, dwuv_ref, dsum_ref, dlng_ref,
            dlnb_ref, dwlpc_ref, dblpc_ref, dxrp_ref, dxrc_ref, dattpc_ref,
            pack_scr, W=W, Wc=Wc, HP=HP, slope=slope, eps=eps,
            mm_dtype=mm_dtype, has_skip=has_skip, has_res=has_res,
            raw_prologue=raw_prologue,
        )


def _bwd_body(
    wb, c, pids_ref, cids_ref, en_ref, skip2_ref, el_ref, we_ref,
    wuv_ref, lng_ref, lnb_ref, wlpc_ref, blpc_ref, xrp_ref, xrc_ref,
    attpc_ref, sselpc_ref, hm_ref, mwinp_ref, mcam_ref,
    gen_ref, gel_ref, den_out_ref, dskip2_ref, dres_ref,
    dps_ref, dpv_ref, dwe_ref, dwuv_ref, dsum_ref, dlng_ref,
    dlnb_ref, dwlpc_ref, dblpc_ref, dxrp_ref, dxrc_ref, dattpc_ref,
    pack_scr, *, W, Wc, HP, slope, eps, mm_dtype, has_skip, has_res,
    raw_prologue=False,
):
    De = wlpc_ref.shape[0]
    Dpc = wlpc_ref.shape[1]
    Dp = xrp_ref.shape[1]
    Dc = Dpc - Dp
    PW = pack_scr.shape[1]
    # ---- recompute the frontend prologue from the SAVED e_l stream (the
    # update itself is not recomputed). Streams may be stored bf16
    # (packing.stream_dtype): upcast on load, downcast on store.
    e_l = unpack_tile(el_ref[:].astype(jnp.float32))  # (CHUNK, De)
    # Lane means as all-ones/De MXU passes (see _fwd_kernel's LN note) —
    # the broadcast across lanes comes for free with the matmul.
    if raw_prologue:
        en = e_l
    else:
        ones_dd = jnp.full((De, De), 1.0 / De, jnp.float32)
        mean = jax.lax.dot_general(
            e_l, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        var = jax.lax.dot_general(
            e_l * e_l, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (e_l - mean) * rstd
        xn = xhat * lng_ref[:] + lnb_ref[:]
        en = jnp.maximum(xn, 0.0)
    xl_pc = jnp.dot(en, wlpc_ref[:], preferred_element_type=jnp.float32) + blpc_ref[:]

    local_row = _id_row(pids_ref, c) - wb * W
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    match_p = local_row == seg_iota
    ohT_p = match_p.astype(jnp.float32)
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
    match_c = _id_row(cids_ref, c) == cam_iota
    ohT_c = match_c.astype(jnp.float32)
    ohT_pc = jnp.concatenate([ohT_p, ohT_c], axis=0)
    ohT_pc_mm = ohT_pc.astype(mm_dtype)

    gath = jax.lax.dot_general(
        ohT_pc_mm, pack_scr[:].astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (CHUNK, PW)
    z_pc = xl_pc + gath[:, 0:Dpc]
    dnum_pc = pltpu.roll(gath, PW - Dpc, 1)[:, 0:Dpc]
    dden_e = pltpu.roll(gath, PW - 2 * Dpc, 1)[:, 0:HP]
    hm = hm_ref[:]
    m_e = (mwinp_ref[pl.ds(wb % 8, 1), :] * hm[0:1, :]
           + mcam_ref[0:1, :] * hm[1:2, :])
    gz = jnp.where(z_pc >= 0, z_pc, slope * z_pc)
    logits = jax.lax.dot_general(
        gz * attpc_ref[:], sselpc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(jnp.minimum(logits - m_e, 0.0))

    dl = p * (
        jax.lax.dot_general(
            xl_pc * dnum_pc, sselpc_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + dden_e
    )
    dl_dpc = jax.lax.dot_general(
        dl, sselpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz_pc = dl_dpc * attpc_ref[:] * jnp.where(z_pc >= 0, 1.0, slope)
    p_dpc = jax.lax.dot_general(
        p, sselpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dxl_pc = p_dpc * dnum_pc + dz_pc
    dattpc_ref[0:1, :] += jnp.sum(dl_dpc * gz, axis=0, keepdims=True)

    gen = unpack_tile(gen_ref[:].astype(jnp.float32))
    d_en = jax.lax.dot_general(
        dxl_pc, wlpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + gen
    dwlpc_ref[:] += jax.lax.dot_general(
        en, dxl_pc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dblpc_ref[0:1, :] += jnp.sum(dxl_pc, axis=0, keepdims=True)

    if raw_prologue:
        # en == e_l: the frontend cotangent passes straight through (the LN
        # params are dummies; their grads stay at zero initialization).
        d_el = d_en
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
        d_el = rstd * (d_xhat - mean_dxhat - xhat * mean_dxhat_xhat)
    d_el += unpack_tile(gel_ref[:].astype(jnp.float32))  # downstream cotangent of e_l

    # ---- update backward (from the total e_l cotangent).
    d_el_p = repack_tile(d_el)
    if has_res:
        dres_ref[:] = d_el_p.astype(dres_ref.dtype)
    d_core_p = d_el_p * 0.25
    den_out_ref[:] = jax.lax.dot_general(
        d_core_p, we_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(den_out_ref.dtype)
    if has_skip:
        dskip2_ref[:] = jax.lax.dot_general(
            d_core_p, wuv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dskip2_ref.dtype)
    dwe_ref[:] += jax.lax.dot_general(
        en_ref[:].astype(jnp.float32), d_core_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_skip:
        dwuv_ref[:] += jax.lax.dot_general(
            skip2_ref[:].astype(jnp.float32), d_core_p,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dsum_ref[0:1, :] += jnp.sum(d_core_p, axis=0, keepdims=True)
    d_core = d_el * 0.25  # (CHUNK, De) for the table scatters
    # ONE merged table-scatter pass for the attention-query cotangent
    # (dz_pc) and the update cotangent (d_core): the lane-concatenated
    # operand fits one vreg width (Dpc + De = 96 <= 128), so a single
    # K=CHUNK one-hot pass replaces two (round-4 bwd ablation,
    # scripts/merged_ablate_bwd.py: -0.51 us/chunk; the extraction rolls
    # are measured free there).
    scat_in = jnp.concatenate([dz_pc, d_core], axis=1)  # (CHUNK, Dpc+De)
    PW2 = Dpc + De
    scat2 = jax.lax.dot_general(
        ohT_pc_mm, scat_in.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (W+Wc, Dpc+De)
    dxrp_ref[:] += scat2[0:W, 0:Dp]
    dxrc_ref[:] += pltpu.roll(scat2[W : W + Wc, :], PW2 - Dp, 1)[:, 0:Dc]
    dps_ref[:] += pltpu.roll(scat2[0:W, :], PW2 - Dpc, 1)[:, 0:De]
    dpv_ref[:] += pltpu.roll(scat2[W : W + Wc, :], PW2 - Dpc, 1)[:, 0:De]


def _pad_ids(pids2d, cids2d):
    rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != rows8:
        pids2d = jnp.pad(pids2d, ((0, rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, rows8 - cids2d.shape[0]), (0, 0)))
    return pids2d, cids2d


@functools.partial(jax.jit, static_argnames=(
    "W", "Wc", "Hp", "Hc", "slope", "eps", "interpret", "finalize", "mm",
    "has_skip", "has_res", "raw_prologue"))
def _fwd_raw(en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps_pad, pv_pad,
             lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
             pids2d, cids2d, wb, nlive, W, Wc, Hp, Hc, slope, eps,
             interpret=False, finalize=True, mm="f32",
             has_skip=True, has_res=True, raw_prologue=False):
    rows, pde = en_p.shape
    # Output stream width from the update weight (the INPUT stream may be
    # narrower — the first-layer deferral feeds a (E/PACK, PACK*d_emb)
    # stream through a (d_emb, De) lin_proj).
    De = we_bd.shape[1] // PACK
    E = rows * PACK
    Dp = wlp.shape[1]
    Dc = wlc.shape[1]
    HP = _round_up(Hp + Hc, 8)
    s_pad = xrp.shape[0]
    chunk = pids2d.shape[1]  # per-graph chunk
    Q = chunk // PACK
    sselp = jnp.asarray(_dir_selector(Hp, Dp // Hp, HP, 0))
    sselc = jnp.asarray(_dir_selector(Hc, Dc // Hc, HP, Hp))
    hm = jnp.asarray(np.concatenate(_head_masks(Hp, Hc, HP), axis=0))
    pids2d, cids2d = _pad_ids(pids2d, cids2d)
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32

    def stream(width):
        return pl.BlockSpec((Q, width), lambda c, wb_ref: (c, 0),
                            memory_space=pltpu.VMEM)

    fixed = lambda c, wb_ref: (0, 0)  # noqa: E731
    wblk = lambda c, wb_ref: (wb_ref[c], 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        stream(pde),
    ]
    operands = [pids2d, cids2d, en_p]
    if has_skip:
        in_specs.append(stream(skip2_p.shape[1]))
        operands.append(skip2_p)
    if has_res:
        in_specs.append(stream(PACK * De))
        operands.append(res_p)
    in_specs += [
        pl.BlockSpec((pde, PACK * De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PACK * De), fixed, memory_space=pltpu.VMEM),
    ]
    operands += [we_bd, c0]
    if has_skip:
        in_specs.append(pl.BlockSpec((wuv_bd.shape[0], PACK * De), fixed,
                                     memory_space=pltpu.VMEM))
        operands.append(wuv_bd)
    # Direction-stacked frontend operands (see _fwd_kernel).
    Dpc = Dp + Dc
    wlpc = jnp.concatenate([wlp, wlc], axis=1)  # (De, Dpc)
    blpc = jnp.concatenate([blp, blc], axis=1)  # (1, Dpc)
    attpc = jnp.concatenate([attp, attc], axis=1)  # (1, Dpc)
    sselpc = jnp.concatenate([sselp, sselc], axis=0)  # (Dpc, HP)
    mega_w = _round_up(Dpc + De + 1, 128)
    in_specs += [
        pl.BlockSpec((W, De), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((De, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, Dp), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((Dpc, HP), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, HP), fixed, memory_space=pltpu.VMEM),
    ]
    operands += [ps_pad, pv_pad, lng, lnb, wlpc, blpc,
                 xrp, xrc, attpc, sselpc, hm]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=in_specs,
        out_specs=[
            stream(PACK * De),
            stream(PACK * De),
            pl.BlockSpec((W, Dp), wblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, W), lambda c, wb_ref: (0, wb_ref[c]), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, Wc), fixed, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, HP), jnp.float32),
            pltpu.VMEM((W + Wc, mega_w), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, Wc=Wc, HP=HP, slope=slope, eps=eps,
                          finalize=finalize, mm_dtype=mm_dtype,
                          has_skip=has_skip, has_res=has_res,
                          raw_prologue=raw_prologue),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, PACK * De), en_p.dtype),
            jax.ShapeDtypeStruct((rows, PACK * De), en_p.dtype),
            jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, Wc), jnp.float32),
        ],
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), *operands)


@functools.partial(jax.jit, static_argnames=(
    "W", "Wc", "Hp", "Hc", "slope", "eps", "interpret", "mm",
    "has_skip", "has_res", "raw_prologue"))
def _bwd_raw(en_p, skip2_p, el_p, we_bd, wuv_bd,
             lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
             mdp, mdc, outp, outc, gp, gc, gen_p, gel_p,
             pids2d, cids2d, wb, nlive, W, Wc, Hp, Hc, slope, eps,
             interpret=False, mm="f32", has_skip=True, has_res=True,
             raw_prologue=False):
    rows, pde = en_p.shape
    De = we_bd.shape[1] // PACK  # output width (see _fwd_raw note)
    E = rows * PACK
    Dp = wlp.shape[1]
    Dc = wlc.shape[1]
    HP = _round_up(Hp + Hc, 8)
    s_pad = xrp.shape[0]
    chunk = pids2d.shape[1]  # per-graph chunk
    Q = chunk // PACK
    d2p = skip2_p.shape[1] if has_skip else 0
    sselp = jnp.asarray(_dir_selector(Hp, Dp // Hp, HP, 0))
    sselc = jnp.asarray(_dir_selector(Hc, Dc // Hc, HP, Hp))
    hm = jnp.asarray(np.concatenate(_head_masks(Hp, Hc, HP), axis=0))
    # Direction-stacked operands (see _bwd_kernel).
    Dpc = Dp + Dc
    wlpc = jnp.concatenate([wlp, wlc], axis=1)
    blpc = jnp.concatenate([blp, blc], axis=1)
    attpc = jnp.concatenate([attp, attc], axis=1)
    sselpc = jnp.concatenate([sselp, sselc], axis=0)
    mdtp = mdp.T
    mdtc = mdc.T
    n_blocks = s_pad // W
    mwinp = mdp[0:HP, ::W].T
    mwinp = jnp.pad(mwinp, ((0, _round_up(n_blocks, 8) - n_blocks), (0, 0)))
    mcam = jnp.pad(mdc[0:HP, 0:1].T, ((0, 7), (0, 0)))
    pids2d, cids2d = _pad_ids(pids2d, cids2d)
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32

    def stream(width):
        return pl.BlockSpec((Q, width), lambda c, wb_ref: (c, 0),
                            memory_space=pltpu.VMEM)

    fixed = lambda c, wb_ref: (0, 0)  # noqa: E731
    wblk = lambda c, wb_ref: (wb_ref[c], 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
        stream(pde),
    ]
    operands = [pids2d, cids2d, en_p]
    if has_skip:
        in_specs.append(stream(d2p))
        operands.append(skip2_p)
    in_specs += [
        stream(PACK * De),
        pl.BlockSpec((pde, PACK * De), fixed, memory_space=pltpu.VMEM),
    ]
    operands += [el_p, we_bd]
    if has_skip:
        in_specs.append(pl.BlockSpec((d2p, PACK * De), fixed, memory_space=pltpu.VMEM))
        operands.append(wuv_bd)
    in_specs += [
        pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((De, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, Dp), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((Dpc, HP), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, HP), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, 2 * HP), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, 2 * HP), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, HP), lambda c, wb_ref: (wb_ref[c] // 8, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, HP), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, Dp), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, Dp), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
        stream(PACK * De),
        stream(PACK * De),
    ]
    operands += [lng, lnb, wlpc, blpc, xrp, xrc, attpc,
                 sselpc, hm, mdtp, mdtc, mwinp, mcam, outp, outc,
                 gp, gc, gen_p, gel_p]

    out_specs = [stream(pde)]
    out_shapes = [jax.ShapeDtypeStruct((rows, pde), en_p.dtype)]
    if has_skip:
        out_specs.append(stream(d2p))
        out_shapes.append(jax.ShapeDtypeStruct((rows, d2p), skip2_p.dtype))
    if has_res:
        out_specs.append(stream(PACK * De))
        out_shapes.append(jax.ShapeDtypeStruct((rows, PACK * De), en_p.dtype))
    out_specs += [
        pl.BlockSpec((W, De), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((pde, PACK * De), fixed, memory_space=pltpu.VMEM),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((s_pad, De), jnp.float32),
        jax.ShapeDtypeStruct((Wc, De), jnp.float32),
        jax.ShapeDtypeStruct((pde, PACK * De), jnp.float32),
    ]
    if has_skip:
        out_specs.append(pl.BlockSpec((d2p, PACK * De), fixed, memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((d2p, PACK * De), jnp.float32))
    out_specs += [
        pl.BlockSpec((8, PACK * De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, De), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((De, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, Dpc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, Dp), wblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, Dpc), fixed, memory_space=pltpu.VMEM),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((8, PACK * De), jnp.float32),
        jax.ShapeDtypeStruct((8, De), jnp.float32),
        jax.ShapeDtypeStruct((8, De), jnp.float32),
        jax.ShapeDtypeStruct((De, Dpc), jnp.float32),
        jax.ShapeDtypeStruct((8, Dpc), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
        jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
        jax.ShapeDtypeStruct((8, Dpc), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((W + Wc, 2 * Dpc + HP), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, Wc=Wc, HP=HP, slope=slope, eps=eps,
                          mm_dtype=mm_dtype, has_skip=has_skip, has_res=has_res,
                          raw_prologue=raw_prologue),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), *operands)


def make_fused_layer_step(Hp: int, Hc: int, eps: float, mm: str,
                          has_skip: bool, has_res: bool,
                          table_sharded: bool = False,
                          raw_prologue: bool = False):
    """Custom-VJP merged layer step, statically specialized.

    Differentiable in every array argument; ids return None cotangents.
    Outputs: (e_l_p, en_next_p, out_pt, out_cam).
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(23, 24, 25, 26, 27, 28, 29))
    def step(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
             lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
             pids2d, cids2d, wb, nlive,
             n_pts, n_cams, W, Wc, slope, interpret, edge_axis):
        out, _ = _run(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
                      lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
                      pids2d, cids2d, wb, nlive,
                      n_pts, n_cams, W, Wc, slope, interpret, edge_axis)
        return out

    def _run(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
             lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
             pids2d, cids2d, wb, nlive,
             n_pts, n_cams, W, Wc, slope, interpret, edge_axis):
        De = w_e.shape[1]
        s_pad = _round_up(n_pts, W)
        ps_pad = ps if ps.shape[0] == s_pad else jnp.pad(
            ps, ((0, s_pad - ps.shape[0]), (0, 0)))
        pv_pad = pv if pv.shape[0] == Wc else jnp.pad(
            pv, ((0, Wc - pv.shape[0]), (0, 0)))
        xr_p_pad = xr_p if xr_p.shape[0] == s_pad else jnp.pad(
            xr_p, ((0, s_pad - xr_p.shape[0]), (0, 0)))
        xr_c_pad = xr_c if xr_c.shape[0] == Wc else jnp.pad(
            xr_c, ((0, Wc - xr_c.shape[0]), (0, 0)))
        we_bd = blockdiag(w_e)
        c0 = tile_row(b.reshape(1, De) + pg.reshape(1, De))
        wuv_bd = blockdiag(w_uv) if has_skip else None
        el_p, ennext_p, outp, outc, mdp, mdc = _fwd_raw(
            en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps_pad, pv_pad,
            lng, lnb, wlp, blp, wlc, blc, xr_p_pad, xr_c_pad, att_p, att_c,
            pids2d, cids2d, wb, nlive, W, Wc, Hp, Hc, slope, eps,
            interpret=interpret, finalize=edge_axis is None, mm=mm,
            has_skip=has_skip, has_res=has_res, raw_prologue=raw_prologue,
        )
        if edge_axis is not None:
            HP = _round_up(Hp + Hc, 8)
            Dp = wlp.shape[1]
            Dc = wlc.shape[1]
            if table_sharded:
                outp, mdp = exchange_boundary_windows(
                    outp, mdp, HP, Hp, Dp // Hp, edge_axis, wb, W
                )
            else:
                outp, mdp = combine_attention_shards(
                    outp, mdp, HP, Hp, Dp // Hp, edge_axis, wb=wb, W=W
                )
            mdc_r = jnp.concatenate([
                mdc[Hp : Hp + Hc], mdc[HP + Hp : HP + Hp + Hc]
            ], axis=0)
            outc, mdc_g = combine_attention_shards(
                outc, mdc_r, Hc, Hc, Dc // Hc, edge_axis
            )
            mdc = jnp.zeros_like(mdc)
            mdc = mdc.at[Hp : Hp + Hc].set(mdc_g[:Hc])
            mdc = mdc.at[HP + Hp : HP + Hp + Hc].set(mdc_g[Hc : 2 * Hc])
        res = (en_p, skip2_p, el_p, w_e, w_uv, lng, lnb, wlp, blp, wlc, blc,
               xr_p_pad, xr_c_pad, att_p, att_c, pids2d, cids2d, wb, nlive,
               outp, outc, mdp, mdc)
        return (el_p, ennext_p, outp[:n_pts], outc[:n_cams]), res

    def _fwd(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
             lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
             pids2d, cids2d, wb, nlive,
             n_pts, n_cams, W, Wc, slope, interpret, edge_axis):
        return _run(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
                    lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
                    pids2d, cids2d, wb, nlive,
                    n_pts, n_cams, W, Wc, slope, interpret, edge_axis)

    def _bwd(n_pts, n_cams, W, Wc, slope, interpret, edge_axis, res, g):
        (gel_p, gen_p, gp_out, gc_out) = g
        (en_p, skip2_p, el_p, w_e, w_uv, lng, lnb, wlp, blp, wlc, blc,
         xr_p_pad, xr_c_pad, att_p, att_c, pids2d, cids2d, wb, nlive,
         outp, outc, mdp, mdc) = res
        De = w_e.shape[1]
        s_pad = xr_p_pad.shape[0]
        gp = gp_out if gp_out.shape[0] == s_pad else jnp.pad(
            gp_out, ((0, s_pad - gp_out.shape[0]), (0, 0)))
        if edge_axis is not None:
            # Interior transpose rule (ops/segment.py): complete the table
            # cotangents (partial -> full); gel_p/gen_p are per-edge
            # (shard-local) and stay as they are. Table-sharded point side:
            # boundary exchange instead of the full-table psum.
            if table_sharded:
                gp = exchange_boundary_add(gp, edge_axis, wb, W)
            else:
                gp = jax.lax.psum(gp, edge_axis)
            gc_out = jax.lax.psum(gc_out, edge_axis)
        gc = gc_out if gc_out.shape[0] == Wc else jnp.pad(
            gc_out, ((0, Wc - gc_out.shape[0]), (0, 0)))
        we_bd = blockdiag(w_e)
        wuv_bd = blockdiag(w_uv) if has_skip else None
        outs = _bwd_raw(
            en_p, skip2_p, el_p, we_bd, wuv_bd,
            lng, lnb, wlp, blp, wlc, blc, xr_p_pad, xr_c_pad, att_p, att_c,
            mdp, mdc, outp, outc, gp, gc, gen_p, gel_p,
            pids2d, cids2d, wb, nlive, W, Wc, Hp, Hc, slope, eps,
            interpret=interpret, mm=mm, has_skip=has_skip, has_res=has_res,
            raw_prologue=raw_prologue,
        )
        i = 0
        den_p = outs[i]
        i += 1
        dskip2_p = outs[i] if has_skip else None
        i += has_skip
        dres_p = outs[i] if has_res else None
        i += has_res
        dps_full, dpv_full, dwe_bd = outs[i], outs[i + 1], outs[i + 2]
        i += 3
        dwuv_bd = outs[i] if has_skip else None
        i += has_skip
        (dsum8, dlng8, dlnb8, dwlpc, dblpc8,
         dxrp_full, dxrc_full, dattpc8) = outs[i : i + 8]

        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        vis_col = jnp.repeat(visited, W)[:, None]
        dps_full = jnp.where(vis_col, dps_full, 0.0)
        dxrp_full = jnp.where(vis_col, dxrp_full, 0.0)
        dsum = sum_lane_groups(dsum8[0:1], De)  # d(bias) == d(pg)
        d_in = en_p.shape[1] // PACK  # input width (narrow for first-layer)
        d2 = skip2_p.shape[1] // PACK if has_skip else 0
        dw_e = sum_diag_blocks(dwe_bd, d_in, De)
        dw_uv = sum_diag_blocks(dwuv_bd, d2, De) if has_skip else None
        # Split the direction-stacked frontend grads back per direction.
        Dp = xr_p_pad.shape[1]
        return (
            den_p, dskip2_p, dres_p,
            dw_e, dsum.reshape(-1), dw_uv,
            dps_full[:n_pts], dpv_full[:n_cams], dsum,
            dlng8[0:1], dlnb8[0:1],
            dwlpc[:, 0:Dp], dblpc8[0:1, 0:Dp],
            dwlpc[:, Dp:], dblpc8[0:1, Dp:],
            dxrp_full[:n_pts], dxrc_full[:n_cams],
            dattpc8[0:1, 0:Dp], dattpc8[0:1, Dp:],
            None, None, None, None,
        )

    step.defvjp(_fwd, _bwd)
    return step


_CACHE = {}


def fused_layer_step(Hp, Hc, eps, en_p, skip2_p, res_p, w_e, b, w_uv,
                     ps, pv, pg, lng, lnb, wlp, blp, wlc, blc,
                     xr_p, xr_c, att_p, att_c, pids2d, cids2d, wb,
                     n_pts, n_cams, W, Wc, slope=0.2, interpret=False,
                     edge_axis=None, nlive=None, raw_prologue=False):
    """Dispatch for the merged update+frontend step (see module docstring).

    en_p: (E/PACK, PACK*De) packed normalized stream of the PREVIOUS layer;
    res_p: packed residual stream (e_{l-1}) or None; skip2_p: packed
    init-skip stream or None; w_e/b/w_uv: lin_proj split; ps/pv/pg: the
    update's table linears' outputs; lng..att_c: the NEXT layer's frontend
    parameters (lng/lnb (1, De); blp/blc (1, D); att (1, D)); xr_p/xr_c:
    its query tables. Returns (e_l_p, en_next_p, out_pt, out_cam).
    """
    from gasfm_tpu.ops.segment import get_kernel_precision

    from gasfm_tpu.ops.segment import is_table_sharded

    key = (Hp, Hc, float(eps), get_kernel_precision(),
           skip2_p is not None, res_p is not None, is_table_sharded(),
           raw_prologue)
    fn = _CACHE.get(key)
    if fn is None:
        fn = make_fused_layer_step(*key)
        _CACHE[key] = fn
    if nlive is None:
        nlive = jnp.asarray(wb.shape[0], dtype=jnp.int32)
    return fn(en_p, skip2_p, res_p, w_e, b, w_uv, ps, pv, pg,
              lng, lnb, wlp, blp, wlc, blc, xr_p, xr_c, att_p, att_c,
              pids2d, cids2d, wb, nlive, n_pts, n_cams, W, Wc, slope,
              interpret, edge_axis)
