"""Functional GATv2-style segment attention core.

Semantics match PyG ``GATv2Conv(add_self_loops=False, share_weights=False,
concat=True)`` as used by the reference (code/models/layers.py:304-309,
401-406, 506-526) restricted to the star graphs the reference builds: all
source nodes of a segment attend into one aggregation node.

Given per-edge source features already transformed by the source linear map
(``xl``) and per-segment query features transformed by the target linear map
(``xr``), one attention head computes

    score_e = att_h . LeakyReLU(xl_e + xr_seg(e), 0.2)
    alpha   = segment_softmax(score)
    out_s   = sum_e alpha_e * xl_e

TPU implementation notes (measured on v5e):
- All segment scatters/gathers run on flat 2D ``(rows, H*C)`` arrays —
  3D ``(rows, H, C)`` layouts make XLA's scatter ~12x slower.
- The softmax numerator and denominator are fused into ONE wide segment-sum
  over ``(E, H*C + H)`` so the graph has a single scatter in the hot path
  (plus the stop-gradient segment-max for stability).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gasfm_tpu.ops.segment import (
    SegmentWindows,
    _kernel_interpret,
    _kernels_enabled,
    gather_segments,
    segment_max,
    segment_sum,
)

from gasfm_tpu.ops.segment import _DENSE_MAX_SEGMENTS  # one authoritative cutoff


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _opf32(x):
    """Upcast a small (non-edge-stream) kernel operand to f32. Mixed-dtype
    Pallas refs are rejected, and under bf16 param storage
    (``train.param_dtype``, train/state._with_f32_master) weight-side
    operands arrive bfloat16; the convert fuses into the operand read, and
    the transpose of the convert casts the f32 cotangent back to bf16."""
    if x is None or x.dtype == jnp.float32:
        return x
    return x.astype(jnp.float32)


def gatv2_attend_pool(
    xl: jnp.ndarray,  # (E, H, C) transformed source features
    xr0: jnp.ndarray,  # (1, H, C) transformed query features of THE segment
    att: jnp.ndarray,  # (H, C) attention vectors
    row_mask: jnp.ndarray,  # (E,) valid-source mask
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Single-segment specialization of :func:`gatv2_attend`: every valid row
    attends into one aggregation node (the reference's view->global and
    point->global star graphs, code/models/layers.py:538-603).

    With one segment the softmax is an ordinary masked softmax over rows and
    the weighted aggregation is one matmul, so both forward AND backward are
    dense XLA ops — the generic segment path would lower its backward to a
    serialized row scatter on TPU (~2.5 ms for 5120 rows, measured)."""
    E, H, C = xl.shape
    g = xl + xr0.reshape(1, H, C)
    g = jnp.where(g >= 0, g, negative_slope * g)  # LeakyReLU(0.2)
    logits = jnp.sum(g * att[None, :, :], axis=-1)  # (E, H)
    logits = jnp.where(row_mask[:, None], logits, -jnp.inf)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=0))  # (H,)
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    p = jnp.exp(logits - m[None, :])
    p = jnp.where(row_mask[:, None], p, jnp.zeros_like(p))
    den = jnp.sum(p, axis=0)  # (H,)
    num = jnp.einsum("eh,ehc->hc", p, xl)  # (H, C), one MXU matmul per head
    den = jnp.where(den > 0, den, jnp.ones_like(den))
    return (num / den[:, None])[None]  # (1, H, C)


def gatv2_attend_pool_sharded(
    xl: jnp.ndarray,  # (E, H, C) local table rows' transformed features
    xr0: jnp.ndarray,  # (1, H, C)
    att: jnp.ndarray,  # (H, C)
    row_mask: jnp.ndarray,  # (E,) valid AND owned-by-this-shard rows
    axis: str,
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Table-sharded variant of :func:`gatv2_attend_pool`: each shard pools
    its OWNED table rows and the per-head softmax triples (max, exp-sum,
    weighted sum) combine across the edge axis — O(H*C) collective volume
    instead of pooling a replicated full table. Gradients follow the
    interior transpose rule (all_sum psums the partial cotangents)."""
    from gasfm_tpu.ops.segment import all_sum

    E, H, C = xl.shape
    g = xl + xr0.reshape(1, H, C)
    g = jnp.where(g >= 0, g, negative_slope * g)
    logits = jnp.sum(g * att[None, :, :], axis=-1)  # (E, H)
    logits = jnp.where(row_mask[:, None], logits, -jnp.inf)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=0))
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    m = jax.lax.stop_gradient(jax.lax.pmax(m, axis))  # global shift
    p = jnp.exp(logits - m[None, :])
    p = jnp.where(row_mask[:, None], p, jnp.zeros_like(p))
    den = all_sum(jnp.sum(p, axis=0))  # (H,) global
    num = all_sum(jnp.einsum("eh,ehc->hc", p, xl))  # (H, C) global
    den = jnp.where(den > 0, den, jnp.ones_like(den))
    return (num / den[:, None])[None]


def gatv2_attend(
    xl: jnp.ndarray,  # (E, H, C) transformed source features
    xr: jnp.ndarray,  # (S, H, C) transformed per-segment query features
    att: jnp.ndarray,  # (H, C) attention vectors
    seg_ids: jnp.ndarray,  # (E,) target segment per edge (num_segments = trash)
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    negative_slope: float = 0.2,
    window: Optional[SegmentWindows] = None,
) -> jnp.ndarray:
    """Returns (S, H, C) attention-aggregated source features per segment."""
    E, H, C = xl.shape
    xl2 = xl.reshape(E, H * C)
    xr2 = _opf32(xr.reshape(num_segments, H * C))
    att = _opf32(att)

    # Fused single-kernel path (TPU): the whole attention — query gather,
    # logits, online segment softmax, weighted aggregation — runs as ONE
    # Pallas launch forward and one backward (gasfm_tpu/ops/pallas/
    # fused_attn.py), instead of 4+ launches with E-sized HBM intermediates.
    # Under edge partitioning the kernel runs unfinalized per shard and the
    # softmax (num, m, den) triples combine with pmax/psum over the edge
    # mesh axis (fused_attn.combine_attention_shards) — the distributed
    # segment-softmax exchange of SURVEY section 5, riding ICI.
    from gasfm_tpu.ops.segment import current_edge_axis, is_table_sharded

    if (
        _kernels_enabled()
        and xl2.dtype == jnp.float32
        and E % 128 == 0
        and (window is not None or num_segments <= _DENSE_MAX_SEGMENTS)
    ):
        from gasfm_tpu.graph.view_graph import WINDOW
        from gasfm_tpu.ops.pallas.fused_attn import fused_attend_h
        from gasfm_tpu.ops.pallas.segment_kernels import _edge_tile

        # Table-sharded boundary exchange applies ONLY to the windowed
        # direction: a point window is owned by at most 2 neighboring
        # shards (span<=2 contract). The dense direction's single
        # whole-table window is touched by EVERY shard, so it must keep
        # the full combine_attention_shards psum/pmax.
        ts = window is not None and is_table_sharded()

        if window is not None:
            W = WINDOW
            wb = window.block
        else:
            # Windowless (dense) direction: the chunk is a free tile size.
            W = _round_up(max(num_segments, 1), 128)
            wb = jnp.zeros((E // _edge_tile(E),), dtype=jnp.int32)
        s_pad = _round_up(num_segments, W)
        ids = seg_ids.astype(jnp.int32)
        if edge_mask is not None:
            # Route masked edges outside every window (id s_pad maps past the
            # last block's range) so they contribute nothing, matching the
            # XLA path's p-masking (and its zero gradients).
            ids = jnp.where(edge_mask, ids, s_pad)
        out2 = fused_attend_h(
            H, xl2, xr2, att.reshape(1, H * C), ids[:, None], wb,
            num_segments, W, negative_slope, _kernel_interpret(),
            edge_axis=current_edge_axis(), table_sharded=ts,
        )
        if window is not None and window.row_ok is not None:
            out2 = jnp.where(window.row_ok[:, None], out2, 0.0)
        return out2.reshape(num_segments, H, C)

    g2 = xl2 + gather_segments(xr2, seg_ids, num_segments, window=window)  # (E, H*C)
    g2 = jnp.where(g2 >= 0, g2, negative_slope * g2)  # LeakyReLU(0.2)
    logits = jnp.sum(g2.reshape(E, H, C) * att[None, :, :], axis=-1)  # (E, H)

    # Stable softmax: per-segment max (exactly zero-gradient; see
    # segment_softmax) computed on the narrow (E, H) array.
    m = segment_max(
        jax.lax.stop_gradient(logits), seg_ids, num_segments, edge_mask,
        indices_are_sorted, window=window,
    )
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    m_e = jax.lax.stop_gradient(gather_segments(m, seg_ids, num_segments, window=window))
    # Valid edges have logits <= their segment max; the stop-gradient cap
    # only affects masked/padded edges, whose exp would otherwise overflow to
    # inf and poison the backward with 0 * inf = NaN. (A plain minimum would
    # zero the gradient of every segment's argmax edge at the 0 tie.)
    shifted = logits - m_e
    p = jnp.exp(shifted - jax.lax.stop_gradient(jnp.maximum(shifted, 0.0)))  # (E, H)
    if edge_mask is not None:
        p = jnp.where(edge_mask[:, None], p, jnp.zeros_like(p))

    # One fused wide segment-sum: [weighted features | softmax denominators].
    weighted = (p[:, :, None] * xl.reshape(E, H, C)).reshape(E, H * C)
    packed = jnp.concatenate([weighted, p], axis=1)  # (E, H*C + H)
    sums = segment_sum(packed, seg_ids, num_segments, edge_mask, indices_are_sorted, window=window)
    num = sums[:, : H * C].reshape(num_segments, H, C)
    den = sums[:, H * C :]  # (S, H)
    den = jnp.where(den > 0, den, jnp.ones_like(den))
    return num / den[:, :, None]


def gatv2_attend_dual(
    xl_p: jnp.ndarray,  # (E, Hp, Cp) point-side transformed source features
    xr_p: jnp.ndarray,  # (Np, Hp, Cp) point-side query transforms
    att_p: jnp.ndarray,  # (Hp, Cp)
    pt_ids: jnp.ndarray,  # (E,) point segment ids (blocked point-major)
    num_pts: int,
    window: Optional[SegmentWindows],
    xl_c: jnp.ndarray,  # (E, Hc, Cc) camera-side transformed source features
    xr_c: jnp.ndarray,  # (Nc, Hc, Cc) camera-side query transforms
    att_c: jnp.ndarray,  # (Hc, Cc)
    cam_ids: jnp.ndarray,  # (E,) camera ids (unsorted)
    num_cams: int,
    edge_mask: Optional[jnp.ndarray] = None,
    negative_slope: float = 0.2,
):
    """Both per-layer edge aggregations in one pass.

    When the fused TPU path is eligible this lowers to ONE Pallas kernel per
    forward/backward (gasfm_tpu/ops/pallas/fused_dual_attn.py) with the two
    directions packed on the lane axis — each alone uses D = H*C ~ 32 of the
    128 lanes and pays the per-chunk fixed cost (id decode, one-hot build,
    grid/DMA overhead) twice. Fallback: two composite :func:`gatv2_attend`
    calls with identical semantics.
    """
    import os as _os

    from gasfm_tpu.ops.segment import current_edge_axis

    E = xl_p.shape[0]
    Hp, Cp = xl_p.shape[1], xl_p.shape[2]
    Hc, Cc = xl_c.shape[1], xl_c.shape[2]
    xr_p, xr_c, att_p, att_c = map(_opf32, (xr_p, xr_c, att_p, att_c))
    if (
        _kernels_enabled()
        and window is not None
        and xl_p.dtype == jnp.float32
        and xl_c.dtype == jnp.float32
        and E % window.block.shape[0] == 0
        and num_cams <= _DENSE_MAX_SEGMENTS
        # A/B kill-switch (convention: GASFM_MERGED / GASFM_PACKED): forces
        # the two-single-calls fallback, e.g. to exercise the single-
        # direction fused path under sharding in tests.
        and _os.environ.get("GASFM_DUAL", "1") != "0"
    ):
        from gasfm_tpu.graph.view_graph import WINDOW
        from gasfm_tpu.ops.pallas.fused_dual_attn import fused_dual_attend

        chunk = E // window.block.shape[0]  # per-graph chunk
        W = WINDOW
        s_pad = _round_up(num_pts, W)
        Wc = _round_up(max(num_cams, 1), 128)
        pids = pt_ids.astype(jnp.int32)
        cids = cam_ids.astype(jnp.int32)
        if edge_mask is not None:
            # Masked edges: out of every point window; camera trash row.
            pids = jnp.where(edge_mask, pids, s_pad)
            cids = jnp.where(edge_mask, cids, num_cams)
        out_p2, out_c2 = fused_dual_attend(
            Hp, Hc,
            xl_p.reshape(E, Hp * Cp), xl_c.reshape(E, Hc * Cc),
            xr_p.reshape(num_pts, Hp * Cp), xr_c.reshape(num_cams, Hc * Cc),
            att_p.reshape(1, Hp * Cp), att_c.reshape(1, Hc * Cc),
            pids.reshape(-1, chunk), cids.reshape(-1, chunk), window.block,
            num_pts, num_cams, W, Wc, negative_slope, _kernel_interpret(),
            edge_axis=current_edge_axis(),
            nlive=window.nlive if edge_mask is not None else None,
        )
        if window.row_ok is not None:
            out_p2 = jnp.where(window.row_ok[:, None], out_p2, 0.0)
        return out_p2.reshape(num_pts, Hp, Cp), out_c2.reshape(num_cams, Hc, Cc)

    out_p = gatv2_attend(
        xl_p, xr_p, att_p, pt_ids, num_pts, edge_mask=edge_mask,
        indices_are_sorted=True, negative_slope=negative_slope, window=window,
    )
    out_c = gatv2_attend(
        xl_c, xr_c, att_c, cam_ids, num_cams, edge_mask=edge_mask,
        indices_are_sorted=False, negative_slope=negative_slope,
    )
    return out_p, out_c


def _layer_norm_relu(e: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float) -> jnp.ndarray:
    """Functional flax-semantics LayerNorm (+ ReLU) over the last axis."""
    mean = jnp.mean(e, axis=-1, keepdims=True)
    var = jnp.mean(e * e, axis=-1, keepdims=True) - mean * mean
    xn = (e - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.maximum(xn, 0.0)


def gatv2_layer_frontend(
    e_raw: jnp.ndarray,  # (E, De) RAW edge features
    ln_scale: jnp.ndarray,  # (De,)
    ln_bias: jnp.ndarray,  # (De,)
    eps: float,
    # point side
    wlp: jnp.ndarray, blp: jnp.ndarray,  # (De, Dp), (Dp,)
    att_p: jnp.ndarray,  # (Hp, Cp)
    xr_p: jnp.ndarray,  # (Np, Hp, Cp)
    pt_ids: jnp.ndarray,
    num_pts: int,
    window,
    # camera side
    wlc: jnp.ndarray, blc: jnp.ndarray,
    att_c: jnp.ndarray,  # (Hc, Cc)
    xr_c: jnp.ndarray,  # (Nc, Hc, Cc)
    cam_ids: jnp.ndarray,
    num_cams: int,
    edge_mask: Optional[jnp.ndarray] = None,
    negative_slope: float = 0.2,
    packed: bool = False,
    raw_prologue: bool = False,
):
    """The whole GASFM-layer edge-stream prologue — LN + ReLU + the two GATv2
    source transforms + BOTH aggregations — as one fused kernel when
    eligible (see ops/pallas/fused_dual_attn.fused_frontend), else the exact
    composite XLA computation. Returns (e_norm, out_pt (Np,Hp,Cp),
    out_cam (Nc,Hc,Cc)).

    ``packed``: e_raw is a lane-packed (E/PACK, PACK*De) stream
    (ops/pallas/packing.py) and e_norm keeps that layout; the composite
    fallback relayouts at the boundaries with identical semantics.

    ``raw_prologue``: skip LN + ReLU — the source transforms consume the raw
    stream, which is the FINAL-aggregation semantics
    (AxialAttentionAggregator.prepare / reference layers.py:723-870);
    ln_scale/ln_bias are then dummy operands whose gradients are zero, and
    the returned e_norm is the raw stream itself."""
    from gasfm_tpu.ops.segment import current_edge_axis

    ln_scale, ln_bias, wlp, blp, wlc, blc, att_p, att_c, xr_p, xr_c = map(
        _opf32, (ln_scale, ln_bias, wlp, blp, wlc, blc, att_p, att_c, xr_p, xr_c)
    )
    if packed:
        from gasfm_tpu.ops.pallas.packing import PACK

        _rows, _pd = e_raw.shape
        De = _pd // PACK
        E = _rows * PACK
    else:
        E, De = e_raw.shape
    Hp, Cp = xr_p.shape[1], xr_p.shape[2]
    Hc, Cc = xr_c.shape[1], xr_c.shape[2]
    if (
        _kernels_enabled()
        and window is not None
        # bf16 accepted for lane-packed streams (packing.stream_dtype).
        and (e_raw.dtype == jnp.float32
             or (packed and e_raw.dtype == jnp.bfloat16))
        and E % window.block.shape[0] == 0
        and num_cams <= _DENSE_MAX_SEGMENTS
    ):
        from gasfm_tpu.graph.view_graph import WINDOW
        from gasfm_tpu.ops.pallas.fused_dual_attn import fused_frontend

        chunk = E // window.block.shape[0]  # per-graph chunk
        wb = window.block
        nlive = window.nlive if edge_mask is not None else None
        if not packed and chunk > 1024:
            # Sub-chunk the UNPACKED frontend at 1024: its backward's VMEM
            # footprint scales with the chunk (17.7 MB > the 16 MB scoped
            # limit at 2048 — the round-4 CHUNK=2048 blocker), while
            # window-constancy holds for any aligned sub-chunk of a chunk.
            # Sub-chunk liveness is no longer a global prefix (a live
            # chunk's padded tail sub-chunks sit before the next block's
            # live ones), so the dead-chunk skip is disabled here — the
            # unpacked frontend runs once per step (first layer only).
            if chunk % 1024 != 0:
                # Guaranteed by build_view_graph's chunk validation; a
                # violation here would otherwise read wb_ref out of bounds
                # and silently map chunks to wrong point windows.
                raise ValueError(
                    f"sub-chunked frontend requires chunk % 1024 == 0, got {chunk}"
                )
            f = chunk // 1024
            chunk = 1024
            wb = jnp.repeat(wb, f)
            nlive = None
        W = WINDOW
        s_pad = _round_up(num_pts, W)
        Wc = _round_up(max(num_cams, 1), 128)
        pids = pt_ids.astype(jnp.int32)
        cids = cam_ids.astype(jnp.int32)
        if edge_mask is not None:
            pids = jnp.where(edge_mask, pids, s_pad)
            cids = jnp.where(edge_mask, cids, num_cams)
        en, out_p2, out_c2 = fused_frontend(
            Hp, Hc, eps, e_raw,
            ln_scale.reshape(1, De), ln_bias.reshape(1, De),
            wlp, blp.reshape(1, Hp * Cp), wlc, blc.reshape(1, Hc * Cc),
            xr_p.reshape(num_pts, Hp * Cp), xr_c.reshape(num_cams, Hc * Cc),
            att_p.reshape(1, Hp * Cp), att_c.reshape(1, Hc * Cc),
            pids.reshape(-1, chunk), cids.reshape(-1, chunk), wb,
            num_pts, num_cams, W, Wc, negative_slope, _kernel_interpret(),
            edge_axis=current_edge_axis(), packed=packed,
            nlive=nlive,
            raw_prologue=raw_prologue,
        )
        if window.row_ok is not None:
            out_p2 = jnp.where(window.row_ok[:, None], out_p2, 0.0)
        return en, out_p2.reshape(num_pts, Hp, Cp), out_c2.reshape(num_cams, Hc, Cc)

    if packed:
        from gasfm_tpu.ops.pallas.packing import pack_edges, unpack_edges

        # Packed layout requires window metadata (the model gates on it),
        # so the per-graph chunk is always derivable here.
        _chunk = E // window.block.shape[0]
        in_dtype = e_raw.dtype
        e_raw = unpack_edges(e_raw, _chunk).astype(jnp.float32)
    en = (e_raw.astype(jnp.float32) if raw_prologue
          else _layer_norm_relu(e_raw, ln_scale, ln_bias, eps))
    xl_p = (en @ wlp + blp).reshape(E, Hp, Cp)
    xl_c = (en @ wlc + blc).reshape(E, Hc, Cc)
    out_p, out_c = gatv2_attend_dual(
        xl_p, xr_p, att_p, pt_ids, num_pts, window,
        xl_c, xr_c, att_c, cam_ids, num_cams,
        edge_mask=edge_mask, negative_slope=negative_slope,
    )
    if packed:
        en = pack_edges(en, _chunk).astype(in_dtype)
    return en, out_p, out_c


def merged_layer_frontend(
    pending,  # models.layers.PendingUpdate: the PREVIOUS layer's update
    ln_scale, ln_bias, eps,
    wlp, blp, att_p, xr_p, pt_ids, num_pts, window,
    wlc, blc, att_c, xr_c, cam_ids, num_cams,
    edge_mask=None, negative_slope: float = 0.2,
    raw_prologue: bool = False,
):
    """The merged inter-layer step: materialize the previous layer's
    deferred projection update AND run THIS layer's fused frontend in one
    Pallas launch (ops/pallas/fused_layer_step.py).

    Only called when the packed fused path is eligible (the caller gates);
    no composite fallback exists at this level — the non-merged path is the
    fallback. Returns (e_prev_packed, e_norm_packed, out_pt, out_cam)."""
    from gasfm_tpu.graph.view_graph import WINDOW
    from gasfm_tpu.ops.pallas.fused_layer_step import fused_layer_step
    from gasfm_tpu.ops.segment import current_edge_axis

    ln_scale, ln_bias, wlp, blp, wlc, blc, att_p, att_c, xr_p, xr_c = map(
        _opf32, (ln_scale, ln_bias, wlp, blp, wlc, blc, att_p, att_c, xr_p, xr_c)
    )
    pending = pending._replace(
        w_e=_opf32(pending.w_e), b=_opf32(pending.b), w_uv=_opf32(pending.w_uv),
        ps=_opf32(pending.ps), pv=_opf32(pending.pv), pg=_opf32(pending.pg),
    )
    Hp, Cp = xr_p.shape[1], xr_p.shape[2]
    Hc, Cc = xr_c.shape[1], xr_c.shape[2]
    De = ln_scale.shape[-1]
    W = WINDOW
    s_pad = _round_up(num_pts, W)
    Wc = _round_up(max(num_cams, 1), 128)
    pids = pt_ids.astype(jnp.int32)
    cids = cam_ids.astype(jnp.int32)
    if edge_mask is not None:
        pids = jnp.where(edge_mask, pids, s_pad)
        cids = jnp.where(edge_mask, cids, num_cams)
    e_prev, en, out_p2, out_c2 = fused_layer_step(
        Hp, Hc, eps,
        pending.en, pending.skip2, pending.res,
        pending.w_e, pending.b, pending.w_uv,
        pending.ps, pending.pv, pending.pg,
        ln_scale.reshape(1, De), ln_bias.reshape(1, De),
        wlp, blp.reshape(1, Hp * Cp), wlc, blc.reshape(1, Hc * Cc),
        xr_p.reshape(num_pts, Hp * Cp), xr_c.reshape(num_cams, Hc * Cc),
        att_p.reshape(1, Hp * Cp), att_c.reshape(1, Hc * Cc),
        pids.reshape(-1, pids.shape[0] // window.block.shape[0]),
        cids.reshape(-1, cids.shape[0] // window.block.shape[0]),
        window.block,
        num_pts, num_cams, W, Wc, negative_slope, _kernel_interpret(),
        edge_axis=current_edge_axis(),
        nlive=window.nlive if edge_mask is not None else None,
        raw_prologue=raw_prologue,
    )
    if window.row_ok is not None:
        out_p2 = jnp.where(window.row_ok[:, None], out_p2, 0.0)
    return (e_prev, en,
            out_p2.reshape(num_pts, Hp, Cp), out_c2.reshape(num_cams, Hc, Cc))
