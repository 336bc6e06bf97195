"""Fused GATv2 segment attention as single Pallas TPU kernels.

Replaces the composite attention pipeline (gather query -> segment max ->
gather max -> exp -> wide segment sum, i.e. 4+ Pallas launches with E-sized
intermediates round-tripping HBM and XLA layout copies at every custom-call
boundary) with ONE kernel per direction:

    forward:  flash-attention-style online softmax over the blocked
              point-major edge layout (gasfm_tpu/graph/view_graph.py). Each
              aligned CHUNK of edges touches one W-wide window of segments
              (scalar-prefetched block index per chunk, non-decreasing), so
              the output tile, running max and running denominator stay
              resident in VMEM across a window's chunks:

                  m'   = max(m, max_e in chunk logits_e)
                  num' = num * exp(m - m') + sum_e p_e * xl_e
                  den' = den * exp(m - m') + sum_e p_e,   p_e = exp(l_e - m')

              finalized to num/den (0 for empty segments) on the window's
              last chunk. All segment gathers/reductions are one-hot matmuls
              on the MXU built in VMEM.

    backward: one kernel recomputing logits/p per chunk (z, p are never
              stored to HBM) and emitting d xl (per chunk), d xr (window
              accumulate) and d att (grid-wide accumulate), using the saved
              (m, den) rows and forward output. The gradient through the max
              shift is exactly zero (softmax shift invariance), matching the
              stop_gradient convention of gasfm_tpu/ops/segment.py.

Semantics parity target: gasfm_tpu/ops/gatv2.gatv2_attend (itself matching
PyG GATv2Conv on the reference's star graphs, code/models/layers.py:266-458);
tests validate forward AND grads against the pure-XLA path.

Dense (unsorted-id) variant: the same kernels with a constant window covering
the whole table (cam-side aggregation, few hundred cameras). The trash
segment id == num_segments lands on a padded table row and is sliced off.

Padded edges carry ids outside their chunk's window -> zero one-hot row ->
no contribution; their recomputed p is clamped (exp(min(.,0)) <= 1) so no
non-finite values can poison the MXU accumulations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_NEG = -1e30


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _head_selector(H: int, C: int, HP: int) -> np.ndarray:
    """(H*C, HP) 0/1 matrix mapping flat feature dim -> head (zero-padded)."""
    s = np.zeros((H * C, HP), dtype=np.float32)
    for h in range(H):
        s[h * C : (h + 1) * C, h] = 1.0
    return s


def _expand_heads(a: jnp.ndarray, H: int, C: int) -> jnp.ndarray:
    """(HP, S) per-head rows -> (S, H*C) head-major flat broadcast."""
    out = a[:H].T  # (S, H)
    return jnp.repeat(out, C, axis=1) if C > 1 else out


def _merge_softmax_rows(num_a, m_a, den_a, num_b, m_b, den_b, H, C):
    """Exact merge of two online-softmax partial triples for the same rows.

    num: (W, H*C); m/den: (W, H). The neutral element is
    (num=0, m=_NEG, den=0), so merging a neutral contribution is a no-op —
    callers exploit this to make non-matching boundary exchanges vanish.
    """
    m = jnp.maximum(m_a, m_b)
    ca = jnp.exp(m_a - m)
    cb = jnp.exp(m_b - m)
    den = den_a * ca + den_b * cb
    num = num_a * _expand_heads(ca.T, H, C) + num_b * _expand_heads(cb.T, H, C)
    return num, m, den


def exchange_boundary_windows(num, md, HP, H, C, edge_axis, wb, W):
    """Sub-linear cross-shard combine for the windowed (point) direction
    under TABLE SHARDING (SURVEY section 5's boundary exchange; the
    round-2/3 verdicts' deferred design).

    In the blocked point-major layout each edge shard's chunks touch a
    CONTIGUOUS window range [wb[0], wb[-1]], and a window is shared by AT
    MOST the two neighboring shards when every window's chunk run fits in
    one shard slice (the span<=2 contract, checked host-side by
    parallel.check_table_shard_contract). Instead of psum/pmax over the
    FULL (s_pad, D) tables (volume = table size, shard-count independent —
    the replication floor of BENCHLOG section 16), each shard exchanges
    ONLY its first/last window's partial triple with its two neighbors
    over ICI ppermutes: per-shard volume is O(W * (D + 2H)) per direction
    per layer, INDEPENDENT of the table size.

    After the exchange every locally-TOUCHED window holds the exact global
    (num, m, den); untouched windows keep their local (neutral) values and
    are masked by the caller's visited mask. Non-matching arrivals (the
    neighbor does not share the window, or the ring wraps) are neutralized
    by an id-match mask before the merge.
    """
    s_pad = num.shape[0]
    m_loc = md[0:HP].T  # (s_pad, HP) row-major views for dynamic slicing
    den_loc = md[HP : 2 * HP].T
    idx = jax.lax.axis_index(edge_axis)
    n_shards = jax.lax.axis_size(edge_axis)
    first_w = wb[0]
    last_w = wb[-1]

    def window_rows(w):
        off = w * W
        return (
            jax.lax.dynamic_slice_in_dim(num, off, W, 0),
            jax.lax.dynamic_slice_in_dim(m_loc, off, W, 0),
            jax.lax.dynamic_slice_in_dim(den_loc, off, W, 0),
        )

    # Send my FIRST window's partial to the LEFT neighbor, my LAST to the
    # RIGHT (ring ppermute; wrap arrivals neutralized below).
    send_left = window_rows(first_w) + (first_w,)
    send_right = window_rows(last_w) + (last_w,)
    left_perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    right_perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    from_right = tuple(
        jax.lax.ppermute(x, edge_axis, left_perm) for x in send_left
    )  # right neighbor's FIRST window
    from_left = tuple(
        jax.lax.ppermute(x, edge_axis, right_perm) for x in send_right
    )  # left neighbor's LAST window

    def neutralize(rows, rid, ok):
        nz, mz, dz = rows
        return (
            jnp.where(ok, nz, 0.0),
            jnp.where(ok, mz, _NEG),
            jnp.where(ok, dz, 0.0),
        )

    # Left arrival merges into MY FIRST window iff ids match and I am not
    # shard 0 (ring wrap); right arrival into MY LAST window likewise.
    ok_l = jnp.logical_and(idx > 0, from_left[3] == first_w)
    ok_r = jnp.logical_and(idx < n_shards - 1, from_right[3] == last_w)
    recv_l = neutralize(from_left[:3], from_left[3], ok_l)
    recv_r = neutralize(from_right[:3], from_right[3], ok_r)

    def merge_at(num, m_loc, den_loc, w, recv):
        off = w * W
        mine = (
            jax.lax.dynamic_slice_in_dim(num, off, W, 0),
            jax.lax.dynamic_slice_in_dim(m_loc, off, W, 0),
            jax.lax.dynamic_slice_in_dim(den_loc, off, W, 0),
        )
        nm, mm, dm = _merge_softmax_rows(*mine, *recv, H, C)
        return (
            jax.lax.dynamic_update_slice_in_dim(num, nm, off, 0),
            jax.lax.dynamic_update_slice_in_dim(m_loc, mm, off, 0),
            jax.lax.dynamic_update_slice_in_dim(den_loc, dm, off, 0),
        )

    num, m_loc, den_loc = merge_at(num, m_loc, den_loc, first_w, recv_l)
    # When first_w == last_w (single-window shard) both arrivals target the
    # same rows; sequential merges compose exactly (the merge is associative).
    num, m_loc, den_loc = merge_at(num, m_loc, den_loc, last_w, recv_r)

    # Untouched windows hold uninitialized kernel memory: select them to
    # neutral values so no NaN/Inf leaks into downstream table ops (their
    # rows are never CONSUMED on this shard, but 0 * NaN would poison the
    # point->global pool's masked matmul).
    win = jax.lax.broadcasted_iota(jnp.int32, (s_pad // W,), 0)
    touched = jnp.repeat(
        jnp.logical_and(win >= first_w, win <= last_w), W
    )[:, None]
    inv = jnp.where(den_loc > 0, 1.0 / jnp.maximum(den_loc, 1e-38), 0.0)
    out_full = jnp.where(touched, num * _expand_heads(inv.T, H, C), 0.0)
    m_loc = jnp.where(touched, m_loc, _NEG)
    den_loc = jnp.where(touched, den_loc, 0.0)
    md_g = jnp.concatenate([m_loc.T, den_loc.T], axis=0)  # (2*HP, s_pad)
    return out_full, md_g


def exchange_boundary_add(g, edge_axis, wb, W):
    """Transpose-side boundary exchange: plain SUM of the neighbors'
    cotangent contributions for the shared first/last windows (the
    table-sharded replacement for the backward-entry full-table psum of the
    interior transpose rule, ops/segment.py)."""
    idx = jax.lax.axis_index(edge_axis)
    n_shards = jax.lax.axis_size(edge_axis)
    first_w = wb[0]
    last_w = wb[-1]

    def rows(w):
        return jax.lax.dynamic_slice_in_dim(g, w * W, W, 0)

    left_perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    right_perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    fr_rows = jax.lax.ppermute(rows(first_w), edge_axis, left_perm)
    fr_id = jax.lax.ppermute(first_w, edge_axis, left_perm)
    fl_rows = jax.lax.ppermute(rows(last_w), edge_axis, right_perm)
    fl_id = jax.lax.ppermute(last_w, edge_axis, right_perm)
    ok_l = jnp.logical_and(idx > 0, fl_id == first_w)
    ok_r = jnp.logical_and(idx < n_shards - 1, fr_id == last_w)
    g = jax.lax.dynamic_update_slice_in_dim(
        g, rows(first_w) + jnp.where(ok_l, fl_rows, 0.0), first_w * W, 0
    )
    g = jax.lax.dynamic_update_slice_in_dim(
        g, rows(last_w) + jnp.where(ok_r, fr_rows, 0.0), last_w * W, 0
    )
    return g


def combine_attention_shards(num, md, HP, H, C, edge_axis, wb=None, W=None):
    """Cross-shard finalization of the online-softmax attention partials.

    This is the distributed segment-softmax exchange of SURVEY section 5:
    each edge shard's fused kernel (run with ``finalize=False``) leaves
    ``num`` = running weighted sums relative to its local max and
    ``md`` = stacked (m_local (HP, S), den_local (HP, S)). The shards'
    triples combine exactly with one ``pmax`` + one ``psum`` over the edge
    mesh axis (ICI):

        m_g   = pmax(m_local)
        den_g = psum(den_local * exp(m_local - m_g))
        num_g = psum(num_local * exp(m_local - m_g))
        out   = num_g / den_g   (0 where den_g == 0)

    ``wb`` (the local chunk->window map) marks window blocks this shard
    never visited: their kernel rows are uninitialized and must be masked
    to the combine's neutral values first. Returns (out_full, md_global)
    with md_global = [m_g; den_g] so the UNMODIFIED backward kernel — which
    only reads (m, den, out) — computes exactly this shard's cotangent
    contribution under the global softmax.
    """
    s_pad = num.shape[0]
    m_loc = md[0:HP]  # (HP, s_pad)
    den_loc = md[HP : 2 * HP]
    if wb is not None:
        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        vis = jnp.repeat(visited, W)  # (s_pad,)
        m_loc = jnp.where(vis[None, :], m_loc, _NEG)
        den_loc = jnp.where(vis[None, :], den_loc, 0.0)
        num = jnp.where(vis[:, None], num, 0.0)
    m_g = jax.lax.pmax(m_loc, edge_axis)
    corr = jnp.exp(m_loc - m_g)  # exp(_NEG - _NEG) = 1 is fine: den/num are 0
    den_g = jax.lax.psum(den_loc * corr, edge_axis)
    num_g = jax.lax.psum(num * _expand_heads(corr, H, C), edge_axis)
    inv = jnp.where(den_g > 0, 1.0 / jnp.maximum(den_g, 1e-38), 0.0)
    out_full = num_g * _expand_heads(inv, H, C)
    return out_full, jnp.concatenate([m_g, den_g], axis=0)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fused_attn_fwd_kernel(
    wb_ref, ids_ref, xl_ref, xr_ref, att_ref, ssel_ref, out_ref, md_ref,
    *, W: int, HP: int, slope: float, mm_dtype, finalize: bool = True,
):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    last = jnp.logical_or(c == nc - 1, wb_ref[jnp.minimum(c + 1, nc - 1)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, md_ref.shape, 0)
        md_ref[:] = jnp.where(row < HP, _NEG, 0.0)  # m rows / den rows

    ids = ids_ref[:]  # (CHUNK, 1)
    local = ids - wb * W
    seg_range = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    match = local == seg_range  # (CHUNK, W)
    onehot = match.astype(jnp.float32)
    # The large (CHUNK, W) x (W, D) matmuls optionally run with bf16
    # operands (one-hot rows are exact in bf16; features round) and f32
    # accumulation — ~4x MXU rate on v5e. Small matmuls stay f32.
    onehot_mm = match.astype(mm_dtype)

    xl = xl_ref[:]  # (CHUNK, D)
    xr_g = jnp.dot(onehot_mm, xr_ref[:].astype(mm_dtype),
                   preferred_element_type=jnp.float32)
    z = xl + xr_g
    gz = jnp.where(z >= 0, z, slope * z)
    # logits per head: (gz * att) @ ssel -> (CHUNK, HP); padded heads get 0.
    logits = jax.lax.dot_general(
        gz * att_ref[:], ssel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # Softmax shift: any per-segment-constant shift is exact (num and den
    # rescale identically), so instead of a per-SEGMENT masked max (HP
    # masked (CHUNK, W) reductions — the kernel's VPU hot spot), use the
    # per-head max over the whole chunk, broadcast to all W segments. The
    # online rescale across chunks handles differing shifts per chunk
    # exactly. Out-of-window (padding) edges must not pollute the max —
    # their xl rows hold arbitrary finite data.
    inwin = jnp.logical_and(local >= 0, local < W)  # (CHUNK, 1)
    masked_logits = jnp.where(inwin, logits, _NEG)
    m_vec = jnp.max(masked_logits, axis=0, keepdims=True)  # (1, HP)
    m_chunk = jnp.broadcast_to(m_vec.T, (HP, W))

    m_old = md_ref[0:HP, :]
    m_new = jnp.maximum(m_old, m_chunk)
    scale = jnp.exp(m_old - m_new)  # (HP, W); empty-so-far rows give exp(0)=1

    m_e = jax.lax.dot_general(
        onehot, m_new, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, HP)
    p = jnp.exp(jnp.minimum(logits - m_e, 0.0))  # <=1; out-of-window rows die in onehot
    p_d = jax.lax.dot_general(
        p, ssel_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, D)

    scale_wd = jax.lax.dot_general(
        scale, ssel_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (W, D)
    out_ref[:] = out_ref[:] * scale_wd + jax.lax.dot_general(
        onehot_mm, (p_d * xl).astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    den_new = md_ref[HP : 2 * HP, :] * scale + jax.lax.dot_general(
        p, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    md_ref[0:HP, :] = m_new
    md_ref[HP : 2 * HP, :] = den_new

    if finalize:
        @pl.when(last)
        def _():
            den = md_ref[HP : 2 * HP, :]
            inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)
            inv_wd = jax.lax.dot_general(
                inv, ssel_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[:] = out_ref[:] * inv_wd


@functools.partial(jax.jit, static_argnames=("W", "H", "slope", "mm", "interpret", "finalize"))
def _fused_attn_fwd_raw(xl2, xr2, att_row, ids2d, wb, W, H, slope, mm="f32", interpret=False,
                        finalize=True):
    E, D = xl2.shape
    chunk = E // wb.shape[0]  # per-graph chunk (or the dense tile)
    assert E % chunk == 0 and D % H == 0
    C = D // H
    HP = _round_up(max(H, 1), 8)
    s_pad = xr2.shape[0]
    assert s_pad % W == 0
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    ssel = jnp.asarray(_head_selector(H, C, HP))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, W), lambda c, wb_ref: (0, wb_ref[c]), memory_space=pltpu.VMEM),
        ],
    )
    out, md = pl.pallas_call(
        functools.partial(_fused_attn_fwd_kernel, W=W, HP=HP, slope=slope,
                          mm_dtype=mm_dtype, finalize=finalize),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((2 * HP, s_pad), jnp.float32),
        ],
        interpret=interpret,
    )(wb, ids2d, xl2, xr2, att_row, ssel)
    return out, md


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _fused_attn_bwd_kernel(
    wb_ref, ids_ref, xl_ref, xr_ref, att_ref, ssel_ref, md_ref, out_ref, g_ref,
    dxl_ref, dxr_ref, datt_ref, gnum_scr, gden_scr,
    *, W: int, HP: int, slope: float, mm_dtype,
):
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(c == 0)
    def _():
        datt_ref[:] = jnp.zeros_like(datt_ref)

    @pl.when(first)
    def _():
        dxr_ref[:] = jnp.zeros_like(dxr_ref)
        # Per-window constants: gnum = g/den broadcast per head on (W, D);
        # gden = -(g . out)_h / den on (HP, W).
        den = md_ref[HP : 2 * HP, :]
        inv = jnp.where(den > 0, 1.0 / jnp.maximum(den, 1e-38), 0.0)  # (HP, W)
        inv_wd = jax.lax.dot_general(
            inv, ssel_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = g_ref[:]
        gnum_scr[:] = g * inv_wd
        go = jax.lax.dot_general(
            ssel_ref[:], g * out_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HP, W)
        gden_scr[:] = -go * inv

    ids = ids_ref[:]
    local = ids - wb * W
    seg_range = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    match = local == seg_range
    onehot = match.astype(jnp.float32)
    onehot_mm = match.astype(mm_dtype)

    xl = xl_ref[:]
    xr_g = jnp.dot(onehot_mm, xr_ref[:].astype(mm_dtype),
                   preferred_element_type=jnp.float32)
    z = xl + xr_g
    gz = jnp.where(z >= 0, z, slope * z)
    logits = jax.lax.dot_general(
        gz * att_ref[:], ssel_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, HP)
    m_e = jax.lax.dot_general(
        onehot, md_ref[0:HP, :], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(jnp.minimum(logits - m_e, 0.0))

    dnum_e = jnp.dot(onehot_mm, gnum_scr[:].astype(mm_dtype),
                     preferred_element_type=jnp.float32)  # (CHUNK, D)
    dden_e = jax.lax.dot_general(
        onehot, gden_scr[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, HP)
    dl = p * (
        jax.lax.dot_general(
            xl * dnum_e, ssel_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + dden_e
    )  # (CHUNK, HP)
    dl_d = jax.lax.dot_general(
        dl, ssel_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, D)
    dz = dl_d * att_ref[:] * jnp.where(z >= 0, 1.0, slope)
    p_d = jax.lax.dot_general(
        p, ssel_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dxl_ref[:] = p_d * dnum_e + dz
    dxr_ref[:] += jax.lax.dot_general(
        onehot_mm, dz.astype(mm_dtype), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    datt_ref[0:1, :] += jnp.sum(dl_d * gz, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("W", "H", "slope", "mm", "interpret"))
def _fused_attn_bwd_raw(xl2, xr2, att_row, ids2d, wb, md, out, g, W, H, slope,
                        mm="f32", interpret=False):
    E, D = xl2.shape
    chunk = E // wb.shape[0]  # per-graph chunk (or the dense tile)
    C = D // H
    HP = _round_up(max(H, 1), 8)
    s_pad = xr2.shape[0]
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    ssel = jnp.asarray(_head_selector(H, C, HP))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, HP), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * HP, W), lambda c, wb_ref: (0, wb_ref[c]), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, D), jnp.float32),
            pltpu.VMEM((HP, W), jnp.float32),
        ],
    )
    dxl, dxr, datt8 = pl.pallas_call(
        functools.partial(_fused_attn_bwd_kernel, W=W, HP=HP, slope=slope, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E, D), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
        ],
        interpret=interpret,
    )(wb, ids2d, xl2, xr2, att_row, ssel, md, out, g)
    return dxl, dxr, datt8


# ---------------------------------------------------------------------------
# differentiable public wrapper
# ---------------------------------------------------------------------------


def make_fused_attend(H: int, mm: str = "f32", table_sharded: bool = False):
    """Build the custom-VJP fused attention entry point for `H` heads at
    matmul precision `mm` ("f32" | "bf16", see ops/segment.py).

    ``edge_axis``: mesh axis name when the edge arrays are sharded across
    devices (None single-shard). With an axis, the forward runs the local
    kernel unfinalized and combines (num, m, den) across shards
    (:func:`combine_attention_shards`); the backward kernel is unchanged —
    fed the global (m, den, out) and the PSUMMED output cotangent it emits
    this shard's exact local cotangents (table/parameter cotangents are
    per-shard partials, summed by the train step's trailing grad psum).

    The backward-entry psum is the interior transpose rule of
    gasfm_tpu/ops/segment.py: the attention output table is consumed by
    every shard's downstream edges, so the cotangent arriving here is a
    shard-local partial and the exact edge-side cotangent needs the full
    ``psum_j(partial_j)``."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
    def attend(xl2, xr2, att_row, ids2d, wb, num_segments, W, slope, interpret,
               edge_axis):
        out, _ = _run_fwd(xl2, xr2, att_row, ids2d, wb, num_segments, W, slope,
                          interpret, edge_axis)
        return out

    def _run_fwd(xl2, xr2, att_row, ids2d, wb, num_segments, W, slope, interpret,
                 edge_axis):
        s_pad = _round_up(num_segments, W)
        xr_p = xr2 if xr2.shape[0] == s_pad else jnp.pad(
            xr2, ((0, s_pad - xr2.shape[0]), (0, 0))
        )
        out_full, md = _fused_attn_fwd_raw(
            xl2, xr_p, att_row, ids2d, wb, W, H, slope, mm=mm, interpret=interpret,
            finalize=edge_axis is None,
        )
        if edge_axis is not None:
            HP = _round_up(max(H, 1), 8)
            if table_sharded:
                out_full, md = exchange_boundary_windows(
                    out_full, md, HP, H, xl2.shape[1] // H, edge_axis, wb, W
                )
            else:
                out_full, md = combine_attention_shards(
                    out_full, md, HP, H, xl2.shape[1] // H, edge_axis, wb=wb, W=W
                )
        return out_full[:num_segments], (xl2, xr_p, att_row, ids2d, wb, out_full, md)

    def _fwd(xl2, xr2, att_row, ids2d, wb, num_segments, W, slope, interpret,
             edge_axis):
        out, res = _run_fwd(xl2, xr2, att_row, ids2d, wb, num_segments, W, slope,
                            interpret, edge_axis)
        return out, res

    def _bwd(num_segments, W, slope, interpret, edge_axis, res, g):
        xl2, xr_p, att_row, ids2d, wb, out_full, md = res
        s_pad = xr_p.shape[0]
        g_p = jnp.pad(g, ((0, s_pad - g.shape[0]), (0, 0)))
        if edge_axis is not None:
            # partial -> full table cotangent (interior transpose rule);
            # table-sharded windowed direction: boundary exchange.
            if table_sharded:
                g_p = exchange_boundary_add(g_p, edge_axis, wb, W)
            else:
                g_p = jax.lax.psum(g_p, edge_axis)
        dxl, dxr_full, datt8 = _fused_attn_bwd_raw(
            xl2, xr_p, att_row, ids2d, wb, md, out_full, g_p, W, H, slope,
            mm=mm, interpret=interpret,
        )
        # Window blocks never visited by any chunk are never written by the
        # kernel (uninitialized memory) — zero them. `wb` is tiny, so this
        # scatter costs microseconds.
        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        dxr_full = jnp.where(jnp.repeat(visited, W)[:, None], dxr_full, 0.0)
        return (dxl, dxr_full[:num_segments], datt8[0:1], None, None)

    attend.defvjp(_fwd, _bwd)
    return attend


_ATTEND_CACHE = {}


def fused_attend_h(num_heads: int, xl2, xr2, att_row, ids2d, wb, num_segments,
                   W, slope=0.2, interpret=False, edge_axis=None,
                   table_sharded=False):
    """Fused segment attention specialized per (head count, matmul precision,
    table-sharded combine). Matmul precision is read from
    ops.segment.get_kernel_precision() at trace time.

    ``table_sharded``: use the O(W*(D+2H)) neighbor boundary exchange for
    the cross-shard softmax combine instead of the full-table psum/pmax.
    ONLY valid for the windowed direction (span<=2 contract) — the caller
    (gatv2_attend) gates it on ``window is not None``.

    xl2: (E, H*C) source-transformed edge features, head-major flat layout.
    xr2: (S, H*C) per-segment query features (S == num_segments).
    att_row: (1, H*C) flat attention vector.
    ids2d: (E, 1) int32 segment ids; out-of-window ids contribute nothing.
    wb: (E // CHUNK,) int32 non-decreasing window-block index per chunk
        (all-zeros for the dense whole-table variant).
    W: static window width, a multiple of 128; the table is padded to
        ceil(S/W)*W rows. For the dense variant W must be >= S+1 so the
        trash id S lands on a padded row (sliced off on return).
    """
    from gasfm_tpu.ops.segment import get_kernel_precision

    key = (num_heads, get_kernel_precision(), bool(table_sharded))
    fn = _ATTEND_CACHE.get(key)
    if fn is None:
        fn = make_fused_attend(*key)
        _ATTEND_CACHE[key] = fn
    return fn(xl2, xr2, att_row, ids2d, wb, num_segments, W, slope, interpret,
              edge_axis)
