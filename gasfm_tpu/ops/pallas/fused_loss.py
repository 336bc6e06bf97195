"""Fused ESFM reprojection loss as one Pallas kernel per direction.

Parity: reference ``ESFMLoss`` (code/loss_functions.py:69-123) in the edge
form of gasfm_tpu/losses.py — per-edge homogeneous projection
``proj_e = P[cam_e] @ X[pt_e]``, hinge-robustified reprojection error, and
the gradient-direction-equalization backward hook
(loss_functions.py:100-110) — computed without EVER materializing the
per-edge (E, 3, 4) gathered cameras, (E, 4) gathered points, or (E, 3)
projections in HBM.

Why: the composite path costs ~1.3 ms of a ~20 ms flagship step (BENCHLOG
section 30's anatomy) across ~15 small XLA ops on 4x lane-padded per-edge
arrays plus two gather kernels forward and two one-hot scatter kernels
backward. Here each direction is ONE kernel over the blocked layout's
chunks:

    forward:  two one-hot MXU gathers per chunk (windowed points, dense
              cameras) feed an in-VMEM projection pipeline whose per-edge
              3-vector arithmetic runs as tiny lane-selector matmuls; the
              kernel emits only the two scalars the loss needs
              (sum of per-edge terms, count of positive projections).
    backward: recomputes the pipeline from the same inputs (cheaper than
              streaming residuals), forms the equalized projection
              cotangent in registers, and scatters BOTH table gradients
              ([dX | dP] lane-stacked) in one one-hot pass.

Lane-selector trick: with P rows gathered as 12 lanes (row-major P[i, j] at
lane 4i+j) and the point table stored pre-tiled as [X X X] (X[j] at lane
4i+j), the bilinear projection is an elementwise product followed by a
constant (12, 3) 0/1-selector matmul — no cross-lane shuffles.

Sharding contract (same as every kernel here): under edge partitioning the
partial sums psum outside (losses.all_sum_final) and the partial table
gradients are completed by the sharded train step's trailing grad psum —
the model's forward is replicated over edge shards, so per-shard partial
``dPs_norm``/``dpts3D`` cotangents yield exact parameter gradients after
that single psum (tests/test_parallel.py exercises the loss inside the
sharded step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gasfm_tpu.ops.pallas.fused_dual_attn import _id_row, _wb_with_nlive


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _sel(pred_fn, rows: int, cols: int):
    """Constant 0/1 selector matrix built from iotas (traced, folds)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return pred_fn(r, c).astype(jnp.float32)


def _projection_pipeline(Pg, Xrep, uv, flag, margin, hinge, hinge_w):
    """Shared fwd recompute: returns (proj01, depth, pos, denom, rvec,
    rnorm, nz, per_edge)."""
    prod = Pg * Xrep  # (CHUNK, 12): lane 4i+j holds P[i,j] * X[j]
    # proj_i = sum_j prod[4i + j]: constant (12, {2,1}) selectors.
    s01 = _sel(lambda r, c: (r // 4) == c, 12, 2)
    s2 = _sel(lambda r, c: (r // 4) == 2, 12, 1)
    proj01 = jax.lax.dot_general(
        prod, s01, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (CHUNK, 2)
    depth = jax.lax.dot_general(
        prod, s2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (CHUNK, 1)
    if hinge:
        pos = depth >= margin
    else:
        pos = jnp.abs(depth) >= margin
    denom = jnp.where(pos, depth, 1.0)
    pts2d = proj01 / denom
    rvec = pts2d - uv
    sq = jax.lax.dot_general(
        rvec * rvec, jnp.ones((2, 1), jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (CHUNK, 1)
    nz = sq > 0
    rnorm = jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)
    hinge_val = (margin - depth) * hinge_w
    per_edge = jnp.where(pos, rnorm, hinge_val) * flag
    return proj01, depth, pos, denom, rvec, rnorm, nz, per_edge


def _fwd_kernel(wb_ref, pids_ref, cids_ref, uv_ref, xt_ref, p_ref, out_ref,
                *, W: int, Wc: int, margin: float, hinge: bool,
                hinge_w: float, mm_dtype):
    c = pl.program_id(0)
    wb = wb_ref[c]
    live = c < wb_ref[pl.num_programs(0)]  # dead-chunk skip

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live)
    def _compute():
        local_row = _id_row(pids_ref, c) - wb * W
        ohT_p = (local_row == jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
                 ).astype(mm_dtype)
        ohT_c = (_id_row(cids_ref, c)
                 == jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
                 ).astype(mm_dtype)
        gx = jax.lax.dot_general(
            ohT_p, xt_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (CHUNK, 16)
        Pg = jax.lax.dot_general(
            ohT_c, p_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (CHUNK, 12)
        Xrep = gx[:, 0:12]
        flag = pltpu.roll(gx, 16 - 12, 1)[:, 0:1]  # in-window == valid edge
        _, _, pos, _, _, _, _, per_edge = _projection_pipeline(
            Pg, Xrep, uv_ref[:], flag, margin, hinge, hinge_w)
        s1 = jnp.sum(per_edge)
        s2 = jnp.sum(flag)
        s3 = jnp.sum(jnp.where(pos, flag, 0.0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[0:1, :] += (
            s1 * (lane == 0).astype(jnp.float32)
            + s2 * (lane == 1).astype(jnp.float32)
            + s3 * (lane == 2).astype(jnp.float32)
        )


def _bwd_kernel(wb_ref, pids_ref, cids_ref, uv_ref, xt_ref, p_ref,
                coef_ref, icnt_ref, dxt_ref, dp_ref,
                *, W: int, Wc: int, margin: float, hinge: bool,
                hinge_w: float, eq_mode: str, mm_dtype):
    c = pl.program_id(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    live = c < wb_ref[pl.num_programs(0)]

    @pl.when(first_w)
    def _():
        dxt_ref[:] = jnp.zeros_like(dxt_ref)

    @pl.when(c == 0)
    def _():
        dp_ref[:] = jnp.zeros_like(dp_ref)

    @pl.when(live)
    def _compute():
        local_row = _id_row(pids_ref, c) - wb * W
        ohT_p = (local_row == jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
                 ).astype(mm_dtype)
        ohT_c = (_id_row(cids_ref, c)
                 == jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
                 ).astype(mm_dtype)
        gx = jax.lax.dot_general(
            ohT_p, xt_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Pg = jax.lax.dot_general(
            ohT_c, p_ref[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Xrep = gx[:, 0:12]
        flag = pltpu.roll(gx, 16 - 12, 1)[:, 0:1]
        proj01, depth, pos, denom, rvec, rnorm, nz, _ = _projection_pipeline(
            Pg, Xrep, uv_ref[:], flag, margin, hinge, hinge_w)

        coef = coef_ref[0:1, 0:1]  # replicated scalar: gbar / den_global
        cf = coef * flag  # (CHUNK, 1)
        # d per_edge / d proj, before equalization:
        #   pos:  d|pts2d - uv| with pts2d = proj01 / depth
        #   !pos: d[(margin - depth) * hinge_w]
        inv_rn = jnp.where(nz, 1.0 / jnp.where(nz, rnorm, 1.0), 0.0)
        rhat = rvec * inv_rn  # (CHUNK, 2); exactly 0 at the 0-residual tie
        inv_d = 1.0 / denom
        g01 = jnp.where(pos, rhat * inv_d, 0.0) * cf  # (CHUNK, 2)
        rdotp = jax.lax.dot_general(
            rhat * (proj01 * inv_d), jnp.ones((2, 1), jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (CHUNK, 1)
        gd = jnp.where(pos, -rdotp * inv_d, -hinge_w) * cf  # (CHUNK, 1)

        if eq_mode != "none":
            icnt = icnt_ref[0:1, 0:1]
            n3 = jnp.sqrt(
                jax.lax.dot_general(
                    g01 * g01, jnp.ones((2, 1), jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + gd * gd
            )
            scale = icnt / jnp.maximum(n3, 1e-12)
            if eq_mode == "valid_only":
                # Normalize positive-depth rows only (reference
                # loss_functions.py:105); masked rows have g == 0 and
                # normalize to 0.
                g01 = jnp.where(pos, g01 * scale, g01)
                gd = jnp.where(pos, gd * scale, gd)
            else:  # "all" (loss_functions.py:110)
                g01 = g01 * scale
                gd = gd * scale

        g3 = jnp.concatenate([g01, gd], axis=1)  # (CHUNK, 3)
        grep = jax.lax.dot_general(
            g3, _sel(lambda r, c_: (c_ // 4) == r, 3, 12),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (CHUNK, 12): lane 4i+j = g_i
        dP_e = grep * Xrep  # dP[i, j] = g_i * X[j]
        dX_e = jax.lax.dot_general(
            Pg * grep, _sel(lambda r, c_: (r % 4) == c_, 12, 4),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # dX[j] = sum_i P[i,j] g_i
        dxt_ref[:] += jax.lax.dot_general(
            ohT_p, dX_e.astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_ref[:] += jax.lax.dot_general(
            ohT_c, dP_e.astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "W", "Wc", "margin", "hinge", "hinge_w", "mm", "interpret"))
def _fwd_raw(uv, xt16, p_pad, pids2d, cids2d, wb, nlive,
             W, Wc, margin, hinge, hinge_w, mm="f32", interpret=False):
    E = uv.shape[0]
    chunk = pids2d.shape[1]
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != rows8:
        pids2d = jnp.pad(pids2d, ((0, rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, rows8 - cids2d.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 2), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 16), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, 12), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, W=W, Wc=Wc, margin=margin,
                          hinge=hinge, hinge_w=hinge_w, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), pids2d, cids2d, uv, xt16, p_pad)
    # (sum per_edge*mask, mask count, pos&mask count)
    return out[0, 0], out[0, 1], out[0, 2]


@functools.partial(jax.jit, static_argnames=(
    "W", "Wc", "s_pad", "margin", "hinge", "hinge_w", "eq_mode", "mm",
    "interpret"))
def _bwd_raw(uv, xt16, p_pad, coef, icnt, pids2d, cids2d, wb, nlive,
             W, Wc, s_pad, margin, hinge, hinge_w, eq_mode, mm="f32",
             interpret=False):
    E = uv.shape[0]
    chunk = pids2d.shape[1]
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    rows8 = _round_up(pids2d.shape[0], 8)
    if pids2d.shape[0] != rows8:
        pids2d = jnp.pad(pids2d, ((0, rows8 - pids2d.shape[0]), (0, 0)))
        cids2d = jnp.pad(cids2d, ((0, rows8 - cids2d.shape[0]), (0, 0)))
    coef_row = jnp.broadcast_to(coef.reshape(1, 1), (1, 128)).astype(jnp.float32)
    icnt_row = jnp.broadcast_to(icnt.reshape(1, 1), (1, 128)).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // chunk,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 2), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 16), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, 12), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, 4), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, 12), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, W=W, Wc=Wc, margin=margin,
                          hinge=hinge, hinge_w=hinge_w, eq_mode=eq_mode,
                          mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((Wc, 12), jnp.float32),
        ],
        interpret=interpret,
    )(_wb_with_nlive(wb, nlive), pids2d, cids2d, uv, xt16, p_pad,
      coef_row, icnt_row)


def make_fused_esfm_terms(margin: float, hinge: bool, hinge_w: float,
                          eq_mode: str):
    """Custom-VJP fused per-edge ESFM terms, statically specialized.

    f(P_flat (M, 12), Xt (N, 4), uv, pids2d, cids2d, wb, nlive, num_pts,
      num_cams, W, interpret) -> (edge_sum, pos_count)

    ``edge_sum`` is the shard-local sum of masked per-edge terms — the
    caller finishes ``all_sum_final(edge_sum) / max(all_sum_final(mask), 1)``
    (identical to the composite path's reductions). ``pos_count`` is the
    GLOBAL valid-and-positive count (psummed inside, non-differentiable —
    consumed under stop_gradient exactly like the composite path's count).
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
    def terms(P_flat, Xt, uv, pids2d, cids2d, wb, nlive,
              num_pts, num_cams, W, interpret):
        out, _ = _run(P_flat, Xt, uv, pids2d, cids2d, wb, nlive,
                      num_pts, num_cams, W, interpret)
        return out

    def _prep(P_flat, Xt, num_pts, num_cams, W):
        s_pad = _round_up(num_pts, W)
        Wc = _round_up(max(num_cams, 1), 128)
        Xp = Xt if Xt.shape[0] == s_pad else jnp.pad(
            Xt, ((0, s_pad - Xt.shape[0]), (0, 0)))
        # Pre-tiled [X X X | flag | pad] operand (16 lanes: Mosaic wants
        # block widths equal to the array width): the bilinear projection
        # becomes elementwise-multiply + selector matmul (module docstring).
        xt16 = jnp.concatenate(
            [Xp, Xp, Xp, jnp.ones((s_pad, 1), Xp.dtype),
             jnp.zeros((s_pad, 3), Xp.dtype)], axis=1
        ).astype(jnp.float32)
        p_pad = P_flat if P_flat.shape[0] == Wc else jnp.pad(
            P_flat, ((0, Wc - P_flat.shape[0]), (0, 0)))
        return xt16, p_pad.astype(jnp.float32), s_pad, Wc

    def _run(P_flat, Xt, uv, pids2d, cids2d, wb, nlive,
             num_pts, num_cams, W, interpret):
        from gasfm_tpu.ops.segment import all_sum_final, get_kernel_precision

        xt16, p_pad, s_pad, Wc = _prep(P_flat, Xt, num_pts, num_cams, W)
        s1, s2, s3 = _fwd_raw(uv, xt16, p_pad, pids2d, cids2d, wb, nlive,
                              W, Wc, margin, hinge, hinge_w,
                              mm=get_kernel_precision(), interpret=interpret)
        # Equalization denominator: valid & positive projections for the
        # valid_only variant (loss_functions.py:105), all valid edges for
        # the original variant (loss_functions.py:110).
        count_g = jax.lax.stop_gradient(
            all_sum_final(s3 if eq_mode == "valid_only" else s2))
        res = (P_flat, Xt, uv, pids2d, cids2d, wb, nlive, count_g)
        return (s1, count_g), res

    def _fwd(P_flat, Xt, uv, pids2d, cids2d, wb, nlive,
             num_pts, num_cams, W, interpret):
        return _run(P_flat, Xt, uv, pids2d, cids2d, wb, nlive,
                    num_pts, num_cams, W, interpret)

    def _bwd(num_pts, num_cams, W, interpret, res, g):
        from gasfm_tpu.ops.segment import get_kernel_precision

        g1, _ = g  # count cotangent: non-differentiable by contract
        (P_flat, Xt, uv, pids2d, cids2d, wb, nlive, count_g) = res
        xt16, p_pad, s_pad, Wc = _prep(P_flat, Xt, num_pts, num_cams, W)
        icnt = 1.0 / jnp.maximum(count_g, 1.0)
        dxt_full, dp_full = _bwd_raw(
            uv, xt16, p_pad, g1, icnt, pids2d, cids2d, wb, nlive,
            W, Wc, s_pad, margin, hinge, hinge_w, eq_mode,
            mm=get_kernel_precision(), interpret=interpret)
        visited = jnp.zeros((s_pad // W,), dtype=bool).at[wb].set(True)
        dxt_full = jnp.where(jnp.repeat(visited, W)[:, None], dxt_full, 0.0)
        return (dp_full[:num_cams], dxt_full[:num_pts],
                jnp.zeros_like(uv), None, None, None, None)

    terms.defvjp(_fwd, _bwd)
    return terms


_CACHE = {}


def fused_esfm_terms(P_flat, Xt, uv, graph, margin, hinge, hinge_w, eq_mode,
                     interpret=False):
    """Dispatch (see make_fused_esfm_terms). Caller gates eligibility."""
    from gasfm_tpu.graph.view_graph import WINDOW

    key = (float(margin), bool(hinge), float(hinge_w), eq_mode)
    fn = _CACHE.get(key)
    if fn is None:
        fn = make_fused_esfm_terms(*key)
        _CACHE[key] = fn
    window = graph.pt_segment_windows()
    chunk = graph.chunk
    s_pad = _round_up(graph.num_pts, WINDOW)
    pids = jnp.where(graph.edge_mask, graph.pt_idx.astype(jnp.int32), s_pad)
    cids = jnp.where(graph.edge_mask, graph.cam_idx.astype(jnp.int32),
                     graph.num_cams)
    return fn(P_flat, Xt, uv, pids.reshape(-1, chunk),
              cids.reshape(-1, chunk), window.block,
              window.nlive if window.nlive is not None
              else jnp.asarray(window.block.shape[0], jnp.int32),
              graph.num_pts, graph.num_cams, WINDOW, interpret)
