"""Subtractive ablation of the merged layer-step FORWARD kernel.

BENCHLOG section 27 left the merged kernel's 7.4 us/chunk unattributed
("Mosaic per-op scheduling"). The CHUNK sweep of this round (4.2/7.4/13.8
us at 512/1024/2048) shows the cost is LINEAR in rows, i.e. per-row
throughput-bound, not per-op-latency-bound — so individual pieces CAN be
attributed by replacing each with a shape-identical cheap fake that keeps
the dataflow alive (no DCE of upstream producers: every fake still
consumes its real inputs, and every real consumer stays).

Variants (subtracted piece -> fake):
  rolls    g_upd/inwin lane rolls of the gather result -> offset-0 slices
  unpack   unpack_tile (3 rolls + concat)              -> slice + 4x concat
  repack   repack_tile (3 rolls + pads + adds)         -> pad of quarter 0
  update   core update matmuls (we_bd, wuv_bd)          -> en passthrough
  ln       LayerNorm mean/var/rsqrt                     -> affine only
  gather   the mega one-hot gather MXU pass             -> row broadcast
  softmax  running-max machinery (max/exp/eye passes)   -> p = logits
  scatters num/den scatter passes + accumulates         -> scalar writes

Run: GASFM_CHUNK=1024 timeout 900 python scripts/merged_ablate.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.graph.view_graph import CHUNK, WINDOW
from gasfm_tpu.ops.pallas import fused_layer_step as fls
from gasfm_tpu.ops.pallas.fused_dual_attn import _id_row, _NEG
from gasfm_tpu.ops.pallas.packing import (
    PACK, blockdiag, pack_edges, repack_tile, tile_row, unpack_tile,
)


def _staged_fwd_kernel(
    wb_ref, pids_ref, cids_ref,
    en_ref, *rest,
    W: int, Wc: int, HP: int, slope: float, eps: float,
    finalize: bool, mm_dtype, has_skip: bool, has_res: bool,
    ablate: frozenset,
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

    def f_unpack(p):
        if "unpack" in ablate:
            D = p.shape[1] // PACK
            x = p[:, 0:D]
            return jnp.concatenate([x, x, x, x], axis=0)
        return unpack_tile(p)

    def f_repack(x):
        if "repack" in ablate:
            e, D = x.shape
            q = e // PACK
            return jnp.pad(x[0:q, :], ((0, 0), (0, (PACK - 1) * D)))
        return repack_tile(x)

    De = ps_ref.shape[1]
    Dpc = wlpc_ref.shape[1]
    Dp = xrp_ref.shape[1]
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)
    last_w = jnp.logical_or(c == nc - 1, wb_ref[jnp.minimum(c + 1, nc - 1)] != wb)
    live = c < wb_ref[nc]

    @pl.when(c == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdc_ref.shape, 0)
        mdc_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        mrun_scr[:] = jnp.full_like(mrun_scr, _NEG)
        mega_scr[:] = jnp.zeros_like(mega_scr)
        mega_scr[W : W + Wc, Dp : Dpc] = xrc_ref[:]
        mega_scr[W : W + Wc, Dpc : Dpc + De] = pv_ref[:]

    @pl.when(first_w)
    def _():
        outp_ref[:] = jnp.zeros_like(outp_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdp_ref.shape, 0)
        mdp_ref[:] = jnp.where(row < HP, _NEG, 0.0)
        mrun_scr[0:1, :] = jnp.where(hm_ref[0:1, :] > 0, _NEG, mrun_scr[0:1, :])
        mega_scr[0:W, 0:Dp] = xrp_ref[:]
        mega_scr[0:W, Dpc : Dpc + De] = ps_ref[:]
        mega_scr[0:W, Dpc + De : Dpc + De + 1] = jnp.ones((W, 1), jnp.float32)

    @pl.when(jnp.logical_not(live))
    def _():
        el_ref[:] = jnp.zeros_like(el_ref)
        ennext_ref[:] = jnp.zeros_like(ennext_ref)

    @pl.when(live)
    def _compute():
        local_row = _id_row(pids_ref, c) - wb * W
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        ohT_p = (local_row == seg_iota).astype(jnp.float32)
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
        ohT_c = (_id_row(cids_ref, c) == cam_iota).astype(jnp.float32)
        ohT_pc = jnp.concatenate([ohT_p, ohT_c], axis=0)
        ohT_pc_mm = ohT_pc.astype(mm_dtype)

        mega_w = mega_scr.shape[1]
        nrows = en_ref.shape[0] * PACK
        if "gather" in ablate:
            gath = jnp.broadcast_to(mega_scr[0:1, :], (nrows, mega_w))
        else:
            gath = jax.lax.dot_general(
                ohT_pc_mm, mega_scr[:].astype(mm_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if "rolls" in ablate:
            g_upd = gath[:, 0:De]
            inwin = gath[:, 0:1] > 0.5
        elif "selmm" in ablate:
            # Lane selection as two tiny MXU passes instead of two full rolls.
            sel_iota_r = jax.lax.broadcasted_iota(jnp.int32, (mega_w, De), 0)
            sel_iota_c = jax.lax.broadcasted_iota(jnp.int32, (mega_w, De), 1)
            s_upd = (sel_iota_r == sel_iota_c + Dpc).astype(jnp.float32)
            g_upd = jax.lax.dot_general(
                gath, s_upd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            flag_iota = jax.lax.broadcasted_iota(jnp.int32, (mega_w, 1), 0)
            s_flag = (flag_iota == Dpc + De).astype(jnp.float32)
            inwin = jax.lax.dot_general(
                gath, s_flag, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) > 0.5
        else:
            g_upd = pltpu.roll(gath, mega_w - Dpc, 1)[:, 0:De]
            inwin = pltpu.roll(gath, mega_w - (Dpc + De), 1)[:, 0:1] > 0.5

        if "update" in ablate:
            core_p2 = en_ref[:].astype(jnp.float32)
        else:
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
        if "resfold" in ablate and has_res:
            # Residual added in PACKED space: one unpack instead of two.
            e_l = f_unpack(
                core_p2 * 0.25 + res_ref[:].astype(jnp.float32)
            ) + g_upd * 0.25
        else:
            e_l = (f_unpack(core_p2) + g_upd) * 0.25
            if has_res:
                e_l += f_unpack(res_ref[:].astype(jnp.float32))
        el_ref[:] = f_repack(e_l).astype(el_ref.dtype)

        if "ln" in ablate:
            xn = e_l * lng_ref[:] + lnb_ref[:]
        elif "lnmm" in ablate:
            # Lane reduction + broadcast as ONE small MXU pass each: the
            # (De, De) all-ones/De matmul returns the per-edge mean already
            # broadcast across the feature lanes.
            ones_dd = jnp.full((De, De), 1.0 / De, jnp.float32)
            mean = jax.lax.dot_general(
                e_l, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            var = jax.lax.dot_general(
                e_l * e_l, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) - mean * mean
            xhat = (e_l - mean) * jax.lax.rsqrt(var + eps)
            xn = xhat * lng_ref[:] + lnb_ref[:]
        else:
            mean = jnp.mean(e_l, axis=1, keepdims=True)
            var = jnp.mean(e_l * e_l, axis=1, keepdims=True) - mean * mean
            xhat = (e_l - mean) * jax.lax.rsqrt(var + eps)
            xn = xhat * lng_ref[:] + lnb_ref[:]
        en = jnp.maximum(xn, 0.0)
        ennext_ref[:] = f_repack(en).astype(ennext_ref.dtype)
        xl_pc = jnp.dot(en, wlpc_ref[:], preferred_element_type=jnp.float32) + blpc_ref[:]

        z_pc = xl_pc + gath[:, 0:Dpc]
        gz = jnp.where(z_pc >= 0, z_pc, slope * z_pc)
        logits = jax.lax.dot_general(
            gz * attpc_ref[:], sselpc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        if "softmax" in ablate:
            p = logits
            scale_pc_d = attpc_ref[:]
            scale_col = jnp.zeros((HP, 1), jnp.float32) + logits[0:1, 0:1]
            m_col = scale_col
        else:
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
            scale_pc_d = jax.lax.dot_general(
                scale_row, sselpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if "scatters" in ablate:
            outp_ref[:] = (
                gz[0 : outp_ref.shape[0], 0 : outp_ref.shape[1]]
                + p[0 : outp_ref.shape[0], 0:1]
            )
            outc_ref[:] = gz[0 : outc_ref.shape[0], 0 : outc_ref.shape[1]]
            mdp_ref[:] = gath[0 : mdp_ref.shape[0], 0 : mdp_ref.shape[1]]
            mdc_ref[:] = gath[0 : mdc_ref.shape[0], 0 : mdc_ref.shape[1]]
        else:
            p_dpc = jax.lax.dot_general(
                p, sselpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            num_stack = jax.lax.dot_general(
                ohT_pc_mm, (p_dpc * xl_pc).astype(mm_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            den_stack = jax.lax.dot_general(
                p, ohT_pc, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outp_ref[:] = outp_ref[:] * scale_pc_d[:, 0:Dp] + num_stack[0:W, 0:Dp]
            if "scatsel" in ablate:
                r_io = jax.lax.broadcasted_iota(jnp.int32, (Dpc, Dpc - Dp), 0)
                c_io = jax.lax.broadcasted_iota(jnp.int32, (Dpc, Dpc - Dp), 1)
                s_c = (r_io == c_io + Dp).astype(jnp.float32)
                out_c_new = jax.lax.dot_general(
                    num_stack[W : W + Wc, :], s_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sc_c = jax.lax.dot_general(
                    scale_pc_d, s_c, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wr_io = jax.lax.broadcasted_iota(jnp.int32, (W + Wc, Wc), 0)
                wc_io = jax.lax.broadcasted_iota(jnp.int32, (W + Wc, Wc), 1)
                s_w = (wr_io == wc_io + W).astype(jnp.float32)
                den_c = jax.lax.dot_general(
                    den_stack, s_w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                out_c_new = pltpu.roll(num_stack[W : W + Wc, :], Dpc - Dp, 1)[:, 0 : Dpc - Dp]
                sc_c = pltpu.roll(scale_pc_d, Dpc - Dp, 1)[:, 0 : Dpc - Dp]
                den_c = pltpu.roll(den_stack, (W + Wc) - W, 1)[:, 0:Wc]
            outc_ref[:] = outc_ref[:] * sc_c + out_c_new
            mdp_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, W))
            mdp_ref[HP : 2 * HP, :] = (
                mdp_ref[HP : 2 * HP, :] * scale_col + den_stack[:, 0:W]
            )
            mdc_ref[0:HP, :] = jnp.broadcast_to(m_col, (HP, Wc))
            mdc_ref[HP : 2 * HP, :] = (
                mdc_ref[HP : 2 * HP, :] * scale_col + den_c
            )

    if finalize and "scatters" not in ablate:
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


def bench(fn, carry, n=100, reps=3):
    @functools.partial(jax.jit, static_argnames="n")
    def run(c, n):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, c, None, length=n)
        return out

    jax.block_until_ready(run(carry, n))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry, n))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    rngs = np.random.default_rng(0)
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E = g.num_edges
    nch = E // CHUNK
    De, Dp, Dc, Hp, Hc = 32, 32, 32, 4, 4
    s_pad = -(-g.num_pts // WINDOW) * WINDOW
    Wc = max(((g.num_cams + 127) // 128) * 128, 128)
    r = lambda *s: jnp.asarray(rngs.standard_normal(s).astype(np.float32) * 0.1)  # noqa: E731
    pids2d = g.pt_idx.astype(jnp.int32).reshape(nch, CHUNK)
    cids2d = g.cam_idx.astype(jnp.int32).reshape(nch, CHUNK)
    wb = g.pt_window.reshape(nch, CHUNK)[:, 0]
    nlive = jnp.asarray(nch, jnp.int32)

    we_bd = blockdiag(r(De, De))
    c0 = tile_row(r(1, De))
    wuv_bd = blockdiag(r(2, De))
    ps, pv = r(s_pad, De), r(Wc, De)
    lng, lnb = r(1, De) + 1.0, r(1, De)
    wlp, blp = r(De, Dp), r(1, Dp)
    wlc, blc = r(De, Dc), r(1, Dc)
    xrp, xrc = r(s_pad, Dp), r(Wc, Dc)
    attp, attc = r(1, Dp), r(1, Dc)
    dt = jnp.bfloat16
    en_p = pack_edges(r(E, De), CHUNK).astype(dt)
    skip2_p = pack_edges(r(E, 2), CHUNK).astype(dt)
    res_p = pack_edges(r(E, De), CHUNK).astype(dt)
    print(f"merged fwd ablation: CHUNK={CHUNK} chunks={nch} Wc={Wc} streams=bf16",
          flush=True)

    variants = [
        (),
        ("scatters",),
        ("rolls", "unpack", "repack"),
        ("rolls", "unpack", "repack", "ln", "softmax"),
        # Positive (math-preserving) optimizations:
        ("lnmm",), ("selmm",), ("scatsel",),
        ("lnmm", "selmm"),
        ("lnmm", "scatsel"),
        ("lnmm", "selmm", "scatsel"),
        ("lnmm", "selmm", "scatsel", "resfold"),
    ]
    base = None
    raw = fls._fwd_raw.__wrapped__
    for v in variants:
        kern = functools.partial(_staged_fwd_kernel, ablate=frozenset(v))
        fls._fwd_kernel = kern

        @jax.jit
        def fwd(en_p):
            outs = raw(
                en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps, pv,
                lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5)
            return (outs[0].astype(jnp.float32) * 1e-9).astype(en_p.dtype) + en_p

        t = bench(fwd, en_p) / nch * 1e6
        if base is None:
            base = t
            print(f"  full                         {t:6.3f} us/chunk", flush=True)
        else:
            print(f"  -{'+'.join(v):27s} {t:6.3f} us/chunk (delta {base - t:+6.3f})",
                  flush=True)


if __name__ == "__main__":
    main()
