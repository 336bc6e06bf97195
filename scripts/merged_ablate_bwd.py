"""Subtractive ablation of the merged layer-step BACKWARD body.

Companion of scripts/merged_ablate.py (forward): attributes the bwd's
~5.4 us/chunk (CHUNK=1024, bf16 streams, after the LN-via-matmul change)
by replacing pieces with shape-identical cheap fakes that keep the
dataflow alive. Monkeypatches fused_layer_step._bwd_body.

Run: GASFM_CHUNK=1024 timeout 1200 python scripts/merged_ablate_bwd.py
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
from gasfm_tpu.ops.pallas.fused_dual_attn import _id_row
from gasfm_tpu.ops.pallas.packing import (
    PACK, blockdiag, pack_edges, repack_tile, tile_row, unpack_tile,
)


def _staged_bwd_body(
    wb, c, pids_ref, cids_ref, en_ref, skip2_ref, el_ref, we_ref,
    wuv_ref, lng_ref, lnb_ref, wlpc_ref, blpc_ref, xrp_ref, xrc_ref,
    attpc_ref, sselpc_ref, hm_ref, mwinp_ref, mcam_ref,
    gen_ref, gel_ref, den_out_ref, dskip2_ref, dres_ref,
    dps_ref, dpv_ref, dwe_ref, dwuv_ref, dsum_ref, dlng_ref,
    dlnb_ref, dwlpc_ref, dblpc_ref, dxrp_ref, dxrc_ref, dattpc_ref,
    pack_scr, *, W, Wc, HP, slope, eps, mm_dtype, has_skip, has_res,
    ablate: frozenset,
):
    De = wlpc_ref.shape[0]
    Dpc = wlpc_ref.shape[1]
    Dp = xrp_ref.shape[1]
    Dc = Dpc - Dp
    PW = pack_scr.shape[1]

    def f_unpack(p):
        if "unpacks" in ablate:
            D = p.shape[1] // PACK
            x = p[:, 0:D]
            return jnp.concatenate([x, x, x, x], axis=0)
        return unpack_tile(p)

    def f_repack(x):
        if "repackb" in ablate:
            e, D = x.shape
            q = e // PACK
            return jnp.pad(x[0:q, :], ((0, 0), (0, (PACK - 1) * D)))
        return repack_tile(x)

    e_l = f_unpack(el_ref[:].astype(jnp.float32))  # (CHUNK, De)
    ones_dd = jnp.full((De, De), 1.0 / De, jnp.float32)
    if "recompute" in ablate:
        rstd = e_l[:, 0:1]
        xhat = e_l
        xn = e_l * lng_ref[:] + lnb_ref[:]
        en = jnp.maximum(xn, 0.0)
    else:
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
    ohT_p = (local_row == seg_iota).astype(jnp.float32)
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
    ohT_c = (_id_row(cids_ref, c) == cam_iota).astype(jnp.float32)
    ohT_pc = jnp.concatenate([ohT_p, ohT_c], axis=0)
    ohT_pc_mm = ohT_pc.astype(mm_dtype)

    if "gatherb" in ablate:
        nrows = en_ref.shape[0] * PACK
        gath = jnp.broadcast_to(pack_scr[0:1, :], (nrows, PW))
    else:
        gath = jax.lax.dot_general(
            ohT_pc_mm, pack_scr[:].astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (CHUNK, PW)
    z_pc = xl_pc + gath[:, 0:Dpc]
    if "rollsb" in ablate:
        dnum_pc = gath[:, 0:Dpc]
        dden_e = gath[:, 0:HP]
    else:
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

    if "attnbwd" in ablate:
        dl = p
        dl_dpc = dnum_pc
        dz_pc = dl_dpc
        p_dpc = dnum_pc
    else:
        dl = p * (
            jax.lax.dot_general(
                xl_pc * dnum_pc, sselpc_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
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
    if "scatmerge" in ablate:
        pass  # handled at the end: one merged scatter pass for dz and d_core
    elif "scatb" in ablate:
        dxrp_ref[:] += dz_pc[0:W, 0:Dp]
        dxrc_ref[:] += dz_pc[0:Wc, 0:Dc]
    else:
        scat_xr = jax.lax.dot_general(
            ohT_pc_mm, dz_pc.astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W+Wc, Dpc)
        dxrp_ref[:] += scat_xr[0:W, 0:Dp]
        dxrc_ref[:] += pltpu.roll(scat_xr[W : W + Wc, :], Dpc - Dp, 1)[:, 0:Dc]
    if "rowsums" not in ablate:
        dattpc_ref[0:1, :] += jnp.sum(dl_dpc * gz, axis=0, keepdims=True)

    gen = f_unpack(gen_ref[:].astype(jnp.float32))
    d_en = jax.lax.dot_general(
        dxl_pc, wlpc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + gen
    if "dw" not in ablate:
        dwlpc_ref[:] += jax.lax.dot_general(
            en, dxl_pc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if "rowsums" not in ablate:
        dblpc_ref[0:1, :] += jnp.sum(dxl_pc, axis=0, keepdims=True)

    d_xn = jnp.where(xn > 0, d_en, 0.0)
    if "rowsums" not in ablate:
        dlng_ref[0:1, :] += jnp.sum(d_xn * xhat, axis=0, keepdims=True)
        dlnb_ref[0:1, :] += jnp.sum(d_xn, axis=0, keepdims=True)
    d_xhat = d_xn * lng_ref[:]
    if "lnbwd" in ablate:
        d_el = rstd * d_xhat
    else:
        mean_dxhat = jax.lax.dot_general(
            d_xhat, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_dxhat_xhat = jax.lax.dot_general(
            d_xhat * xhat, ones_dd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_el = rstd * (d_xhat - mean_dxhat - xhat * mean_dxhat_xhat)
    d_el += f_unpack(gel_ref[:].astype(jnp.float32))

    d_el_p = f_repack(d_el)
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
    if "dw" not in ablate:
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
    if "rowsums" not in ablate:
        dsum_ref[0:1, :] += jnp.sum(d_core_p, axis=0, keepdims=True)
    d_core = d_el * 0.25  # (CHUNK, De) for the table scatters
    if "scatmerge" in ablate:
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
    elif "scatb" in ablate:
        dps_ref[:] += d_core[0:W, :]
        dpv_ref[:] += d_core[0:Wc, :]
    else:
        scat_upd = jax.lax.dot_general(
            ohT_pc_mm, d_core.astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W+Wc, De)
        dps_ref[:] += scat_upd[0:W, :]
        dpv_ref[:] += scat_upd[W : W + Wc, :]


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
    HP = -(-(Hp + Hc) // 8) * 8
    r = lambda *s: jnp.asarray(rngs.standard_normal(s).astype(np.float32) * 0.1)  # noqa: E731
    pids2d = g.pt_idx.astype(jnp.int32).reshape(nch, CHUNK)
    cids2d = g.cam_idx.astype(jnp.int32).reshape(nch, CHUNK)
    wb = g.pt_window.reshape(nch, CHUNK)[:, 0]
    nlive = jnp.asarray(nch, jnp.int32)

    we_bd = blockdiag(r(De, De))
    wuv_bd = blockdiag(r(2, De))
    lng, lnb = r(1, De) + 1.0, r(1, De)
    wlp, blp = r(De, Dp), r(1, Dp)
    wlc, blc = r(De, Dc), r(1, Dc)
    xrp, xrc = r(s_pad, Dp), r(Wc, Dc)
    attp, attc = r(1, Dp), r(1, Dc)
    dt = jnp.bfloat16
    en_p = pack_edges(r(E, De), CHUNK).astype(dt)
    skip2_p = pack_edges(r(E, 2), CHUNK).astype(dt)
    el_p = pack_edges(r(E, De), CHUNK).astype(dt)
    gen_p = pack_edges(r(E, De), CHUNK).astype(dt)
    gel_p = pack_edges(r(E, De), CHUNK).astype(dt)
    mdp = jnp.abs(r(2 * HP, s_pad)) + 0.5
    mdc = jnp.abs(r(2 * HP, Wc)) + 0.5
    outp, outc = r(s_pad, Dp), r(Wc, Dc)
    gp, gc = r(s_pad, Dp), r(Wc, Dc)
    print(f"merged bwd ablation: CHUNK={CHUNK} chunks={nch} Wc={Wc} streams=bf16",
          flush=True)

    variants = [
        (),
        ("unpacks",), ("repackb",), ("recompute",), ("gatherb",),
        ("rollsb",), ("attnbwd",), ("scatb",), ("rowsums",), ("dw",),
        ("lnbwd",), ("scatmerge",),
    ]
    base = None
    raw = fls._bwd_raw.__wrapped__
    for v in variants:
        fls._bwd_body = functools.partial(_staged_bwd_body, ablate=frozenset(v))

        @jax.jit
        def bwd(en_p):
            outs = raw(
                en_p, skip2_p, el_p, we_bd, wuv_bd,
                lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                mdp, mdc, outp, outc, gp, gc, gen_p, gel_p,
                pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5)
            return (outs[0].astype(jnp.float32) * 1e-6).astype(en_p.dtype) + en_p

        t = bench(bwd, en_p) / nch * 1e6
        if base is None:
            base = t
            print(f"  full                         {t:6.3f} us/chunk", flush=True)
        else:
            print(f"  -{'+'.join(v):27s} {t:6.3f} us/chunk (delta {base - t:+6.3f})",
                  flush=True)


if __name__ == "__main__":
    main()
