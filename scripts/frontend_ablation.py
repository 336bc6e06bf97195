"""Ablate the fused frontend forward kernel piece by piece to locate its
~3.4 us/chunk cost (which packed layout, Wc=128, and bf16 all failed to
move). Standalone copies of the production kernel with pieces disabled —
numerics of ablated variants are WRONG by design; only time matters.

Run: timeout 1800 python scripts/frontend_ablation.py
"""

from __future__ import annotations

import functools
import sys
import time
from functools import partial
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

_NEG = -1e30


def _round_up(a, b):
    return -(-a // b) * b


def _id_row(ref, c):
    return ref[pl.ds(c % 8, 1), :]


def _kernel(
    wb_ref, pids_ref, cids_ref, e_ref, lng_ref, lnb_ref,
    wlp_ref, blp_ref, wlc_ref, blc_ref, xrp_ref, xrc_ref,
    attp_ref, attc_ref, sselp_ref, sselc_ref,
    en_ref, outp_ref, outc_ref, mdp_ref, mdc_ref,
    *, W, Wc, HP, slope, eps,
    do_ln=True, do_cam=True, do_gather=True, do_onlinemax=True, do_attn=True,
):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    wb = wb_ref[c]
    first_w = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first_w)
    def _():
        outp_ref[:] = jnp.zeros_like(outp_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdp_ref.shape, 0)
        mdp_ref[:] = jnp.where(row < HP, _NEG, 0.0)

    @pl.when(c == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, mdc_ref.shape, 0)
        mdc_ref[:] = jnp.where(row < HP, _NEG, 0.0)

    e = e_ref[:]
    if do_ln:
        mean = jnp.mean(e, axis=1, keepdims=True)
        var = jnp.mean(e * e, axis=1, keepdims=True) - mean * mean
        xhat = (e - mean) * jax.lax.rsqrt(var + eps)
        xn = xhat * lng_ref[:] + lnb_ref[:]
        en = jnp.maximum(xn, 0.0)
    else:
        en = e
    en_ref[:] = en
    xlp = jnp.dot(en, wlp_ref[:], preferred_element_type=jnp.float32) + blp_ref[:]
    xlc = jnp.dot(en, wlc_ref[:], preferred_element_type=jnp.float32) + blc_ref[:]

    local_row = _id_row(pids_ref, c) - wb * W
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    match_p = local_row == seg_iota
    ohT_p = match_p.astype(jnp.float32)
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, (Wc, 1), 0)
    match_c = _id_row(cids_ref, c) == cam_iota
    ohT_c = match_c.astype(jnp.float32)

    if do_gather:
        z_p = xlp + jax.lax.dot_general(
            ohT_p, xrp_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z_c = xlc + jax.lax.dot_general(
            ohT_c, xrc_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        z_p, z_c = xlp, xlc
    gz_p = jnp.where(z_p >= 0, z_p, slope * z_p)
    gz_c = jnp.where(z_c >= 0, z_c, slope * z_c)
    if do_attn:
        logits = jax.lax.dot_general(
            gz_p * attp_ref[:], sselp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            gz_c * attc_ref[:], sselc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if do_onlinemax:
            inwin = jax.lax.dot_general(
                ohT_p, jnp.ones((W, 1), jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) > 0.5
            m_vec = jnp.max(jnp.where(inwin, logits, _NEG), axis=0, keepdims=True)
        else:
            m_vec = jnp.zeros((1, HP), jnp.float32)
        p = jnp.exp(jnp.minimum(logits - m_vec, 0.0))
    else:
        p = gz_p[:, 0:HP] * 0.0 + 1.0
        m_vec = jnp.zeros((1, HP), jnp.float32)

    p_dp = jax.lax.dot_general(
        p, sselp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if do_onlinemax:
        mp_old = mdp_ref[0:HP, :]
        mp_new = jnp.maximum(mp_old, jnp.broadcast_to(m_vec.T, (HP, W)))
        scale_p = jnp.exp(mp_old - mp_new)
        corr_p = jnp.exp(jnp.broadcast_to(m_vec.T, (HP, W)) - mp_new)
        scale_p_wd = jax.lax.dot_general(
            scale_p, sselp_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        corr_p_wd = jax.lax.dot_general(
            corr_p, sselp_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        outp_ref[:] = outp_ref[:] * scale_p_wd + corr_p_wd * jax.lax.dot_general(
            ohT_p, (p_dp * xlp), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mdp_ref[0:HP, :] = mp_new
        mdp_ref[HP:2 * HP, :] = mdp_ref[HP:2 * HP, :] * scale_p + corr_p * jax.lax.dot_general(
            p, ohT_p, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        outp_ref[:] += jax.lax.dot_general(
            ohT_p, (p_dp * xlp), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mdp_ref[HP:2 * HP, :] += jax.lax.dot_general(
            p, ohT_p, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    if do_cam:
        p_dc = jax.lax.dot_general(
            p, sselc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if do_onlinemax:
            mc_old = mdc_ref[0:HP, :]
            mc_new = jnp.maximum(mc_old, jnp.broadcast_to(m_vec.T, (HP, Wc)))
            scale_c = jnp.exp(mc_old - mc_new)
            corr_c = jnp.exp(jnp.broadcast_to(m_vec.T, (HP, Wc)) - mc_new)
            scale_c_wd = jax.lax.dot_general(
                scale_c, sselc_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            corr_c_wd = jax.lax.dot_general(
                corr_c, sselc_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            outc_ref[:] = outc_ref[:] * scale_c_wd + corr_c_wd * jax.lax.dot_general(
                ohT_c, (p_dc * xlc), dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mdc_ref[0:HP, :] = mc_new
            mdc_ref[HP:2 * HP, :] = mdc_ref[HP:2 * HP, :] * scale_c + corr_c * jax.lax.dot_general(
                p, ohT_c, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            outc_ref[:] += jax.lax.dot_general(
                ohT_c, (p_dc * xlc), dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def main():
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E = g.num_edges
    nch = E // CHUNK
    De = Dp = Dc = 32
    Hp = Hc = 4
    HP = 8
    W = WINDOW
    Wc = 128
    s_pad = _round_up(g.num_pts, W)
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)  # noqa: E731

    def selm(H, C, off):
        s = np.zeros((H * C, HP), np.float32)
        for h in range(H):
            s[h * C:(h + 1) * C, off + h] = 1.0
        return jnp.asarray(s)

    e0 = r(E, De)
    args = dict(
        lng=r(1, De) + 1.0, lnb=r(1, De),
        wlp=r(De, Dp), blp=r(1, Dp), wlc=r(De, Dc), blc=r(1, Dc),
        xrp=r(s_pad, Dp), xrc=r(Wc, Dc), attp=r(1, Dp), attc=r(1, Dc),
        sselp=selm(Hp, Dp // Hp, 0), sselc=selm(Hc, Dc // Hc, Hp),
    )
    pids2d = g.pt_idx.astype(jnp.int32).reshape(nch, CHUNK)
    cids2d = g.cam_idx.astype(jnp.int32).reshape(nch, CHUNK)
    rows8 = _round_up(nch, 8)
    pids2d = jnp.pad(pids2d, ((0, rows8 - nch), (0, 0)))
    cids2d = jnp.pad(cids2d, ((0, rows8 - nch), (0, 0)))
    wb = g.pt_window.reshape(nch, CHUNK)[:, 0]
    print(f"CHUNK={CHUNK} chunks={nch} Wc={Wc}", flush=True)

    fixed = lambda c, w: (0, 0)  # noqa: E731

    def build(**ablate):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((8, CHUNK), lambda c, w: (c // 8, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, CHUNK), lambda c, w: (c // 8, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, De), lambda c, w: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, De), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((De, Dp), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dp), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((De, Dc), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dc), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((W, Dp), lambda c, w: (w[c], 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dp), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dc), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((Dp, HP), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((Dc, HP), fixed, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((CHUNK, De), lambda c, w: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((W, Dp), lambda c, w: (w[c], 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, Dc), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * HP, W), lambda c, w: (0, w[c]), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * HP, Wc), fixed, memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, W=W, Wc=Wc, HP=HP, slope=0.2, eps=1e-5, **ablate),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((E, De), jnp.float32),
                jax.ShapeDtypeStruct((s_pad, Dp), jnp.float32),
                jax.ShapeDtypeStruct((Wc, Dc), jnp.float32),
                jax.ShapeDtypeStruct((2 * HP, s_pad), jnp.float32),
                jax.ShapeDtypeStruct((2 * HP, Wc), jnp.float32),
            ],
        )

    a = args

    def run_variant(name, **ablate):
        fn = build(**ablate)

        def step(e):
            en, outp, outc, mdp, mdc = fn(
                wb, pids2d, cids2d, e, a["lng"], a["lnb"], a["wlp"], a["blp"],
                a["wlc"], a["blc"], a["xrp"], a["xrc"], a["attp"], a["attc"],
                a["sselp"], a["sselc"])
            return en + outp.sum() * 1e-9

        @partial(jax.jit, static_argnames="n")
        def loop(e, n):
            def body(e, _):
                return step(e), ()
            out, _ = jax.lax.scan(body, e, None, length=n)
            return out

        n = 100
        jax.block_until_ready(loop(e0, n))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(e0, n))
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s}: {min(ts)/n/nch*1e6:6.3f} us/chunk", flush=True)

    run_variant("full")
    run_variant("no-online-max", do_onlinemax=False)
    run_variant("no-cam-direction", do_cam=False)
    run_variant("no-z-gathers", do_gather=False)
    run_variant("no-attn (gather+scatter)", do_attn=False, do_onlinemax=False)
    run_variant("no-ln", do_ln=False)
    run_variant("bare min", do_ln=False, do_attn=False, do_onlinemax=False,
                do_cam=False, do_gather=False)


if __name__ == "__main__":
    main()
