"""In-process measurement of the merged layer-step kernel's cost.

The bench's honest "attainable" model prices the step's edge work by the
measured per-chunk cost of the production merged kernel
(ops/pallas/fused_layer_step). Round 4 hardcoded that constant from one
campaign measurement and it went stale mid-round (VERDICT r4 weak #2);
here the bench derives it by timing the isolated kernel on THIS chip at
the bench graph's exact id layout, scan-amortized like every other
measurement in this repo (scripts/packed_microbench.py is the standalone
ancestor of this helper).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def measure_merged_kernel_cost(graph, stream_dtype, reps: int = 3,
                               n_scan: int = 50) -> float:
    """Seconds per chunk of the merged layer-step kernel, fwd + bwd,
    at this graph's chunk/id layout and the given stream storage dtype.

    Uses synthetic operand values (cost is value-independent) at the
    flagship interior-layer shape profile (De = Dp = Dc = 32, 4+4 heads,
    init-skip + residual present).

    Calibration caveat (BENCHLOG section 38): the per-chunk figure is a
    reliable production proxy at the headline layout (~65 live 2048-chunks
    — the bench attainable-model use case), but at LOW live-chunk counts
    on small-chunk graphs its per-launch amortization differs from the
    production step (measured 15.5 vs 10.0 us/chunk across two chunk-512
    graphs) — do not treat it as an absolute per-chunk bound there."""
    from gasfm_tpu.graph.view_graph import WINDOW
    from gasfm_tpu.ops.pallas import fused_layer_step as fls
    from gasfm_tpu.ops.pallas.packing import blockdiag, pack_edges, tile_row

    rng = np.random.default_rng(0)
    g = graph
    E = g.num_edges
    chunk = g.chunk
    nch = E // chunk
    De, Dp, Dc, Hp, Hc = 32, 32, 32, 4, 4
    s_pad = -(-g.num_pts // WINDOW) * WINDOW
    Wc = max(((g.num_cams + 127) // 128) * 128, 128)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)

    pids2d = g.pt_idx.astype(jnp.int32).reshape(nch, chunk)
    cids2d = g.cam_idx.astype(jnp.int32).reshape(nch, chunk)
    wb = g.pt_window.reshape(nch, chunk)[:, 0]
    window = g.pt_segment_windows()
    nlive = window.nlive if window is not None else jnp.asarray(nch, jnp.int32)
    nlive_i = int(nlive)

    we_bd = blockdiag(r(De, De))
    c0 = tile_row(r(1, De))
    wuv_bd = blockdiag(r(2, De))
    ps, pv = r(s_pad, De), r(Wc, De)
    lng, lnb = r(1, De) + 1.0, r(1, De)
    wlp, blp = r(De, Dp), r(1, Dp)
    wlc, blc = r(De, Dc), r(1, Dc)
    xrp, xrc = r(s_pad, Dp), r(Wc, Dc)
    attp, attc = r(1, Dp), r(1, Dc)
    en_p = pack_edges(r(E, De), chunk).astype(stream_dtype)
    skip2_p = pack_edges(r(E, 2), chunk).astype(stream_dtype)
    res_p = pack_edges(r(E, De), chunk).astype(stream_dtype)

    from gasfm_tpu.ops.segment import get_kernel_precision

    mm = get_kernel_precision()

    def fwdbwd(en_p):
        el, ennext, outp, outc, mdp, mdc = fls._fwd_raw(
            en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps, pv,
            lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
            pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5, mm=mm)
        outs = fls._bwd_raw(
            en_p, skip2_p, el, we_bd, wuv_bd,
            lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
            mdp, mdc, outp, outc, outp, outc, ennext, el,
            pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5, mm=mm)
        return (outs[0].astype(jnp.float32) * 1e-6).astype(en_p.dtype) + en_p

    @partial(jax.jit, static_argnames="n")
    def run(c, n):
        def body(c, _):
            return fwdbwd(c), ()

        out, _ = jax.lax.scan(body, c, None, length=n)
        return out

    jax.block_until_ready(run(en_p, n_scan))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(en_p, n_scan))
        ts.append(time.perf_counter() - t0)
    # Per LIVE chunk: the dead-chunk skip removes dead chunks' compute, so
    # the attainable model prices live chunks only.
    return min(ts) / n_scan / max(nlive_i, 1)


def measure_hbm_gbps(n_probe: int = 5):
    """Median-of-N achievable-HBM-bandwidth probe of THIS chip instance.

    Methodology (pinned; BENCHLOG sections 20/26 measured a 2x spread from
    ad-hoc probes): read-only sum over a fixed 256 MB f32 working set
    inside one jitted scan of K=40 iterations (amortizing the ~5 ms tunnel
    dispatch), repeated ``n_probe`` times; report (median, min, max) GB/s.
    The virtualized 'v5 lite' runtime delivers a fraction of the 819 GB/s
    v5e spec at every measured working set.
    """
    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB
    K = 40

    @jax.jit
    def red(a):
        def body(c, _):
            return c + jnp.sum(a) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    float(red(x))  # compile + warm
    rates = []
    for _ in range(n_probe):
        t0 = time.perf_counter()
        float(red(x))
        dt = (time.perf_counter() - t0) / K
        rates.append(256 / 1024 / dt)
    rates.sort()
    return rates[len(rates) // 2], rates[0], rates[-1]
