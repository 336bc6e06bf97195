"""Microbenchmark: packed vs unpacked fused kernels in isolation.

Times, per chunk, on bench-scene shapes (m=128/n=8192):
  - frontend fwd / fwd+bwd  (fused_dual_attn._front_{fwd,bwd}_raw), both
    layouts,
  - packed projection update fwd / fwd+bwd (fused_proj_update), vs the old
    unpacked fused_update pair (which also needed XLA for concat/lin_proj —
    not timed here; kernel-only comparison).

Run: timeout 1800 python scripts/packed_microbench.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.graph.view_graph import CHUNK, WINDOW
from gasfm_tpu.ops.pallas import fused_update
from gasfm_tpu.ops.pallas import fused_proj_update as fpu
from gasfm_tpu.ops.pallas.fused_dual_attn import _front_bwd_raw, _front_fwd_raw
from gasfm_tpu.ops.pallas.packing import PACK, blockdiag, pack_edges, tile_row


def bench(fn, carry, n=100, reps=3):
    @partial(jax.jit, static_argnames="n")
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
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E = g.num_edges
    nch = E // CHUNK
    import os

    mm = os.environ.get("GASFM_KERNEL_PRECISION", "f32")
    De = Dp = Dc = D = 32
    Hp = Hc = 4
    W = WINDOW
    Wc = int(os.environ.get("BENCH_WC", "128"))  # round_up(128 cams, 128)
    s_pad = ((g.num_pts + W - 1) // W) * W
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)  # noqa: E731
    e0 = r(E, De)
    e0p = pack_edges(e0, CHUNK)
    lng, lnb = r(1, De) + 1.0, r(1, De)
    wlp, blp, wlc, blc = r(De, Dp), r(1, Dp), r(De, Dc), r(1, Dc)
    xrp, xrc = r(s_pad, Dp), r(Wc, Dc)
    attp, attc = r(1, Dp), r(1, Dc)
    pids2d = g.pt_idx.astype(jnp.int32).reshape(nch, CHUNK)
    cids2d = g.cam_idx.astype(jnp.int32).reshape(nch, CHUNK)
    wb = g.pt_window.reshape(nch, CHUNK)[:, 0]
    print(f"CHUNK={CHUNK} E_cap={E} chunks={nch} Wc={Wc} mm={mm}", flush=True)

    def front_fwd(e, packed):
        en, outp, outc, mdp, mdc = _front_fwd_raw(
            e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
            pids2d, cids2d, wb, None, W, Wc, Hp, Hc, 0.2, 1e-5, mm=mm, packed=packed)
        return en + outp.sum() * 1e-9

    def front_fwdbwd(e, packed):
        en, outp, outc, mdp, mdc = _front_fwd_raw(
            e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
            pids2d, cids2d, wb, None, W, Wc, Hp, Hc, 0.2, 1e-5, mm=mm, packed=packed)
        outs = _front_bwd_raw(
            e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
            pids2d, cids2d, wb, None, mdp, mdc, outp, outc, outp, outc, en,
            W, Wc, Hp, Hc, 0.2, 1e-5, mm=mm, packed=packed)
        return outs[0] * 1e-6 + e

    for packed, e_in in ((False, e0), (True, e0p)):
        t = bench(lambda e: front_fwd(e, packed), e_in)
        t2 = bench(lambda e: front_fwdbwd(e, packed), e_in)
        print(f"frontend packed={int(packed)}: fwd {t/nch*1e6:6.3f} us/chunk | "
              f"fwd+bwd {t2/nch*1e6:6.3f} us/chunk", flush=True)

    # Projection update. Packed (folded skip/res) vs old unpacked kernel.
    skip2_p = pack_edges(r(E, 2), CHUNK)
    res_p = e0p
    w_e, b_, w_uv = r(De, D), r(1, D), r(2, D)
    ps, pv, pg = r(s_pad, D), r(Wc, D), r(1, D)

    def upd_packed(en_p):
        out = fpu._fwd_raw(en_p, skip2_p, res_p, blockdiag(w_e),
                           tile_row(b_ + pg), blockdiag(w_uv), ps, pv,
                           pids2d, cids2d, wb, None, W, Wc, D, False, mm,
                           True, True)
        return out + en_p * 1e-9

    def upd_packed_bwd(en_p):
        out = fpu._fwd_raw(en_p, skip2_p, res_p, blockdiag(w_e),
                           tile_row(b_ + pg), blockdiag(w_uv), ps, pv,
                           pids2d, cids2d, wb, None, W, Wc, D, False, mm,
                           True, True)
        outs = fpu._bwd_raw(out, en_p, skip2_p, blockdiag(w_e), blockdiag(w_uv),
                            pids2d, cids2d, wb, None, W, Wc, D, s_pad, False, mm,
                            True)
        return outs[0] * 1e-6 + en_p

    def upd_unpacked(pe):
        out = fused_update._fwd_raw(pe, ps, pv, pg, pids2d, cids2d, wb, W, Wc)
        return out + pe * 1e-9

    def upd_unpacked_bwd(pe):
        out = fused_update._fwd_raw(pe, ps, pv, pg, pids2d, cids2d, wb, W, Wc)
        outs = fused_update._bwd_raw(out, pids2d, cids2d, wb, s_pad, W, Wc)
        return outs[0] * 1e-6 + pe

    t = bench(upd_packed, e0p)
    t2 = bench(upd_packed_bwd, e0p)
    print(f"update packed (folded): fwd {t/nch*1e6:6.3f} us/chunk | "
          f"fwd+bwd {t2/nch*1e6:6.3f} us/chunk", flush=True)
    t = bench(upd_unpacked, e0)
    t2 = bench(upd_unpacked_bwd, e0)
    print(f"update unpacked (kernel only, excl. concat/lin_proj XLA): "
          f"fwd {t/nch*1e6:6.3f} us/chunk | fwd+bwd {t2/nch*1e6:6.3f} us/chunk",
          flush=True)


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "merged"):
    main()


def merged_main():
    """Isolated merged layer-step kernel (fused_layer_step) fwd / fwd+bwd,
    f32 vs bf16 streams — attributes the bench's hot path against the
    stream model of BENCHLOG section 20. Run:
        GASFM_CHUNK=1024 python scripts/packed_microbench.py merged
    """
    import numpy as np

    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.ops.pallas import fused_layer_step as fls
    from gasfm_tpu.ops.pallas.packing import PACK, blockdiag, pack_edges, tile_row

    rngs = np.random.default_rng(0)
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    scene = data.to_scene_graph()
    g = scene.graph
    E = g.num_edges
    nch = E // CHUNK
    De, Dp, Dc, Hp, Hc = 32, 32, 32, 4, 4
    s_pad = -(-g.num_pts // WINDOW) * WINDOW
    Wc = max(((g.num_cams + 127) // 128) * 128, 128)
    import os as _os
    if _os.environ.get("MERGED_WC"):
        Wc = int(_os.environ["MERGED_WC"])  # A/B: cam ids stay < 128
    r = lambda *s: jnp.asarray(rngs.standard_normal(s).astype(np.float32) * 0.1)  # noqa: E731
    pids2d = g.pt_idx.astype(jnp.int32).reshape(nch, CHUNK)
    cids2d = g.cam_idx.astype(jnp.int32).reshape(nch, CHUNK)
    wb = g.pt_window.reshape(nch, CHUNK)[:, 0]
    nlive = jnp.asarray(nch, jnp.int32)
    HP = -(-(Hp + Hc) // 8) * 8

    we_bd = blockdiag(r(De, De))
    c0 = tile_row(r(1, De))
    wuv_bd = blockdiag(r(2, De))
    ps, pv = r(s_pad, De), r(Wc, De)
    lng, lnb = r(1, De) + 1.0, r(1, De)
    wlp, blp = r(De, Dp), r(1, Dp)
    wlc, blc = r(De, Dc), r(1, Dc)
    xrp, xrc = r(s_pad, Dp), r(Wc, Dc)
    attp, attc = r(1, Dp), r(1, Dc)
    _mm = _os.environ.get("GASFM_KERNEL_PRECISION", "f32")
    print(f"merged kernel: CHUNK={CHUNK} chunks={nch} Wc={Wc} mm={_mm}", flush=True)

    for sd in ("f32", "bf16"):
        dt = jnp.float32 if sd == "f32" else jnp.bfloat16
        en_p = pack_edges(r(E, De), CHUNK).astype(dt)
        skip2_p = pack_edges(r(E, 2), CHUNK).astype(dt)
        res_p = pack_edges(r(E, De), CHUNK).astype(dt)

        def fwd(en_p):
            outs = fls._fwd_raw(
                en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps, pv,
                lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5, mm=_mm)
            return outs[0] + en_p * 1e-9

        def fwdbwd(en_p):
            el, ennext, outp, outc, mdp, mdc = fls._fwd_raw(
                en_p, skip2_p, res_p, we_bd, c0, wuv_bd, ps, pv,
                lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5, mm=_mm)
            outs = fls._bwd_raw(
                en_p, skip2_p, el, we_bd, wuv_bd,
                lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                mdp, mdc, outp, outc, outp, outc, ennext, el,
                pids2d, cids2d, wb, nlive, WINDOW, Wc, Hp, Hc, 0.2, 1e-5, mm=_mm)
            return (outs[0].astype(jnp.float32) * 1e-6).astype(en_p.dtype) + en_p
        t = bench(fwd, en_p)
        t2 = bench(fwdbwd, en_p)
        # Stream model: fwd moves en+skip2+res in, el+ennext out; bwd adds
        # en+skip2+el+gen+gel in, den+dskip2+dres out (physical packed rows).
        b = 2 if sd == "bf16" else 4
        fwd_bytes = (3 + 2) * CHUNK * 32 * b
        bwd_bytes = (5 + 3) * CHUNK * 32 * b
        print(f"streams={sd}: fwd {t/nch*1e6:6.3f} us/chunk "
              f"(stream model {fwd_bytes/220e9*1e6:5.2f} @220GB/s) | "
              f"fwd+bwd {t2/nch*1e6:6.3f} us/chunk "
              f"(model {(fwd_bytes+bwd_bytes)/220e9*1e6:5.2f})", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "merged":
    merged_main()
    raise SystemExit(0)
