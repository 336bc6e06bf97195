"""Microbenchmark of the fused layer-frontend kernels in isolation.

Times _front_fwd_raw / _front_bwd_raw on blocked synthetic data at the
bench-scene size, chained through a jitted scan (output feeds the next
input, preventing loop hoisting). Sweep CHUNK / precision via env:

    GASFM_CHUNK=512  GASFM_KERNEL_PRECISION=f32  python scripts/kernel_microbench.py
    GASFM_CHUNK=1024 GASFM_KERNEL_PRECISION=bf16 python scripts/kernel_microbench.py
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
from gasfm_tpu.ops.pallas.fused_dual_attn import _front_bwd_raw, _front_fwd_raw
from gasfm_tpu.ops.segment import get_kernel_precision


def main():
    mm = get_kernel_precision()
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E = g.num_edges
    De = 32
    Hp = Hc = 4
    Dp = Dc = 32
    W = WINDOW
    Wc = 256  # 128 cams -> round_up(129, 128)
    s_pad = ((g.num_pts + W - 1) // W) * W
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)  # noqa: E731
    e0 = r(E, De)
    lng, lnb = r(1, De) + 1.0, r(1, De)
    wlp, blp, wlc, blc = r(De, Dp), r(1, Dp), r(De, Dc), r(1, Dc)
    xrp, xrc = r(s_pad, Dp), r(Wc, Dc)
    attp, attc = r(1, Dp), r(1, Dc)
    pids = g.pt_idx.astype(jnp.int32)[:, None]
    cids = g.cam_idx.astype(jnp.int32)[:, None]
    wb = g.pt_window.reshape(E // CHUNK, CHUNK)[:, 0]
    print(f"CHUNK={CHUNK} W={W} Wc={Wc} E_cap={E} chunks={E // CHUNK} mm={mm}")

    @partial(jax.jit, static_argnames="n")
    def run_fwd(e, n):
        def body(e, _):
            en, outp, outc, mdp, mdc = _front_fwd_raw(
                e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                pids, cids, wb, None, W, Wc, Hp, Hc, 0.2, 1e-5, mm=mm)
            return en + outp.sum() * 1e-9, ()

        out, _ = jax.lax.scan(body, e, None, length=n)
        return out

    @partial(jax.jit, static_argnames="n")
    def run_fwd_bwd(e, n):
        def body(e, _):
            en, outp, outc, mdp, mdc = _front_fwd_raw(
                e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                pids, cids, wb, None, W, Wc, Hp, Hc, 0.2, 1e-5, mm=mm)
            outs = _front_bwd_raw(
                e, lng, lnb, wlp, blp, wlc, blc, xrp, xrc, attp, attc,
                pids, cids, wb, None, mdp, mdc, outp, outc, outp, outc, en,
                W, Wc, Hp, Hc, 0.2, 1e-5, mm=mm)
            de = outs[0]
            return en + de * 1e-6, ()

        out, _ = jax.lax.scan(body, e, None, length=n)
        return out

    for name, fn in (("fwd", run_fwd), ("fwd+bwd", run_fwd_bwd)):
        n = 100
        out = fn(e0, n)
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(e0, n))
            times.append(time.perf_counter() - t0)
        per_call = min(times) / n
        per_chunk = per_call / (E // CHUNK)
        print(f"{name:8s}: {per_call*1e3:7.3f} ms/call  "
              f"{per_chunk*1e6:6.2f} us/chunk  "
              f"{per_call/E*1e9:6.1f} ns/edge", flush=True)


if __name__ == "__main__":
    main()
