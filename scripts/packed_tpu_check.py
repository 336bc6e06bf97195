"""Compiled-on-TPU correctness check of the packed kernels (frontend +
projection update) against the composite/unpacked paths. The interpret-mode
tests (tests/test_packed.py) validate semantics; this validates the Mosaic
compilation of the roll-based relayouts on real hardware.

Run: timeout 900 python scripts/packed_tpu_check.py
"""

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gasfm_tpu.graph.view_graph import CHUNK, WINDOW
from gasfm_tpu.ops.pallas.packing import pack_edges, unpack_edges
from gasfm_tpu.ops.gatv2 import gatv2_layer_frontend
from gasfm_tpu.ops.pallas.fused_proj_update import packed_edge_update
from gasfm_tpu.ops.segment import SegmentWindows, set_kernel_mode

rng = np.random.default_rng(11)
n_chunks, S, M, De = 5, 500, 21, 32
Hp = Hc = 4
Cp = Cc = 8
W = WINDOW
E = n_chunks * CHUNK
n_blocks = -(-S // W)
wb = np.sort(rng.choice(n_blocks, size=n_chunks, replace=True)).astype(np.int32)
pt_ids = np.empty((E,), np.int32)
for c in range(n_chunks):
    lo = wb[c] * W
    pt_ids[c * CHUNK : (c + 1) * CHUNK] = rng.integers(lo, min(lo + W, S), size=CHUNK)
cam_ids = rng.integers(0, M, size=E).astype(np.int32)
emask = rng.random(E) > 0.08
visited = np.zeros(n_blocks, bool)
visited[np.unique(wb)] = True
row_ok = np.repeat(visited, W)[:S]
window = SegmentWindows(block=jnp.asarray(wb), row_ok=jnp.asarray(row_ok))
r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
e = r(E, De)
a = dict(lng=r(De), lnb=r(De) * 0.1, wlp=r(De, 32) * 0.3, blp=r(32) * 0.1,
         att_p=r(Hp, Cp), xr_p=r(S, Hp, Cp), wlc=r(De, 32) * 0.3,
         blc=r(32) * 0.1, att_c=r(Hc, Cc), xr_c=r(M, Hc, Cc))
R_en, R_p, R_c = r(E, De), r(S, Hp, Cp), r(M, Hc, Cc)


def loss(e_, packed):
    en, op_, oc = gatv2_layer_frontend(
        e_, a["lng"], a["lnb"], 1e-5,
        a["wlp"], a["blp"], a["att_p"], a["xr_p"], jnp.asarray(pt_ids), S, window,
        a["wlc"], a["blc"], a["att_c"], a["xr_c"], jnp.asarray(cam_ids), M,
        edge_mask=jnp.asarray(emask), packed=packed)
    if packed:
        en = unpack_edges(en, CHUNK)
    op_ = jnp.where(jnp.asarray(row_ok)[:, None, None], op_, 0.0)
    return jnp.sum(en * R_en) + jnp.sum(op_ * R_p) + jnp.sum(oc * R_c)


set_kernel_mode("auto")
vu, gu = jax.value_and_grad(lambda e_: loss(e_, False))(e)
vp, gp = jax.value_and_grad(lambda e_: loss(e_, True))(pack_edges(e, CHUNK))
gp = unpack_edges(gp, CHUNK)
print("frontend fwd diff:", abs(float(vu) - float(vp)), flush=True)
print("frontend grad maxdiff:", float(jnp.max(jnp.abs(gu - gp))), flush=True)

D = 32
D2 = 2
en, skip2, res = r(E, D), r(E, D2), r(E, D)
w_e, b, w_uv, ps, pv, pg = (r(D, D) * 0.3, r(D) * 0.1, r(D2, D) * 0.3,
                            r(S, D), r(M, D), r(1, D))
s_pad = n_blocks * W
ptm = np.where(emask, pt_ids, s_pad).astype(np.int32)
cmm = np.where(emask, cam_ids, M).astype(np.int32)
Rr = r(E, D)


def loss_k(args):
    en_, skip2_, res_, w_e_, b_, w_uv_, ps_, pv_, pg_ = args
    out = packed_edge_update(
        pack_edges(en_, CHUNK), pack_edges(skip2_, CHUNK), pack_edges(res_, CHUNK),
        w_e_, b_, w_uv_, ps_, pv_, pg_,
        jnp.asarray(ptm).reshape(-1, CHUNK), jnp.asarray(cmm).reshape(-1, CHUNK),
        jnp.asarray(wb), S, M, W)
    out = unpack_edges(out, CHUNK)
    return jnp.sum(jnp.where(jnp.asarray(emask)[:, None], out, 0.0) * Rr)


def loss_c(args):
    en_, skip2_, res_, w_e_, b_, w_uv_, ps_, pv_, pg_ = args
    cat = jnp.concatenate([en_, skip2_], axis=1)
    wcat = jnp.concatenate([w_e_, w_uv_], axis=0)
    pe = cat @ wcat + b_
    ps_g = jnp.where(jnp.asarray(emask)[:, None], ps_[np.minimum(pt_ids, S - 1)], 0.0)
    pv_g = jnp.where(jnp.asarray(emask)[:, None], pv_[np.minimum(cam_ids, M - 1)], 0.0)
    out = (pe + ps_g + pv_g + pg_) / 4.0 + res_
    return jnp.sum(jnp.where(jnp.asarray(emask)[:, None], out, 0.0) * Rr)


args = (en, skip2, res, w_e, b, w_uv, ps, pv, pg)
vk, gk = jax.value_and_grad(loss_k)(args)
vc, gc = jax.value_and_grad(loss_c)(args)
print("update fwd diff:", abs(float(vk) - float(vc)), flush=True)
for n_, a_, b_ in zip(("en", "skip2", "res", "w_e", "b", "w_uv", "ps", "pv", "pg"),
                      gk, gc):
    print(n_, float(jnp.max(jnp.abs(a_ - b_))), flush=True)
print("OK", flush=True)
