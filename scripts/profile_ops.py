"""Component-level timing of the GASFM hot path on the current JAX backend.

Times each candidate bottleneck in isolation by scanning it N times inside a
single jit (the carry feeds the op so XLA cannot CSE the loop away) and
reports per-iteration microseconds. Run on the real TPU:

    timeout 1800 python scripts/profile_ops.py
"""

from __future__ import annotations

import time
from functools import partial

import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=50, repeats=3):
    """Per-iteration seconds of fn(carry, *args) scanned `iters` times."""

    @partial(jax.jit, static_argnames="n")
    def run(c, n, *a):
        def body(carry, _):
            out = fn(carry, *a)
            return out, ()

        c, _ = jax.lax.scan(body, c, None, length=n)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)

    c0 = args[0]
    rest = args[1:]
    small, large = 2, 2 + iters
    jax.block_until_ready(run(c0, small, *rest))
    jax.block_until_ready(run(c0, large, *rest))
    ts, tl = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(c0, small, *rest))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(c0, large, *rest))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / iters


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    E, S_pt, S_cam, H, C = 53248, 4096, 64, 4, 8
    d = H * C + H  # packed width in gatv2_attend

    data = jnp.asarray(rng.standard_normal((E, d)), dtype=jnp.float32)
    pt_ids = jnp.asarray(np.sort(rng.integers(0, S_pt, size=E)).astype(np.int32))
    cam_ids = jnp.asarray(np.sort(rng.integers(0, S_cam, size=E)).astype(np.int32))
    pt_ids_unsorted = jnp.asarray(rng.permutation(np.asarray(pt_ids)))
    table_pt = jnp.asarray(rng.standard_normal((S_pt, d)), dtype=jnp.float32)
    logits = jnp.asarray(rng.standard_normal((E, H)), dtype=jnp.float32)

    def report(name, sec, nbytes=None):
        line = f"{name:55s} {sec*1e6:10.1f} us"
        if nbytes:
            line += f"   {nbytes/sec/1e9:8.1f} GB/s"
        print(line, flush=True)

    # --- raw segment reductions (XLA scatter path) ---
    report("segsum E->4096 d36 sorted",
           timed(lambda x: jax.ops.segment_sum(x, pt_ids, S_pt, indices_are_sorted=True)[pt_ids] ,
                 data), E * d * 4 * 2)
    report("segsum E->4096 d36 unsorted",
           timed(lambda x: jax.ops.segment_sum(x, pt_ids_unsorted, S_pt)[pt_ids_unsorted], data),
           E * d * 4 * 2)
    report("segsum E->64 d36 sorted",
           timed(lambda x: jax.ops.segment_sum(x, cam_ids, S_cam, indices_are_sorted=True)[cam_ids],
                 data), E * d * 4 * 2)
    report("segmax E->4096 d4 sorted",
           timed(lambda x: jax.ops.segment_max(jax.lax.stop_gradient(x), pt_ids, S_pt,
                                               indices_are_sorted=True)[pt_ids], logits + 0 * 1.0)
           if True else 0, E * H * 4 * 2)

    # --- gather only (carry must keep table shape: reduce back via slice-add) ---
    report("gather 4096->E d36 (+Esum)",
           timed(lambda t: t * (1.0 + 1e-12 * jnp.sum(t[pt_ids])), table_pt), E * d * 4 * 2)

    # --- pallas one-hot kernels ---
    from gasfm_tpu.ops.pallas.segment_kernels import (
        gather_rows_kernel, segment_sum_kernel,
    )
    ids2d_pt = pt_ids[:, None]
    report("pallas segsum E->4096 d36 (+gather)",
           timed(lambda x: x + 1e-12 * gather_rows_kernel(
               segment_sum_kernel(x, ids2d_pt, S_pt), ids2d_pt), data),
           E * d * 4 * 2)
    report("pallas gather 4096->E d36 (+Esum)",
           timed(lambda t: t * (1.0 + 1e-12 * jnp.sum(gather_rows_kernel(t, ids2d_pt))), table_pt),
           E * d * 4 * 2)
    ids2d_cam = cam_ids[:, None]
    report("pallas segsum E->64 d36 (+gather)",
           timed(lambda x: x + 1e-12 * gather_rows_kernel(
               segment_sum_kernel(x, ids2d_cam, S_cam), ids2d_cam), data),
           E * d * 4 * 2)

    # --- gatv2_attend (full attention core), fwd and grad ---
    from gasfm_tpu.ops.gatv2 import gatv2_attend
    xl = jnp.asarray(rng.standard_normal((E, H, C)), dtype=jnp.float32)
    xr = jnp.asarray(rng.standard_normal((S_pt, H, C)), dtype=jnp.float32)
    att = jnp.asarray(rng.standard_normal((H, C)), dtype=jnp.float32)
    emask = jnp.ones((E,), dtype=bool)

    def att_fwd(x):
        return gatv2_attend(x, xr, att, pt_ids, S_pt, edge_mask=emask,
                            indices_are_sorted=True)[pt_ids]

    report("gatv2_attend fwd E->4096", timed(att_fwd, xl))
    def att_loss(x):
        return jnp.sum(gatv2_attend(x, xr, att, pt_ids, S_pt, edge_mask=emask,
                                    indices_are_sorted=True) ** 2)
    report("gatv2_attend grad E->4096",
           timed(lambda x: jax.grad(att_loss)(x), xl))

    # --- dense pieces ---
    ln = jnp.asarray(rng.standard_normal((E, 32)), dtype=jnp.float32)
    def layernorm(x):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-5)
    report("layernorm E x 32", timed(layernorm, ln), E * 32 * 4 * 2)

    w1 = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.01, dtype=jnp.float32)
    mv = jnp.asarray(rng.standard_normal((64, 1024)), dtype=jnp.float32)
    report("view MLP 64x1024x1024", timed(lambda x: jnp.tanh(x @ w1), mv))
    wg = jnp.asarray(rng.standard_normal((2048, 2048)) * 0.01, dtype=jnp.float32)
    gv = jnp.asarray(rng.standard_normal((1, 2048)), dtype=jnp.float32)
    report("global MLP 1x2048x2048", timed(lambda x: jnp.tanh(x @ wg), gv))

    # --- full model fwd / train step at bench scale ---
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _flagship_conf
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.losses import get_loss_func
    from gasfm_tpu.models import get_model

    conf = _flagship_conf(small=False)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    data_s = generate_synthetic_scene(n_views=64, n_points=4096, visibility=0.2, seed=0)
    scene = data_s.to_scene_graph()
    params = model.init(jax.random.PRNGKey(0), scene.graph)
    print("E_true:", int(scene.graph.e_true), "E_cap:", scene.graph.num_edges,
          "N_cap:", scene.graph.num_pts, "M_cap:", scene.graph.num_cams)

    def fwd(p):
        out = model.apply(p, scene.graph)
        return jax.tree_util.tree_map(lambda x: x * 1.000001, p), out["Ps_norm"].sum() + out["pts3D"].sum()

    report("model forward (full)", timed(lambda p: fwd(p)[0], params, iters=20))

    def train_like(p):
        def loss_fn(q):
            return loss_func(model.apply(q, scene.graph), scene)
        g = jax.grad(loss_fn)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)

    report("fwd+bwd (full)", timed(train_like, params, iters=20))


if __name__ == "__main__":
    main()
