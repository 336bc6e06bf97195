"""Time the windowed Pallas kernels vs XLA on a real blocked graph."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from functools import partial
import jax, jax.numpy as jnp, numpy as np

def timed(fn, *args, iters=50, repeats=3):
    @partial(jax.jit, static_argnames="n")
    def run(c, n, *a):
        def body(carry, _):
            return fn(carry, *a), ()
        c, _ = jax.lax.scan(body, c, None, length=n)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)
    c0, rest = args[0], args[1:]
    small, large = 2, 2 + iters
    jax.block_until_ready(run(c0, small, *rest)); jax.block_until_ready(run(c0, large, *rest))
    ts, tl = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); jax.block_until_ready(run(c0, small, *rest)); ts.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); jax.block_until_ready(run(c0, large, *rest)); tl.append(time.perf_counter()-t0)
    return (min(tl)-min(ts))/iters

def report(name, sec):
    print(f"{name:58s} {sec*1e6:10.1f} us", flush=True)

def main():
    print("platform:", jax.devices()[0].platform)
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    data = generate_synthetic_scene(n_views=64, n_points=4096, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E, N, M = g.num_edges, g.num_pts, g.num_cams
    print("E", E, "N", N, "M", M, "e_true", int(g.e_true))
    win = g.pt_segment_windows()
    rng = np.random.default_rng(0)
    d = 36
    x = jnp.asarray(rng.standard_normal((E, d)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((E, 4)), jnp.float32)

    from gasfm_tpu.ops.pallas.segment_kernels import (
        windowed_segment_sum, windowed_gather, windowed_segment_max,
        segment_sum_kernel, gather_rows_kernel)
    ids2d = g.pt_idx.astype(jnp.int32)[:, None]
    cam2d = g.cam_idx.astype(jnp.int32)[:, None]

    report("wseg_sum E->N d36 (+XLA take)", timed(
        lambda a: a + 1e-12*windowed_segment_sum(a, ids2d, win.block, N, False)[g.pt_idx.clip(0,N-1)], x))
    report("wgather N->E d36 (+sum)", timed(
        lambda t: t*(1.0+1e-12*jnp.sum(windowed_gather(t, ids2d, win.block, False))), table))
    report("wseg_max E->N d4 (+take)", timed(
        lambda a: a + 1e-12*windowed_segment_max(a, ids2d, win.block, N)[g.pt_idx.clip(0,N-1)], logits))
    report("dense segsum E->M d36 (+take)", timed(
        lambda a: a + 1e-12*segment_sum_kernel(a, cam2d, M, False)[g.cam_idx.clip(0,M-1)], x))
    report("dense gather M->E d36 (+sum)", timed(
        lambda t: t*(1.0+1e-12*jnp.sum(gather_rows_kernel(t, cam2d, False))),
        jnp.asarray(rng.standard_normal((M, d)), jnp.float32)))

    # XLA references on same data
    report("XLA segsum E->N d36", timed(
        lambda a: a + 1e-12*jax.ops.segment_sum(a, g.pt_idx, num_segments=N)[g.pt_idx.clip(0,N-1)], x))
    report("XLA take N->E d36 (+sum)", timed(
        lambda t: t*(1.0+1e-12*jnp.sum(t[g.pt_idx.clip(0,N-1)])), table))

    # attention core fwd+grad via dispatch, window on vs off
    from gasfm_tpu.ops.gatv2 import gatv2_attend
    from gasfm_tpu.ops import segment as seg
    H, C = 4, 8
    xl = jnp.asarray(rng.standard_normal((E, H, C)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((N, H, C)), jnp.float32)
    att = jnp.asarray(rng.standard_normal((H, C)), jnp.float32)
    def att_loss(xx, w):
        return jnp.sum(gatv2_attend(xx, xr, att, g.pt_idx, N, edge_mask=g.edge_mask, window=w)**2)
    report("gatv2 fwd (windowed kernels)", timed(
        lambda xx: xx + 1e-12*jnp.sum(gatv2_attend(xx, xr, att, g.pt_idx, N, edge_mask=g.edge_mask, window=win)), xl))
    report("gatv2 grad (windowed kernels)", timed(lambda xx: jax.grad(att_loss)(xx, win), xl))
    seg.set_kernel_mode("off")
    report("gatv2 fwd (XLA)", timed(
        lambda xx: xx + 1e-12*jnp.sum(gatv2_attend(xx, xr, att, g.pt_idx, N, edge_mask=g.edge_mask, window=None)), xl))
    report("gatv2 grad (XLA)", timed(lambda xx: jax.grad(att_loss)(xx, None), xl))

if __name__ == "__main__":
    main()
