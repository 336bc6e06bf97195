"""Fused single-kernel GATv2 attention vs the composite XLA path.

Runs the dispatch (gasfm_tpu/ops/gatv2.gatv2_attend) in kernel mode
"interpret" — which routes through gasfm_tpu/ops/pallas/fused_attn.py — and
compares forward values AND gradients (xl, xr, att) against kernel mode
"off" (pure XLA), covering the windowed (point-side) and dense whole-table
(camera-side) variants, padding edges, empty segments, and skipped blocks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gasfm_tpu.ops.gatv2 import gatv2_attend
from gasfm_tpu.ops.segment import SegmentWindows, set_kernel_mode


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_kernel_mode("auto")


def make_windowed_case(n_chunks=6, S=1800, H=4, C=8, seed=0):
    """Blocked layout: chunk c draws ids from one WINDOW-wide window; some
    blocks are skipped entirely; ~10% padding edges carry the trash id == S."""
    from gasfm_tpu.graph.view_graph import CHUNK, WINDOW

    rng = np.random.default_rng(seed)
    W = WINDOW
    E = n_chunks * CHUNK
    n_blocks = -(-S // W)
    wb = np.sort(rng.choice(n_blocks, size=n_chunks, replace=True)).astype(np.int32)
    ids = np.empty((E,), np.int32)
    for c in range(n_chunks):
        lo = wb[c] * W
        hi = min(lo + W, S)
        ids[c * CHUNK : (c + 1) * CHUNK] = rng.integers(lo, hi, size=CHUNK)
    pad = rng.random(E) < 0.1
    ids[pad] = S
    visited = np.zeros(n_blocks, bool)
    visited[np.unique(wb)] = True
    row_ok = np.repeat(visited, W)[:S]

    xl = rng.normal(size=(E, H, C)).astype(np.float32)
    xl[pad] = 333.0  # must not leak
    xr = rng.normal(size=(S, H, C)).astype(np.float32)
    att = rng.normal(size=(H, C)).astype(np.float32)
    window = SegmentWindows(block=jnp.asarray(wb), row_ok=jnp.asarray(row_ok))
    return (
        jnp.asarray(xl), jnp.asarray(xr), jnp.asarray(att),
        jnp.asarray(ids), S, jnp.asarray(ids < S), window, row_ok,
    )


def make_dense_case(E=1024, S=64, H=2, C=16, seed=1):
    """Camera-like: unsorted ids over a small table, trash id == S padding."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, S, size=E).astype(np.int32)
    ids[-50:] = S
    xl = rng.normal(size=(E, H, C)).astype(np.float32)
    xl[-50:] = -77.0
    xr = rng.normal(size=(S, H, C)).astype(np.float32)
    att = rng.normal(size=(H, C)).astype(np.float32)
    return (
        jnp.asarray(xl), jnp.asarray(xr), jnp.asarray(att),
        jnp.asarray(ids), S, jnp.asarray(ids < S), None,
        np.ones(S, bool),
    )


CASES = {
    "windowed": make_windowed_case,
    "windowed_h1": lambda: make_windowed_case(H=1, C=32, S=700, seed=3),
    "dense": make_dense_case,
    "dense_h4": lambda: make_dense_case(S=300, H=4, C=8, seed=4),
}


@pytest.mark.parametrize("case", list(CASES))
def test_fused_matches_xla_forward_and_grads(case):
    xl, xr, att, ids, S, emask, window, row_ok = CASES[case]()
    rng = np.random.default_rng(9)
    R = jnp.asarray(rng.normal(size=(S,) + xl.shape[1:]).astype(np.float32))
    sorted_ids = window is not None

    def run(mode):
        set_kernel_mode(mode)

        def loss(xl_, xr_, att_):
            out = gatv2_attend(
                xl_, xr_, att_, ids, S, edge_mask=emask,
                indices_are_sorted=sorted_ids, window=window,
            )
            out = jnp.where(jnp.asarray(row_ok)[:, None, None], out, 0.0)
            return jnp.sum(out * R), out

        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(
            xl, xr, att
        )
        return l, out, grads

    l_x, out_x, g_x = run("off")
    l_k, out_k, g_k = run("interpret")

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(l_k), float(l_x), atol=1e-4, rtol=1e-5)
    for name, gx, gk in zip(("xl", "xr", "att"), g_x, g_k):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=2e-4, rtol=1e-3,
            err_msg=f"grad mismatch: {name} ({case})",
        )


def test_fused_empty_segments_zero():
    """Segments with no edges must give exactly 0 (and zero xr grads)."""
    xl, xr, att, ids, S, emask, window, row_ok = make_windowed_case(
        n_chunks=2, S=1800, seed=7
    )
    set_kernel_mode("interpret")
    out = gatv2_attend(xl, xr, att, ids, S, edge_mask=emask, window=window)
    out = np.asarray(out)
    has = np.zeros(S, bool)
    ids_np = np.asarray(ids)
    has[ids_np[ids_np < S]] = True
    assert np.all(out[~has] == 0.0)

    def loss(xr_):
        o = gatv2_attend(xl, xr_, att, ids, S, edge_mask=emask, window=window)
        return jnp.sum(o ** 2)

    g = np.asarray(jax.grad(loss)(xr))
    assert np.all(g[~has] == 0.0)
    assert np.isfinite(g).all()


# ---------------------------------------------------------------------------
# Fused edge update (4-way gather-broadcast average)
# ---------------------------------------------------------------------------


def test_fused_edge_combine_matches_xla():
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.ops.edge_update import edge_combine

    data = generate_synthetic_scene(n_views=9, n_points=700, visibility=0.35, seed=3)
    g = data.to_scene_graph().graph
    rng = np.random.default_rng(11)
    D = 24
    pe = jnp.asarray(rng.normal(size=(g.num_edges, D)).astype(np.float32))
    ps = jnp.asarray(rng.normal(size=(g.num_pts, D)).astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(g.num_cams, D)).astype(np.float32))
    pg = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    R = jnp.asarray(rng.normal(size=(g.num_edges, D)).astype(np.float32))
    emask = np.asarray(g.edge_mask)

    def run(mode):
        set_kernel_mode(mode)

        def loss(pe_, ps_, pv_, pg_):
            out = edge_combine(pe_, ps_, pv_, pg_, g)
            # Padding rows differ by documented contract (clip vs zero-row
            # gather); compare on valid edges only.
            out = jnp.where(g.edge_mask[:, None], out, 0.0)
            return jnp.sum(out * R), out

        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(pe, ps, pv, pg)
        return l, out, grads

    l_x, out_x, g_x = run("off")
    l_k, out_k, g_k = run("interpret")

    np.testing.assert_allclose(
        np.asarray(out_k)[emask], np.asarray(out_x)[emask], atol=1e-5, rtol=1e-5
    )
    for name, gx, gk in zip(("pe", "ps", "pv", "pg"), g_x, g_k):
        if name == "pe":
            gx = np.asarray(gx)[emask]
            gk = np.asarray(gk)[emask]
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=1e-4, rtol=1e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_layer_frontend_fused_matches_composite():
    """Op-level check of gatv2_layer_frontend: the fused kernel path
    (interpret) must match the composite XLA path on e_norm, both
    aggregation outputs, and gradients w.r.t. every differentiable input
    (raw edges, LN scale/bias, source kernels/biases, attention vectors,
    query tables)."""
    from gasfm_tpu.graph.view_graph import CHUNK, WINDOW
    from gasfm_tpu.ops.gatv2 import gatv2_layer_frontend

    rng = np.random.default_rng(11)
    n_chunks, S, M = 5, 500, 21
    Hp = Hc = 4
    Cp = Cc = 8
    De = 32
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

    args = dict(
        e=jnp.asarray(rng.normal(size=(E, De)).astype(np.float32)),
        lng=jnp.asarray(rng.normal(size=(De,)).astype(np.float32)),
        lnb=jnp.asarray(rng.normal(size=(De,)).astype(np.float32) * 0.1),
        wlp=jnp.asarray(rng.normal(size=(De, Hp * Cp)).astype(np.float32) * 0.3),
        blp=jnp.asarray(rng.normal(size=(Hp * Cp,)).astype(np.float32) * 0.1),
        att_p=jnp.asarray(rng.normal(size=(Hp, Cp)).astype(np.float32)),
        xr_p=jnp.asarray(rng.normal(size=(S, Hp, Cp)).astype(np.float32)),
        wlc=jnp.asarray(rng.normal(size=(De, Hc * Cc)).astype(np.float32) * 0.3),
        blc=jnp.asarray(rng.normal(size=(Hc * Cc,)).astype(np.float32) * 0.1),
        att_c=jnp.asarray(rng.normal(size=(Hc, Cc)).astype(np.float32)),
        xr_c=jnp.asarray(rng.normal(size=(M, Hc, Cc)).astype(np.float32)),
    )
    R_en = jnp.asarray(rng.normal(size=(E, De)).astype(np.float32))
    R_p = jnp.asarray(rng.normal(size=(S, Hp, Cp)).astype(np.float32))
    R_c = jnp.asarray(rng.normal(size=(M, Hc, Cc)).astype(np.float32))

    def run(mode):
        set_kernel_mode(mode)
        try:
            def loss(a):
                en, out_p, out_c = gatv2_layer_frontend(
                    a["e"], a["lng"], a["lnb"], 1e-5,
                    a["wlp"], a["blp"], a["att_p"], a["xr_p"],
                    jnp.asarray(pt_ids), S, window,
                    a["wlc"], a["blc"], a["att_c"], a["xr_c"],
                    jnp.asarray(cam_ids), M,
                    edge_mask=jnp.asarray(emask),
                )
                out_p = jnp.where(jnp.asarray(row_ok)[:, None, None], out_p, 0.0)
                val = jnp.sum(en * R_en) + jnp.sum(out_p * R_p) + jnp.sum(out_c * R_c)
                return val, (en, out_p, out_c)

            (v, outs), grads = jax.value_and_grad(loss, has_aux=True)(args)
            return v, outs, grads
        finally:
            set_kernel_mode("auto")

    v_x, outs_x, g_x = run("off")
    v_k, outs_k, g_k = run("interpret")

    for name, a, b in zip(("e_norm", "out_p", "out_c"), outs_k, outs_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4, err_msg=name
        )
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5, atol=1e-3)
    for key in args:
        np.testing.assert_allclose(
            np.asarray(g_k[key]), np.asarray(g_x[key]), atol=5e-4, rtol=2e-3,
            err_msg=f"grad mismatch: {key}",
        )


class TestBf16KernelPrecision:
    """GASFM_KERNEL_PRECISION=bf16 runs the big one-hot matmuls of the fused
    dual/frontend kernels with bf16 operands + f32 accumulation. One-hot
    operands are exact in bf16; features round to 8 mantissa bits, so
    outputs/grads must track the f32 composite path to ~bf16 tolerance."""

    def test_frontend_bf16_close_to_f32(self):
        import jax
        import jax.numpy as jnp

        from gasfm_tpu.data.synthetic import generate_synthetic_scene
        from gasfm_tpu.ops import segment as seg
        from gasfm_tpu.ops.gatv2 import gatv2_layer_frontend

        data = generate_synthetic_scene(n_views=6, n_points=120, seed=0)
        scene = data.to_scene_graph(caps=(8, 256, 1024))
        g = scene.graph
        E, De = g.num_edges, 16
        Hp = Hc = 2
        Dp = Dc = 16
        rng = np.random.default_rng(0)
        r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
        e_raw = r(E, De)
        args = dict(
            ln_scale=r(De), ln_bias=r(De),
            wlp=r(De, Dp) * 0.3, blp=r(Dp) * 0.1,
            wlc=r(De, Dc) * 0.3, blc=r(Dc) * 0.1,
            att_p=r(Hp, Dp // Hp), att_c=r(Hc, Dc // Hc),
            xr_p=r(g.num_pts, Hp, Dp // Hp), xr_c=r(g.num_cams, Hc, Dc // Hc),
        )

        def loss_of(e_raw):
            en, out_p, out_c = gatv2_layer_frontend(
                e_raw, args["ln_scale"], args["ln_bias"], 1e-5,
                args["wlp"], args["blp"], args["att_p"], args["xr_p"],
                g.pt_idx, g.num_pts, g.pt_segment_windows(),
                args["wlc"], args["blc"], args["att_c"], args["xr_c"],
                g.cam_idx, g.num_cams, edge_mask=g.edge_mask,
            )
            return jnp.sum(en**2) * 0.001 + jnp.sum(out_p**2) + jnp.sum(out_c**2)

        prev_mode, prev_prec = seg.get_kernel_mode(), seg.get_kernel_precision()
        try:
            seg.set_kernel_mode("off")
            ref_loss = float(loss_of(e_raw))
            ref_grad = np.asarray(jax.grad(loss_of)(e_raw))

            seg.set_kernel_mode("interpret")
            seg.set_kernel_precision("bf16")
            bf_loss = float(loss_of(e_raw))
            bf_grad = np.asarray(jax.grad(loss_of)(e_raw))
        finally:
            seg.set_kernel_mode(prev_mode)
            seg.set_kernel_precision(prev_prec)

        assert abs(bf_loss - ref_loss) / abs(ref_loss) < 2e-2
        scale = np.abs(ref_grad).max()
        assert np.abs(bf_grad - ref_grad).max() < 3e-2 * scale
