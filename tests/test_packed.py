"""Packed edge-stream layout (ops/pallas/packing.py) op-level tests.

Validates, in kernel interpret mode against the composite XLA path:
- the XLA pack/unpack relayout convention round-trips,
- the packed fused layer frontend matches the unpacked path on values and
  gradients (including the packed raw-stream cotangent),
- the packed fused projection update (folded lin_proj + init-skip concat +
  residual, ops/pallas/fused_proj_update.py) matches the reference
  composite math on values and every gradient.

Parity surface: reference code/models/layers.py:873-956 (projection update)
and layers.py:150-263 (layer edge-stream prologue / residual).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gasfm_tpu.graph.view_graph import CHUNK, WINDOW
from gasfm_tpu.ops.pallas.packing import (
    PACK,
    blockdiag,
    pack_edges,
    packable,
    sum_diag_blocks,
    unpack_edges,
)
from gasfm_tpu.ops.segment import SegmentWindows, set_kernel_mode


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_kernel_mode("auto")


def test_pack_unpack_roundtrip_and_convention():
    rng = np.random.default_rng(0)
    E, D = 4 * CHUNK, 32
    x = rng.standard_normal((E, D)).astype(np.float32)
    p = np.asarray(pack_edges(jnp.asarray(x), CHUNK))
    assert p.shape == (E // PACK, PACK * D)
    # Convention: chunk c, lane group k, packed row r -> edge c*CHUNK+k*Q+r.
    q = CHUNK // PACK
    for (c, k, r) in [(0, 0, 0), (0, 3, 5), (2, 1, q - 1), (3, 2, 17)]:
        np.testing.assert_array_equal(
            p[c * q + r, k * D : (k + 1) * D], x[c * CHUNK + k * q + r]
        )
    np.testing.assert_array_equal(np.asarray(unpack_edges(jnp.asarray(p), CHUNK)), x)


def test_blockdiag_applies_per_lane_group():
    rng = np.random.default_rng(1)
    D = 32
    w = rng.standard_normal((D, D)).astype(np.float32)
    x = rng.standard_normal((8, PACK * D)).astype(np.float32)
    y = np.asarray(jnp.asarray(x) @ blockdiag(jnp.asarray(w)))
    for k in range(PACK):
        np.testing.assert_allclose(
            y[:, k * D : (k + 1) * D], x[:, k * D : (k + 1) * D] @ w, rtol=1e-5
        )
    # sum_diag_blocks is the adjoint contraction
    m = rng.standard_normal((PACK * D, PACK * D)).astype(np.float32)
    got = np.asarray(sum_diag_blocks(jnp.asarray(m), D, D))
    want = sum(m[k * D : (k + 1) * D, k * D : (k + 1) * D] for k in range(PACK))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _blocked_case(n_chunks=5, S=500, M=21, De=32, seed=11):
    rng = np.random.default_rng(seed)
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
    return E, W, wb, pt_ids, cam_ids, emask, row_ok, window, rng


def test_packed_frontend_matches_unpacked():
    from gasfm_tpu.ops.gatv2 import gatv2_layer_frontend

    assert packable(32, CHUNK)
    E, W, wb, pt_ids, cam_ids, emask, row_ok, window, rng = _blocked_case()
    S, M, De = 500, 21, 32
    Hp = Hc = 4
    Cp = Cc = 8
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    e = r(E, De)
    args = dict(
        lng=r(De), lnb=r(De) * 0.1,
        wlp=r(De, Hp * Cp) * 0.3, blp=r(Hp * Cp) * 0.1,
        att_p=r(Hp, Cp), xr_p=r(S, Hp, Cp),
        wlc=r(De, Hc * Cc) * 0.3, blc=r(Hc * Cc) * 0.1,
        att_c=r(Hc, Cc), xr_c=r(M, Hc, Cc),
    )
    R_en = r(E, De)
    R_p = r(S, Hp, Cp)
    R_c = r(M, Hc, Cc)

    def run(packed):
        set_kernel_mode("interpret")
        e_in = pack_edges(e, CHUNK) if packed else e

        def loss(e_, a):
            en, out_p, out_c = gatv2_layer_frontend(
                e_, a["lng"], a["lnb"], 1e-5,
                a["wlp"], a["blp"], a["att_p"], a["xr_p"],
                jnp.asarray(pt_ids), S, window,
                a["wlc"], a["blc"], a["att_c"], a["xr_c"],
                jnp.asarray(cam_ids), M,
                edge_mask=jnp.asarray(emask), packed=packed,
            )
            if packed:
                en = unpack_edges(en, CHUNK)
            out_p = jnp.where(jnp.asarray(row_ok)[:, None, None], out_p, 0.0)
            val = jnp.sum(en * R_en) + jnp.sum(out_p * R_p) + jnp.sum(out_c * R_c)
            return val, (en, out_p, out_c)

        (v, outs), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            e_in, args
        )
        ge, ga = grads
        if packed:
            ge = unpack_edges(ge, CHUNK)
        return v, outs, ge, ga

    v_u, outs_u, ge_u, ga_u = run(False)
    v_p, outs_p, ge_p, ga_p = run(True)

    for name, a, b in zip(("e_norm", "out_p", "out_c"), outs_p, outs_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4, err_msg=name
        )
    np.testing.assert_allclose(float(v_p), float(v_u), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ge_p), np.asarray(ge_u), atol=5e-4, rtol=2e-3,
        err_msg="grad mismatch: e (packed cotangent)",
    )
    for key in ga_u:
        np.testing.assert_allclose(
            np.asarray(ga_p[key]), np.asarray(ga_u[key]), atol=5e-4, rtol=2e-3,
            err_msg=f"grad mismatch: {key}",
        )


@pytest.mark.parametrize("has_skip,has_res", [(True, True), (False, False), (True, False)])
def test_packed_proj_update_matches_composite(has_skip, has_res):
    from gasfm_tpu.ops.pallas.fused_proj_update import packed_edge_update

    E, W, wb, pt_ids, cam_ids, emask, row_ok, window, rng = _blocked_case(seed=23)
    S, M = 500, 21
    De = D = 32
    D2 = 2
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    en = r(E, De)
    skip2 = r(E, D2) if has_skip else None
    res = r(E, D) if has_res else None
    w_e = r(De, D) * 0.3
    b = r(D) * 0.1
    w_uv = r(D2, D) * 0.3 if has_skip else None
    ps = r(S, D)
    pv = r(M, D)
    pg = r(1, D)
    R = r(E, D)

    # Masked edges: out-of-window point id, camera trash id (the layer does
    # this before calling the kernel; mirrors ops/gatv2 dispatch).
    s_pad = -(-S // W) * W
    pt_ids_m = np.where(emask, pt_ids, s_pad).astype(np.int32)
    cam_ids_m = np.where(emask, cam_ids, M).astype(np.int32)

    def composite():
        cat = jnp.concatenate([en, skip2], axis=1) if has_skip else en
        wcat = jnp.concatenate([w_e, w_uv], axis=0) if has_skip else w_e
        pe = cat @ wcat + b
        ps_g = ps[np.minimum(pt_ids, S - 1)]
        pv_g = pv[np.minimum(cam_ids, M - 1)]
        ps_g = jnp.where(jnp.asarray(emask)[:, None], ps_g, 0.0)
        pv_g = jnp.where(jnp.asarray(emask)[:, None], pv_g, 0.0)
        out = (pe + ps_g + pv_g + pg) / 4.0
        if has_res:
            out = out + res
        return out

    def run_kernel(args):
        (en_, skip2_, res_, w_e_, b_, w_uv_, ps_, pv_, pg_) = args
        set_kernel_mode("interpret")
        en_p = pack_edges(en_, CHUNK)
        skip2_p = pack_edges(skip2_, CHUNK) if has_skip else None
        res_p = pack_edges(res_, CHUNK) if has_res else None
        out_p = packed_edge_update(
            en_p, skip2_p, res_p, w_e_, b_, w_uv_, ps_, pv_, pg_,
            jnp.asarray(pt_ids_m).reshape(-1, CHUNK),
            jnp.asarray(cam_ids_m).reshape(-1, CHUNK),
            jnp.asarray(wb), S, M, W, interpret=True,
        )
        return unpack_edges(out_p, CHUNK)

    args = (en, skip2, res, w_e, b, w_uv, ps, pv, pg)
    out_k = np.asarray(run_kernel(args))
    out_ref = np.asarray(composite())
    np.testing.assert_allclose(out_k[emask], out_ref[emask], atol=1e-5, rtol=1e-4)

    # Gradients: compare the kernel VJP against jax.grad of the composite.
    def loss_kernel(args):
        out = run_kernel(args)
        return jnp.sum(jnp.where(jnp.asarray(emask)[:, None], out, 0.0) * R)

    def loss_comp(args):
        (en_, skip2_, res_, w_e_, b_, w_uv_, ps_, pv_, pg_) = args
        cat = jnp.concatenate([en_, skip2_], axis=1) if has_skip else en_
        wcat = jnp.concatenate([w_e_, w_uv_], axis=0) if has_skip else w_e_
        pe = cat @ wcat + b_
        ps_g = ps_[np.minimum(pt_ids, S - 1)]
        pv_g = pv_[np.minimum(cam_ids, M - 1)]
        ps_g = jnp.where(jnp.asarray(emask)[:, None], ps_g, 0.0)
        pv_g = jnp.where(jnp.asarray(emask)[:, None], pv_g, 0.0)
        out = (pe + ps_g + pv_g + pg_) / 4.0
        if has_res:
            out = out + res_
        return jnp.sum(jnp.where(jnp.asarray(emask)[:, None], out, 0.0) * R)

    g_k = jax.grad(loss_kernel)(args)
    g_c = jax.grad(loss_comp)(args)
    names = ("en", "skip2", "res", "w_e", "b", "w_uv", "ps", "pv", "pg")
    for name, gk, gc in zip(names, g_k, g_c):
        if gk is None and gc is None:
            continue
        if name in ("en", "skip2", "res"):
            gk = np.asarray(gk)[emask]
            gc = np.asarray(gc)[emask]
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gc), atol=1e-4, rtol=1e-3,
            err_msg=f"grad mismatch: {name} (skip={has_skip}, res={has_res})",
        )


class TestPackedModelEquivalence:
    """Full GASFM forward + gradients with packed streams active (kernel
    interpret mode) must match the packed-disabled path on the same params.

    This drives the real model wiring: pack boundaries around layer 1 and
    the final update, the packed frontend, and the folded projection-update
    kernel with init-skip + residual (reference layers.py:150-263)."""

    def test_gasfm_packed_matches_unpacked(self, monkeypatch):
        from gasfm_tpu.data.synthetic import generate_synthetic_scene
        from gasfm_tpu.graph.view_graph import build_view_graph
        from gasfm_tpu.models.gasfm import GraphAttnSfMNet

        data = generate_synthetic_scene(n_views=8, n_points=600, visibility=0.5, seed=5)
        graph = build_view_graph(data.M, data.Ns)
        model = GraphAttnSfMNet(
            num_layers=3, n_heads=4, n_feat_proj=32, n_feat_scenepoint=24,
            n_feat_view=40, n_feat_global=48, stateful_global_features=True,
            add_skipconn_from_init_projfeat=True,
        )
        params = model.init(jax.random.PRNGKey(0), graph)

        def loss_fn(p):
            pred = model.apply(p, graph)
            return (
                jnp.sum(jnp.abs(pred["Ps_norm"])) * 1e-3
                + jnp.sum(jnp.abs(pred["pts3D"])) * 1e-3
            )

        def run(packed_env):
            monkeypatch.setenv("GASFM_PACKED", packed_env)
            set_kernel_mode("interpret")
            try:
                l, g = jax.value_and_grad(loss_fn)(params)
                return float(l), g
            finally:
                set_kernel_mode("auto")

        l_u, g_u = run("0")
        l_p, g_p = run("1")
        np.testing.assert_allclose(l_p, l_u, rtol=2e-5)
        flat_u = jax.tree_util.tree_leaves_with_path(g_u)
        flat_p = jax.tree_util.tree_leaves(g_p)
        assert len(flat_u) == len(flat_p)
        for (path, gu), gp in zip(flat_u, flat_p):
            # atol floors at 1e-7: leaves whose grads are ~1e-9 are pure
            # cancellation noise and carry no signal to compare.
            scale = max(2e-4, float(np.abs(np.asarray(gu)).max()))
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gu), atol=5e-4 * scale, rtol=2e-3,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )

    def test_packed_param_tree_identical(self, monkeypatch):
        """The packed path must produce the exact same parameter tree
        (names, shapes, init values) as the unpacked path — checkpoint and
        reference-conversion compatibility."""
        from gasfm_tpu.data.synthetic import generate_synthetic_scene
        from gasfm_tpu.graph.view_graph import build_view_graph
        from gasfm_tpu.models.gasfm import GraphAttnSfMNet

        data = generate_synthetic_scene(n_views=6, n_points=300, seed=1)
        graph = build_view_graph(data.M, data.Ns)
        model = GraphAttnSfMNet(
            num_layers=2, n_heads=4, n_feat_proj=32, n_feat_scenepoint=24,
            n_feat_view=40, n_feat_global=48,
        )

        def init_with(packed_env):
            monkeypatch.setenv("GASFM_PACKED", packed_env)
            set_kernel_mode("interpret")
            try:
                return model.init(jax.random.PRNGKey(7), graph)
            finally:
                set_kernel_mode("auto")

        p_u = init_with("0")
        p_p = init_with("1")
        flat_u = jax.tree_util.tree_leaves_with_path(p_u)
        flat_p = jax.tree_util.tree_leaves_with_path(p_p)
        assert [jax.tree_util.keystr(k) for k, _ in flat_u] == [
            jax.tree_util.keystr(k) for k, _ in flat_p
        ]
        for (path, a), (_, b) in zip(flat_u, flat_p):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
            )


class TestMergedLayerStep:
    """The merged update+frontend kernel (ops/pallas/fused_layer_step.py,
    driven by the deferred-update protocol) must match the separate-kernels
    packed path on the full model's loss and every parameter gradient."""

    def test_gasfm_merged_matches_separate(self, monkeypatch):
        from gasfm_tpu.data.synthetic import generate_synthetic_scene
        from gasfm_tpu.graph.view_graph import build_view_graph
        from gasfm_tpu.models.gasfm import GraphAttnSfMNet

        data = generate_synthetic_scene(n_views=8, n_points=600, visibility=0.5, seed=9)
        graph = build_view_graph(data.M, data.Ns)
        model = GraphAttnSfMNet(
            num_layers=4, n_heads=4, n_feat_proj=32, n_feat_scenepoint=24,
            n_feat_view=40, n_feat_global=48, stateful_global_features=True,
            add_skipconn_from_init_projfeat=True,
        )
        monkeypatch.setenv("GASFM_PACKED", "1")
        monkeypatch.setenv("GASFM_MERGED", "0")
        set_kernel_mode("interpret")
        params = model.init(jax.random.PRNGKey(0), graph)

        def loss_fn(p):
            pred = model.apply(p, graph)
            return (
                jnp.sum(jnp.abs(pred["Ps_norm"])) * 1e-3
                + jnp.sum(jnp.abs(pred["pts3D"])) * 1e-3
            )

        def run(merged_env):
            monkeypatch.setenv("GASFM_MERGED", merged_env)
            set_kernel_mode("interpret")
            try:
                l, g = jax.value_and_grad(loss_fn)(params)
                return float(l), g
            finally:
                set_kernel_mode("auto")

        l_s, g_s = run("0")
        l_m, g_m = run("1")
        np.testing.assert_allclose(l_m, l_s, rtol=2e-5)
        flat_s = jax.tree_util.tree_leaves_with_path(g_s)
        flat_m = jax.tree_util.tree_leaves(g_m)
        assert len(flat_s) == len(flat_m)
        for (path, gs), gm in zip(flat_s, flat_m):
            scale = max(2e-4, float(np.abs(np.asarray(gs)).max()))
            np.testing.assert_allclose(
                np.asarray(gm), np.asarray(gs), atol=5e-4 * scale, rtol=2e-3,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )

    def test_merged_dead_chunk_skip_exact(self, monkeypatch):
        """Dead-chunk skip (SegmentWindows.nlive): an edge cap far above the
        blocked need leaves a suffix of all-padding chunks whose compute the
        merged kernel skips entirely — forward and every gradient must stay
        identical to the pure-XLA path."""
        from gasfm_tpu.data.synthetic import generate_synthetic_scene
        from gasfm_tpu.graph.view_graph import CHUNK, build_view_graph, blocked_edge_count
        from gasfm_tpu.models.gasfm import GraphAttnSfMNet

        data = generate_synthetic_scene(n_views=8, n_points=600, visibility=0.5, seed=9)
        blocked = blocked_edge_count(np.asarray(data.M))
        # >= 4 dead chunks after the blocked region.
        e_cap = ((blocked + CHUNK - 1) // CHUNK + 4) * CHUNK
        graph = build_view_graph(data.M, data.Ns, caps=(8, 640, e_cap))
        n_dead = int(e_cap // CHUNK - np.any(
            np.asarray(graph.edge_mask).reshape(-1, CHUNK), axis=1).sum())
        assert n_dead >= 4

        model = GraphAttnSfMNet(
            num_layers=3, n_heads=4, n_feat_proj=32, n_feat_scenepoint=24,
            n_feat_view=40, n_feat_global=48, stateful_global_features=True,
            add_skipconn_from_init_projfeat=True,
        )
        set_kernel_mode("off")
        params = model.init(jax.random.PRNGKey(0), graph)

        def loss_fn(p):
            pred = model.apply(p, graph)
            return (
                jnp.sum(jnp.abs(pred["Ps_norm"])) * 1e-3
                + jnp.sum(jnp.abs(pred["pts3D"])) * 1e-3
            )

        def run(packed_env, merged_env, mode):
            monkeypatch.setenv("GASFM_PACKED", packed_env)
            monkeypatch.setenv("GASFM_MERGED", merged_env)
            set_kernel_mode(mode)
            try:
                l, g = jax.value_and_grad(loss_fn)(params)
                return float(l), g
            finally:
                set_kernel_mode("auto")

        l_ref, g_ref = run("0", "0", "off")
        l_m, g_m = run("1", "1", "interpret")
        np.testing.assert_allclose(l_m, l_ref, rtol=2e-5)
        for (path, gs), gm in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves(g_m),
        ):
            scale = max(2e-4, float(np.abs(np.asarray(gs)).max()))
            np.testing.assert_allclose(
                np.asarray(gm), np.asarray(gs), atol=5e-4 * scale, rtol=2e-3,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )


class TestBF16Streams:
    """GASFM_STREAM_DTYPE=bf16: packed inter-layer edge streams (and their
    cotangents) stored in bfloat16 — BENCHLOG section 20's stream-bound
    lever. All in-kernel math stays f32, so the loss and gradients must
    track the f32-stream path to bf16-rounding tolerance."""

    def test_bf16_stream_close_to_f32(self, monkeypatch):
        from gasfm_tpu.data.synthetic import generate_synthetic_scene
        from gasfm_tpu.graph.view_graph import build_view_graph
        from gasfm_tpu.models.gasfm import GraphAttnSfMNet

        data = generate_synthetic_scene(n_views=8, n_points=600, visibility=0.5, seed=9)
        graph = build_view_graph(data.M, data.Ns)
        model = GraphAttnSfMNet(
            num_layers=4, n_heads=4, n_feat_proj=32, n_feat_scenepoint=24,
            n_feat_view=40, n_feat_global=48, stateful_global_features=True,
            add_skipconn_from_init_projfeat=True,
        )
        monkeypatch.setenv("GASFM_PACKED", "1")
        monkeypatch.setenv("GASFM_MERGED", "1")
        set_kernel_mode("interpret")
        params = model.init(jax.random.PRNGKey(0), graph)

        def loss_fn(p):
            pred = model.apply(p, graph)
            return (
                jnp.sum(jnp.abs(pred["Ps_norm"])) * 1e-3
                + jnp.sum(jnp.abs(pred["pts3D"])) * 1e-3
            )

        def run(dtype_env):
            monkeypatch.setenv("GASFM_STREAM_DTYPE", dtype_env)
            set_kernel_mode("interpret")
            try:
                l, g = jax.value_and_grad(loss_fn)(params)
                return float(l), g
            finally:
                set_kernel_mode("auto")

        l_f32, g_f32 = run("f32")
        l_bf16, g_bf16 = run("bf16")
        assert np.isfinite(l_bf16)
        # bf16 activation rounding through 3 packed layers: percent-level.
        np.testing.assert_allclose(l_bf16, l_f32, rtol=3e-2)
        # Gradients stay directionally consistent (loose: rounding occurs
        # in both the primal streams and the cotangent streams).
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_f32),
            jax.tree_util.tree_leaves(g_bf16),
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(
                b, a, atol=0.08 * scale,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )
