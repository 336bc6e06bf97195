"""Model tests: shapes, finiteness, padding invariance, permutation
equivariance — the properties that guarantee the padded static-shape design
reproduces the reference's per-sample dynamic-graph semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gasfm_tpu.config import ConfigFactory
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.graph import build_view_graph
from gasfm_tpu.models import GraphAttnSfMNet, SetOfSetNet, get_model

GASFM_CONF = """
dataset { calibrated = true }
model {
  type = "graph_attn_sfm.GraphAttnSfMNet"
  n_heads = 2
  stateful_global_features = true
  global2view_and_global2scenepoint_enabled = false
  n_feat_proj = 16
  n_feat_scenepoint = 16
  n_feat_view = 32
  n_feat_global = 64
  num_layers = 2
  n_hidden_layers_scenepoint_update = 0
  n_hidden_layers_view_update = 0
  n_hidden_layers_global_update = 0
  n_hidden_layers_proj_update = 0
  use_norm_proj_update = true
  add_residual_skipconn_proj_update = true
  add_skipconn_from_init_projfeat = true
  pos_emb_n_freq = 0
  depth_head { enabled = false }
  view_head { enabled = true, n_hidden_layers = 1, rot_representation = "quat" }
  scenepoint_head { enabled = true, n_hidden_layers = 1 }
}
"""

DPESFM_CONF = """
dataset { calibrated = true }
model {
  type = "SetOfSet.SetOfSetNet"
  num_features = 16
  num_blocks = 2
  block_size = 2
  proj_feat_normalization = true
  add_skipconn_for_residual_blocks = true
  pos_emb_n_freq = 0
  depth_head { enabled = false }
  view_head { enabled = true, n_hidden_layers = 1, rot_representation = "quat" }
  scenepoint_head { enabled = true, n_hidden_layers = 1 }
}
"""


def init_and_run(model, graph, seed=0):
    params = model.init(jax.random.PRNGKey(seed), graph)
    return params, model.apply(params, graph)


def scene_and_graph(seed=0, caps=None, **kwargs):
    data = generate_synthetic_scene(n_views=6, n_points=40, seed=seed, **kwargs)
    graph = build_view_graph(data.M, data.Ns, caps=caps)
    return data, graph


@pytest.mark.parametrize("conf_str", [GASFM_CONF, DPESFM_CONF], ids=["gasfm", "dpesfm"])
class TestForward:
    def test_shapes_and_finite(self, conf_str):
        conf = ConfigFactory.parse_string(conf_str)
        model = get_model(conf)
        data, graph = scene_and_graph()
        params, pred = init_and_run(model, graph)
        m, n = data.num_views, data.num_points
        assert pred["Ps_norm"].shape == (graph.num_cams, 3, 4)
        assert pred["pts3D"].shape == (4, graph.num_pts)
        assert np.isfinite(np.asarray(pred["Ps_norm"])[:m]).all()
        assert np.isfinite(np.asarray(pred["pts3D"])[:, :n]).all()
        # Rotations decoded to valid SO(3) for real cameras
        R = np.asarray(pred["Ps_norm"])[:m, :, :3]
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (m, 1, 1)), atol=1e-4)

    def test_padding_invariance(self, conf_str):
        """Outputs at real rows must be identical whatever the bucket caps —
        the core guarantee that padding replaces recompilation safely."""
        conf = ConfigFactory.parse_string(conf_str)
        model = get_model(conf)
        data, graph_small = scene_and_graph(seed=1)
        m, n = data.num_views, data.num_points
        caps_big = (graph_small.num_cams + 16, graph_small.num_pts + 512, graph_small.num_edges + 1024)
        graph_big = build_view_graph(data.M, data.Ns, caps=caps_big)

        params = model.init(jax.random.PRNGKey(0), graph_small)
        pred_small = model.apply(params, graph_small)
        pred_big = model.apply(params, graph_big)

        np.testing.assert_allclose(
            np.asarray(pred_small["Ps_norm"])[:m],
            np.asarray(pred_big["Ps_norm"])[:m],
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(pred_small["pts3D"])[:, :n],
            np.asarray(pred_big["pts3D"])[:, :n],
            atol=2e-5,
        )

    def test_jit_compiles_and_matches_eager(self, conf_str):
        conf = ConfigFactory.parse_string(conf_str)
        model = get_model(conf)
        _, graph = scene_and_graph(seed=2)
        params = model.init(jax.random.PRNGKey(0), graph)
        eager = model.apply(params, graph)
        jitted = jax.jit(model.apply)(params, graph)
        np.testing.assert_allclose(
            np.asarray(eager["Ps_norm"]), np.asarray(jitted["Ps_norm"]), atol=1e-5
        )


class TestEquivariance:
    def test_view_permutation_equivariance_dpesfm(self):
        """Permuting the order of views must permute the per-view outputs
        (the defining property of both model families)."""
        conf = ConfigFactory.parse_string(DPESFM_CONF)
        model = SetOfSetNet.from_conf(conf)
        data, _ = scene_and_graph(seed=3)
        m = data.num_views

        perm = np.random.default_rng(0).permutation(m)
        M_perm = np.zeros_like(data.M)
        for new_i, old_i in enumerate(perm):
            M_perm[2 * new_i] = data.M[2 * old_i]
            M_perm[2 * new_i + 1] = data.M[2 * old_i + 1]
        Ns_perm = data.Ns[perm]

        caps = None
        g1 = build_view_graph(data.M, data.Ns, caps=caps)
        g2 = build_view_graph(M_perm, Ns_perm, caps=(g1.num_cams, g1.num_pts, g1.num_edges))

        params = model.init(jax.random.PRNGKey(0), g1)
        p1 = model.apply(params, g1)
        p2 = model.apply(params, g2)
        np.testing.assert_allclose(
            np.asarray(p1["Ps_norm"])[perm], np.asarray(p2["Ps_norm"])[:m], atol=3e-5
        )

    def test_gasfm_param_count_matches_architecture(self):
        conf = ConfigFactory.parse_string(GASFM_CONF)
        model = GraphAttnSfMNet.from_conf(conf)
        _, graph = scene_and_graph(seed=4)
        params = model.init(jax.random.PRNGKey(0), graph)
        count = sum(x.size for x in jax.tree_util.tree_leaves(params))
        assert count > 10_000  # sanity: the net is materialized
        # Params must not depend on graph size (shape-agnostic weights)
        data2 = generate_synthetic_scene(n_views=9, n_points=77, seed=5)
        graph2 = build_view_graph(data2.M, data2.Ns)
        params2 = model.init(jax.random.PRNGKey(0), graph2)
        count2 = sum(x.size for x in jax.tree_util.tree_leaves(params2))
        assert count == count2


class TestDepthHead:
    def test_depth_head_outputs_per_edge(self):
        conf = ConfigFactory.parse_string(GASFM_CONF)
        conf.put("model.depth_head.enabled", True)
        conf.put("model.depth_head.n_feat", 8)
        conf.put("model.depth_head.n_hidden_layers", 1)
        conf.put("model.view_head.enabled", True)
        model = GraphAttnSfMNet.from_conf(conf)
        _, graph = scene_and_graph(seed=6)
        params, pred = init_and_run(model, graph)
        assert pred["depths"].shape == (graph.num_edges,)
        assert np.isfinite(np.asarray(pred["depths"])[np.asarray(graph.edge_mask)]).all()


class TestRematLayers:
    """model.remat_layers wraps each attention round in nn.remat: same math
    (up to XLA fusion-boundary float reassociation) — only the backward's
    activation memory changes (BENCHLOG: lets 2M+-edge scenes train on one
    chip where the reference OOM-skips, train.py:225-248)."""

    def test_remat_is_numerically_identical(self):
        import jax.numpy as jnp

        from gasfm_tpu.models.gasfm import GraphAttnSfMNet

        data = generate_synthetic_scene(n_views=7, n_points=300, seed=2)
        graph = build_view_graph(data.M, data.Ns)
        kw = dict(num_layers=3, n_heads=4, n_feat_proj=32, n_feat_scenepoint=24,
                  n_feat_view=40, n_feat_global=48)
        m0 = GraphAttnSfMNet(**kw)
        m1 = GraphAttnSfMNet(**kw, remat_layers=True)
        params = m0.init(jax.random.PRNGKey(0), graph)

        def loss(model, p):
            pred = model.apply(p, graph)
            return (jnp.sum(jnp.abs(pred["Ps_norm"])) * 1e-3
                    + jnp.sum(jnp.abs(pred["pts3D"])) * 1e-3)

        l0, g0 = jax.value_and_grad(lambda q: loss(m0, q))(params)
        l1, g1 = jax.value_and_grad(lambda q: loss(m1, q))(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1e-4, np.abs(a).max())
            np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-4)


class TestPaddedRowDecodeFinite:
    """Padded camera rows (cam_mask False, zero head outputs) must decode
    NaN-free through BOTH forward and backward for every rotation
    representation: 6d's zero a2 hits b2 = 0/||0||; svd's repeated singular
    values make the SVD gradient's 1/(s_i^2-s_j^2) terms NaN — and 0-masking
    the loss does NOT save the gradients (0 * NaN = NaN)."""

    def test_decode_view_outputs_finite_with_padding(self):
        import jax
        import jax.numpy as jnp

        from gasfm_tpu.models.heads import decode_view_outputs, view_head_out_channels

        mask = jnp.array([True] * 5 + [False] * 3)
        for rep in ["quat", "6d", "svd"]:
            C = view_head_out_channels(True, rep)

            def f(x, rep=rep):
                Ps = decode_view_outputs(x, True, rep, cam_mask=mask)
                return jnp.sum(jnp.where(mask[:, None, None], Ps, 0.0) ** 2)

            x = jax.random.normal(jax.random.PRNGKey(0), (8, C))
            x = jnp.where(mask[:, None], x, 0.0)  # padded rows come out zero
            v, g = jax.value_and_grad(f)(x)
            assert bool(jnp.isfinite(v)), rep
            assert bool(jnp.all(jnp.isfinite(g))), f"non-finite grads for {rep}"
