"""End-to-end equivalence of the Pallas kernel dispatch path vs pure XLA.

Runs the full GASFM forward and the train-step gradient on a real blocked
graph with kernel mode "interpret" (every dispatchable op routed through the
Pallas kernels in interpreter mode) and compares against mode "off". This is
the CPU-side guarantee that flipping the kernels on for TPU cannot change
model semantics on valid (non-padding) rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gasfm_tpu.config import ConfigFactory
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.models import get_model
from gasfm_tpu.ops.segment import set_kernel_mode


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_kernel_mode("auto")


def _conf(model_type="graph_attn_sfm.GraphAttnSfMNet"):
    return ConfigFactory.parse_string(f"""
dataset {{ calibrated = true }}
model {{
  type = "{model_type}"
  n_heads = 2
  stateful_global_features = true
  global2view_and_global2scenepoint_enabled = false
  n_feat_proj = 16
  n_feat_scenepoint = 16
  n_feat_view = 32
  n_feat_global = 32
  num_layers = 2
  num_features = 16
  num_blocks = 2
  block_size = 2
  proj_feat_normalization = true
  use_norm_proj_update = true
  add_skipconn_for_residual_blocks = true
  add_residual_skipconn_proj_update = true
  add_skipconn_from_init_projfeat = true
  n_hidden_layers_scenepoint_update = 0
  n_hidden_layers_view_update = 0
  n_hidden_layers_global_update = 0
  n_hidden_layers_proj_update = 0
  pos_emb_n_freq = 0
  depth_head {{ enabled = false }}
  view_head {{ enabled = true, n_hidden_layers = 1, rot_representation = "quat" }}
  scenepoint_head {{ enabled = true, n_hidden_layers = 1 }}
}}
loss {{
  func = "ESFMLoss"
  infinity_pts_margin = 1e-4
  hinge_loss = true
  hinge_loss_weight = 1.0
  pts_grad_equalization_pre_perspective_divide = true
  normalize_grad_wrt_valid_projections_only = true
}}
""")


@pytest.mark.parametrize(
    "model_type", ["graph_attn_sfm.GraphAttnSfMNet", "SetOfSet.SetOfSetNet"]
)
def test_forward_and_grad_match_xla(model_type):
    conf = _conf(model_type)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    # >WINDOW points forces several point blocks; E lands chunk-aligned.
    from gasfm_tpu.graph.view_graph import CHUNK, WINDOW

    data = generate_synthetic_scene(n_views=9, n_points=700, visibility=0.35, seed=3)
    scene = data.to_scene_graph()
    graph = scene.graph
    assert graph.num_edges % CHUNK == 0 and graph.num_pts > WINDOW

    params = model.init(jax.random.PRNGKey(0), graph)

    def run(mode):
        set_kernel_mode(mode)

        def loss_fn(p):
            return loss_func(model.apply(p, graph), scene)

        pred = model.apply(params, graph)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return pred, loss, grads

    pred_x, loss_x, grads_x = run("off")
    pred_k, loss_k, grads_k = run("interpret")

    m, n = int(graph.m_true), int(graph.n_true)
    np.testing.assert_allclose(
        np.asarray(pred_k["Ps_norm"])[:m], np.asarray(pred_x["Ps_norm"])[:m],
        atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pred_k["pts3D"])[:, :n], np.asarray(pred_x["pts3D"])[:, :n],
        atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(float(loss_k), float(loss_x), atol=1e-5, rtol=1e-5)
    for (path, gx), (_, gk) in zip(
        jax.tree_util.tree_leaves_with_path(grads_x),
        jax.tree_util.tree_leaves_with_path(grads_k),
    ):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=2e-4, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_bf16_kernel_precision_close_to_f32():
    """bf16 matmul mode (bench/training mixed precision): one-hot operands
    are exact, feature operands round to 8 mantissa bits, so the fused-kernel
    forward must track the f32 XLA path to bf16-level tolerances."""
    from gasfm_tpu.ops.segment import set_kernel_precision

    conf = _conf("graph_attn_sfm.GraphAttnSfMNet")
    model = get_model(conf)
    data = generate_synthetic_scene(n_views=9, n_points=700, visibility=0.35, seed=3)
    scene = data.to_scene_graph()
    graph = scene.graph
    params = model.init(jax.random.PRNGKey(0), graph)

    def run(mode, precision):
        set_kernel_mode(mode)
        set_kernel_precision(precision)
        try:
            return model.apply(params, graph)
        finally:
            set_kernel_precision("f32")
            set_kernel_mode("auto")

    pred_x = run("off", "f32")
    pred_b = run("interpret", "bf16")

    m, n = int(graph.m_true), int(graph.n_true)
    np.testing.assert_allclose(
        np.asarray(pred_b["Ps_norm"])[:m], np.asarray(pred_x["Ps_norm"])[:m],
        atol=2e-2, rtol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(pred_b["pts3D"])[:, :n], np.asarray(pred_x["pts3D"])[:, :n],
        atol=2e-2, rtol=2e-2,
    )
