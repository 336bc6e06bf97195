"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the
edge-partitioned step must be numerically identical to the single-device
step (forward, loss, gradients, parameter updates)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gasfm_tpu.config import ConfigFactory
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.models import get_model
from gasfm_tpu.parallel import (
    make_mesh,
    make_sharded_forward,
    make_sharded_train_step,
    stack_scene_graphs,
)
from gasfm_tpu.train.state import build_optimizer

CONF = """
dataset { calibrated = true }
model {
  type = "graph_attn_sfm.GraphAttnSfMNet"
  n_heads = 2
  stateful_global_features = true
  global2view_and_global2scenepoint_enabled = false
  n_feat_proj = 16
  n_feat_scenepoint = 16
  n_feat_view = 32
  n_feat_global = 32
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
train {
  lr = 0.001
  lr_schedule { lr_warmup_n_steps = 0, main_scheduler = "constant" }
}
loss {
  func = "ESFMLoss"
  infinity_pts_margin = 0.0001
  pts_grad_equalization_pre_perspective_divide = true
  normalize_grad_wrt_valid_projections_only = true
  hinge_loss = true
  hinge_loss_weight = 1
}
"""


def make_scenes(n, caps=None):
    scenes = []
    for seed in range(n):
        data = generate_synthetic_scene(n_views=6, n_points=48, seed=seed)
        scenes.append(data.to_scene_graph(caps=caps))
    return scenes


@pytest.fixture(scope="module")
def setup():
    conf = ConfigFactory.parse_string(CONF)
    model = get_model(conf)
    scenes = make_scenes(2, caps=(8, 256, 512))
    params = model.init(jax.random.PRNGKey(0), scenes[0].graph)
    return conf, model, scenes, params


class TestShardedForward:
    def test_matches_single_device(self, setup):
        conf, model, scenes, params = setup
        mesh = make_mesh(n_edge=4, n_data=1)
        fwd = make_sharded_forward(conf, model, mesh)
        batched = stack_scene_graphs(scenes[:1])
        pred_sharded = fwd(params, batched)
        pred_single = model.apply(params, scenes[0].graph)
        np.testing.assert_allclose(
            np.asarray(pred_sharded["Ps_norm"]), np.asarray(pred_single["Ps_norm"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pred_sharded["pts3D"]), np.asarray(pred_single["pts3D"]), atol=1e-5
        )


class TestShardedTrainStep:
    def test_matches_single_device_update(self, setup):
        conf, model, scenes, params = setup
        loss_func = get_loss_func(conf)
        tx, _ = build_optimizer(conf)

        # Single-device reference: batch-accumulated grads over both scenes.
        def loss_fn(p, scene):
            return loss_func(model.apply(p, scene.graph), scene)

        total_loss = 0.0
        grads_sum = None
        for scene in scenes:
            loss, grads = jax.value_and_grad(loss_fn)(params, scene)
            total_loss += loss
            grads_sum = grads if grads_sum is None else jax.tree_util.tree_map(
                jnp.add, grads_sum, grads
            )
        # Sharded gradients: data=2 x edge=4 mesh.
        from jax.sharding import PartitionSpec as P

        from gasfm_tpu.ops.segment import edge_partitioned
        from gasfm_tpu.parallel import DATA_AXIS, EDGE_AXIS, scene_graph_specs

        mesh = make_mesh(n_edge=4, n_data=2)

        def per_device(p, scene):
            scene = jax.tree_util.tree_map(lambda x: x[0], scene)
            with edge_partitioned(EDGE_AXIS):
                loss, grads = jax.value_and_grad(loss_fn)(p, scene)
            return (
                jax.lax.psum(loss, DATA_AXIS),
                jax.lax.psum(grads, (EDGE_AXIS, DATA_AXIS)),
            )

        grads_fn = jax.jit(
            jax.shard_map(
                per_device, mesh=mesh,
                in_specs=(P(), scene_graph_specs(batched=True)),
                out_specs=(P(), P()), check_vma=False,
            )
        )
        batched = stack_scene_graphs(scenes)
        loss_sharded, grads_sharded = grads_fn(params, batched)

        assert float(loss_sharded) == pytest.approx(float(total_loss), rel=1e-5)
        flat_ref = jax.tree_util.tree_leaves(grads_sum)
        flat_sh = jax.tree_util.tree_leaves(grads_sharded)
        assert len(flat_ref) == len(flat_sh)
        for a, b in zip(flat_ref, flat_sh):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a, b, atol=2e-5 * scale, rtol=1e-3)

    def test_multiple_steps_stay_finite(self, setup):
        conf, model, scenes, params = setup
        tx, _ = build_optimizer(conf)
        mesh = make_mesh(n_edge=2, n_data=2)
        step = make_sharded_train_step(conf, model, mesh)
        batched = stack_scene_graphs(scenes)
        opt_state = tx.init(params)
        p = params
        losses = []
        for _ in range(5):
            p, opt_state, loss = step(p, opt_state, batched)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # optimizing
