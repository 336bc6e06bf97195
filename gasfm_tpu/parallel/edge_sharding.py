"""Multi-chip execution: edge-partitioned view graphs over a device mesh.

The reference is single-GPU (SURVEY section 2.7); this module provides the
TPU-native scaling design demanded by the BASELINE north star:

- mesh axes ``(data, edge)``: scene-level data parallelism x edge-set
  partitioning (the sequence-parallel analogue for view graphs).
- Edge arrays (observations, segment ids, masks, per-edge activations) are
  sharded along ``edge``; per-view/per-point/global feature tables are
  replicated. Segment reductions compute local partials and combine across
  shards with ``psum``/``pmax`` over ICI (see
  :mod:`gasfm_tpu.ops.segment.edge_partitioned`), which is exactly the
  numerically-stable distributed segment-softmax decomposition
  (max-exchange before exp).
- Gradients: each shard's backward pass produces its partial contribution
  (the loss collectives transpose to broadcasts); a final ``psum`` over both
  axes yields the exact global gradient; the optimizer update then runs
  replicated.

The sharded train step is numerically identical to the single-device step —
asserted by tests/test_parallel.py on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gasfm_tpu.graph.view_graph import SceneGraph, ViewGraph
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.ops.segment import edge_partitioned
from gasfm_tpu.train.state import build_optimizer

DATA_AXIS = "data"
EDGE_AXIS = "edge"

# ViewGraph fields whose leading dimension is the edge capacity.
_EDGE_FIELDS = {"uv", "cam_idx", "pt_idx", "edge_mask", "pt_order", "pt_window"}
_SCALAR_FIELDS = {"m_true", "n_true", "e_true"}


def make_mesh(n_edge: int, n_data: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_edge * n_data, (
        f"need {n_edge * n_data} devices, have {len(devices)}"
    )
    dev_array = np.asarray(devices[: n_edge * n_data]).reshape(n_data, n_edge)
    return Mesh(dev_array, axis_names=(DATA_AXIS, EDGE_AXIS))


def _graph_specs(batched: bool) -> ViewGraph:
    lead = (DATA_AXIS,) if batched else ()

    def spec(field: str):
        if field in _SCALAR_FIELDS:
            return P(*lead)
        if field in _EDGE_FIELDS:
            return P(*lead, EDGE_AXIS)
        return P(*lead)  # per-view / per-point tables: replicated over edge

    return ViewGraph(**{f.name: spec(f.name) for f in dataclasses.fields(ViewGraph)})


def scene_graph_specs(batched: bool = True, has_depths: bool = False) -> SceneGraph:
    """PartitionSpec pytree matching a (stacked) SceneGraph."""
    lead = (DATA_AXIS,) if batched else ()
    return SceneGraph(
        graph=_graph_specs(batched),
        Ns=P(*lead),
        Ns_inv=P(*lead),
        Ps_gt=P(*lead),
        gt_depths=P(*lead, EDGE_AXIS) if has_depths else None,
    )


def stack_scene_graphs(scenes: List[SceneGraph]) -> SceneGraph:
    """Stack same-capacity SceneGraphs along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *scenes)


def make_sharded_train_step(conf, model, mesh: Mesh):
    """Build the jitted multi-chip train step.

    step(params, opt_state, batched_scene) -> (params, opt_state, loss)
    where batched_scene has a leading batch dim equal to the data-axis size.
    Losses are summed over the batch (the reference's batch accumulation,
    train.py:61-88) and gradients are exact global gradients.
    """
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)

    def per_device(params, opt_state, scene):
        # Local batch is 1 (one scene per data-group); drop the batch dim.
        scene = jax.tree_util.tree_map(lambda x: x[0], scene)
        with edge_partitioned(EDGE_AXIS):
            def loss_fn(p):
                pred = model.apply(p, scene.graph)
                return loss_func(pred, scene)

            loss, grads = jax.value_and_grad(loss_fn)(params)
        # Sum losses over scenes (data axis); combine partial grads over both.
        loss = jax.lax.psum(loss, DATA_AXIS)
        grads = jax.lax.psum(grads, (EDGE_AXIS, DATA_AXIS))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    has_depths = conf.get_bool("model.depth_head.enabled", default=False)
    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), scene_graph_specs(batched=True, has_depths=has_depths)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_sharded_forward(conf, model, mesh: Mesh):
    """Sharded inference: returns the padded pred dict (replicated)."""

    def per_device(params, scene):
        scene = jax.tree_util.tree_map(lambda x: x[0], scene)
        with edge_partitioned(EDGE_AXIS):
            pred = model.apply(params, scene.graph)
        # Per-edge outputs (depth head) stay sharded; table outputs replicated.
        return pred

    has_depths = conf.get_bool("model.depth_head.enabled", default=False)
    out_specs = {"Ps_norm": P(), "pts3D": P()}
    if has_depths:
        out_specs["depths"] = P(EDGE_AXIS)
    if conf.get_bool("model.view_head.enabled", default=False) is False:
        out_specs.pop("Ps_norm", None)
    if conf.get_bool("model.scenepoint_head.enabled", default=False) is False:
        out_specs.pop("pts3D", None)

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), scene_graph_specs(batched=True, has_depths=has_depths)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
