"""Weak-scaling measurement of the edge-partitioned train step.

Per-shard edge count is held constant while the edge-mesh size grows
(n_edge in {1, 2, 4, 8}); the scene grows proportionally. Efficiency is
t(1)/t(n) — ideal weak scaling keeps the step time flat while total
edges/step grows linearly.

On this machine only a VIRTUAL CPU mesh is available (one real TPU chip,
no multi-chip hardware — see BENCHLOG.md): the numbers validate the
*mechanics* (sharded kernels + pmax/psum combine + grad psum execute and
scale), not ICI performance. Virtual devices share the host's cores, so
measured efficiency is a LOWER bound on real-hardware efficiency wherever
cores saturate.

Run: JAX_PLATFORMS=cpu timeout 3600 python scripts/weak_scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from __graft_entry__ import _flagship_conf
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.graph.view_graph import CHUNK
from gasfm_tpu.models import get_model
from gasfm_tpu.parallel import make_mesh, make_sharded_fused_step, pad_scene_group
from gasfm_tpu.train.state import build_optimizer


def _collective_bytes_per_step(conf, scene, n_params: int) -> int:
    """Logical bytes reduced by the edge-axis collectives of ONE fused step.

    Per layer and per final update, each attention direction combines its
    (num, m|den) pair across shards (ops/pallas/fused_attn.
    combine_attention_shards): point side psum/pmax over (s_pad, Dp) +
    (2*HP, s_pad); camera side over (Wc, Dc) + (2*HP, Wc). The gradient
    psum adds the parameter tree once. Volume is INDEPENDENT of the shard
    count (dense replicated-output combine): the per-device wire traffic of
    a ring all-reduce is ~2x this, regardless of n_edge — which is exactly
    what this instrumentation is meant to expose (VERDICT round 2,
    item 5). NOTE a boundary-aware exchange cannot shrink the num tables
    below this while downstream consumers need them replicated: every shard
    must still RECEIVE the full table; only the m/den side tables and
    multi-hop reduction overhead are compressible.
    """
    from gasfm_tpu.graph.view_graph import WINDOW

    g = scene.graph
    Hp = Hc = conf.get_int("model.n_heads")
    HP = -(-(Hp + Hc) // 8) * 8
    Dp = conf.get_int("model.n_feat_proj")
    Dc = Dp
    s_pad = -(-g.num_pts // WINDOW) * WINDOW
    Wc = max(((g.num_cams + 127) // 128) * 128, 128)
    per_dual = (s_pad * Dp + 2 * HP * s_pad) + (Wc * Dc + 2 * HP * Wc)
    n_attn = conf.get_int("model.num_layers") + 1  # layers + final update
    return 4 * (per_dual * n_attn + n_params)


def _collective_bytes_table_sharded(conf, scene, n_params: int) -> int:
    """Logical bytes exchanged per shard per step under TABLE SHARDING
    (parallel.table_sharding): the point direction exchanges only the
    first/last WINDOW\'s softmax triple with its two neighbors per layer
    (forward) plus the boundary cotangent rows (backward); the camera-side
    tables stay fully combined (small, scene-size independent at fixed view
    count); the point->global pool combines one (H, C)+(H,) triple; pts3D
    is assembled by ONE masked psum per step. Per-layer point-side volume
    is O(WINDOW * D) — INDEPENDENT of the table size — so per-shard MB/step
    stays ~CONSTANT as the scene (and mesh) grows, vs the replicated
    combine\'s full-table volume growing linearly with it.
    """
    from gasfm_tpu.graph.view_graph import WINDOW

    g = scene.graph
    Hp = Hc = conf.get_int("model.n_heads")
    HP = -(-(Hp + Hc) // 8) * 8
    Dp = conf.get_int("model.n_feat_proj")
    Dc = Dp
    Wc = max(((g.num_cams + 127) // 128) * 128, 128)
    n_attn = conf.get_int("model.num_layers") + 1
    # fwd: 2 sends x (num + m + den + id) rows; bwd: 2 sends of cotangent rows.
    pt_fwd = 2 * (WINDOW * Dp + 2 * WINDOW * HP + 1)
    pt_bwd = 2 * (WINDOW * Dp)
    cam = (Wc * Dc + 2 * HP * Wc) + (Wc * Dc)  # fwd psum + bwd psum
    pool = 2 * (Hp * (Dp // max(Hp, 1)) + Hp)  # point pool triple (fwd+bwd)
    per_layer = pt_fwd + pt_bwd + cam + pool
    pts3d_out = 4 * g.num_pts  # ONE masked psum per step
    return 4 * (per_layer * n_attn + pts3d_out + n_params)


def main():
    import contextlib

    import gasfm_tpu.parallel.edge_sharding as es

    conf = _flagship_conf(small=True)
    model = get_model(conf)
    tx, _ = build_optimizer(conf)

    @contextlib.contextmanager
    def _no_collectives(axis):
        # Timing-only: same sharded program WITHOUT the edge-axis context,
        # so every kernel finalizes locally and no attention combine runs
        # (numerics wrong, cost model right: identical local compute).
        yield

    import os as _os

    table_sharding = _os.environ.get("WEAK_SCALING_TABLE_SHARD", "0") == "1"
    if table_sharding:
        conf.put("parallel.table_sharding", True)
        print("MODE: table sharding (boundary exchange)", flush=True)
    else:
        print("MODE: replicated tables (full-table combine)", flush=True)

    base = None
    base_nc = None
    for n_edge in (1, 2, 4, 8):
        # Points (and so edges) grow linearly with the mesh at fixed view
        # count -> per-shard edge load ~constant; the edge cap is the blocked
        # layout's need rounded up to an n_edge-divisible chunk count, so
        # per-shard slices stay CHUNK-aligned.
        n_points = 128 * n_edge
        n_views = 32
        data = generate_synthetic_scene(
            n_views=n_views, n_points=n_points, visibility=0.5, seed=0)
        from gasfm_tpu.graph.view_graph import blocked_edge_count

        blocked = blocked_edge_count(np.asarray(data.M))
        align = n_edge * CHUNK
        e_cap = ((blocked + align - 1) // align) * align
        caps = (max(8, n_views), max(256, n_points), e_cap)
        scene = data.to_scene_graph(caps=caps)
        mesh = make_mesh(n_edge=n_edge, n_data=1)
        step = make_sharded_fused_step(conf, model, mesh, tx=tx)
        batched, weights = pad_scene_group([scene], 1)
        params = model.init(jax.random.PRNGKey(0), scene.graph)
        opt_state = tx.init(params)
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(jnp.asarray, params)

        # No-collective twin of the same program: patch the edge context to
        # a no-op while BUILDING/tracing, so per-shard compute is identical
        # but no combine/psum lowers. combine_time = full - no_collective.
        saved_ctx = es.edge_partitioned
        try:
            es.edge_partitioned = _no_collectives
            step_nc = make_sharded_fused_step(conf, model, mesh, tx=tx)
            # Real copies: jnp.asarray aliases, and the fused step DONATES
            # its params/opt_state buffers.
            p_nc = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
            o_nc = tx.init(p_nc)
            p_nc, o_nc, *_ = step_nc(p_nc, o_nc, batched, jnp.asarray(weights))
            jax.block_until_ready(p_nc)
        finally:
            es.edge_partitioned = saved_ctx

        def timed(fn, p, o, n_iter=20):
            p, o, *_ = fn(p, o, batched, jnp.asarray(weights))
            jax.block_until_ready(p)
            t0 = time.perf_counter()
            loss = None
            for _ in range(n_iter):
                p, o, loss, *_ = fn(p, o, batched, jnp.asarray(weights))
            jax.block_until_ready(p)
            return (time.perf_counter() - t0) / n_iter, loss

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        dt, loss = timed(step, params, opt_state)
        dt_nc, _ = timed(step_nc, p_nc, o_nc)
        edges = int(scene.graph.e_true)
        rate = edges / dt
        # Weak-scaling efficiency: time per per-shard chunk vs the 1-shard
        # run (robust to the synthetic scenes not growing their edge count
        # exactly linearly).
        per_shard_chunks = e_cap / CHUNK / n_edge
        t_chunk = dt / per_shard_chunks
        t_chunk_nc = dt_nc / per_shard_chunks
        if base is None:
            base = t_chunk
            base_nc = t_chunk_nc
        eff = base / t_chunk
        eff_nc = base_nc / t_chunk_nc
        cbytes = (
            _collective_bytes_table_sharded(conf, scene, n_params)
            if table_sharding
            else _collective_bytes_per_step(conf, scene, n_params)
        )
        print(f"n_edge={n_edge}  E={edges:6d} (cap {e_cap:6d})  "
              f"step={dt*1e3:8.2f} ms  no-coll={dt_nc*1e3:8.2f} ms  "
              f"combine={max(dt-dt_nc,0)*1e3:7.2f} ms  "
              f"{rate/1e3:8.1f}k edges/s  weak-eff={eff:5.2f}  "
              f"compute-only-eff={eff_nc:5.2f}  "
              f"collective={cbytes/1e6:6.2f} MB/step", flush=True)
        assert np.isfinite(float(loss))


if __name__ == "__main__":
    main()
