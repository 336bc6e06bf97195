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


def main():
    conf = _flagship_conf(small=True)
    model = get_model(conf)
    tx, _ = build_optimizer(conf)

    base = None
    base_rate = None
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

        # Warm up (compile) + timed loop.
        params, opt_state, *_ = step(params, opt_state, batched, jnp.asarray(weights))
        jax.block_until_ready(params)
        n_iter = 20
        t0 = time.perf_counter()
        for _ in range(n_iter):
            params, opt_state, loss, *_ = step(params, opt_state, batched,
                                               jnp.asarray(weights))
        jax.block_until_ready(params)
        dt = (time.perf_counter() - t0) / n_iter
        edges = int(scene.graph.e_true)
        rate = edges / dt
        # Weak-scaling efficiency: time per per-shard chunk vs the 1-shard
        # run (robust to the synthetic scenes not growing their edge count
        # exactly linearly).
        per_shard_chunks = e_cap / CHUNK / n_edge
        t_chunk = dt / per_shard_chunks
        if base is None:
            base = t_chunk
        eff = base / t_chunk
        print(f"n_edge={n_edge}  E={edges:6d} (cap {e_cap:6d})  "
              f"step={dt*1e3:8.2f} ms  {rate/1e3:8.1f}k edges/s  "
              f"weak-efficiency={eff:5.2f}", flush=True)
        assert np.isfinite(float(loss))


if __name__ == "__main__":
    main()
