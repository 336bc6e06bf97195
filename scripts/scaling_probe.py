"""Probe train-step time vs scene size on the real chip.

Measures the flagship fwd+bwd+Adam step at several synthetic scene sizes to
separate fixed per-step overhead from bandwidth-proportional cost. Informs
the bench scene-size choice (edges/s is overhead-dominated on small scenes).

Run: timeout 1800 python scripts/scaling_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _flagship_conf
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.models import get_model
from gasfm_tpu.train.state import build_optimizer
from gasfm_tpu.utils.benchstep import make_run_steps


def main():
    conf = _flagship_conf(small=False)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)

    sizes = [
        (64, 4096, 0.2),     # ~29k valid edges
        (128, 8192, 0.2),    # ~116k valid edges (the bench scene)
        (256, 16384, 0.2),   # ~460k valid edges
        # (256, 32768): ~0.9M valid edges OOMs — the scan saves per-layer
        # E-sized residuals for the backward (see BENCHLOG.md section 1).
    ]
    for n_views, n_points, vis in sizes:
        data = generate_synthetic_scene(
            n_views=n_views, n_points=n_points, visibility=vis, seed=0)
        scene = data.to_scene_graph()
        n_edges = int(scene.graph.e_true)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), scene.graph)
        opt_state = tx.init(params)

        # The SAME scan-batched step program bench.py measures.
        run_steps = make_run_steps(model, loss_func, tx)

        n = max(8, min(256, int(2e9 / max(n_edges, 1) / 9)))
        t0 = time.perf_counter()
        float(run_steps(params, opt_state, scene, n)[2])
        # NOTE: includes executing n steps, not just trace+compile.
        first_call_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_steps(params, opt_state, scene, n)[2])
            times.append(time.perf_counter() - t0)
        step_ms = min(times) / n * 1e3
        eps = n_edges / (min(times) / n)
        print(f"m={n_views:4d} n={n_points:6d} E={n_edges:8d} "
              f"E_cap={scene.graph.num_edges:8d} steps={n:4d} "
              f"step={step_ms:8.2f} ms  {eps/1e6:7.2f}M edges/s "
              f"(first call {first_call_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
