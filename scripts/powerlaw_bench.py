"""Bench the train step on a REALISTIC (power-law track-length) scene.

The headline bench scene uses uniform visibility 0.2; real SfM scenes have
power-law track lengths (most points seen by 2-5 views, a heavy tail of
long tracks). This measures the blocked point-major layout's padding
fraction and end-to-end edges/s on both distributions at a matched scale
(~AlcatrazCourtyard shape: 133 views / ~25k points), guarding the layout's
locality assumptions before real data arrives (round-3 verdict item 6).

Round 5: scenes go through the production GraphBucketizer, whose chunk
rule (view_graph.choose_chunk) picks each scene's edge-chunk length from
its mean window run — 1024 for the dense uniform scene, 512 for the
power-law one — with no env overrides (round-4 verdict item 3).

Run on the TPU:
  [GASFM_STREAM_DTYPE=bf16] timeout 1800 python scripts/powerlaw_bench.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax
import numpy as np


def main():
    from __graft_entry__ import _flagship_conf
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.losses import get_loss_func
    from gasfm_tpu.models import get_model
    from gasfm_tpu.train.loop import GraphBucketizer
    from gasfm_tpu.train.state import build_optimizer
    from gasfm_tpu.utils.benchstep import make_run_steps

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    conf = _flagship_conf(small=False)
    bucketize = GraphBucketizer(conf)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)
    run_steps = make_run_steps(model, loss_func, tx)

    scenes = {
        "uniform_v0.2": dict(n_views=128, n_points=8192, visibility=0.2),
        "powerlaw_a1.8": dict(
            n_views=133, n_points=24576, track_length_dist="powerlaw"
        ),
    }
    STEPS = 64
    for name, kw in scenes.items():
        data = generate_synthetic_scene(seed=0, **kw)
        scene = bucketize(data)  # production bucketizer: auto chunk
        g = scene.graph
        e_valid = int(g.e_true)
        e_cap = g.num_edges
        em = np.asarray(g.edge_mask).reshape(-1, g.chunk)
        dead = int((~em.any(axis=1)).sum())
        track_lens = np.asarray(g.cam_per_pts)
        track_lens = track_lens[track_lens > 0]
        params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
        opt_state = tx.init(params)
        _, _, l0 = run_steps(params, opt_state, scene, STEPS)
        float(l0)
        t0 = time.perf_counter()
        float(run_steps(params, opt_state, scene, STEPS)[2])
        dt = (time.perf_counter() - t0) / STEPS
        print(
            f"{name:14s}: chunk={g.chunk} E_valid={e_valid:7d} E_cap={e_cap:7d} "
            f"padding={(e_cap - e_valid) / e_cap:5.1%} "
            f"dead_chunks={dead}/{em.shape[0]} "
            f"track_len mean={track_lens.mean():5.2f} med={np.median(track_lens):4.0f} "
            f"max={track_lens.max():4d} | step={dt * 1e3:7.2f} ms "
            f"-> {e_valid / dt / 1e6:6.3f} M edges/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
