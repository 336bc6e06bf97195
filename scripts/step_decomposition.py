"""Decompose the flagship train-step time into forward / backward / Adam /
scan overhead on the real chip, at two scene sizes.

Each component is timed as its own jitted program batched over a lax.scan
(dispatch-amortized, same measurement methodology as bench.py). Results
feed BENCHLOG.md — the per-component table is the evidence base for the
round-2 perf work.

Run: timeout 3600 python scripts/step_decomposition.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import optax

REPO = Path(__file__).resolve().parents[1]
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _flagship_conf
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.models import get_model
from gasfm_tpu.train.state import apply_param_updates, build_optimizer


def timed_scan(fn, carry, scene, n):
    """Time a jitted scan of `fn` (carry -> carry) with `n` iterations."""

    @partial(jax.jit, static_argnames="n")
    def run(carry, scene, n):
        def body(c, _):
            return fn(c, scene), ()

        out, _ = jax.lax.scan(body, carry, None, length=n)
        return out

    out = run(carry, scene, n)  # compile + first batch
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry, scene, n))
        times.append(time.perf_counter() - t0)
    return min(times) / n


def main():
    conf = _flagship_conf(small=False)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)

    for n_views, n_points in [(64, 4096), (128, 8192)]:
        data = generate_synthetic_scene(n_views=n_views, n_points=n_points,
                                        visibility=0.2, seed=0)
        scene = data.to_scene_graph()
        E_cap = scene.graph.num_edges
        params = jax.jit(model.init)(jax.random.PRNGKey(0), scene.graph)
        opt_state = tx.init(params)
        n = max(16, min(128, int(6e8 / E_cap / 9)))
        print(f"--- scene m={n_views} n={n_points} E_cap={E_cap} "
              f"E={int(scene.graph.e_true)} (scan n={n})", flush=True)

        # (a) forward + loss only. CAVEAT (measured, BENCHLOG.md section 2):
        # with params and scene constant across iterations, XLA hoists the
        # loop-invariant forward out of the scan — this row measures almost
        # nothing and is NOT a valid forward cost. Kept for the record; use
        # the per-op trace (scripts/trace_step.py) for forward attribution.
        def fwd_only(carry, scene):
            p, dummy = carry
            loss = loss_func(model.apply(p, scene.graph), scene)
            return (p, dummy + loss)

        t = timed_scan(fwd_only, (params, jnp.float32(0)), scene, n)
        print(f"forward+loss            : {t*1e3:8.2f} ms", flush=True)

        # (b) forward + backward (grads), trivial fold of grads into params.
        def fwd_bwd(carry, scene):
            p = carry

            def loss_fn(q):
                return loss_func(model.apply(q, scene.graph), scene)

            g = jax.grad(loss_fn)(p)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)

        t = timed_scan(fwd_bwd, params, scene, n)
        print(f"forward+backward        : {t*1e3:8.2f} ms", flush=True)

        # (c) full step: fwd + bwd + Adam.
        def full_step(carry, scene):
            p, o = carry

            def loss_fn(q):
                return loss_func(model.apply(q, scene.graph), scene)

            g = jax.grad(loss_fn)(p)
            updates, o = tx.update(g, o, p)
            # NOT optax.apply_updates: under GASFM_PARAM_DTYPE=bf16 the
            # f32-master wrapper returns the NEW params as `updates`
            # (train/state._with_f32_master) and adding them would double
            # the weights silently.
            p = apply_param_updates(p, updates, o)
            return (p, o)

        t = timed_scan(full_step, (params, opt_state), scene, n)
        print(f"forward+backward+adam   : {t*1e3:8.2f} ms", flush=True)

        # (d) Adam alone on this param tree (grads = params as dummy data).
        def adam_only(carry, scene):
            p, o = carry
            updates, o = tx.update(p, o, p)
            p = apply_param_updates(p, updates, o)
            return (p, o)

        t = timed_scan(adam_only, (params, opt_state), scene, n)
        print(f"adam only               : {t*1e3:8.2f} ms", flush=True)

        # (e) fwd+bwd with Pallas kernels off (composite XLA path).
        from gasfm_tpu.ops import segment as seg

        seg.set_kernel_mode("off")
        t = timed_scan(fwd_bwd, params, scene, n)
        seg.set_kernel_mode("auto")
        print(f"forward+backward (XLA)  : {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
