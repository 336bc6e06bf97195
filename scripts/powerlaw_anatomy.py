"""Attribute the powerlaw (realistic-scene) step: kernel vs table vs fixed.

The powerlaw scene runs at ~2.8M edges/s vs the uniform headline's 6.1M.
Decompose via a layer-count sweep (per-interior-layer marginal x 9 +
fixed) and compare the marginal against the live-chunk kernel model
(live_chunks x measured per-chunk cost at this scene's chunk): the excess
marginal is per-layer TABLE-side work (the point table is 3x the uniform
scene's: 24,576 vs 8,192 rows), and the excess fixed cost is Adam + heads
+ loss + dispatch. Run on the TPU:
    timeout 2400 python scripts/powerlaw_anatomy.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))


def measure(env_overrides, num_layers, label, scene_kind="powerlaw"):
    scene_line = {
        "powerlaw": "data = generate_synthetic_scene(n_views=133, n_points=24576,"
                    " track_length_dist='powerlaw', seed=0)",
        # Same track-length distribution at a 3x smaller point table: if the
        # excess per-layer marginal (vs the live-chunk kernel model) shrinks
        # ~3x, the table-side cost is BYTES-bound (bf16 tables would pay);
        # if it stays flat, it is per-op-floor-bound (only fusion pays).
        "powerlaw8k": "data = generate_synthetic_scene(n_views=133, n_points=8192,"
                      " track_length_dist='powerlaw', seed=0)",
        "uniform": "data = generate_synthetic_scene(n_views=128, n_points=8192,"
                   " visibility=0.2, seed=0)",
    }[scene_kind]
    code = f"""
import os, sys, time
sys.path.insert(0, {str(_REPO)!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", {str(_REPO / '.jax_cache')!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from __graft_entry__ import _flagship_conf
from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.losses import get_loss_func
from gasfm_tpu.models import get_model
from gasfm_tpu.train.loop import GraphBucketizer
from gasfm_tpu.train.state import build_optimizer, cast_params_for_training
from gasfm_tpu.utils.benchstep import make_run_steps

conf = _flagship_conf(small=False)
conf.put("model.num_layers", {num_layers})
conf.put("train.adam_mu_dtype", "bf16")
conf.put("train.adam_nu_dtype", "bf16")
model = get_model(conf)
loss_func = get_loss_func(conf)
tx, _ = build_optimizer(conf)
{scene_line}
scene = GraphBucketizer(conf)(data)
params = jax.jit(model.init)(jax.random.PRNGKey(0), scene.graph)
params = cast_params_for_training(conf, params)
opt_state = tx.init(params)
run_steps = make_run_steps(model, loss_func, tx)
N = 128
float(run_steps(params, opt_state, scene, N)[2])
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(run_steps(params, opt_state, scene, N)[2])
    ts.append(time.perf_counter() - t0)
g = scene.graph
em = np.asarray(g.edge_mask).reshape(-1, g.chunk)
live = int(em.any(axis=1).sum())
e = int(g.e_true)
dt = min(ts) / N
from gasfm_tpu.ops.pallas.packing import stream_dtype
from gasfm_tpu.utils.kernel_cost import measure_merged_kernel_cost
kc = measure_merged_kernel_cost(g, stream_dtype())
print(f"RESULT {{dt*1e3:.3f}} ms/step  {{e/dt/1e6:.3f}} M edges/s  "
      f"chunk={{g.chunk}} live_chunks={{live}} E={{e}} "
      f"kernel_us_chunk={{kc*1e6:.2f}}")
"""
    env = dict(os.environ)
    env.setdefault("GASFM_STREAM_DTYPE", "bf16")
    env.update(env_overrides)
    t0 = time.time()
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, cwd=str(_REPO))
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    print(f"{label:34s} {line[0][7:] if line else 'FAILED'}"
          f"   (wall {time.time()-t0:.0f}s)", flush=True)
    if not line:
        sys.stderr.write(p.stderr[-3000:] + "\n")


if __name__ == "__main__":
    kinds = os.environ.get("ANATOMY_KINDS", "powerlaw,uniform").split(",")
    for kind in kinds:
        measure({}, 9, f"{kind} L=9", scene_kind=kind)
        measure({}, 5, f"{kind} L=5", scene_kind=kind)
