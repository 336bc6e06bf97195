"""Round-5 step anatomy: layer-count sweep + feature A/Bs at the bench scene.

Prices the remaining fixed costs after the round-5 glue harvest (fused
ESFM loss, first-layer deferral): per-interior-layer marginal, layer-
independent fixed cost, and the deltas from disabling each new feature.
Run on the TPU:  timeout 1800 python scripts/anatomy_r5.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))


def measure(env_overrides, num_layers=9, label=""):
    """One subprocess measurement (env knobs are trace-time)."""
    code = f"""
import os, sys, time
sys.path.insert(0, {str(_REPO)!r})
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
if os.environ.get("GASFM_ADAM_MU_DTYPE", "bf16") == "bf16":
    conf.put("train.adam_mu_dtype", "bf16")
if os.environ.get("GASFM_ADAM_NU_DTYPE", "bf16") == "bf16":
    conf.put("train.adam_nu_dtype", "bf16")
model = get_model(conf)
loss_func = get_loss_func(conf)
tx, _ = build_optimizer(conf)
data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
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
e = int(scene.graph.e_true)
dt = min(ts) / N
print(f"RESULT {{dt*1e3:.3f}} ms/step  {{e/dt/1e6:.3f}} M edges/s  chunk={{scene.graph.chunk}}")
"""
    env = dict(os.environ)
    env.setdefault("GASFM_STREAM_DTYPE", "bf16")
    env.update(env_overrides)
    t0 = time.time()
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, cwd=str(_REPO))
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    print(f"{label:42s} {line[0][7:] if line else 'FAILED'}"
          f"   (wall {time.time()-t0:.0f}s)", flush=True)
    if not line:
        sys.stderr.write(p.stderr[-3000:] + "\n")


if __name__ == "__main__":
    measure({}, 9, "baseline L=9 (fast config)")
    measure({}, 5, "L=5 (marginal layer cost)")
    measure({"GASFM_DEFER_FIRST": "0"}, 9, "no first-layer deferral")
    measure({"GASFM_CHUNK": "2048"}, 9, "CHUNK=2048")
    measure({"GASFM_CHUNK": "512"}, 9, "CHUNK=512")
