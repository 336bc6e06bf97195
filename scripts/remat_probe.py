"""Large-scene capability probe: train-step on multi-million-edge scenes
with model.remat_layers on/off. Round-2 state: a ~0.9M-valid-edge scene
OOMs because the jitted step saves per-layer E-sized residuals
(BENCHLOG section 1); the reference OOM-skips such scenes
(code/train.py:225-248). remat trades one recompute for O(layers) less
activation HBM.

Run: timeout 3000 python scripts/remat_probe.py [--small]
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


def probe(m, n, remat: bool, steps=8):
    conf = _flagship_conf(small=False)
    conf.put("model.remat_layers", remat)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)
    data = generate_synthetic_scene(n_views=m, n_points=n, visibility=0.2, seed=0)
    scene = data.to_scene_graph()
    n_edges = int(scene.graph.e_true)
    label = f"m={m} n={n} E={n_edges} cap={scene.graph.num_edges} remat={int(remat)}"
    try:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), scene.graph)
        run_steps = make_run_steps(model, loss_func, tx)
        opt_state = tx.init(params)
        float(run_steps(params, opt_state, scene, steps)[2])
        t0 = time.perf_counter()
        float(run_steps(params, opt_state, scene, steps)[2])
        dt = (time.perf_counter() - t0) / steps
        print(f"{label}: {dt*1e3:8.2f} ms/step, {n_edges/dt/1e6:6.2f} M edges/s",
              flush=True)
    except Exception as exc:  # noqa: BLE001
        first = str(exc).split("\n")[0][:120]
        print(f"{label}: FAILED — {first}", flush=True)


def main():
    small = "--small" in sys.argv
    if small:
        probe(128, 8192, False)
        probe(128, 8192, True)
        return
    # Memory/time tradeoff at the bench scene:
    probe(128, 8192, False)
    probe(128, 8192, True)
    # The round-2 OOM scene, then the 2M+ target:
    probe(256, 32768, False, steps=4)
    probe(256, 32768, True, steps=4)
    probe(384, 49152, True, steps=4)


if __name__ == "__main__":
    main()
