"""Measured DPESFM (SetOfSet) train-step throughput (round-3 verdict item 5).

The packed/merged kernel surface covers GASFM (n_feat_proj=32); DPESFM runs
wide edge features (reference confs/dpesfm: num_features=256, num_blocks=1,
block_size=3), so its hot path is the WINDOWED segment-mean kernels
(ops/pallas/segment_kernels.py — the TPU replacement for the reference's
``sparse_mean`` hot path, code/utils/sparse_utils.py:406-419) without lane
packing: at 256 features every lane of the (CHUNK, 256) tiles is live, so
packing has nothing to recover — the decision paragraph lives in BENCHLOG.

Run on the TPU:  GASFM_CHUNK=1024 timeout 1800 python scripts/dpesfm_bench.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

os.environ.setdefault("GASFM_CHUNK", "1024")

import jax


def main():
    from gasfm_tpu.config import ConfigFactory
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.losses import get_loss_func
    from gasfm_tpu.models import get_model
    from gasfm_tpu.train.state import build_optimizer
    from gasfm_tpu.utils.benchstep import make_run_steps

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    conf = ConfigFactory.parse_string("""
dataset { calibrated = true }
model {
  type = "SetOfSet.SetOfSetNet"
  num_features = 256
  num_blocks = 1
  block_size = 3
  normalize_output = null
  proj_feat_normalization = true
  add_skipconn_for_residual_blocks = true
  pos_emb_n_freq = 0
  depth_head { enabled = false }
  view_head { enabled = true, n_hidden_layers = 2, rot_representation = "quat" }
  scenepoint_head { enabled = true, n_hidden_layers = 2 }
}
train { lr = 0.0001, lr_schedule { lr_warmup_n_steps = 0, main_scheduler = "constant" } }
loss {
  func = "ESFMLoss"
  infinity_pts_margin = 0.0001
  pts_grad_equalization_pre_perspective_divide = true
  normalize_grad_wrt_valid_projections_only = true
  hinge_loss = true
  hinge_loss_weight = 1
}
""")
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)
    run_steps = make_run_steps(model, loss_func, tx)

    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    scene = data.to_scene_graph()
    n_edges = int(scene.graph.e_true)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene.graph)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    opt_state = tx.init(params)

    STEPS = 64
    _, _, l0 = run_steps(params, opt_state, scene, STEPS)
    float(l0)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_steps(params, opt_state, scene, STEPS)[2])
        times.append(time.perf_counter() - t0)
    dt = min(times) / STEPS
    print(
        f"DPESFM (256 feat, 1 block x 3 layers, {n_params / 1e6:.1f}M params): "
        f"E={n_edges} E_cap={scene.graph.num_edges} step={dt * 1e3:.2f} ms "
        f"-> {n_edges / dt / 1e6:.3f} M edges/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
