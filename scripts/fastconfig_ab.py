"""A/B: does the bench FAST configuration train to the same final quality?

The headline bench number runs bf16 packed streams + bf16 Adam mu AND nu
(bench.py fast_config); each piece is validated by per-step rounding-
tolerance tests, but the round-4 verdict (missing #4) demanded an
END-TO-END check: a full synthetic single-scene optimization under the
parity config (f32 everything) vs the fast config, same seed and step
count, comparing final reconstruction quality (our_repro + camera errors).

The stream dtype is a trace-time env knob, so each arm runs in its own
subprocess. Run on the TPU:

    timeout 3600 python scripts/fastconfig_ab.py          # both arms
    python scripts/fastconfig_ab.py --arm parity|fast     # one arm

Results land in BENCHLOG.md round-5 (section: fast-config A/B).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

STEPS = 4000

ARMS = {
    "parity": {"GASFM_STREAM_DTYPE": "f32", "GASFM_ADAM_MU_DTYPE": "f32",
               "GASFM_ADAM_NU_DTYPE": "f32"},
    "fast": {"GASFM_STREAM_DTYPE": "bf16", "GASFM_ADAM_MU_DTYPE": "bf16",
             "GASFM_ADAM_NU_DTYPE": "bf16"},
}


def run_arm(arm: str, seed: int = 0):
    import time

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_conf
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.eval.metrics import compute_core_errors, unpad_predictions
    from gasfm_tpu.losses import get_loss_func
    from gasfm_tpu.models import get_model
    from gasfm_tpu.train.loop import GraphBucketizer
    from gasfm_tpu.train.state import build_optimizer
    from gasfm_tpu.utils.benchstep import make_run_steps

    conf = _flagship_conf(small=False)
    if os.environ.get("GASFM_ADAM_MU_DTYPE") == "bf16":
        conf.put("train.adam_mu_dtype", "bf16")
    if os.environ.get("GASFM_ADAM_NU_DTYPE") == "bf16":
        conf.put("train.adam_nu_dtype", "bf16")
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    tx, _ = build_optimizer(conf)

    # Mid-size noiseless synthetic scene (the test_e2e optimization recipe's
    # setting, scaled up): a short optimization must drive reprojection
    # error far down; equal-quality convergence is the pass criterion.
    data = generate_synthetic_scene(n_views=24, n_points=2048, seed=seed)
    scene = GraphBucketizer(conf)(data)

    params = jax.jit(model.init)(jax.random.PRNGKey(seed), scene.graph)
    opt_state = tx.init(params)
    run_steps = make_run_steps(model, loss_func, tx)

    t0 = time.time()
    CALL = 500
    losses = []
    for i in range(STEPS // CALL):
        params, opt_state, loss = run_steps(params, opt_state, scene, CALL)
        losses.append(float(loss))
    wall = time.time() - t0

    pred = jax.jit(model.apply)(params, scene.graph)
    pred_np = unpad_predictions(
        {k: np.asarray(v) for k, v in pred.items()}, data, graph=scene.graph
    )
    errs = compute_core_errors(data, pred_np, conf)
    out = {
        "arm": arm,
        "seed": seed,
        "steps": STEPS,
        "final_loss": losses[-1],
        "loss_curve": losses,
        "wall_s": round(wall, 1),
        **{k: float(v) for k, v in errs.items()},
    }
    print("ARM_RESULT " + json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=list(ARMS), default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.arm:
        run_arm(args.arm, args.seed)
        return
    results = {}
    for arm, env in ARMS.items():
        e = dict(os.environ)
        e.update(env)
        p = subprocess.run(
            [sys.executable, __file__, "--arm", arm, "--seed", str(args.seed)],
            env=e, capture_output=True, text=True, cwd=str(_REPO),
        )
        sys.stdout.write(p.stdout)
        sys.stderr.write(p.stderr[-2000:])
        for line in p.stdout.splitlines():
            if line.startswith("ARM_RESULT "):
                results[arm] = json.loads(line[len("ARM_RESULT "):])
    if len(results) == 2:
        pr, fa = results["parity"], results["fast"]
        print("\n=== fast-config A/B summary ===")
        for k in ("final_loss", "our_repro"):
            print(f"{k}: parity={pr[k]:.6f} fast={fa[k]:.6f} "
                  f"ratio={fa[k] / max(pr[k], 1e-12):.4f}")
        for k in sorted(pr):
            if k in ("arm", "loss_curve"):
                continue
            if isinstance(pr[k], float) and k in fa:
                print(f"  {k}: parity={pr[k]:.6f} fast={fa[k]:.6f}")


if __name__ == "__main__":
    main()
