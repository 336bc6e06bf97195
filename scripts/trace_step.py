"""Capture a jax.profiler device trace of the flagship fwd+bwd step and
aggregate per-op durations.

Run on the real TPU:  timeout 1800 python scripts/trace_step.py
Writes trace under /tmp/gasfm_trace and prints a duration-sorted op table.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    from __graft_entry__ import _flagship_conf
    from gasfm_tpu.data.synthetic import generate_synthetic_scene
    from gasfm_tpu.losses import get_loss_func
    from gasfm_tpu.models import get_model

    conf = _flagship_conf(small=False)
    model = get_model(conf)
    loss_func = get_loss_func(conf)
    data_s = generate_synthetic_scene(n_views=64, n_points=4096, visibility=0.2, seed=0)
    scene = data_s.to_scene_graph()
    jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), scene.graph)
    print("E_cap:", scene.graph.num_edges, "N_cap:", scene.graph.num_pts,
          "M_cap:", scene.graph.num_cams, flush=True)

    @jax.jit
    def train_like(p, scene):
        def loss_fn(q):
            return loss_func(model.apply(q, scene.graph), scene)

        g = jax.grad(loss_fn)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)

    t0 = time.perf_counter()
    p1 = train_like(params, scene)
    jax.block_until_ready(p1)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(2):
        jax.block_until_ready(train_like(params, scene))

    logdir = "/tmp/gasfm_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            jax.block_until_ready(train_like(params, scene))
    print("trace captured", flush=True)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        print("NO TRACE FILES — profiler unsupported on this backend?")
        return

    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Identify device-track pids (TPU op events live on tracks whose process
    # name mentions the device) and aggregate complete events by name.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    print("process tracks:", sorted(pid_names.values()), flush=True)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e6  # us -> s
        agg[name] += dur
        cnt[name] += 1
        total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"\n{'op':70s} {'count':>6s} {'total_ms':>9s}")
    for name, dur in rows[:60]:
        print(f"{name[:70]:70s} {cnt[name]:6d} {dur*1e3/3:9.3f}")
    print(f"\nTOTAL (all device events, per step): {total*1e3/3:.2f} ms over 3 steps")


if __name__ == "__main__":
    main()
