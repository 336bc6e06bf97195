"""Isolate the fused-frontend kernel's per-chunk cost components.

Three kernels with the frontend's exact grid/block structure:
  copy    — DMA the chunked inputs in, write one chunked output (pipeline
            + grid-step floor).
  onehot  — copy + build both one-hot masks and reduce them (VPU compare/
            cast cost) without any MXU work.
  matmul  — onehot + the two big one-hot matmuls (gather + scatter).

Compares against the real _front_fwd_raw to attribute its time. Informs
whether further kernel work should target DMA/grid overhead, the VPU
one-hot builds, or the MXU.

Run: timeout 1800 python scripts/kernel_cost_isolation.py
"""

from __future__ import annotations

import functools
import sys
import time
from functools import partial
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gasfm_tpu.data.synthetic import generate_synthetic_scene
from gasfm_tpu.graph.view_graph import CHUNK, WINDOW


def _copy_kernel(wb_ref, pids_ref, cids_ref, e_ref, xrp_ref, xrc_ref, out_ref, *, W, Wc):
    out_ref[:] = e_ref[:] + xrp_ref[0:1, :] + xrc_ref[0:1, :]


def _onehot_kernel(wb_ref, pids_ref, cids_ref, e_ref, xrp_ref, xrc_ref, out_ref, *, W, Wc):
    c = pl.program_id(0)
    local = pids_ref[:] - wb_ref[c] * W
    oh_p = (local == jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)).astype(jnp.float32)
    oh_c = (cids_ref[:] == jax.lax.broadcasted_iota(jnp.int32, (1, Wc), 1)).astype(jnp.float32)
    mark = jnp.sum(oh_p, axis=1, keepdims=True) + jnp.sum(oh_c, axis=1, keepdims=True)
    out_ref[:] = e_ref[:] + mark + xrp_ref[0:1, :] + xrc_ref[0:1, :]


def _matmul_kernel(wb_ref, pids_ref, cids_ref, e_ref, xrp_ref, xrc_ref, out_ref, *, W, Wc):
    c = pl.program_id(0)
    local = pids_ref[:] - wb_ref[c] * W
    oh_p = (local == jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)).astype(jnp.float32)
    oh_c = (cids_ref[:] == jax.lax.broadcasted_iota(jnp.int32, (1, Wc), 1)).astype(jnp.float32)
    e = e_ref[:]
    g_p = jnp.dot(oh_p, xrp_ref[:], preferred_element_type=jnp.float32)
    g_c = jnp.dot(oh_c, xrc_ref[:], preferred_element_type=jnp.float32)
    s_p = jax.lax.dot_general(oh_p, e, dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (W, D) scatter
    out_ref[:] = e + g_p + g_c + s_p[0:1, :]


def build(kernel, E, D, W, Wc, s_pad):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 1), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
    )

    def call(wb, pids, cids, e, xrp, xrc):
        return pl.pallas_call(
            functools.partial(kernel, W=W, Wc=Wc),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        )(wb, pids, cids, e, xrp, xrc)

    return call


def main():
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E, D, W, Wc = g.num_edges, 32, WINDOW, 256
    s_pad = ((g.num_pts + W - 1) // W) * W
    rng = np.random.default_rng(0)
    e0 = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    xrp = jnp.asarray(rng.standard_normal((s_pad, D)).astype(np.float32))
    xrc = jnp.asarray(rng.standard_normal((Wc, D)).astype(np.float32))
    pids = g.pt_idx.astype(jnp.int32)[:, None]
    cids = g.cam_idx.astype(jnp.int32)[:, None]
    wb = g.pt_window.reshape(E // CHUNK, CHUNK)[:, 0]
    chunks = E // CHUNK
    print(f"E={E} chunks={chunks}")

    for name, kern in (("copy", _copy_kernel), ("onehot", _onehot_kernel),
                       ("matmul", _matmul_kernel)):
        fn = build(kern, E, D, W, Wc, s_pad)

        @partial(jax.jit, static_argnames="n")
        def run(e, n, fn=fn):
            def body(e, _):
                return fn(wb, pids, cids, e, xrp, xrc), ()

            out, _ = jax.lax.scan(body, e, None, length=n)
            return out

        n = 200
        jax.block_until_ready(run(e0, n))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(e0, n))
            times.append(time.perf_counter() - t0)
        per_chunk = min(times) / n / chunks
        print(f"{name:7s}: {per_chunk*1e6:6.2f} us/chunk", flush=True)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def _copy_noids_kernel(wb_ref, e_ref, xrp_ref, xrc_ref, out_ref, *, W, Wc):
    out_ref[:] = e_ref[:] + xrp_ref[0:1, :] + xrc_ref[0:1, :]


def build_noids(E, D, W, Wc):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, D), lambda c, wb_ref: (wb_ref[c], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, D), lambda c, wb_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, D), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
    )

    def call(wb, e, xrp, xrc):
        return pl.pallas_call(
            functools.partial(_copy_noids_kernel, W=W, Wc=Wc),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        )(wb, e, xrp, xrc)

    return call


def _copy_packed_kernel(wb_ref, e_ref, out_ref):
    out_ref[:] = e_ref[:] * 1.0000001


def build_packed(rows):
    # Edge stream pre-packed to 128 lanes: (E, 32) viewed as (E/4, 128) —
    # no T(8,128) lane padding in HBM, 4x less physical DMA if the padding
    # hypothesis holds.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // (CHUNK // 4),),
        in_specs=[
            pl.BlockSpec((CHUNK // 4, 128), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK // 4, 128), lambda c, wb_ref: (c, 0),
                               memory_space=pltpu.VMEM),
    )

    def call(wb, e):
        return pl.pallas_call(
            _copy_packed_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(wb, e)

    return call


def extra():
    data = generate_synthetic_scene(n_views=128, n_points=8192, visibility=0.2, seed=0)
    g = data.to_scene_graph().graph
    E, D, W, Wc = g.num_edges, 32, WINDOW, 256
    s_pad = ((g.num_pts + W - 1) // W) * W
    rng = np.random.default_rng(0)
    e0 = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    e0p = jnp.asarray(rng.standard_normal((E // 4, 128)).astype(np.float32))
    xrp = jnp.asarray(rng.standard_normal((s_pad, D)).astype(np.float32))
    xrc = jnp.asarray(rng.standard_normal((Wc, D)).astype(np.float32))
    wb = g.pt_window.reshape(E // CHUNK, CHUNK)[:, 0]
    chunks = E // CHUNK

    def timeit(name, run, x):
        n = 200
        jax.block_until_ready(run(x, n))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x, n))
            times.append(time.perf_counter() - t0)
        print(f"{name:12s}: {min(times)/n/chunks*1e6:6.2f} us/chunk", flush=True)

    fn = build_noids(E, D, W, Wc)

    @partial(jax.jit, static_argnames="n")
    def run_noids(e, n):
        def body(e, _):
            return fn(wb, e, xrp, xrc), ()
        out, _ = jax.lax.scan(body, e, None, length=n)
        return out

    timeit("copy_noids", run_noids, e0)

    fp = build_packed(E // 4)

    @partial(jax.jit, static_argnames="n")
    def run_packed(e, n):
        def body(e, _):
            return fp(wb, e), ()
        out, _ = jax.lax.scan(body, e, None, length=n)
        return out

    timeit("copy_packed", run_packed, e0p)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
