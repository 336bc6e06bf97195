"""Measure packed-at-rest edge storage with in-kernel unpack.

Hypothesis (BENCHLOG section 9): (E, 32) f32 edge arrays are physically
padded to 128 lanes by the T(8,128) HBM tiling — every edge-stream DMA and
every XLA elementwise op moves 4x the logical bytes, and the edge stream
occupies 4x HBM. Storing the stream as (E/4, 128) ("4 edges per row")
removes the padding; kernels then unpack in VMEM via reshape.

This kernel DMAs a packed (CHUNK/4, 128) block, reshapes to (CHUNK, 32),
does a trivial op, reshapes back and writes packed — measuring DMA savings
minus the Mosaic relayout cost.

Run: timeout 1800 python scripts/kernel_pack_unpack.py
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

from gasfm_tpu.graph.view_graph import CHUNK

E = 149504
D = 32
PACK = 128 // D


def _unpack_kernel(wb_ref, packed_ref, out_ref):
    x = packed_ref[:].reshape(CHUNK, D)  # in-VMEM relayout
    y = x * 1.0000001 + 0.0000001
    out_ref[:] = y.reshape(CHUNK // PACK, 128)


def main():
    rows = E // PACK
    rng = np.random.default_rng(0)
    e0 = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))
    chunks = E // CHUNK

    fn = pl.pallas_call(
        _unpack_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(chunks,),
            in_specs=[pl.BlockSpec((CHUNK // PACK, 128), lambda c, wb: (c, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK // PACK, 128), lambda c, wb: (c, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    )
    wb = jnp.zeros((chunks,), dtype=jnp.int32)

    @partial(jax.jit, static_argnames="n")
    def run(e, n):
        def body(e, _):
            return fn(wb, e), ()

        out, _ = jax.lax.scan(body, e, None, length=n)
        return out

    n = 200
    jax.block_until_ready(run(e0, n))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(e0, n))
        times.append(time.perf_counter() - t0)
    print(f"packed+unpack: {min(times)/n/chunks*1e6:6.2f} us/chunk "
          f"(vs unpacked copy ~1.84, packed copy: see kernel_cost_isolation --extra)",
          flush=True)


def _id_unpack_kernel(wb_ref, packed_ref, e_ref, out_ref):
    ids = packed_ref[:].reshape(CHUNK, 1)  # (CHUNK/128, 128) -> (CHUNK, 1)
    out_ref[:] = e_ref[:] + ids.astype(jnp.float32)


def id_variant():
    rows = E // PACK
    rng = np.random.default_rng(0)
    e0 = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100, size=(E // 128, 128)).astype(np.int32))
    chunks = E // CHUNK

    fn = pl.pallas_call(
        _id_unpack_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(chunks,),
            in_specs=[
                pl.BlockSpec((CHUNK // 128, 128), lambda c, wb: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, D), lambda c, wb: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, D), lambda c, wb: (c, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
    )
    wb = jnp.zeros((chunks,), dtype=jnp.int32)

    @partial(jax.jit, static_argnames="n")
    def run(e, n):
        def body(e, _):
            return fn(wb, ids, e), ()

        out, _ = jax.lax.scan(body, e, None, length=n)
        return out

    n = 200
    jax.block_until_ready(run(e0, n))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(e0, n))
        times.append(time.perf_counter() - t0)
    print(f"packed-id unpack + e copy: {min(times)/n/chunks*1e6:6.2f} us/chunk "
          f"(baseline e-copy-only ~1.0; unpacked 1-id copy adds ~0.32)", flush=True)


if __name__ == "__main__":
    main()
    id_variant()
