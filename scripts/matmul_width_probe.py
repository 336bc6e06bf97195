"""Is the fused kernels' per-pass cost set by MXU lane under-utilization?

Times a Pallas kernel doing K one-hot-style matmuls per chunk of shapes
(CHUNK, W) x (W, N) for N in {32, 128} and pass counts {1, 4, 8}. If an
N=128 pass costs ~an N=32 pass, the narrow passes waste 3/4 of the MXU
and packing 4 into 1 wide pass is ~4x on this op class.

Run: timeout 1200 python scripts/matmul_width_probe.py
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

CHUNK = 512
W = 128
E = 149504


def _kern(wb_ref, ids_ref, x_ref, t_ref, o_ref, *, n_passes, N, gather):
    c = pl.program_id(0)
    idrow = ids_ref[pl.ds(c % 8, 1), :]
    ohT = (idrow == jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)).astype(jnp.float32)
    # Chained passes (each consumes the previous result) so the compiler
    # cannot CSE identical matmuls into one.
    if gather:
        cur = t_ref[0:W, 0:N] * 1.0
        for k in range(n_passes):
            # (CHUNK, W) x (W, N) gather-style: contract ohT dim0
            full = jax.lax.dot_general(
                ohT, cur, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (CHUNK, N)
            cur = full[0:W, :] + 1.0
        o_ref[:, 0:N] = jnp.pad(cur, ((0, CHUNK - W), (0, 0))) + x_ref[:, 0:N]
    else:
        cur = x_ref[:, 0:N] * 1.0
        for k in range(n_passes):
            # (W, CHUNK) x (CHUNK, N) scatter-style: contract edges
            o = jax.lax.dot_general(
                ohT, cur, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (W, N)
            cur = jnp.pad(o, ((0, CHUNK - W), (0, 0))) + cur * 0.5
        o_ref[:, 0:N] = cur


def bench(n_passes, N, gather, ids2d, wb):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, 128)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((W * (E // CHUNK // 1), 128)).astype(np.float32)[: W * 8])
    t = jnp.asarray(rng.standard_normal((W * 8, 128)).astype(np.float32))
    nch = E // CHUNK
    fn = pl.pallas_call(
        functools.partial(_kern, n_passes=n_passes, N=N, gather=gather),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((8, CHUNK), lambda c, wb: (c // 8, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 128), lambda c, wb: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((W, 128), lambda c, wb: (wb[c] % 8, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, 128), lambda c, wb: (c, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
    )

    @partial(jax.jit, static_argnames="n")
    def run(xx, n):
        def body(xx, _):
            return fn(wb, ids2d, xx, t), ()
        out, _ = jax.lax.scan(body, xx, None, length=n)
        return out

    n = 100
    jax.block_until_ready(run(x, n))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, n))
        ts.append(time.perf_counter() - t0)
    label = "gather " if gather else "scatter"
    print(f"{label} passes={n_passes} N={N:3d}: {min(ts)/n/nch*1e6:6.3f} us/chunk",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    nch = E // CHUNK
    ids = rng.integers(0, W, size=(nch, CHUNK)).astype(np.int32)
    rows8 = -(-nch // 8) * 8
    ids2d = jnp.asarray(np.pad(ids, ((0, rows8 - nch), (0, 0))))
    wb = jnp.asarray(np.arange(nch, dtype=np.int32))
    for gather in (True, False):
        for n_passes, N in ((1, 32), (1, 128), (4, 32), (4, 128), (8, 32)):
            bench(n_passes, N, gather, ids2d, wb)


if __name__ == "__main__":
    main()
