"""Validate round-3 packed-layout unpack/repack routes inside Pallas TPU.

Packed convention: an (E, D) edge stream (D=32) is stored (E/4, 4*D): packed
row r of chunk c, lane group k holds edge c*CHUNK + k*(CHUNK/4) + r. DMA of
the packed form measured 4.3x cheaper (BENCHLOG section 8). Mosaic rejects
both the straight reshape and the naive lane-slice+concat (offset mismatch),
so this script tries layout-safe routes:

  U-roll: pltpu.roll each lane group toward offset 0, slice, sublane-concat
  U-mm:   selection matmul (P @ S_k contracts lanes -> offset-0 quarters),
          S_k built in-kernel from iota (no DMA)
  R-roll: lane-pad each quarter to 128, roll into place, sum
  R-mm:   sublane-slice quarters (8-aligned -> clean), y_k @ S_k^T, sum

Run: timeout 1800 python scripts/kernel_pack_slice.py
"""

from __future__ import annotations

import sys
import time
import traceback
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
D = 32
PACK = 4
Q = CHUNK // PACK  # 128 rows per quarter
E = 149504
W = 128
PD = PACK * D


def _sel(k):
    """(PD, D) 0/1 selection: S_k[j, d] = 1 iff j == k*D + d (iota-built)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (PD, D), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (PD, D), 1)
    return (rows == cols + k * D).astype(jnp.float32)


def _unpack_roll(p):
    qs = []
    for k in range(PACK):
        r = pltpu.roll(p, PD - k * D, 1) if k else p
        qs.append(r[:, 0:D])
    return jnp.concatenate(qs, axis=0)


def _unpack_mm(p):
    qs = [
        jax.lax.dot_general(p, _sel(k), dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for k in range(PACK)
    ]
    return jnp.concatenate(qs, axis=0)


def _repack_roll(x):
    out = None
    for k in range(PACK):
        yk = x[k * Q : (k + 1) * Q, :]
        ypad = jnp.pad(yk, ((0, 0), (0, PD - D)))
        r = pltpu.roll(ypad, k * D, 1) if k else ypad
        out = r if out is None else out + r
    return out


def _repack_mm(x):
    out = None
    for k in range(PACK):
        yk = x[k * Q : (k + 1) * Q, :]
        r = jax.lax.dot_general(yk, _sel(k), dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out = r if out is None else out + r
    return out


def _mk_kernel(unpack, repack):
    def kern(wb_ref, p_ref, o_ref):
        x = unpack(p_ref[:])
        y = x * 1.0000001 + 0.0000001
        o_ref[:] = repack(y)
    return kern


def _copy_kernel(wb_ref, p_ref, o_ref):
    o_ref[:] = p_ref[:] * 1.0000001


def _bench(fn, wb, packed, chunks, label):
    @partial(jax.jit, static_argnames="n")
    def run(a, n):
        def body(a, _):
            return a, fn(wb, a)
        _, outs = jax.lax.scan(body, a, None, length=n)
        return outs

    n = 200
    jax.block_until_ready(run(packed, n))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(packed, n))
        times.append(time.perf_counter() - t0)
    print(f"{label}: {min(times)/n/chunks*1e6:6.3f} us/chunk", flush=True)


def main():
    rows = E // PACK
    chunks = E // CHUNK
    rng = np.random.default_rng(0)
    packed_np = rng.standard_normal((rows, PD)).astype(np.float32)
    packed = jnp.asarray(packed_np)
    wb = jnp.zeros((chunks,), dtype=jnp.int32)

    def build(kern):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(chunks,),
                in_specs=[
                    pl.BlockSpec((Q, PD), lambda c, wb: (c, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Q, PD), lambda c, wb: (c, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((rows, PD), jnp.float32),
        )

    variants = {
        "U-roll/R-roll": _mk_kernel(_unpack_roll, _repack_roll),
        "U-roll/R-mm  ": _mk_kernel(_unpack_roll, _repack_mm),
        "U-mm  /R-roll": _mk_kernel(_unpack_mm, _repack_roll),
        "U-mm  /R-mm  ": _mk_kernel(_unpack_mm, _repack_mm),
    }

    ref = packed_np * 1.0000001 + 0.0000001
    copy = build(_copy_kernel)
    _bench(copy, wb, packed, chunks, "packed copy  ")

    verbose = "-v" in sys.argv
    for name, kern in variants.items():
        try:
            fn = build(kern)
            out = np.asarray(fn(wb, packed))
            np.testing.assert_allclose(out, ref, rtol=1e-6)
            _bench(fn, wb, packed, chunks, name)
        except Exception as exc:  # noqa: BLE001
            if verbose:
                traceback.print_exc()
            lines = [ln for ln in str(exc).split("\n") if ln.strip()]
            print(f"{name}: FAILED — {lines[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
