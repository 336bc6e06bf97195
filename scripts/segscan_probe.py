"""Sorted-segment-scan aggregation vs the production one-hot MXU pass.

The round-3 verdict's top demand: replace the one-hot aggregation with a
non-one-hot algorithm — "the blocked point-major layout already sorts edges
by point id; a within-chunk segmented scan + carry across chunk boundaries
needs no (W, 128) one-hot operands at all" — or produce a measured
refutation. This probe isolates exactly the contested operation at
production shapes (CHUNK edges -> W=128-point window, D=32 features,
weighted sum + denominator) and times three implementations as standalone
Pallas kernels sweeping the same synthetic sorted stream:

1. ``onehot``   — the production form: build the transposed one-hot
   (W, CHUNK) from the lane-packed id row (one iota compare), one MXU pass
   ``ohT @ [w*x | w]`` accumulated per window block.
2. ``scan``     — log2(CHUNK) sublane rolls + masked adds produce the
   inclusive prefix sum of [w*x | w] along the chunk, then the per-segment
   totals are extracted at segment-last rows. The extraction itself needs a
   (W, CHUNK) selection matmul (rows at dynamic positions cannot be
   gathered any other way on TPU), so the scan can only ever ADD work on
   top of the one-hot pass — measured here to quantify by how much.
3. ``staircase`` — the scan-free variant of the same idea: a `<=` compare
   builds the staircase matrix sel[p, e] = (id[e] <= p) (same build cost as
   the one-hot's `==` compare), ONE identical-shape MXU pass computes
   prefix-to-p sums directly, and a sublane roll-subtract recovers the
   per-segment totals. Algebraically the one-hot pass factored differently:
   any win/loss isolates the marginal cost of the roll-subtract epilogue.

Run on the TPU:  python scripts/segscan_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("SEGSCAN_INTERPRET", "0") == "1":
    # True-CPU interpret mode: the sitecustomize force-registers the
    # tunneled TPU plugin before env vars can act, so set the config knob
    # (interpret mode on the TPU backend would run the dot_generals at the
    # backend's default bf16 matmul precision and muddy the correctness
    # comparison).
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = int(os.environ.get("GASFM_CHUNK", "512"))
W = 128
D = 32
DW = D + 8  # [w*x (D) | w (1, padded to 8)] lanes


def _make_stream(n_chunks: int, seed: int = 0):
    """Synthetic blocked point-major stream: sorted local ids per chunk."""
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, W, size=(n_chunks, CHUNK)), axis=1).astype(np.int32)
    wb = np.arange(n_chunks, dtype=np.int32) // 4  # 4 chunks per window block
    x = rng.standard_normal((n_chunks * CHUNK, DW)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(wb), jnp.asarray(x)


# ---------------------------------------------------------------------------
# 1. production one-hot pass
# ---------------------------------------------------------------------------


def _onehot_kernel(wb_ref, ids_ref, x_ref, out_ref):
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[pl.ds(c % 8, 1), :]  # (1, CHUNK) lane-packed row
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    ohT = (ids == iota).astype(jnp.float32)  # (W, CHUNK)
    out_ref[:] += jax.lax.dot_general(
        ohT, x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _onehot_bf16_kernel(wb_ref, ids_ref, x_ref, out_ref):
    """One-hot pass with bf16 operands (one-hot exact in bf16; x rounds)."""
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[pl.ds(c % 8, 1), :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    ohT = (ids == iota).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        ohT, x_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_only_kernel(wb_ref, ids_ref, x_ref, out_ref):
    """The MXU pass with a CONSTANT selection operand: isolates dot + DMA
    (no id fetch, no compare, no dtype convert)."""
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 1)
    ohT = (iota_c % W == iota_r).astype(jnp.float32)  # constant, hoistable
    out_ref[:] += jax.lax.dot_general(
        ohT, x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stream_only_kernel(wb_ref, ids_ref, x_ref, out_ref):
    """No W-shaped work at all: just stream the x block through. Isolates
    per-grid-step overhead + input DMA."""
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += x_ref[0:1, :] * 1e-30


def _no_accum_kernel(wb_ref, ids_ref, x_ref, out_ref):
    """Full one-hot pass but OVERWRITING the output (no read-modify-write
    chain across grid steps): isolates the serial accumulation dependency."""
    c = pl.program_id(0)
    ids = ids_ref[pl.ds(c % 8, 1), :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    ohT = (ids == iota).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        ohT, x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stream_bf16_kernel(wb_ref, ids_ref, x_ref, out_ref):
    """Full one-hot pass with the x stream STORED bf16 (half the HBM
    bytes): tests the streaming-bound hypothesis — if the kernels are
    stream-bound, halving storage should cut ~half the floor."""
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[pl.ds(c % 8, 1), :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    ohT = (ids == iota).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        ohT, x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _build_only_kernel(wb_ref, ids_ref, x_ref, out_ref):
    """One-hot build + a cheap VPU consume (no MXU pass): isolates the id
    fetch + compare + convert cost."""
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[pl.ds(c % 8, 1), :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    ohT = (ids == iota).astype(jnp.float32)
    deg = jnp.sum(ohT, axis=1, keepdims=True)  # (W, 1) VPU reduce
    out_ref[:] += deg + x_ref[0:1, :] * 0.0


# ---------------------------------------------------------------------------
# 2. segmented scan: log-step sublane rolls, then segment-last extraction
# ---------------------------------------------------------------------------


def _scan_kernel(wb_ref, ids_ref, x_ref, out_ref):
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]  # (CHUNK, DW)
    # Inclusive prefix sum along sublanes: log2(CHUNK) shifted adds. The
    # shift direction: row e accumulates rows <= e.
    s = x
    k = 1
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    while k < CHUNK:
        shifted = pltpu.roll(s, k, 0)
        s = s + jnp.where(row >= k, shifted, 0.0)
        k *= 2
    # Extraction: prefix-to-p selection (id[e] <= p AND e is last with that
    # property == the staircase row evaluated at segment-last positions).
    ids = ids_ref[pl.ds(c % 8, 1), :]  # (1, CHUNK)
    nxt = pltpu.roll(ids, CHUNK - 1, 1)  # id[e+1] with wraparound
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    is_last = jnp.logical_or(col == CHUNK - 1, nxt != ids)  # (1, CHUNK)
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    sel = jnp.logical_and(is_last, ids == iota).astype(jnp.float32)  # (W, CHUNK)
    tot = jax.lax.dot_general(
        sel, s, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (W, DW) prefix sums at segment-last rows (0 rows for absent ids)
    # Per-segment totals: subtract the previous PRESENT segment's prefix.
    # Running max of tot's prefix along sublanes turns absent rows into the
    # previous present row's prefix... cheapest exact form: forward-fill via
    # log-step max on the per-row "prefix count" is overkill here — instead
    # subtract using the prefix BEFORE the segment's first edge, extracted
    # with the mirrored first-edge selector.
    prv = pltpu.roll(ids, 1, 1)  # id[e-1]
    is_first = jnp.logical_or(col == 0, prv != ids)
    self_before = pltpu.roll(s, 1, 0)  # prefix before row e
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) > 0
    before = jnp.where(row_ok, self_before, 0.0)
    sel_f = jnp.logical_and(is_first, ids == iota).astype(jnp.float32)
    base = jax.lax.dot_general(
        sel_f, before, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += tot - base


# ---------------------------------------------------------------------------
# 3. staircase matmul (scan-free prefix extraction)
# ---------------------------------------------------------------------------


def _staircase_kernel(wb_ref, ids_ref, x_ref, out_ref):
    c = pl.program_id(0)
    wb = wb_ref[c]
    first = jnp.logical_or(c == 0, wb_ref[jnp.maximum(c - 1, 0)] != wb)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[pl.ds(c % 8, 1), :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    stair = (ids <= iota).astype(jnp.float32)  # (W, CHUNK) staircase
    pref = jax.lax.dot_general(
        stair, x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (W, DW): prefix-to-p chunk sums
    shifted = pltpu.roll(pref, 1, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    seg = pref - jnp.where(row > 0, shifted, 0.0)
    out_ref[:] += seg


def _build(kernel, n_chunks, n_blocks, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda c, wb_ref: (c // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, DW), lambda c, wb_ref: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, DW), lambda c, wb_ref: (wb_ref[c], 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * W, DW), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(lambda w, i, xx: f(w, i, xx))


def _pad_ids(ids):
    n_chunks = ids.shape[0]
    rows8 = -(-n_chunks // 8) * 8
    return jnp.pad(ids, ((0, rows8 - n_chunks), (0, 0)))


def main():
    interpret = os.environ.get("SEGSCAN_INTERPRET", "0") == "1"
    n_chunks = 512  # 256K edges
    n_blocks = int(n_chunks // 4)
    ids, wb, x = _make_stream(n_chunks)
    ids_p = _pad_ids(ids)

    kernels = {
        "onehot": _onehot_kernel,
        "staircase": _staircase_kernel,
        "scan": _scan_kernel,
    }
    if os.environ.get("SEGSCAN_DECOMPOSE", "0") == "1":
        kernels = {
            "onehot": _onehot_kernel,
            "onehot_bf16": _onehot_bf16_kernel,
            "dot_only": _dot_only_kernel,
            "build_only": _build_only_kernel,
            "stream_only": _stream_only_kernel,
            "no_accum": _no_accum_kernel,
            "stream_bf16": _stream_bf16_kernel,
        }
    # Correctness first (skipped for the decomposition variants, which
    # intentionally compute different things).
    if os.environ.get("SEGSCAN_DECOMPOSE", "0") != "1":
        ref = None
        for name, k in kernels.items():
            out = np.asarray(_build(k, n_chunks, n_blocks, interpret)(wb, ids_p, x))
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
                print(f"{name}: max rel err vs onehot = {err:.2e}")
    if interpret:
        print("interpret-mode correctness check done (run on TPU for timings)")
        return

    # Steady-state timing: K kernel sweeps inside ONE jitted lax.scan (the
    # tunnel's per-dispatch latency would otherwise dominate a single
    # ~1 ms sweep), consuming the previous output so sweeps serialize.
    K = 20
    reps = 5
    for name, k in kernels.items():
        f = _build(k, n_chunks, n_blocks)
        x_in = x.astype(jnp.bfloat16) if name == "stream_bf16" else x

        @jax.jit
        def many(w, i, xx):
            def body(carry, _):
                out = f(w, i, xx + carry * 1e-30)
                return jnp.sum(out[0, 0:1]), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        float(many(wb, ids_p, x_in))
        t0 = time.perf_counter()
        for _ in range(reps):
            c = many(wb, ids_p, x_in)
        float(c)
        dt = (time.perf_counter() - t0) / (reps * K)
        print(f"{name:10s}: {dt * 1e6 / n_chunks:7.3f} us/chunk "
              f"({n_chunks * CHUNK / dt / 1e6:8.1f} M edges/s)")


if __name__ == "__main__":
    main()
