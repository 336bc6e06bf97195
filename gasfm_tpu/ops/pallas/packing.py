"""Lane-packed edge-stream layout: 4 edges per 128-lane row.

Why: (E, D) f32 edge streams with D = 32 are physically padded to 128 lanes
by the TPU's T(8,128) HBM tiling, so every DMA and every XLA elementwise op
moves 4x the logical bytes. Round-2 cost isolation (BENCHLOG section 8)
showed the fused kernels sit entirely at this DMA floor: a copy of the
padded (CHUNK, 32) block costs 1.84 us/chunk vs 0.43 us lane-packed. Storing
the stream as (E/PACK, PACK*D) removes the padding; the measured in-kernel
unpack+repack (pltpu.roll + slice + concat; scripts/kernel_pack_slice.py)
costs ~0.12 us/chunk on top of the packed copy floor.

Packed convention (PACK = 4): packed row ``c*(CHUNK/4) + r``, lane group k
holds edge ``c*CHUNK + k*(CHUNK/4) + r`` — i.e. within each chunk, lane
group k stores the k-th quarter of the chunk's edges. This keeps quarter
boundaries of every per-edge (W, CHUNK) one-hot 128-lane-aligned
(CHUNK/4 = 128 at the default CHUNK = 512) and leaves the lane-packed
(E/CHUNK, CHUNK) id rows of round 2 unchanged.

Mosaic notes (measured/validated on v5e): the straight
(rows, 128) -> (CHUNK, D) reshape is rejected ("unsupported shape cast");
lane-slice + sublane-concat is rejected ("result/input offset mismatch on
non-concat dimension"); rolling each lane group to offset 0 BEFORE slicing
compiles and is fast. pltpu.roll requires a non-negative shift.

Reference parity note: the reference has no analogue — torch/PyG stores
edge streams row-major unpadded and its CUDA kernels gather rows directly.
This layout is the TPU-native equivalent of "don't pay for padding".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

PACK = 4


def stream_dtype():
    """Storage dtype of the packed inter-layer edge streams.

    ``GASFM_STREAM_DTYPE=bf16`` stores the packed streams (and their
    cotangents) in bfloat16 — HALVING the per-chunk HBM stream volume that
    BENCHLOG section 20 measures as the fused kernels' binding floor. All
    in-kernel math stays f32 (streams upcast on load, downcast on store);
    tables, parameters, gradients-of-parameters and the unpacked boundary
    layers stay f32. This rounds activations (and activation cotangents) to
    bf16 once per layer — standard mixed-precision training behavior,
    OFF by default for bit-level parity with the reference.

    Read at trace time (like GASFM_KERNEL_MODE): changing the env var does
    not invalidate already-jitted callables.
    """
    import os

    return (
        jnp.bfloat16
        if os.environ.get("GASFM_STREAM_DTYPE", "f32") == "bf16"
        else jnp.float32
    )


def packable(n_feat: int, chunk: int) -> bool:
    """Whether the packed layout applies to an edge stream of width n_feat.

    Gated to D = 32 (the flagship/learning GASFM width, 4*32 = 128 lanes
    exactly) and chunks whose quarters are whole vregs (Q % 128 == 0 keeps
    the per-quarter id-row slices in fused_proj_update vreg-aligned).
    """
    return n_feat == 32 and chunk % (128 * PACK) == 0


def packed_rows(E: int) -> int:
    assert E % PACK == 0
    return E // PACK


def packed_streams_enabled(n_feat: int, chunk: int) -> bool:
    """Trace-time gate for the packed edge-stream model path: Pallas kernels
    active, the stream width is packable at this graph's chunk, and
    GASFM_PACKED != 0 (the env kill-switch exists for A/B perf runs)."""
    import os

    from gasfm_tpu.ops.segment import _kernels_enabled

    if os.environ.get("GASFM_PACKED", "1") == "0":
        return False
    return _kernels_enabled() and packable(n_feat, chunk)


# ---------------------------------------------------------------------------
# XLA-side relayout (used once at the packed-region boundaries)
# ---------------------------------------------------------------------------


def pack_edges(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(E, D) -> (E/PACK, PACK*D) in the per-chunk quarter convention."""
    E, D = x.shape
    assert E % chunk == 0 and chunk % PACK == 0
    q = chunk // PACK
    return (
        x.reshape(E // chunk, PACK, q, D)
        .swapaxes(1, 2)
        .reshape(E // PACK, PACK * D)
    )


def unpack_edges(p: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(E/PACK, PACK*D) -> (E, D): inverse of :func:`pack_edges`."""
    rows, pd = p.shape
    D = pd // PACK
    q = chunk // PACK
    E = rows * PACK
    assert E % chunk == 0
    return (
        p.reshape(E // chunk, q, PACK, D)
        .swapaxes(1, 2)
        .reshape(E, D)
    )


# ---------------------------------------------------------------------------
# In-kernel relayout (Pallas TPU; also correct under interpret mode)
# ---------------------------------------------------------------------------


def unpack_tile(p: jnp.ndarray) -> jnp.ndarray:
    """(Q, PACK*D) packed tile -> (PACK*Q, D) edge-major tile.

    Each lane group is rotated to lane offset 0 before slicing — Mosaic
    cannot concat vregs whose lane offsets differ, but offset-0 slices
    concat cleanly along sublanes.
    """
    q, pd = p.shape
    D = pd // PACK
    quarters = []
    for k in range(PACK):
        r = pltpu.roll(p, pd - k * D, 1) if k else p
        quarters.append(r[:, 0:D])
    return jnp.concatenate(quarters, axis=0)


def repack_tile(x: jnp.ndarray) -> jnp.ndarray:
    """(PACK*Q, D) edge-major tile -> (Q, PACK*D) packed tile."""
    e, D = x.shape
    q = e // PACK
    pd = PACK * D
    out = None
    for k in range(PACK):
        yk = x[k * q : (k + 1) * q, :]
        ypad = jnp.pad(yk, ((0, 0), (0, pd - D)))
        r = pltpu.roll(ypad, k * D, 1) if k else ypad
        out = r if out is None else out + r
    return out


def place_quarters(quarters) -> jnp.ndarray:
    """[(Q, D)] * PACK -> (Q, PACK*D): pad + roll each quarter into its lane
    group and sum (repack for values already materialized per quarter)."""
    D = quarters[0].shape[1]
    pd = PACK * D
    out = None
    for k, yk in enumerate(quarters):
        ypad = jnp.pad(yk, ((0, 0), (0, pd - D)))
        r = pltpu.roll(ypad, k * D, 1) if k else ypad
        out = r if out is None else out + r
    return out


def lane_group(p: jnp.ndarray, k: int, D: int) -> jnp.ndarray:
    """Lane group k of a packed tile as an offset-0 (Q, D) value."""
    pd = p.shape[1]
    r = pltpu.roll(p, pd - k * D, 1) if k else p
    return r[:, 0:D]


# ---------------------------------------------------------------------------
# Block-diagonal weights: dense per-edge linear maps applied in packed space
# ---------------------------------------------------------------------------


def blockdiag(w: jnp.ndarray) -> jnp.ndarray:
    """(Din, Dout) -> (PACK*Din, PACK*Dout) block-diagonal replication.

    ``packed_x @ blockdiag(w)`` applies ``x @ w`` to each lane group — one
    full-lane MXU pass instead of PACK quarter-utilized ones.
    """
    din, dout = w.shape
    eye = jnp.eye(PACK, dtype=w.dtype)
    # (PACK, PACK, Din, Dout) -> (PACK*Din, PACK*Dout)
    return (
        (eye[:, :, None, None] * w[None, None, :, :])
        .transpose(0, 2, 1, 3)
        .reshape(PACK * din, PACK * dout)
    )


def tile_row(v: jnp.ndarray) -> jnp.ndarray:
    """(1, D) -> (1, PACK*D): per-edge row vector tiled across lane groups."""
    return jnp.tile(v, (1, PACK))


def sum_diag_blocks(m: jnp.ndarray, din: int, dout: int) -> jnp.ndarray:
    """(PACK*Din, PACK*Dout) -> (Din, Dout): sum of the diagonal blocks.

    Inverse contraction of :func:`blockdiag` for weight gradients:
    ``dW = sum_k packed_x_k^T @ packed_g_k``.
    """
    blocks = m.reshape(PACK, din, PACK, dout)
    return sum(blocks[k, :, k, :] for k in range(PACK))


def sum_lane_groups(v: jnp.ndarray, D: int) -> jnp.ndarray:
    """(R, PACK*D) -> (R, D): sum across the PACK lane groups (XLA side)."""
    r = v.shape[0]
    return v.reshape(r, PACK, D).sum(axis=1)
