"""Dispatch for the 4-way gather-broadcast edge update.

Parity surface: reference ``GraphAttnSfMProjectionFeatureUpdate``
(code/models/layers.py:873-956) / ``SetOfSetProjectionFeatureUpdate``
(layers.py:129-147): ``out_e = (pe_e + ps[pt_e] + pv[cam_e] + pg) / 4``.

On TPU this routes through the single fused Pallas kernel pair
(gasfm_tpu/ops/pallas/fused_update.py); otherwise it composes the generic
gather path. The fused path is safe under edge partitioning: its forward
only gathers replicated tables, and its backward emits shard-local partial
table gradients, which the trailing global psum of the sharded train step
(gasfm_tpu/parallel/edge_sharding.py) turns into exact gradients — the same
contract as the composite path.
"""

from __future__ import annotations

import jax.numpy as jnp

from gasfm_tpu.graph.view_graph import ViewGraph, WINDOW
from gasfm_tpu.ops.segment import _kernel_interpret, _kernels_enabled, gather_segments

from gasfm_tpu.ops.segment import _DENSE_MAX_SEGMENTS  # one authoritative cutoff


def edge_combine(
    pe: jnp.ndarray,  # (E, D) per-edge linear output
    ps: jnp.ndarray,  # (N, D) point-table linear output
    pv: jnp.ndarray,  # (M, D) camera-table linear output
    pg: jnp.ndarray,  # (1, D) global linear output
    graph: ViewGraph,
) -> jnp.ndarray:
    window = graph.pt_segment_windows()
    if (
        _kernels_enabled()
        and window is not None
        and pe.dtype == jnp.float32
        and pe.shape[0] % graph.chunk == 0
        and graph.num_cams <= _DENSE_MAX_SEGMENTS
    ):
        from gasfm_tpu.ops.pallas.fused_update import fused_edge_combine

        from gasfm_tpu.ops.segment import get_kernel_precision

        return fused_edge_combine(
            pe, ps, pv, pg,
            graph.pt_idx.astype(jnp.int32).reshape(-1, graph.chunk),
            graph.cam_idx.astype(jnp.int32).reshape(-1, graph.chunk),
            window.block,
            graph.num_pts, graph.num_cams, WINDOW,
            _kernel_interpret(), get_kernel_precision(),
        )
    return (
        pe
        + gather_segments(ps, graph.pt_idx, graph.num_pts, window=window)
        + gather_segments(pv, graph.cam_idx, graph.num_cams)
        + pg
    ) / 4.0
