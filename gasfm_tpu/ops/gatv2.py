"""Functional GATv2-style segment attention core.

Semantics match PyG ``GATv2Conv(add_self_loops=False, share_weights=False,
concat=True)`` as used by the reference (code/models/layers.py:304-309,
401-406, 506-526) restricted to the star graphs the reference builds: all
source nodes of a segment attend into one aggregation node.

Given per-edge source features already transformed by the source linear map
(``xl``) and per-segment query features transformed by the target linear map
(``xr``), one attention head computes

    score_e = att_h . LeakyReLU(xl_e + xr_seg(e), 0.2)
    alpha   = segment_softmax(score)
    out_s   = sum_e alpha_e * xl_e

This functional core is the contract the Pallas TPU kernel implements; the
XLA composition here is the correctness oracle.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from gasfm_tpu.ops.segment import gather_segments, segment_softmax, segment_sum


def gatv2_attend(
    xl: jnp.ndarray,  # (E, H, C) transformed source features
    xr: jnp.ndarray,  # (S, H, C) transformed per-segment query features
    att: jnp.ndarray,  # (H, C) attention vectors
    seg_ids: jnp.ndarray,  # (E,) target segment per edge (num_segments = trash)
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Returns (S, H, C) attention-aggregated source features per segment."""
    g = xl + gather_segments(xr, seg_ids, num_segments)  # (E, H, C)
    g = jnp.where(g >= 0, g, negative_slope * g)  # LeakyReLU(0.2)
    logits = jnp.sum(g * att[None, :, :], axis=-1)  # (E, H)
    w = segment_softmax(
        logits, seg_ids, num_segments, edge_mask=edge_mask, indices_are_sorted=indices_are_sorted
    )  # (E, H)
    out = segment_sum(
        w[:, :, None] * xl, seg_ids, num_segments, edge_mask=edge_mask,
        indices_are_sorted=indices_are_sorted,
    )  # (S, H, C)
    return out
