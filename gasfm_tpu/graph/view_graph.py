"""Edge-centric, statically-shaped view-graph container.

This replaces the reference's per-sample rebuilt sparse structures — the
custom ``SparseMat`` (reference: code/utils/sparse_utils.py:392-449) and the
four ``AxialAggregationGraphWrapper`` PyG edge lists (reference:
code/utils/dataset_utils.py:464-597, code/datasets/SceneData.py:136-239) —
with a single immutable pytree of padded, bucket-capped arrays.

TPU rationale: XLA traces once per shape. The reference rebuilds the graph on
the host for every training sample because view subsampling changes the
sparsity pattern (reference: code/datasets/ScenesDataSet.py:30-48). Here the
(views, points, edges) counts are padded up to bucketed caps so the jitted
train/eval steps are compiled once per bucket and reused across scenes and
samples. Padded edges carry segment id == num_segments and are dropped by the
segment reductions; padded views/points are masked.

Conventions:
- Edges are stored in row-major (camera-major) order — the same order a
  coalesced COO of the measurement matrix produces in the reference — so
  per-camera segment ids are sorted ascending. ``pt_order`` holds a
  precomputed permutation that sorts edges by point id, giving sorted segment
  ids for the per-point aggregations as well.
- ``uv`` holds the *normalized* (N-matrix-applied) 2D observations, i.e. the
  values of the reference's ``data.x`` SparseMat
  (reference: code/utils/dataset_utils.py:116-156 ``M2sparse(normalize=True)``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gasfm_tpu.utils.constants import MIN_N_POINTS_PER_VIEW, MIN_N_VIEWS_PER_POINT


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


def bucket_size(x: int, multiple: int, growth: float = 1.3) -> int:
    """Smallest padded capacity >= x on a geometric grid, aligned to `multiple`.

    Geometric bucketing bounds both padding waste (< `growth`x) and the number
    of distinct compiled shapes (log-many).
    """
    x = max(int(x), 1)
    base = multiple
    while base < x:
        base = _round_up(int(math.ceil(base * growth)), multiple)
    return base


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ViewGraph:
    """Static-shape bipartite camera x point graph over valid observations."""

    # Per-edge arrays, length E (capacity):
    uv: jnp.ndarray  # (E, 2) float32 normalized 2D observations
    cam_idx: jnp.ndarray  # (E,) int32 in [0, M); padded edges hold M
    pt_idx: jnp.ndarray  # (E,) int32 in [0, N); padded edges hold N
    edge_mask: jnp.ndarray  # (E,) bool
    pt_order: jnp.ndarray  # (E,) int32 permutation sorting edges by pt_idx

    # Per-view / per-point masks, lengths M / N (capacities):
    cam_mask: jnp.ndarray  # (M,) bool — view exists
    pt_mask: jnp.ndarray  # (N,) bool — point exists
    cam_valid: jnp.ndarray  # (M,) bool — >= MIN_N_POINTS_PER_VIEW observations
    pt_valid: jnp.ndarray  # (N,) bool — >= MIN_N_VIEWS_PER_POINT observations

    # True (unpadded) sizes as traced scalars:
    m_true: jnp.ndarray  # () int32
    n_true: jnp.ndarray  # () int32
    e_true: jnp.ndarray  # () int32

    @property
    def num_cams(self) -> int:
        return self.cam_mask.shape[0]

    @property
    def num_pts(self) -> int:
        return self.pt_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def pts_per_cam(self) -> jnp.ndarray:
        """(M,) observation count per view (reference SparseMat.pts_per_cam)."""
        ones = self.edge_mask.astype(jnp.int32)
        return jax.ops.segment_sum(ones, self.cam_idx, num_segments=self.num_cams)

    @property
    def cam_per_pts(self) -> jnp.ndarray:
        """(N,) observation count per point (reference SparseMat.cam_per_pts)."""
        ones = self.edge_mask.astype(jnp.int32)
        return jax.ops.segment_sum(ones, self.pt_idx, num_segments=self.num_pts)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneGraph:
    """A graph plus the per-scene camera-side arrays the model & loss need."""

    graph: ViewGraph
    Ns: jnp.ndarray  # (M, 3, 3) normalization matrices (inv(K) if calibrated)
    Ns_inv: jnp.ndarray  # (M, 3, 3)
    Ps_gt: jnp.ndarray  # (M, 3, 4) GT cameras (zero-padded)
    gt_depths: Optional[jnp.ndarray] = None  # (E,) per-edge GT depths or None


def build_view_graph(
    M: np.ndarray,
    Ns: np.ndarray,
    caps: Optional[Tuple[int, int, int]] = None,
    cam_multiple: int = 8,
    pt_multiple: int = 256,
    edge_multiple: int = 512,
    growth: float = 1.3,
) -> ViewGraph:
    """Host-side construction from a (2m, n) measurement matrix.

    `caps` optionally pins (M_cap, N_cap, E_cap); otherwise bucketed caps are
    derived. Mirrors the reference's M2sparse + validity semantics
    (reference: code/utils/dataset_utils.py:86-156).
    """
    from gasfm_tpu.geometry.np_geo import get_M_valid_points, normalize_M

    M = np.asarray(M, dtype=np.float32)
    m = M.shape[0] // 2
    n = M.shape[1]
    valid = get_M_valid_points(M)  # (m, n) bool
    norm_M = normalize_M(M, np.asarray(Ns, dtype=np.float32), valid)  # (m, n, 2)

    rows, cols = np.nonzero(valid)  # row-major order
    e = rows.shape[0]

    if caps is None:
        m_cap = bucket_size(m, cam_multiple, growth)
        n_cap = bucket_size(n, pt_multiple, growth)
        e_cap = bucket_size(e, edge_multiple, growth)
    else:
        m_cap, n_cap, e_cap = caps
        assert m_cap >= m and n_cap >= n and e_cap >= e, (
            f"caps {caps} too small for scene with (m={m}, n={n}, e={e})"
        )

    uv = np.zeros((e_cap, 2), dtype=np.float32)
    uv[:e] = norm_M[rows, cols]
    cam_idx = np.full((e_cap,), m_cap, dtype=np.int32)
    cam_idx[:e] = rows
    pt_idx = np.full((e_cap,), n_cap, dtype=np.int32)
    pt_idx[:e] = cols
    edge_mask = np.zeros((e_cap,), dtype=bool)
    edge_mask[:e] = True

    pt_order = np.argsort(pt_idx, kind="stable").astype(np.int32)

    cam_mask = np.zeros((m_cap,), dtype=bool)
    cam_mask[:m] = True
    pt_mask = np.zeros((n_cap,), dtype=bool)
    pt_mask[:n] = valid.any(axis=0)

    pts_per_cam = valid.sum(axis=1)
    cam_per_pts = valid.sum(axis=0)
    cam_valid = np.zeros((m_cap,), dtype=bool)
    cam_valid[:m] = pts_per_cam >= MIN_N_POINTS_PER_VIEW
    pt_valid = np.zeros((n_cap,), dtype=bool)
    pt_valid[:n] = cam_per_pts >= MIN_N_VIEWS_PER_POINT

    return ViewGraph(
        uv=jnp.asarray(uv),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        edge_mask=jnp.asarray(edge_mask),
        pt_order=jnp.asarray(pt_order),
        cam_mask=jnp.asarray(cam_mask),
        pt_mask=jnp.asarray(pt_mask),
        cam_valid=jnp.asarray(cam_valid),
        pt_valid=jnp.asarray(pt_valid),
        m_true=jnp.asarray(m, dtype=jnp.int32),
        n_true=jnp.asarray(n, dtype=jnp.int32),
        e_true=jnp.asarray(e, dtype=jnp.int32),
    )


def build_scene_graph(
    M: np.ndarray,
    Ns: np.ndarray,
    Ps_gt: np.ndarray,
    caps: Optional[Tuple[int, int, int]] = None,
    gt_depths_dense: Optional[np.ndarray] = None,
    **bucket_kwargs,
) -> SceneGraph:
    graph = build_view_graph(M, Ns, caps=caps, **bucket_kwargs)
    m_cap = graph.num_cams
    m = Ps_gt.shape[0]
    Ns = np.asarray(Ns, dtype=np.float32)
    Ps_gt = np.asarray(Ps_gt, dtype=np.float32)

    Ns_pad = np.tile(np.eye(3, dtype=np.float32), (m_cap, 1, 1))
    Ns_pad[:m] = Ns
    Ns_inv_pad = np.tile(np.eye(3, dtype=np.float32), (m_cap, 1, 1))
    Ns_inv_pad[:m] = np.linalg.inv(Ns.astype(np.float64)).astype(np.float32)
    Ps_pad = np.zeros((m_cap, 3, 4), dtype=np.float32)
    Ps_pad[:m] = Ps_gt

    gt_depths = None
    if gt_depths_dense is not None:
        cam_np = np.asarray(graph.cam_idx)
        pt_np = np.asarray(graph.pt_idx)
        mask_np = np.asarray(graph.edge_mask)
        vals = np.zeros((graph.num_edges,), dtype=np.float32)
        vals[mask_np] = np.asarray(gt_depths_dense, dtype=np.float32)[
            cam_np[mask_np], pt_np[mask_np]
        ]
        gt_depths = jnp.asarray(vals)

    return SceneGraph(
        graph=graph,
        Ns=jnp.asarray(Ns_pad),
        Ns_inv=jnp.asarray(Ns_inv_pad),
        Ps_gt=jnp.asarray(Ps_pad),
        gt_depths=gt_depths,
    )
