"""Model building blocks (flax.linen) over the edge-centric graph.

Behavioral parity surface: reference code/models/layers.py (1015 LoC). Every
module documents the reference symbol it reproduces. Architectural
differences are TPU-driven only: aggregations run as masked segment
reductions over the padded edge arrays instead of PyG message passing, and
all shapes are static.

Initializer parity: torch ``nn.Linear`` default init (uniform
+-1/sqrt(fan_in) for weight and bias) for plain linears; PyG's Glorot with
zero bias for the GATv2 linears/attention (PyG GATv2Conv defaults).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gasfm_tpu.graph.view_graph import ViewGraph
from gasfm_tpu.ops.edge_update import edge_combine
from gasfm_tpu.ops.gatv2 import gatv2_attend, gatv2_attend_pool
from gasfm_tpu.ops.segment import gather_segments, masked_mean, segment_mean

LN_EPS = 1e-5  # torch nn.LayerNorm default


class PendingUpdate(NamedTuple):
    """A layer's projection update, DEFERRED: the ingredients of

        e_l = (en @ w_e [+ skip2-part] + b + ps[pt] + pv[cam] + pg) / 4
              [+ res]

    handed to the NEXT layer so its frontend can materialize e_l inside the
    merged Pallas kernel (ops/pallas/fused_layer_step.py) — one launch for
    update_l + frontend_{l+1}, shared one-hots, no e_l HBM round trip
    between separate kernels. All fields are plain arrays (packed streams /
    tables / weight slices), so the hand-off crosses flax module boundaries
    without moving any parameters."""

    en: object  # (E/4, 128) packed normalized edge stream
    skip2: Optional[object]  # packed init-skip stream or None
    res: Optional[object]  # packed residual stream (e_{l-1}) or None
    w_e: object  # (De, De) lin_proj rows for en
    b: object  # (De,)
    w_uv: Optional[object]  # (D2, De) lin_proj rows for the skip stream
    ps: object  # (N, De) point-table linear output
    pv: object  # (M, De) camera-table linear output
    pg: object  # (1, De) global linear output


def _torch_uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Linear layer with torch nn.Linear default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        bound = 1.0 / math.sqrt(in_dim)
        kernel = self.param("kernel", _torch_uniform_init(bound), (in_dim, self.features))
        if kernel.dtype == jnp.bfloat16:
            # bf16 param storage (train.param_dtype): run the dot natively in
            # bf16 with f32 accumulation — a promoted f32 x bf16 dot would
            # materialize an f32 copy of the kernel per use, re-paying the
            # weight traffic the bf16 storage is meant to halve.
            y = jax.lax.dot_general(
                x.astype(jnp.bfloat16), kernel,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", _torch_uniform_init(bound), (self.features,))
            y = y + bias
        return y


class DenseParams(nn.Module):
    """The parameters of a TorchDense, materialized without applying it.

    Param names/shapes/init are identical to :class:`TorchDense`, so a
    module named e.g. ``lin_proj`` produces the same checkpoint tree whether
    the matmul runs in XLA (TorchDense) or inside a fused Pallas kernel
    (packed edge streams never materialize the (E, in_dim) operand).
    """

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        bound = 1.0 / math.sqrt(self.in_dim)
        kernel = self.param("kernel", _torch_uniform_init(bound), (self.in_dim, self.features))
        bias = self.param("bias", _torch_uniform_init(bound), (self.features,))
        return kernel, bias


def layer_norm(name: Optional[str] = None) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LN_EPS, name=name)


class MLPStack(nn.Module):
    """Parity: reference ``get_linear_layers`` (code/models/layers.py:10-44).

    feats = (d_in, ..., d_out); LayerNorm+ReLU between layers iff norm=True
    (ReLU always), optional leading/trailing activation blocks.
    """

    feats: Tuple[int, ...]
    init_activation: bool = False
    final_activation: bool = False
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        assert len(self.feats) >= 2
        if self.init_activation:
            if self.norm:
                x = layer_norm()(x)
            x = nn.relu(x)
        for i in range(len(self.feats) - 2):
            x = TorchDense(self.feats[i + 1])(x)
            if self.norm:
                x = layer_norm()(x)
            x = nn.relu(x)
        x = TorchDense(self.feats[-1])(x)
        if self.final_activation:
            if self.norm:
                x = layer_norm()(x)
            x = nn.relu(x)
        return x


def positional_embed(x: jnp.ndarray, n_freq: int) -> jnp.ndarray:
    """NeRF-style frequency embedding, include-input, log-sampled 2^k freqs.

    Parity: reference code/utils/pos_enc_utils.py:4-58 (ordering: input, then
    per-frequency sin, cos).
    """
    if n_freq <= 0:
        return x
    outs = [x]
    for k in range(n_freq):
        freq = 2.0 ** k
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)


def pos_embed_dim(in_dim: int, n_freq: int) -> int:
    return in_dim if n_freq <= 0 else in_dim * (1 + 2 * n_freq)


class EmbeddingLayer(nn.Module):
    """Parity: reference ``EmbeddingLayer`` (code/models/layers.py:992-1015)."""

    pos_emb_n_freq: int
    post_embed_proj_dim: Optional[int] = None  # -1 => keep embedding width

    @nn.compact
    def __call__(self, x):
        x = positional_embed(x, self.pos_emb_n_freq)
        if self.post_embed_proj_dim is not None:
            d = x.shape[-1] if self.post_embed_proj_dim == -1 else self.post_embed_proj_dim
            x = TorchDense(d, name="post_embed_lin")(x)
        return x


class GATv2SegmentConv(nn.Module):
    """PyG GATv2Conv(add_self_loops=False) over star graphs.

    Source nodes = rows of ``x_src``; each attends into its segment's single
    aggregation node whose (optional) query features are ``query``.
    Parity: PyG GATv2Conv as instantiated in reference layers.py:304-309.

    setup-style with split ``transform_src`` / ``transform_dst`` /
    ``add_bias`` methods so a parent can run the attention of TWO convs over
    the same edge set as one fused dual-direction kernel
    (gasfm_tpu/ops/pallas/fused_dual_attn.py).
    """

    in_feat: int
    out_per_head: int
    heads: int

    def setup(self):
        H, C = self.heads, self.out_per_head
        glorot = nn.initializers.glorot_uniform()
        self.lin_l_kernel = self.param("lin_l_kernel", glorot, (self.in_feat, H * C))
        self.lin_l_bias = self.param("lin_l_bias", nn.initializers.zeros, (H * C,))
        self.lin_r_kernel = self.param("lin_r_kernel", glorot, (self.in_feat, H * C))
        self.lin_r_bias = self.param("lin_r_bias", nn.initializers.zeros, (H * C,))
        self.att = self.param("att", glorot, (H, C))
        self.bias = self.param("bias", nn.initializers.zeros, (H * C,))

    def transform_src(self, x_src: jnp.ndarray) -> jnp.ndarray:
        H, C = self.heads, self.out_per_head
        return (x_src @ self.lin_l_kernel + self.lin_l_bias).reshape(-1, H, C)

    def transform_dst(self, query: Optional[jnp.ndarray], num_segments: int) -> jnp.ndarray:
        H, C = self.heads, self.out_per_head
        if query is None:
            return jnp.broadcast_to(
                self.lin_r_bias, (num_segments, H * C)
            ).reshape(num_segments, H, C)
        return (query @ self.lin_r_kernel + self.lin_r_bias).reshape(num_segments, H, C)

    def add_bias(self, out: jnp.ndarray) -> jnp.ndarray:
        num_segments = out.shape[0]
        return out.reshape(num_segments, self.heads * self.out_per_head) + self.bias

    def __call__(
        self,
        x_src: jnp.ndarray,  # (E, in_feat)
        seg_ids: jnp.ndarray,  # (E,)
        num_segments: int,
        query: Optional[jnp.ndarray] = None,  # (S, in_feat); zeros if None
        edge_mask: Optional[jnp.ndarray] = None,
        indices_are_sorted: bool = False,
        window=None,
    ) -> jnp.ndarray:
        xl = self.transform_src(x_src)
        xr = self.transform_dst(query, num_segments)
        if num_segments == 1:
            # Single-aggregation-node pool (view->global / point->global):
            # dense masked softmax + matmul; seg_ids routing invalid rows to
            # a trash segment is subsumed by the mask.
            row_mask = seg_ids == 0
            if edge_mask is not None:
                row_mask = jnp.logical_and(row_mask, edge_mask)
            from gasfm_tpu.ops.segment import current_edge_axis, is_table_sharded

            axis = current_edge_axis()
            if axis is not None and is_table_sharded():
                # Table-sharded pool: the caller already restricted
                # edge_mask to this shard's OWNED rows; combine the softmax
                # triples across shards (O(H*C) collective volume).
                from gasfm_tpu.ops.gatv2 import gatv2_attend_pool_sharded

                out = gatv2_attend_pool_sharded(xl, xr, self.att, row_mask, axis)
            else:
                out = gatv2_attend_pool(xl, xr, self.att, row_mask)
        else:
            out = gatv2_attend(
                xl, xr, self.att, seg_ids, num_segments,
                edge_mask=edge_mask, indices_are_sorted=indices_are_sorted, window=window,
            )
        return self.add_bias(out)


def default_agg_width(in_feat: int, heads: int) -> int:
    """Aggregation width defaulting rule (reference layers.py:287-291)."""
    agg = in_feat
    if agg % heads:
        agg += heads - (agg % heads)
    return agg


class QueryAdapter(nn.Module):
    """LN + ReLU (+ Linear if widths differ): the stateful-attention query
    path (reference ``norm_and_proj_*`` Sequentials, layers.py:295-303)."""

    project_to: Optional[int]  # None => no linear

    @nn.compact
    def __call__(self, x):
        x = layer_norm()(x)
        x = nn.relu(x)
        if self.project_to is not None:
            x = TorchDense(self.project_to)(x)
        return x


class AxialAttentionAggregator(nn.Module):
    """Edge->node attention aggregation with residual MLP head.

    Parity: reference ``Proj2View`` (layers.py:266-361) and
    ``Proj2ScenePoint`` (layers.py:363-458) — both have identical structure,
    differing only in which axis the segments run over; here the caller
    supplies the segment ids.
    """

    in_feat: int
    out_feat: int
    n_heads: int
    stateful: bool = True
    agg_feat: Optional[int] = None
    n_hidden_layers: int = 0
    use_norm_pre_mlp: bool = True

    def setup(self):
        agg = self.agg_feat if self.agg_feat is not None else default_agg_width(
            self.in_feat, self.n_heads
        )
        assert agg % self.n_heads == 0
        self.agg = agg
        self.query_adapter = (
            QueryAdapter(
                project_to=self.in_feat if self.in_feat != self.out_feat else None
            )
            if self.stateful
            else None
        )
        self.graph_conv = GATv2SegmentConv(self.in_feat, agg // self.n_heads, self.n_heads)
        self.proj_agg = TorchDense(self.out_feat) if agg != self.out_feat else None
        self.norm_pre_mlp = layer_norm() if self.use_norm_pre_mlp else None
        self.mlp = MLPStack(tuple([self.out_feat] * (2 + self.n_hidden_layers)), norm=False)

    def prepare(self, x_edges: jnp.ndarray, num_segments: int, prev):
        """Source/query transforms of the attention half: (xl, xr, att).
        Lets the parent run the aggregation itself (fused dual kernel)."""
        query = self.query_adapter(prev) if self.stateful else None
        xl = self.graph_conv.transform_src(x_edges)
        xr = self.graph_conv.transform_dst(query, num_segments)
        return xl, xr, self.graph_conv.att

    def query_transform(self, prev, num_segments: int):
        """Only the query half of :meth:`prepare` — the source transform runs
        inside the fused layer frontend (ops/gatv2.gatv2_layer_frontend)."""
        query = self.query_adapter(prev) if self.stateful else None
        return self.graph_conv.transform_dst(query, num_segments)

    def src_params(self):
        """(lin_l kernel, lin_l bias, att) for the fused layer frontend."""
        return self.graph_conv.lin_l_kernel, self.graph_conv.lin_l_bias, self.graph_conv.att

    def finish(self, aggregated: jnp.ndarray, prev) -> jnp.ndarray:
        """Everything after the aggregation: bias, width adapter, residual,
        LN+ReLU+MLP with second residual (reference layers.py:344-357)."""
        x = self.graph_conv.add_bias(aggregated)
        if self.proj_agg is not None:
            x = self.proj_agg(x)
        if prev is not None:
            x = prev + x

        x_skip = x
        if self.norm_pre_mlp is not None:
            x = self.norm_pre_mlp(x)
            x = nn.relu(x)
        x = self.mlp(x)
        return x_skip + x

    def __call__(
        self,
        x_edges: jnp.ndarray,  # (E, in_feat)
        seg_ids: jnp.ndarray,
        num_segments: int,
        edge_mask: jnp.ndarray,
        prev: Optional[jnp.ndarray] = None,  # (S, out_feat) iff stateful
        indices_are_sorted: bool = False,
        window=None,
    ) -> jnp.ndarray:
        assert self.stateful == (prev is not None)
        xl, xr, att = self.prepare(x_edges, num_segments, prev)
        x = gatv2_attend(
            xl, xr, att, seg_ids, num_segments,
            edge_mask=edge_mask, indices_are_sorted=indices_are_sorted, window=window,
        )
        return self.finish(x, prev)


class ViewAndScenePoint2Global(nn.Module):
    """Two single-segment attention pools (views -> global, points -> global)
    concatenated. Parity: reference layers.py:460-603."""

    n_feat_scenepoint_in: int
    n_feat_view_in: int
    n_feat_global_out: int
    n_heads: int
    stateful: bool = True
    n_feat_scenepoint2global_agg: Optional[int] = None
    n_feat_view2global_agg: Optional[int] = None
    n_hidden_layers: int = 0
    use_norm_pre_mlp: bool = True

    @nn.compact
    def __call__(
        self,
        view_features: jnp.ndarray,  # (M, dv)
        scenepoint_features: jnp.ndarray,  # (N, ds)
        cam_valid: jnp.ndarray,  # (M,) bool
        pt_valid: jnp.ndarray,  # (N,) bool
        prev_global: Optional[jnp.ndarray] = None,  # (1, dg)
    ) -> jnp.ndarray:
        assert self.stateful == (prev_global is not None)
        v2g = self.n_feat_view2global_agg or default_agg_width(self.n_feat_view_in, self.n_heads)
        s2g = self.n_feat_scenepoint2global_agg or default_agg_width(
            self.n_feat_scenepoint_in, self.n_heads
        )

        q_view = q_pt = None
        if self.stateful:
            q_view = QueryAdapter(
                project_to=self.n_feat_view_in if self.n_feat_view_in != self.n_feat_global_out else None,
                name="query_adapter_view",
            )(prev_global)
            q_pt = QueryAdapter(
                project_to=self.n_feat_scenepoint_in
                if self.n_feat_scenepoint_in != self.n_feat_global_out
                else None,
                name="query_adapter_scenepoint",
            )(prev_global)

        # One segment (id 0); invalid rows routed to the trash segment (id 1).
        view_seg = jnp.where(cam_valid, 0, 1).astype(jnp.int32)
        pt_seg = jnp.where(pt_valid, 0, 1).astype(jnp.int32)

        # The VIEW pool reduces over the replicated camera-side table, so
        # edge-axis collectives are disabled (every edge shard computes the
        # identical full reduction). The POINT pool: likewise when tables
        # are replicated; under TABLE SHARDING each shard pools only its
        # OWNED point rows and the triples combine across shards.
        from gasfm_tpu.ops.segment import (
            edge_replicated,
            is_table_sharded,
            table_shard_owned,
        )

        with edge_replicated():
            view_pooled = GATv2SegmentConv(
                self.n_feat_view_in, v2g // self.n_heads, self.n_heads,
                name="graph_conv_view2global",
            )(view_features, view_seg, 1, query=q_view, edge_mask=cam_valid)  # (1, v2g)
        pt_conv = GATv2SegmentConv(
            self.n_feat_scenepoint_in, s2g // self.n_heads, self.n_heads,
            name="graph_conv_scenepoint2global",
        )
        if is_table_sharded():
            owned = table_shard_owned()
            pt_pooled = pt_conv(
                scenepoint_features, pt_seg, 1, query=q_pt,
                edge_mask=jnp.logical_and(pt_valid, owned),
            )  # (1, s2g)
        else:
            with edge_replicated():
                pt_pooled = pt_conv(
                    scenepoint_features, pt_seg, 1, query=q_pt, edge_mask=pt_valid
                )  # (1, s2g)

        x = jnp.concatenate([view_pooled, pt_pooled], axis=1)
        if (v2g + s2g) != self.n_feat_global_out:
            x = TorchDense(self.n_feat_global_out, name="proj_global")(x)
        if prev_global is not None:
            x = prev_global + x

        x_skip = x
        if self.use_norm_pre_mlp:
            x = layer_norm(name="norm_pre_mlp")(x)
            x = nn.relu(x)
        x = MLPStack(
            tuple([self.n_feat_global_out] * (2 + self.n_hidden_layers)), norm=False, name="mlp"
        )(x)
        return x_skip + x


class GlobalBroadcastUpdate(nn.Module):
    """Global -> per-view / per-point residual broadcast update.

    Parity: reference ``Global2View`` / ``Global2ScenePoint``
    (layers.py:605-721). Disabled in all shipped confs but part of the
    capability surface.
    """

    n_feat_in_out: int
    n_hidden_layers: int = 0
    use_norm: bool = True

    @nn.compact
    def __call__(self, global_features: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
        x = prev
        if self.use_norm:
            x = layer_norm(name="node_norm")(x)
            x = nn.relu(x)
        x = TorchDense(self.n_feat_in_out, name="lin_node")(x)
        g = global_features
        if self.use_norm:
            g = layer_norm(name="global_norm")(g)
            g = nn.relu(g)
        g = TorchDense(self.n_feat_in_out, use_bias=False, name="lin_global")(g)
        x = x + g
        if self.n_hidden_layers > 0:
            x = nn.relu(x)
            x = MLPStack(
                tuple([self.n_feat_in_out] * self.n_hidden_layers + [self.n_feat_in_out]),
                norm=False,
                name="mlp",
            )(x)
        return prev + x


class GraphAttnGlobalFeatureUpdate(nn.Module):
    """Composes the three aggregators + optional global broadcasts.

    Parity: reference ``GraphAttnSfMGlobalFeatureUpdate``
    (layers.py:723-870).
    """

    n_feat_proj_in: int
    n_feat_scenepoint_out: int
    n_feat_view_out: int
    n_feat_global_out: Optional[int] = None
    n_feat_proj2scenepoint_agg: Optional[int] = None
    n_feat_proj2view_agg: Optional[int] = None
    n_feat_scenepoint2global_agg: Optional[int] = None
    n_feat_view2global_agg: Optional[int] = None
    output_global: bool = True
    n_heads: int = 1
    stateful: bool = True
    global2view_and_global2scenepoint_enabled: bool = True
    n_hidden_layers_scenepoint_update: int = 0
    n_hidden_layers_view_update: int = 0
    n_hidden_layers_global_update: int = 0
    packed_edges: bool = False  # x_edges lane-packed (requires ln_params
    #                             or raw_frontend)
    # Run the no-LN frontends on the (possibly packed) raw stream instead of
    # the composite prepare + attend_dual — identical semantics (the final
    # aggregation's source transforms consume x_edges as-is), but the fused
    # kernel path consumes the packed inter-layer stream directly, removing
    # the unpack relayout and the composite per-edge transforms.
    raw_frontend: bool = False

    @nn.compact
    def __call__(
        self,
        x_edges: jnp.ndarray,  # (E, d) edge features (see ln_params)
        graph: ViewGraph,
        prev_scenepoint_features: Optional[jnp.ndarray] = None,
        prev_view_features: Optional[jnp.ndarray] = None,
        prev_global_features: Optional[jnp.ndarray] = None,
        ln_params=None,  # (scale, bias, eps): x_edges is then RAW and the
        #                  LN + ReLU prologue fuses into the attention kernel;
        #                  the normalized features are appended to the return.
    ):
        assert not (self.packed_edges and ln_params is None and not self.raw_frontend)
        need_global = self.output_global or self.global2view_and_global2scenepoint_enabled
        if need_global:
            assert self.n_feat_global_out is not None

        # Both edge aggregations (edges->points windowed, edges->cameras
        # dense) share the edge set; gatv2_attend_dual / gatv2_layer_frontend
        # fuse them into ONE Pallas kernel per forward/backward when eligible
        # and otherwise run the composite calls with identical semantics.
        from gasfm_tpu.ops.gatv2 import gatv2_attend_dual, gatv2_layer_frontend

        proj2scenepoint = AxialAttentionAggregator(
            self.n_feat_proj_in,
            self.n_feat_scenepoint_out,
            self.n_heads,
            stateful=self.stateful,
            agg_feat=self.n_feat_proj2scenepoint_agg,
            n_hidden_layers=self.n_hidden_layers_scenepoint_update,
            name="proj2scenepoint",
        )
        proj2view = AxialAttentionAggregator(
            self.n_feat_proj_in,
            self.n_feat_view_out,
            self.n_heads,
            stateful=self.stateful,
            agg_feat=self.n_feat_proj2view_agg,
            n_hidden_layers=self.n_hidden_layers_view_update,
            name="proj2view",
        )
        assert self.stateful == (prev_scenepoint_features is not None)
        assert self.stateful == (prev_view_features is not None)
        e_prev = None
        if ln_params is not None:
            ln_scale, ln_bias, ln_eps = ln_params
            xr_p = proj2scenepoint.query_transform(prev_scenepoint_features, graph.num_pts)
            xr_c = proj2view.query_transform(prev_view_features, graph.num_cams)
            wlp, blp, att_p = proj2scenepoint.src_params()
            wlc, blc, att_c = proj2view.src_params()
            if isinstance(x_edges, PendingUpdate):
                # The previous layer deferred its projection update; run it
                # merged with this layer's frontend as one Pallas launch.
                from gasfm_tpu.ops.gatv2 import merged_layer_frontend

                assert self.packed_edges
                e_prev, x_edges, agg_p, agg_c = merged_layer_frontend(
                    x_edges, ln_scale, ln_bias, ln_eps,
                    wlp, blp, att_p, xr_p, graph.pt_idx, graph.num_pts,
                    graph.pt_segment_windows(),
                    wlc, blc, att_c, xr_c, graph.cam_idx, graph.num_cams,
                    edge_mask=graph.edge_mask,
                )
            else:
                x_edges, agg_p, agg_c = gatv2_layer_frontend(
                    x_edges, ln_scale, ln_bias, ln_eps,
                    wlp, blp, att_p, xr_p, graph.pt_idx, graph.num_pts,
                    graph.pt_segment_windows(),
                    wlc, blc, att_c, xr_c, graph.cam_idx, graph.num_cams,
                    edge_mask=graph.edge_mask, packed=self.packed_edges,
                )
        elif self.raw_frontend:
            # Final-aggregation fast path: same weights and math as
            # prepare + attend_dual (source transforms on the RAW stream),
            # but as the fused frontend with the LN/ReLU prologue skipped —
            # consumes the packed stream directly when packed_edges.
            xr_p = proj2scenepoint.query_transform(prev_scenepoint_features, graph.num_pts)
            xr_c = proj2view.query_transform(prev_view_features, graph.num_cams)
            wlp, blp, att_p = proj2scenepoint.src_params()
            wlc, blc, att_c = proj2view.src_params()
            De = self.n_feat_proj_in
            dummy_s = jnp.ones((De,), jnp.float32)
            dummy_b = jnp.zeros((De,), jnp.float32)
            if isinstance(x_edges, PendingUpdate):
                # The LAST layer deferred its projection update: materialize
                # it AND run the final aggregation in one merged Pallas
                # launch (no LN — raw_prologue).
                from gasfm_tpu.ops.gatv2 import merged_layer_frontend

                assert self.packed_edges
                _, _, agg_p, agg_c = merged_layer_frontend(
                    x_edges, dummy_s, dummy_b, LN_EPS,
                    wlp, blp, att_p, xr_p, graph.pt_idx, graph.num_pts,
                    graph.pt_segment_windows(),
                    wlc, blc, att_c, xr_c, graph.cam_idx, graph.num_cams,
                    edge_mask=graph.edge_mask, raw_prologue=True,
                )
            else:
                _, agg_p, agg_c = gatv2_layer_frontend(
                    x_edges, dummy_s, dummy_b, LN_EPS,
                    wlp, blp, att_p, xr_p, graph.pt_idx, graph.num_pts,
                    graph.pt_segment_windows(),
                    wlc, blc, att_c, xr_c, graph.cam_idx, graph.num_cams,
                    edge_mask=graph.edge_mask, packed=self.packed_edges,
                    raw_prologue=True,
                )
        else:
            xl_p, xr_p, att_p = proj2scenepoint.prepare(
                x_edges, graph.num_pts, prev_scenepoint_features
            )
            xl_c, xr_c, att_c = proj2view.prepare(x_edges, graph.num_cams, prev_view_features)
            agg_p, agg_c = gatv2_attend_dual(
                xl_p, xr_p, att_p, graph.pt_idx, graph.num_pts, graph.pt_segment_windows(),
                xl_c, xr_c, att_c, graph.cam_idx, graph.num_cams,
                edge_mask=graph.edge_mask,
            )
        scenepoint_features = proj2scenepoint.finish(agg_p, prev_scenepoint_features)
        view_features = proj2view.finish(agg_c, prev_view_features)

        global_features = None
        if need_global:
            global_features = ViewAndScenePoint2Global(
                self.n_feat_scenepoint_out,
                self.n_feat_view_out,
                self.n_feat_global_out,
                self.n_heads,
                stateful=self.stateful,
                n_feat_scenepoint2global_agg=self.n_feat_scenepoint2global_agg,
                n_feat_view2global_agg=self.n_feat_view2global_agg,
                n_hidden_layers=self.n_hidden_layers_global_update,
                name="view_and_scenepoint2global",
            )(
                view_features,
                scenepoint_features,
                graph.cam_valid,
                graph.pt_valid,
                prev_global=prev_global_features,
            )

        if self.global2view_and_global2scenepoint_enabled:
            scenepoint_features = GlobalBroadcastUpdate(
                self.n_feat_scenepoint_out,
                n_hidden_layers=self.n_hidden_layers_scenepoint_update,
                name="global2scenepoint",
            )(global_features, scenepoint_features)
            view_features = GlobalBroadcastUpdate(
                self.n_feat_view_out,
                n_hidden_layers=self.n_hidden_layers_view_update,
                name="global2view",
            )(global_features, view_features)

        if ln_params is not None:
            # x_edges is the fused-frontend's normalized edge features here;
            # e_prev is the previous layer's materialized update output when
            # the input was a PendingUpdate (merged kernel), else None.
            if not self.output_global:
                return scenepoint_features, view_features, x_edges, e_prev
            return (scenepoint_features, view_features, global_features,
                    x_edges, e_prev)
        if not self.output_global:
            return scenepoint_features, view_features
        return scenepoint_features, view_features, global_features


class ProjectionFeatureUpdate(nn.Module):
    """Fused gather-broadcast edge update
    ``(lin_p(e) + lin_s(s)[pt] + lin_v(v)[cam] + lin_g(g)) / 4``.

    Parity: reference ``GraphAttnSfMProjectionFeatureUpdate``
    (layers.py:873-956).

    Packed mode (``packed=True``): ``x_edges`` (and the optional init-skip
    stream ``skip2_p`` and residual stream ``res_p``) arrive lane-packed
    (ops/pallas/packing.py) and the whole update — including the
    ``[e | skip]`` concat, ``lin_proj``, and the residual add that the
    reference applies around it (layers.py:236-263) — runs as one Pallas
    kernel (ops/pallas/fused_proj_update.py). The parameter tree is
    identical to the unpacked path (DenseParams mirrors TorchDense).
    """

    n_feat_proj_out: int
    n_hidden_layers: int = 0
    normalize_global_features: bool = True

    @nn.compact
    def __call__(
        self,
        scenepoint_features: jnp.ndarray,  # (N, ds)
        view_features: jnp.ndarray,  # (M, dv)
        global_features: jnp.ndarray,  # (1, dg)
        x_edges: jnp.ndarray,  # (E, de) normalized; packed: (E/PACK, PACK*de)
        graph: ViewGraph,
        packed: bool = False,
        skip2_p: Optional[jnp.ndarray] = None,  # packed init-skip stream
        res_p: Optional[jnp.ndarray] = None,  # packed residual stream
        defer: bool = False,  # return PendingUpdate for the merged kernel
    ) -> jnp.ndarray:
        s, v, g = scenepoint_features, view_features, global_features
        if self.normalize_global_features:
            s = nn.relu(layer_norm(name="scenepoint_norm")(s))
            v = nn.relu(layer_norm(name="view_norm")(v))
            g = nn.relu(layer_norm(name="global_norm")(g))

        ps = TorchDense(self.n_feat_proj_out, use_bias=False, name="lin_scenepoint")(s)
        pv = TorchDense(self.n_feat_proj_out, use_bias=False, name="lin_view")(v)
        pg = TorchDense(self.n_feat_proj_out, use_bias=False, name="lin_global")(g)

        if packed:
            assert self.n_hidden_layers == 0
            from gasfm_tpu.graph.view_graph import WINDOW
            from gasfm_tpu.ops.pallas.fused_proj_update import packed_edge_update
            from gasfm_tpu.ops.pallas.packing import PACK
            from gasfm_tpu.ops.segment import _kernel_interpret

            CHUNK = graph.chunk  # per-graph chunk

            De = x_edges.shape[1] // PACK
            D2 = skip2_p.shape[1] // PACK if skip2_p is not None else 0
            kernel, bias = DenseParams(
                self.n_feat_proj_out, De + D2, name="lin_proj"
            )()
            # Pallas refs reject mixed dtypes: under bf16 param storage
            # (train.param_dtype) upcast the weight-side operands; the
            # convert fuses into the operand read (ops/gatv2._opf32).
            kernel = kernel.astype(jnp.float32)
            bias = bias.astype(jnp.float32)
            ps, pv, pg = (x.astype(jnp.float32) for x in (ps, pv, pg))
            w_e = kernel[:De]
            w_uv = kernel[De:] if D2 else None
            if defer:
                return PendingUpdate(
                    en=x_edges, skip2=skip2_p, res=res_p,
                    w_e=w_e, b=bias, w_uv=w_uv, ps=ps, pv=pv, pg=pg,
                )
            window = graph.pt_segment_windows()
            return packed_edge_update(
                x_edges, skip2_p, res_p, w_e, bias, w_uv, ps, pv, pg,
                graph.pt_idx.astype(jnp.int32).reshape(-1, CHUNK),
                graph.cam_idx.astype(jnp.int32).reshape(-1, CHUNK),
                window.block,
                graph.num_pts, graph.num_cams, WINDOW,
                interpret=_kernel_interpret(), nlive=window.nlive,
            )

        if defer:
            # Unpacked-input deferral (the FIRST layer): hand the narrow
            # normalized stream to the next layer's merged kernel packed as
            # (E/PACK, PACK*d_in) — the kernel's update matmul is
            # width-generic, so the (E, d_out) update output never
            # materializes in HBM (round-4 step anatomy: the first layer
            # cost ~0.95 ms over an interior layer, largely this unpacked
            # update + the pack relayout). Param tree identical to the
            # TorchDense path (DenseParams mirrors it).
            assert self.n_hidden_layers == 0
            from gasfm_tpu.ops.pallas.packing import pack_edges, stream_dtype

            d_in = x_edges.shape[-1]
            kernel, bias = DenseParams(self.n_feat_proj_out, d_in, name="lin_proj")()
            en_p = pack_edges(x_edges, graph.chunk).astype(stream_dtype())
            return PendingUpdate(
                en=en_p, skip2=None, res=None,
                w_e=kernel.astype(jnp.float32), b=bias.astype(jnp.float32),
                w_uv=None,
                ps=ps.astype(jnp.float32), pv=pv.astype(jnp.float32),
                pg=pg.astype(jnp.float32),
            )

        pe = TorchDense(self.n_feat_proj_out, name="lin_proj")(x_edges)
        new = edge_combine(pe, ps, pv, pg, graph)
        if self.n_hidden_layers > 0:
            new = nn.relu(new)
            new = MLPStack(
                tuple([self.n_feat_proj_out] * self.n_hidden_layers + [self.n_feat_proj_out]),
                norm=False,
                name="mlp",
            )(new)
        return new


def normalize_edge_features(
    x: jnp.ndarray, edge_mask: jnp.ndarray, norm: Optional[nn.Module]
) -> jnp.ndarray:
    """LayerNorm per edge, or masked mean-centering over valid edges.

    Parity: reference ``normalize_projection_features`` (layers.py:972-979).
    """
    if norm is not None:
        return norm(x)
    mean = masked_mean(x, edge_mask, axis=0)
    return x - mean[None, :]


class GraphAttnLayer(nn.Module):
    """One GASFM message-passing round.

    Parity: reference ``GraphAttnSfMLayer`` (layers.py:150-263): LN+ReLU on
    edge features -> global feature update -> optional init-embedding concat
    -> edge update -> residual (with projected skip when widths differ).
    """

    n_feat_proj_in: int
    n_feat_proj_out: int
    n_feat_scenepoint_hidden: int
    n_feat_view_hidden: int
    n_feat_global_hidden: int
    n_feat_proj2scenepoint_agg: Optional[int] = None
    n_feat_proj2view_agg: Optional[int] = None
    n_feat_scenepoint2global_agg: Optional[int] = None
    n_feat_view2global_agg: Optional[int] = None
    use_norm_proj_update: bool = True
    add_residual_skipconn_proj_update: bool = True
    n_feat_skipconn_init_projfeat_in: Optional[int] = None
    n_heads: int = 1
    stateful: bool = True
    global2view_and_global2scenepoint_enabled: bool = True
    n_hidden_layers_scenepoint_update: int = 0
    n_hidden_layers_view_update: int = 0
    n_hidden_layers_global_update: int = 0
    n_hidden_layers_proj_update: int = 0
    # Lane-packed edge streams end to end (ops/pallas/packing.py): the raw
    # stream, the init-skip stream, e_norm and the layer output all stay in
    # the packed layout; the skip concat + lin_proj + residual fold into the
    # packed update kernel. Requires equal in/out widths, use_norm, and no
    # proj-update MLP (the flagship/learning GASFM configuration).
    packed_edges: bool = False
    # Defer this layer's projection update: return a PendingUpdate that the
    # NEXT layer materializes inside the merged update+frontend kernel
    # (ops/pallas/fused_layer_step.py). Set by the net for every packed
    # layer whose successor is also packed.
    defer_update: bool = False

    @nn.compact
    def __call__(
        self,
        prev_projection_features: jnp.ndarray,  # (E, d_in)
        graph: ViewGraph,
        prev_scenepoint_features: Optional[jnp.ndarray] = None,
        prev_view_features: Optional[jnp.ndarray] = None,
        prev_global_features: Optional[jnp.ndarray] = None,
        skipconn_init_projfeat: Optional[jnp.ndarray] = None,
    ):
        if self.packed_edges:
            assert self.use_norm_proj_update
            assert self.n_hidden_layers_proj_update == 0
            assert self.n_feat_proj_in == self.n_feat_proj_out
        raw = prev_projection_features
        global_update = GraphAttnGlobalFeatureUpdate(
            self.n_feat_proj_in,
            self.n_feat_scenepoint_hidden,
            self.n_feat_view_hidden,
            n_feat_global_out=self.n_feat_global_hidden,
            n_feat_proj2scenepoint_agg=self.n_feat_proj2scenepoint_agg,
            n_feat_proj2view_agg=self.n_feat_proj2view_agg,
            n_feat_scenepoint2global_agg=self.n_feat_scenepoint2global_agg,
            n_feat_view2global_agg=self.n_feat_view2global_agg,
            output_global=True,
            n_heads=self.n_heads,
            stateful=self.stateful,
            global2view_and_global2scenepoint_enabled=self.global2view_and_global2scenepoint_enabled,
            n_hidden_layers_scenepoint_update=self.n_hidden_layers_scenepoint_update,
            n_hidden_layers_view_update=self.n_hidden_layers_view_update,
            n_hidden_layers_global_update=self.n_hidden_layers_global_update,
            packed_edges=self.packed_edges,
            name="global_feature_update",
        )
        if self.use_norm_proj_update:
            # The LN params live here (functional form) so the LN + ReLU +
            # source-transform prologue can fuse into the attention kernel
            # (ops/gatv2.gatv2_layer_frontend); x comes back normalized.
            d_in = self.n_feat_proj_in if self.packed_edges else raw.shape[-1]
            ln_scale = self.param("prev_projfeat_norm_scale", nn.initializers.ones, (d_in,))
            ln_bias = self.param("prev_projfeat_norm_bias", nn.initializers.zeros, (d_in,))
            s, v, g, x, e_prev = global_update(
                raw,
                graph,
                prev_scenepoint_features=prev_scenepoint_features,
                prev_view_features=prev_view_features,
                prev_global_features=prev_global_features,
                ln_params=(ln_scale, ln_bias, LN_EPS),
            )
            if e_prev is not None:
                # The merged kernel materialized the previous layer's e
                # stream; it is this layer's residual.
                raw = e_prev
        else:
            # Parity (reference layers.py:228-234): with use_norm_proj_update
            # False the edge features get ReLU only — no normalization.
            x = nn.relu(raw)
            s, v, g = global_update(
                x,
                graph,
                prev_scenepoint_features=prev_scenepoint_features,
                prev_view_features=prev_view_features,
                prev_global_features=prev_global_features,
            )

        e = x
        if self.packed_edges:
            # Skip concat + lin_proj + residual fold into the packed update
            # kernel; raw IS the residual (equal widths asserted above).
            skip2_p = None
            if self.n_feat_skipconn_init_projfeat_in is not None:
                assert skipconn_init_projfeat is not None
                from gasfm_tpu.ops.pallas.packing import PACK

                assert skipconn_init_projfeat.shape[-1] == (
                    PACK * self.n_feat_skipconn_init_projfeat_in
                )
                skip2_p = skipconn_init_projfeat
            res_p = raw if self.add_residual_skipconn_proj_update else None
            e = ProjectionFeatureUpdate(
                self.n_feat_proj_out,
                n_hidden_layers=0,
                normalize_global_features=True,
                name="projection_feature_update",
            )(s, v, g, e, graph, packed=True, skip2_p=skip2_p, res_p=res_p,
              defer=self.defer_update)
            return e, s, v, g

        if self.defer_update:
            # Unpacked-layer deferral (the FIRST layer feeding a packed
            # successor): the update AND the width-adapting residual fold
            # into the next layer's merged kernel. The residual rides the
            # kernel's free skip2 slot: the kernel computes
            # (en@w_e + skip2@w_uv + b + tables)/4 [+ res], so passing
            # skip2 = relu(LN(raw)) and w_uv = 4*W_skip (bias folded as
            # b += 4*b_skip) makes the /4 cancel — exactly
            # skip_projection(relu(LN(raw))) + update (reference
            # layers.py:236-263 residual semantics). JAX AD routes the
            # w_uv/b cotangents through the scaling automatically.
            assert self.n_feat_skipconn_init_projfeat_in is None
            assert self.n_hidden_layers_proj_update == 0
            from gasfm_tpu.ops.pallas.packing import pack_edges, stream_dtype

            pending = ProjectionFeatureUpdate(
                self.n_feat_proj_out,
                n_hidden_layers=0,
                normalize_global_features=True,
                name="projection_feature_update",
            )(s, v, g, e, graph, defer=True)
            if self.add_residual_skipconn_proj_update:
                if self.n_feat_proj_in == self.n_feat_proj_out:
                    pending = pending._replace(
                        res=pack_edges(raw, graph.chunk).astype(stream_dtype())
                    )
                else:
                    x_skip = raw
                    if self.use_norm_proj_update:
                        x_skip = layer_norm(name="residual_skipconn_proj_norm")(x_skip)
                        x_skip = nn.relu(x_skip)
                    w_skip, b_skip = DenseParams(
                        self.n_feat_proj_out, x_skip.shape[-1],
                        name="skip_projection",
                    )()
                    pending = pending._replace(
                        skip2=pack_edges(x_skip, graph.chunk).astype(stream_dtype()),
                        w_uv=w_skip.astype(jnp.float32) * 4.0,
                        b=pending.b + 4.0 * b_skip.astype(jnp.float32),
                    )
            return pending, s, v, g

        if self.n_feat_skipconn_init_projfeat_in is not None:
            assert skipconn_init_projfeat is not None
            assert skipconn_init_projfeat.shape[-1] == self.n_feat_skipconn_init_projfeat_in
            e = jnp.concatenate([e, skipconn_init_projfeat], axis=-1)

        e = ProjectionFeatureUpdate(
            self.n_feat_proj_out,
            n_hidden_layers=self.n_hidden_layers_proj_update,
            normalize_global_features=True,
            name="projection_feature_update",
        )(s, v, g, e, graph)

        if self.add_residual_skipconn_proj_update:
            x_skip = raw
            if self.n_feat_proj_in != self.n_feat_proj_out:
                if self.use_norm_proj_update:
                    x_skip = layer_norm(name="residual_skipconn_proj_norm")(x_skip)
                    x_skip = nn.relu(x_skip)
                x_skip = TorchDense(self.n_feat_proj_out, name="skip_projection")(x_skip)
            e = x_skip + e

        return e, s, v, g


# ---------------------------------------------------------------------------
# DPESFM (SetOfSet) blocks
# ---------------------------------------------------------------------------


class SetOfSetGlobalFeatureUpdate(nn.Module):
    """Per-point / per-view / global means through linears.

    Parity: reference layers.py:100-126.
    """

    d_out: int
    output_global: bool = True

    @nn.compact
    def __call__(self, x_edges: jnp.ndarray, graph: ViewGraph):
        mean_colwise = segment_mean(
            x_edges, graph.pt_idx, graph.num_pts, edge_mask=graph.edge_mask,
            indices_are_sorted=True, window=graph.pt_segment_windows(),
        )  # (N, d)
        scenepoint_features = TorchDense(self.d_out, name="lin_scenepoint")(mean_colwise)
        mean_rowwise = segment_mean(
            x_edges, graph.cam_idx, graph.num_cams, edge_mask=graph.edge_mask
        )  # (M, d)
        view_features = TorchDense(self.d_out, name="lin_view")(mean_rowwise)
        if not self.output_global:
            return scenepoint_features, view_features
        global_mean = masked_mean(x_edges, graph.edge_mask, axis=0)[None, :]
        global_features = TorchDense(self.d_out, name="lin_global")(global_mean)
        return scenepoint_features, view_features, global_features


class SetOfSetLayer(nn.Module):
    """Parity: reference ``SetOfSetLayer`` (layers.py:87-97)."""

    d_out: int

    @nn.compact
    def __call__(self, x_edges: jnp.ndarray, graph: ViewGraph) -> jnp.ndarray:
        s, v, g = SetOfSetGlobalFeatureUpdate(self.d_out, name="global_feature_update")(
            x_edges, graph
        )
        pe = TorchDense(self.d_out, name="lin_proj")(x_edges)
        return edge_combine(pe, s, v, g, graph)


class SetOfSetBlock(nn.Module):
    """Parity: reference ``SetOfSetBlock`` (code/models/SetOfSet.py:7-46)."""

    d_in: int
    d_out: int
    block_size: int
    proj_feat_normalization: bool
    add_skipconn_for_residual_blocks: bool

    @nn.compact
    def __call__(self, x_edges: jnp.ndarray, graph: ViewGraph) -> jnp.ndarray:
        xl = x_edges
        for i in range(self.block_size):
            xl = SetOfSetLayer(self.d_out, name=f"layers_{i}")(xl, graph)
            if i < self.block_size - 1:
                if self.proj_feat_normalization:
                    xl = normalize_edge_features(xl, graph.edge_mask, None)
                xl = nn.relu(xl)
        if self.add_skipconn_for_residual_blocks:
            x_skip = x_edges
            if self.d_in != self.d_out:
                x_skip = TorchDense(self.d_out, name="skip_projection")(x_skip)
                if self.proj_feat_normalization:
                    x_skip = normalize_edge_features(x_skip, graph.edge_mask, None)
            xl = x_skip + xl
        return nn.relu(xl)


class Parameter3DPts(nn.Module):
    """Learnable bank of 3D points, normal-initialized with sigma=0.1.

    Parity: reference ``Parameter3DPts`` (code/models/layers.py:47-57) —
    unused by the shipped confs but part of the capability surface (direct
    structure optimization without a scenepoint head).
    """

    n_pts: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "pts_3d", nn.initializers.normal(stddev=0.1), (3, self.n_pts)
        )
