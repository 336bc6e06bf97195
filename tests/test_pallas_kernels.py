"""Pallas kernel correctness vs the XLA reference ops (interpret mode on
CPU; the same code path compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gasfm_tpu.ops.pallas.segment_kernels import (
    gather_rows_kernel,
    segment_max_kernel,
    segment_sum_kernel,
)


def make_case(E=1024, S=700, d=32, seed=0, sorted_ids=False):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(E, d)).astype(np.float32)
    ids = rng.integers(0, S, size=E).astype(np.int32)
    # Some padding edges at the end with the trash id == S
    ids[-37:] = S
    data[-37:] = 999.0  # must not leak into outputs via id matching
    if sorted_ids:
        order = np.argsort(ids, kind="stable")
        ids, data = ids[order], data[order]
    return jnp.asarray(data), jnp.asarray(ids)


class TestSegmentSum:
    @pytest.mark.parametrize("S", [64, 512, 700])
    def test_matches_xla(self, S):
        data, ids = make_case(S=S, seed=1)
        ref = jax.ops.segment_sum(
            jnp.where((ids < S)[:, None], data, 0.0), ids, num_segments=S
        )
        out = segment_sum_kernel(
            jnp.where((ids < S)[:, None], data, 0.0), ids[:, None], S, True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_grad_is_gather(self):
        data, ids = make_case(S=300, seed=2)
        S = 300
        zeroed = jnp.where((ids < S)[:, None], data, 0.0)

        def f(d):
            return jnp.sum(segment_sum_kernel(d, ids[:, None], S, True) ** 2)

        def f_ref(d):
            return jnp.sum(jax.ops.segment_sum(d, ids, num_segments=S) ** 2)

        g = jax.grad(f)(zeroed)
        g_ref = jax.grad(f_ref)(zeroed)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)


class TestGatherRows:
    def test_matches_take(self):
        rng = np.random.default_rng(3)
        S, d, E = 600, 32, 1024
        table = jnp.asarray(rng.normal(size=(S, d)).astype(np.float32))
        ids = rng.integers(0, S, size=E).astype(np.int32)
        ids[-10:] = S  # trash -> zero rows
        out = gather_rows_kernel(table, jnp.asarray(ids)[:, None], True)
        ref = np.asarray(table)[np.minimum(ids, S - 1)]
        ref[ids == S] = 0.0
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_grad_is_segment_sum(self):
        rng = np.random.default_rng(4)
        S, d, E = 300, 16, 512
        table = jnp.asarray(rng.normal(size=(S, d)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, S, size=E).astype(np.int32))

        def f(t):
            return jnp.sum(gather_rows_kernel(t, ids[:, None], True) ** 3)

        def f_ref(t):
            return jnp.sum(t[ids] ** 3)

        g = jax.grad(f)(table)
        g_ref = jax.grad(f_ref)(table)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)


class TestSegmentMax:
    def test_matches_xla(self):
        data, ids = make_case(S=450, d=4, seed=5)
        S = 450
        masked = jnp.where((ids < S)[:, None], data, -1e30)
        ref = jax.ops.segment_max(masked, ids, num_segments=S)
        out = segment_max_kernel(masked, ids[:, None], S, neutral=-1e30, interpret=True)
        # Empty segments: ref yields -inf-ish minimum, ours the neutral.
        ref = np.asarray(ref)
        out = np.asarray(out)
        has_edges = np.asarray(jax.ops.segment_sum(jnp.ones_like(ids), ids, num_segments=S)) > 0
        np.testing.assert_allclose(out[has_edges], ref[has_edges], atol=1e-5)
        assert (out[~has_edges] == -1e30).all()

    def test_neutral_contract_backend_independent(self):
        """ops.segment.segment_max documents 'empty segments yield neutral'.
        The XLA fallback used to return jax.ops.segment_max's -inf identity
        instead, silently splitting behavior on which backend dispatched
        (review round 5). Both dispatch paths must honor `neutral`."""
        from gasfm_tpu.ops import segment as seg

        data, ids = make_case(S=450, d=4, seed=6)
        S = 450
        outs = {}
        prev = seg.get_kernel_mode()
        for mode in ("interpret", "off"):
            seg.set_kernel_mode(mode)
            try:
                outs[mode] = np.asarray(
                    seg.segment_max(data, ids, S, neutral=0.0)
                )
            finally:
                seg.set_kernel_mode(prev)
        has_edges = (
            np.asarray(jax.ops.segment_sum(jnp.ones_like(ids), ids, num_segments=S)) > 0
        )
        for mode, out in outs.items():
            assert np.isfinite(out).all(), mode
            assert (out[~has_edges] == 0.0).all(), mode
        np.testing.assert_allclose(outs["interpret"], outs["off"], atol=1e-5)


# ---------------------------------------------------------------------------
# Windowed kernels (blocked point-major layout)
# ---------------------------------------------------------------------------

from gasfm_tpu.graph.view_graph import CHUNK, WINDOW  # noqa: E402
from gasfm_tpu.ops.pallas.segment_kernels import (  # noqa: E402
    windowed_gather,
    windowed_segment_max,
    windowed_segment_sum,
)

W = WINDOW


def make_blocked_case(n_chunks=4, S=1800, d=36, seed=0):
    """Random blocked layout: chunk c draws ids from one WINDOW-window."""
    rng = np.random.default_rng(seed)
    E = n_chunks * CHUNK
    n_blocks = -(-S // W)
    wb = np.sort(rng.integers(0, n_blocks, size=n_chunks)).astype(np.int32)
    ids = np.empty((E,), np.int32)
    for c in range(n_chunks):
        lo = wb[c] * W
        hi = min(lo + W, S)
        ids[c * CHUNK : (c + 1) * CHUNK] = rng.integers(lo, hi, size=CHUNK)
    # sprinkle padding ids (== S) into each chunk
    pad = rng.random(E) < 0.1
    ids[pad] = S
    data = rng.normal(size=(E, d)).astype(np.float32)
    data[pad] = 777.0  # must be dropped by id mismatch
    visited = np.zeros(n_blocks, bool)
    visited[np.unique(wb)] = True
    return jnp.asarray(data), jnp.asarray(ids), jnp.asarray(wb), S, visited


class TestWindowedKernels:
    @pytest.mark.parametrize("S", [512, 700, 1800])
    def test_segment_sum_matches_xla(self, S):
        data, ids, wb, S, visited = make_blocked_case(S=S, seed=1)
        ref = jax.ops.segment_sum(
            jnp.where((ids < S)[:, None], data, 0.0), ids, num_segments=S
        )
        out = windowed_segment_sum(data, ids[:, None], wb, S, True)
        row_ok = np.repeat(visited, W)[:S]
        np.testing.assert_allclose(np.asarray(out)[row_ok], np.asarray(ref)[row_ok], atol=1e-4)
        # unvisited blocks are garbage by contract; visited rows with no edges are 0
        assert np.abs(np.asarray(out)[row_ok]).max() < 1e5

    def test_gather_matches_take(self):
        data, ids, wb, S, _ = make_blocked_case(S=1800, seed=2)
        rng = np.random.default_rng(3)
        table = jnp.asarray(rng.normal(size=(S, 36)).astype(np.float32))
        out = windowed_gather(table, ids[:, None], wb, True)
        ref = np.asarray(table)[np.minimum(np.asarray(ids), S - 1)]
        ref[np.asarray(ids) == S] = 0.0
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_segment_max_matches_xla(self):
        data, ids, wb, S, visited = make_blocked_case(S=700, d=4, seed=4)
        masked = jnp.where((ids < S)[:, None], data, -1e30)
        ref = jax.ops.segment_max(masked, ids, num_segments=S)
        out = windowed_segment_max(data, ids[:, None], wb, S, neutral=-1e30, interpret=True)
        row_ok = np.repeat(visited, W)[:S]
        has = np.asarray(jax.ops.segment_sum((ids < S).astype(jnp.int32), ids, num_segments=S)) > 0
        sel = row_ok & has
        np.testing.assert_allclose(np.asarray(out)[sel], np.asarray(ref)[sel], atol=1e-5)
        assert (np.asarray(out)[row_ok & ~has] == -1e30).all()

    def test_sum_grad_is_gather(self):
        data, ids, wb, S, visited = make_blocked_case(S=700, d=8, seed=5)
        zeroed = jnp.where((ids < S)[:, None], data, 0.0)
        row_ok = jnp.asarray(np.repeat(visited, W)[:S])

        def f(d):
            out = windowed_segment_sum(d, ids[:, None], wb, S, True)
            out = jnp.where(row_ok[:, None], out, 0.0)
            return jnp.sum(out ** 2)

        def f_ref(d):
            return jnp.sum(jax.ops.segment_sum(d, ids, num_segments=S) ** 2)

        g = jax.grad(f)(zeroed)
        g_ref = jax.grad(f_ref)(zeroed)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)

    def test_gather_grad_is_segment_sum(self):
        data, ids, wb, S, _ = make_blocked_case(S=700, d=8, seed=6)
        rng = np.random.default_rng(7)
        table = jnp.asarray(rng.normal(size=(S, 8)).astype(np.float32))

        def f(t):
            return jnp.sum(windowed_gather(t, ids[:, None], wb, True) ** 3)

        def f_ref(t):
            g = jnp.where((ids < S)[:, None], t[jnp.minimum(ids, S - 1)], 0.0)
            return jnp.sum(g ** 3)

        g = jax.grad(f)(table)
        g_ref = jax.grad(f_ref)(table)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)
