"""Packed int8 record graph: layout + search parity with the f32 beam."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.models.beam import beam_search
from hnsw_nsg_tpu.models.records import (
    RecordGraph,
    _layout,
    build_record_graph,
    beam_search_records,
)
from hnsw_nsg_tpu.models.inline_graph import rerank_exact
from hnsw_nsg_tpu.ops import brute_force_topk, recall, squared_norms


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    n, d, q = 2048, 64, 32
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    norms = squared_norms(x)
    _, knn = brute_force_topk(x, x, 17)
    adj = jnp.asarray(np.asarray(knn)[:, 1:].astype(np.int32))
    qs = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    init = jnp.asarray(rng.integers(0, n, (q, 16), dtype=np.int32))
    _, gt = brute_force_topk(qs, x, 10)
    return x, norms, adj, qs, init, np.asarray(gt)


class TestRecordGraph:
    def test_layout_shapes(self):
        # d=64 -> nw=16; R=16 -> 16*16+32=288 -> S=8
        nw, s = _layout(16, 64)
        assert nw == 16 and s == 8
        # d=128, R=30 -> 30*32+60=1020 -> S=8 (one 4KB row)
        nw, s = _layout(30, 128)
        assert nw == 32 and s == 8
        # d=128, R=32 -> 1088 -> S=16
        nw, s = _layout(32, 128)
        assert s == 16

    def test_roundtrip_ids_and_norms(self, setup):
        x, norms, adj, *_ = setup
        g = build_record_graph(x, adj, norms, chunk=512)
        n, r = adj.shape
        nw, s = _layout(r, x.shape[1])
        flat = np.asarray(g.rows).reshape(n, -1)
        ids = flat[:, r * nw : r * nw + r]
        np.testing.assert_array_equal(ids, np.asarray(adj))
        nb = flat[:, r * nw + r : r * nw + 2 * r].view(np.float32)
        want = np.asarray(norms)[np.asarray(adj)]
        np.testing.assert_allclose(nb, want, rtol=1e-6)

    def test_quantized_vec_roundtrip(self, setup):
        x, norms, adj, *_ = setup
        g = build_record_graph(x, adj, norms, chunk=512)
        n, r = adj.shape
        d = x.shape[1]
        nw, _ = _layout(r, d)
        flat = np.asarray(g.rows).reshape(n, -1)
        vec = flat[:, : r * nw].reshape(n, r, nw)
        # unpack bytes of neighbor 0 of node 0
        w = vec[0, 0].view(np.uint32)
        quarters = [
            (np.left_shift(w, np.uint32(24 - 8 * k)).astype(np.uint32)
             .view(np.int32) >> 24)
            for k in range(4)
        ]
        got = float(g.scale) * np.concatenate(
            [q.astype(np.float32) for q in quarters]
        )[:d]
        nb0 = int(np.asarray(adj)[0, 0])
        np.testing.assert_allclose(got, np.asarray(x)[nb0],
                                   atol=float(g.scale) * 0.51)

    def test_search_recall_parity(self, setup):
        x, norms, adj, qs, init, gt = setup
        g = build_record_graph(x, adj, norms, chunk=512)
        res = beam_search_records(qs, x, norms, g, init, width=64,
                                  max_hops=128)
        ref = beam_search(qs, x, norms, adj, init, width=64, max_hops=128)
        _, i1 = rerank_exact(qs, x, norms, res.ids, 10)
        _, i2 = rerank_exact(qs, x, norms, ref.ids, 10)
        r_rec = recall(np.asarray(i1), gt)
        r_f32 = recall(np.asarray(i2), gt)
        # int8 traversal + exact rerank stays within a point of f32
        assert r_rec >= r_f32 - 0.02, (r_rec, r_f32)

    def test_compaction_identical_results(self, setup):
        """Converged-query compaction must not change any query's result
        (it only re-buckets the still-active rows between scan chunks)."""
        x, norms, adj, qs, init, gt = setup
        g = build_record_graph(x, adj, norms, chunk=512)
        plain = beam_search_records(
            qs, x, norms, g, init, width=32, max_hops=128,
            min_compact=qs.shape[0] + 1,   # compaction disabled
        )
        compacted = beam_search_records(
            qs, x, norms, g, init, width=32, max_hops=128,
            chunk_hops=8, min_compact=2,   # compact aggressively
        )
        np.testing.assert_array_equal(
            np.asarray(plain.ids), np.asarray(compacted.ids)
        )
        np.testing.assert_array_equal(
            np.asarray(plain.hops), np.asarray(compacted.hops)
        )


class TestHNSWAccel:
    @pytest.mark.slow
    def test_accel_query_parity(self, setup):
        """knn_query with the record accel path matches the plain path."""
        from hnsw_nsg_tpu.models.hnsw import HNSWIndex
        from hnsw_nsg_tpu.utils.params import HNSWConfig

        x, norms, adj, qs, init, gt = setup
        xs = np.asarray(x)
        idx = HNSWIndex(xs.shape[1], xs.shape[0] + 1,
                        HNSWConfig(M=12, ef_construction=80), "l2")
        idx.add_items(xs)
        q = np.asarray(qs)[:16]
        lab_plain, d_plain = idx.knn_query(q, k=10, ef=64)
        idx.build_accel()
        assert idx._records is not None
        lab_acc, d_acc = idx.knn_query(q, k=10, ef=64)
        # exact-reranked accel results: recall vs plain within a point
        inter = np.mean([
            len(set(a) & set(b)) / 10
            for a, b in zip(lab_acc, lab_plain)
        ])
        assert inter >= 0.9, inter
        # distances are exact metric values (ascending, non-negative)
        assert (np.diff(d_acc, axis=1) >= -1e-5).all()
        assert (d_acc >= -1e-4).all()
        # mutation invalidates the derived layout
        idx.add_items(xs[:1], labels=np.array([99999]))
        assert idx._records is None

    @pytest.mark.slow
    def test_accel_insert_recall_parity(self):
        """add_items(accel=True) builds through the record layout with
        exact re-distanced pools — graph quality must match plain build."""
        from hnsw_nsg_tpu.models.hnsw import HNSWIndex
        from hnsw_nsg_tpu.utils.params import HNSWConfig
        import jax.numpy as jnp
        from hnsw_nsg_tpu.ops import brute_force_topk

        rng = np.random.default_rng(4)
        n, d = 3000, 32
        x = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((32, d)).astype(np.float32)
        _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(x), 10)
        i1 = HNSWIndex(d, n, HNSWConfig(M=12, ef_construction=80), "l2")
        i1.add_items(x, accel=True, batch_size=1024)
        assert i1._records is not None  # maintained through the build
        l1, _ = i1.knn_query(q, k=10, ef=80)
        r1 = recall(l1, np.asarray(gt))
        i2 = HNSWIndex(d, n, HNSWConfig(M=12, ef_construction=80), "l2")
        i2.add_items(x, batch_size=1024)
        l2, _ = i2.knn_query(q, k=10, ef=80)
        r2 = recall(l2, np.asarray(gt))
        assert r1 >= r2 - 0.02, (r1, r2)
