"""nn-descent graph quality vs exact kNN graph."""

import numpy as np
import pytest

from hnsw_nsg_tpu.ops import knn_graph_exact, recall
from hnsw_nsg_tpu.models.nndescent import nn_descent
from hnsw_nsg_tpu.utils.params import NNDescentConfig


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    return rng.standard_normal((4000, 24)).astype(np.float32)


def test_converges_to_high_graph_recall(data):
    cfg = NNDescentConfig(K=10, L=24, iters=8, S=8, R=8)
    adj = nn_descent(data, cfg, seed=1)
    gt = np.asarray(knn_graph_exact(data, 10, query_block=2048))
    r = recall(adj, gt)
    assert r >= 0.9, f"graph recall {r}"


def test_no_self_edges_no_dups(data):
    cfg = NNDescentConfig(K=10, L=24, iters=4, S=8, R=8)
    adj = nn_descent(data, cfg, seed=2)
    n = len(adj)
    assert (adj != np.arange(n)[:, None]).all()
    for row in adj[:200]:
        v = row[row >= 0]
        assert len(np.unique(v)) == len(v)


def test_warm_start_refine(data):
    """RefineGraph semantics: a noisy init improves."""
    rng = np.random.default_rng(9)
    gt = np.asarray(knn_graph_exact(data, 10, query_block=2048))
    noisy = gt.copy()
    noise_rows = rng.random(noisy.shape) < 0.5
    noisy[noise_rows] = rng.integers(0, len(data), noise_rows.sum())
    r0 = recall(noisy, gt)
    cfg = NNDescentConfig(K=10, L=24, iters=4, S=8, R=8)
    adj = nn_descent(data, cfg, seed=3, init_adj=noisy)
    r1 = recall(adj, gt)
    assert r1 > r0 + 0.2


def test_ip_metric(data):
    cfg = NNDescentConfig(K=10, L=24, iters=6, S=8, R=8)
    adj = nn_descent(data, cfg, metric="ip", seed=4)
    gt = np.asarray(knn_graph_exact(data, 10, metric="ip", query_block=2048))
    assert recall(adj, gt) >= 0.8


class TestGraphAdd:
    """Incremental insertion (GraphAdd, index_graph.cpp:379-498)."""

    def _built(self, data, n0, k=10):
        from hnsw_nsg_tpu.models.nndescent import graph_add

        base, new = data[:n0], data[n0:]
        adj0 = np.asarray(knn_graph_exact(base, k, query_block=2048))
        return graph_add(base, adj0, new, seed=7, batch=256, l_add=96)

    def test_new_nodes_get_good_edges(self, data):
        n0 = 3000
        data_all, adj = self._built(data, n0)
        assert data_all.shape == data.shape
        assert adj.shape == (len(data), 10)
        gt = np.asarray(knn_graph_exact(data, 10, query_block=2048))
        r_new = recall(adj[n0:], gt[n0:])
        assert r_new >= 0.72, f"new-node edge recall {r_new}"

    def test_reverse_edges_reach_old_nodes(self, data):
        n0 = 3000
        _, adj = self._built(data, n0)
        back = (adj[:n0] >= n0).any(axis=1).mean()
        # 1000 new nodes x 10 reverse edges over 3000 old nodes: a
        # meaningful fraction of old pools must now point at new nodes
        assert back > 0.05, f"only {back:.3f} of old rows link new nodes"
        # and old pools stay valid: sorted-by-merge rows, no self loops
        n = len(adj)
        assert (adj != np.arange(n)[:, None]).all()
        assert adj.max() < n

    def test_graph_still_searchable(self, data):
        """End-to-end: beam search over the grown graph finds the new
        points (the reference's use case: extend, then Search)."""
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.beam import beam_search
        from hnsw_nsg_tpu.ops import squared_norms

        n0 = 3000
        data_all, adj = self._built(data, n0)
        q = data[n0 : n0 + 64]
        xd = jnp.asarray(data_all)
        rng = np.random.default_rng(5)
        init = jnp.asarray(
            rng.integers(0, len(data_all), (64, 64), dtype=np.int32)
        )

        def findability(graph):
            res = beam_search(
                jnp.asarray(q), xd, squared_norms(xd), jnp.asarray(graph),
                init, width=64,
            )
            ids = np.asarray(res.ids)[:, :10]
            return (ids == np.arange(n0, n0 + 64)[:, None]).any(axis=1).mean()

        # control: the EXACT kNN graph of the full set. Plain kNN graphs
        # lack long-range links, so even exact graphs stall some walks
        # (~0.75 here) — what matters is that incremental insertion stays
        # at that ceiling, not an absolute bar.
        exact = np.asarray(knn_graph_exact(data_all, 10, query_block=2048))
        ctl = findability(exact)
        grown = findability(adj)
        assert grown >= ctl - 0.10, (grown, ctl)
