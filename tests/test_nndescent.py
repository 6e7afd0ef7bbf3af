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
