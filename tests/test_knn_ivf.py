"""Cluster-join kNN graph (the large-N TPU build path)."""

import numpy as np
import pytest

from hnsw_nsg_tpu.ops import knn_graph_exact, recall
from hnsw_nsg_tpu.models.knn_ivf import knn_graph_ivf


@pytest.mark.slow
def test_matches_exact_graph_quality():
    rng = np.random.default_rng(17)
    centers = rng.standard_normal((24, 32)).astype(np.float32)
    x = (centers[rng.integers(0, 24, 9_000)]
         + rng.standard_normal((9_000, 32))).astype(np.float32)
    adj = knn_graph_ivf(x, 10, n_clusters=12, probes=6, seed=0)
    gt = np.asarray(knn_graph_exact(x, 10, query_block=4096))
    r = recall(adj, gt)
    assert r >= 0.9, f"cluster-join graph recall {r}"
    # structural invariants: no self edges, ids in range
    n = len(adj)
    assert (adj != np.arange(n)[:, None]).all()
    assert adj.max() < n


def test_uniform_data_needs_more_probes():
    rng = np.random.default_rng(18)
    x = rng.standard_normal((5000, 16)).astype(np.float32)
    gt = np.asarray(knn_graph_exact(x, 10, query_block=4096))
    r_lo = recall(knn_graph_ivf(x, 10, n_clusters=16, probes=2, seed=1), gt)
    r_hi = recall(knn_graph_ivf(x, 10, n_clusters=16, probes=8, seed=1), gt)
    # structureless uniform data is IVF's adversarial case (neighbors
    # scatter across arbitrary partition boundaries) — probes is the
    # recall knob, and realistic clustered data (test above) sits >=0.9
    assert r_hi > r_lo + 0.1
    assert r_hi >= 0.7, r_hi
