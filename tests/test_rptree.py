"""RP-tree kNN-graph builder: recall growth with trees, refinement, padding."""

import numpy as np
import pytest

from hnsw_nsg_tpu.ops import knn_graph_exact, recall
from hnsw_nsg_tpu.models.rptree import knn_graph_rp
from hnsw_nsg_tpu.utils.params import NNDescentConfig


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    return rng.standard_normal((4000, 24)).astype(np.float32)


def test_recall_grows_with_trees(data):
    gt = np.asarray(knn_graph_exact(data, 10, query_block=2048))
    r4 = recall(knn_graph_rp(data, 10, n_trees=4, leaf_size=256, seed=1), gt)
    r8 = recall(knn_graph_rp(data, 10, n_trees=8, leaf_size=256, seed=1), gt)
    assert r8 > r4 > 0.5
    assert r8 > 0.9


def test_refinement_improves(data):
    gt = np.asarray(knn_graph_exact(data, 10, query_block=2048))
    base = knn_graph_rp(data, 10, n_trees=3, leaf_size=256, seed=2)
    refined = knn_graph_rp(
        data, 10, n_trees=3, leaf_size=256, seed=2,
        refine=NNDescentConfig(K=10, L=24, iters=3, S=8, R=8),
    )
    assert recall(refined, gt) > recall(base, gt)


def test_no_self_edges_valid_ids(data):
    adj = knn_graph_rp(data, 10, n_trees=4, leaf_size=256, seed=3)
    n = len(adj)
    assert adj.shape == (n, 10)
    assert (adj != np.arange(n)[:, None]).all()
    assert (adj < n).all()


def test_non_power_of_two_n():
    """Padding path: N not divisible by leaves."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1037, 16)).astype(np.float32)
    adj = knn_graph_rp(x, 5, n_trees=4, leaf_size=128, seed=4)
    assert adj.shape == (1037, 5)
    assert (adj < 1037).all()
    gt = np.asarray(knn_graph_exact(x, 5, query_block=1037))
    assert recall(adj, gt) > 0.7
