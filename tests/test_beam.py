"""Beam search + greedy descent on an exact kNN graph vs brute-force oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.ops import (
    PAD_ID,
    brute_force_topk,
    knn_graph_exact,
    recall,
    squared_norms,
)
from hnsw_nsg_tpu.models.beam import beam_search, greedy_descent


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    return x, q


def test_knn_graph_exact(dataset):
    x, _ = dataset
    adj = np.asarray(knn_graph_exact(x, 10, query_block=512))
    assert adj.shape == (2000, 10)
    # no self edges, no pads (n >> k)
    assert (adj != np.arange(2000)[:, None]).all()
    assert (adj >= 0).all()
    # row 0's first neighbor is the true nearest non-self point
    d = ((x - x[0]) ** 2).sum(-1)
    d[0] = np.inf
    assert adj[0, 0] == np.argmin(d)


def test_beam_search_recall(dataset):
    x, q = dataset
    adj = knn_graph_exact(x, 16, query_block=512)
    norms = squared_norms(x)
    # init: node 0's neighbors + random fill (NSG-style init)
    key = jax.random.PRNGKey(0)
    rand = jax.random.randint(key, (64, 16), 0, 2000, dtype=jnp.int32)
    init = jnp.concatenate(
        [jnp.broadcast_to(adj[0][None], (64, 16)), rand], axis=1
    )
    res = beam_search(q, x, norms, adj, init, width=64, metric="l2")
    gt_d, gt_i = brute_force_topk(q, x, 10)
    r = recall(np.asarray(res.ids)[:, :10], np.asarray(gt_i))
    assert r >= 0.9, f"recall {r}"
    # retset sorted ascending
    d = np.asarray(res.dists)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    # counters move
    assert np.asarray(res.hops).min() > 0
    assert np.asarray(res.evals).min() > 0


def test_beam_search_expand_multi(dataset):
    """expand>1 reaches at-least-comparable recall."""
    x, q = dataset
    adj = knn_graph_exact(x, 16, query_block=512)
    norms = squared_norms(x)
    init = jnp.broadcast_to(adj[0][None], (64, 16))
    r1 = beam_search(q, x, norms, adj, init, width=64, expand=1)
    r4 = beam_search(q, x, norms, adj, init, width=64, expand=4)
    _, gt_i = brute_force_topk(q, x, 10)
    rec1 = recall(np.asarray(r1.ids)[:, :10], np.asarray(gt_i))
    rec4 = recall(np.asarray(r4.ids)[:, :10], np.asarray(gt_i))
    assert rec4 >= rec1 - 0.05
    # fatter hops: fewer iterations' worth of hops per query for expand=4
    assert np.asarray(r4.evals).mean() >= np.asarray(r1.evals).mean() * 0.5


def test_beam_terminates_on_all_pad_init(dataset):
    x, q = dataset
    adj = knn_graph_exact(x, 8, query_block=512)
    norms = squared_norms(x)
    init = jnp.full((64, 4), PAD_ID, jnp.int32)
    res = beam_search(q, x, norms, adj, init, width=16)
    assert (np.asarray(res.ids) == PAD_ID).all()
    assert (np.asarray(res.hops) == 0).all()


def test_greedy_descent(dataset):
    x, q = dataset
    adj = knn_graph_exact(x, 16, query_block=512)
    norms = squared_norms(x)
    start = jnp.zeros((64,), jnp.int32)
    ids, dists = greedy_descent(q, x, norms, adj, start)
    # end point must be a 1-NN local minimum: no neighbor of it is closer
    ids_np = np.asarray(ids)
    adj_np = np.asarray(adj)
    fast = lambda qq, xx: (xx * xx).sum(-1) - 2 * (qq * xx).sum(-1)
    for i in range(8):
        dq = fast(q[i], x[ids_np[i]])
        nbr_d = np.array([fast(q[i], x[j]) for j in adj_np[ids_np[i]]])
        assert (nbr_d >= dq - 1e-4).all()
    # greedy walks land in local minima on a plain kNN digraph (that is why
    # HNSW adds hierarchy + beam); just require decent improvement over start
    gt_d, gt_i = brute_force_topk(q, x, 1)
    hit = (ids_np == np.asarray(gt_i)[:, 0]).mean()
    assert hit > 0.1
    start_d = np.array([fast(q[i], x[0]) for i in range(64)])
    final_d = np.array([fast(q[i], x[ids_np[i]]) for i in range(64)])
    assert final_d.mean() < start_d.mean()
