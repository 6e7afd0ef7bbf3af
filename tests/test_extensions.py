"""Epsilon (range) search and multivector distinct-doc retrieval."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.ops import knn_graph_exact, squared_norms
from hnsw_nsg_tpu.models.extensions import (
    epsilon_search,
    filter_epsilon,
    multivector_search,
    topk_distinct_docs,
)


@pytest.fixture(scope="module")
def graphed(rng_mod=None):
    rng = np.random.default_rng(13)
    x = rng.standard_normal((1500, 16)).astype(np.float32)
    adj = knn_graph_exact(x, 12, query_block=1500)
    norms = squared_norms(jnp.asarray(x))
    return x, adj, norms


def test_epsilon_search_matches_exact(graphed):
    x, adj, norms = graphed
    rng = np.random.default_rng(1)
    q = x[:8] + rng.standard_normal((8, 16)).astype(np.float32) * 0.1
    eps = 8.0
    init = jnp.broadcast_to(jnp.asarray(np.asarray(adj)[0])[None], (8, 12))
    d, i, counts = epsilon_search(
        jnp.asarray(q), jnp.asarray(x), norms, adj, init,
        epsilon=eps, max_candidates=256,
    )
    d, i, counts = np.asarray(d), np.asarray(i), np.asarray(counts)
    full = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    for qi in range(8):
        exact = set(np.nonzero(full[qi] <= eps)[0].tolist())
        got = set(i[qi][i[qi] >= 0].tolist())
        assert got <= exact | got  # sanity
        # high recall of the true range set
        if exact:
            assert len(got & exact) / len(exact) > 0.9
        # everything returned is truly within epsilon
        for j, iv in enumerate(i[qi]):
            if iv >= 0:
                assert full[qi, iv] <= eps + 1e-3


def test_filter_epsilon_counts():
    d = jnp.array([[1.0, 2.0, 3.0]])
    i = jnp.array([[10, 20, 30]])
    fd, fi, c = filter_epsilon(d, i, 2.5)
    assert int(c[0]) == 2
    assert fi[0].tolist()[:2] == [10, 20]


def test_topk_distinct_docs():
    # vector ids 0..5 belong to docs [0,0,1,1,2,2]
    doc_ids = jnp.array([0, 0, 1, 1, 2, 2])
    dists = jnp.array([[0.1, 0.2, 0.3, 0.4, 0.5, 0.6]])
    ids = jnp.array([[0, 1, 2, 3, 4, 5]])
    dd, docs, vecs = topk_distinct_docs(dists, ids, doc_ids, 3)
    assert docs[0].tolist() == [0, 1, 2]
    assert vecs[0].tolist() == [0, 2, 4]  # best vector per doc
    np.testing.assert_allclose(np.asarray(dd[0]), [0.1, 0.3, 0.5], rtol=1e-6)


def test_multivector_search(graphed):
    x, adj, norms = graphed
    doc_ids = np.arange(1500) // 3  # 3 vectors per doc
    q = x[30:38]  # near docs 10..12
    init = jnp.broadcast_to(jnp.asarray(np.asarray(adj)[0])[None], (8, 12))
    dd, docs, vecs = multivector_search(
        jnp.asarray(q), jnp.asarray(x), norms, adj, init,
        doc_ids, k=5, width=64,
    )
    docs = np.asarray(docs)
    # distinct docs per row
    for r in range(8):
        v = docs[r][docs[r] >= 0]
        assert len(np.unique(v)) == len(v)
    # query vector's own doc comes first
    assert docs[0, 0] == 10
