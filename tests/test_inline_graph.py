"""Inline neighbor-record layout: correctness vs the plain f32 beam.

The inline layout (models/inline_graph.py) is the TPU analogue of the
reference's OptimizeGraph/SearchWithOptGraph re-pack
(CNNS/src/nsg/index_nsg.cpp:570-682): derived search-time state, same
results. Traversal runs in bf16, so we compare *recall against exact GT*
(must match the f32 beam), not raw id agreement.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.models.beam import beam_search
from hnsw_nsg_tpu.models.inline_graph import (
    build_inline_graph,
    beam_search_inline,
    rerank_exact,
)
from hnsw_nsg_tpu.ops import brute_force_topk, recall, squared_norms


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.default_rng(7)
    n, d, q = 2048, 64, 32
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    norms = squared_norms(x)
    _, knn = brute_force_topk(x, x, 17)
    adj = jnp.asarray(np.asarray(knn)[:, 1:].astype(np.int32))
    qs = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    init = jnp.asarray(rng.integers(0, n, (q, 8), dtype=np.int32))
    _, gt = brute_force_topk(qs, x, 10)
    return x, norms, adj, qs, init, np.asarray(gt)


class TestInlineGraph:
    def test_build_layout(self, setup):
        x, norms, adj, *_ = setup
        g = build_inline_graph(x, adj, norms, chunk=512)
        assert g.n == x.shape[0] and g.degree == adj.shape[1]
        assert (np.asarray(g.nids) == np.asarray(adj)).all()
        # neighbor record 0 of node 0 holds adj[0,0]'s vector (bf16)
        nb0 = int(np.asarray(adj)[0, 0])
        want = np.asarray(x)[nb0].astype(jnp.bfloat16)
        got = np.asarray(g.recs)[0, 0]
        np.testing.assert_array_equal(got, want)

    def test_recall_matches_f32_beam(self, setup):
        x, norms, adj, qs, init, gt = setup
        g = build_inline_graph(x, adj, norms, chunk=512)
        res = beam_search_inline(
            qs, x, norms, g, init, width=48, max_hops=128
        )
        ref = beam_search(qs, x, norms, adj, init, width=48, max_hops=128)
        _, i1 = rerank_exact(qs, x, norms, res.ids, 10)
        _, i2 = rerank_exact(qs, x, norms, ref.ids, 10)
        r_inline = recall(np.asarray(i1), gt)
        r_f32 = recall(np.asarray(i2), gt)
        # bf16 traversal + exact rerank must not lose recall
        assert r_inline >= r_f32 - 0.01, (r_inline, r_f32)

    def test_rerank_exact_values(self, setup):
        x, norms, adj, qs, init, gt = setup
        g = build_inline_graph(x, adj, norms, chunk=512)
        res = beam_search_inline(qs, x, norms, g, init, width=48,
                                 max_hops=128)
        d, i = rerank_exact(qs, x, norms, res.ids, 5)
        # distances are exact L2^2 for the returned ids
        xi = np.asarray(x)[np.asarray(i)]
        want = ((np.asarray(qs)[:, None, :] - xi) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), want, rtol=1e-4, atol=1e-4)
