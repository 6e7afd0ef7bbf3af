"""Multivector document retrieval (reference: examples/cpp/
example_multivector_search.cpp + stop_condition.h:10-215)."""

import numpy as np
import jax.numpy as jnp

from hnsw_nsg_tpu.ops import knn_graph_exact, squared_norms
from hnsw_nsg_tpu.models.extensions import multivector_search

rng = np.random.default_rng(3)
n_docs, vecs_per_doc, dim = 500, 4, 32
x = rng.standard_normal((n_docs * vecs_per_doc, dim)).astype(np.float32)
doc_ids = np.repeat(np.arange(n_docs), vecs_per_doc)

adj = knn_graph_exact(x, 16)
norms = squared_norms(jnp.asarray(x))
q = x[:8]  # queries near docs 0 and 1
init = jnp.broadcast_to(jnp.asarray(np.asarray(adj)[0])[None], (8, 16))

dists, docs, vecs = multivector_search(
    jnp.asarray(q), jnp.asarray(x), norms, adj, init, doc_ids, k=5
)
print("top docs for query 0:", np.asarray(docs)[0])
print("their best vectors:", np.asarray(vecs)[0])
