"""Epsilon (range) search (reference: examples/cpp/
example_epsilon_search.cpp + stop_condition.h:218-275)."""

import numpy as np
import jax.numpy as jnp

from hnsw_nsg_tpu.ops import knn_graph_exact, squared_norms
from hnsw_nsg_tpu.models.extensions import epsilon_search

rng = np.random.default_rng(4)
x = rng.standard_normal((5000, 16)).astype(np.float32)
adj = knn_graph_exact(x, 16)
norms = squared_norms(jnp.asarray(x))

q = x[:4] + 0.05 * rng.standard_normal((4, 16)).astype(np.float32)
init = jnp.broadcast_to(jnp.asarray(np.asarray(adj)[0])[None], (4, 16))

dists, ids, counts = epsilon_search(
    jnp.asarray(q), jnp.asarray(x), norms, adj, init,
    epsilon=4.0, max_candidates=128,
)
for i in range(4):
    print(f"query {i}: {int(counts[i])} points within epsilon")
