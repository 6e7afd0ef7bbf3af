"""Search extensions: epsilon (range) search and multivector document
retrieval.

Reference: hnswlib/hnswlib/stop_condition.h —
  * ``EpsilonSearchStopCondition`` (:218-275): collect every point with
    distance <= epsilon, exploring at least min_num_candidates and at most
    max_num_candidates (used via searchStopConditionClosest,
    hnswalg.h:1327-1378);
  * ``MultiVectorSearchStopCondition`` (:146-215) over
    ``MultiVectorL2Space/InnerProductSpace`` (:10-143): vectors belong to
    documents; search returns the top-k *distinct documents* (best vector
    per document).

TPU form: both are post-processing disciplines over the same fixed-width
lockstep beam — an epsilon filter (the beam width plays the role of
max_num_candidates) and a best-per-document dedup + top-k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.distance import PAD_DIST, PAD_ID, squared_norms
from .beam import beam_search_chunked


def filter_epsilon(dists: jax.Array, ids: jax.Array, epsilon: float):
    """Keep only entries with dist <= epsilon (rows stay sorted, PAD-padded).
    Returns (dists, ids, counts[Q])."""
    keep = (ids >= 0) & (dists <= epsilon)
    d = jnp.where(keep, dists, PAD_DIST)
    i = jnp.where(keep, ids, PAD_ID)
    return d, i, jnp.sum(keep, axis=-1).astype(jnp.int32)


def epsilon_search(
    queries,
    data,
    norms,
    adj,
    init_ids,
    epsilon: float,
    max_candidates: int,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
):
    """Graph-based range search: beam of width max_candidates, then the
    epsilon filter. Distances returned exact. Mirrors the semantics of
    searchStopConditionClosest + EpsilonSearchStopCondition: the candidate
    budget caps exploration; everything within epsilon among the
    max_candidates closest found is returned."""
    res = beam_search_chunked(
        queries, data, norms, adj, init_ids,
        width=max_candidates, metric=metric, max_hops=max_hops,
        expand=expand,
    )
    d = res.dists
    if metric == "l2":
        d = d + squared_norms(jnp.asarray(queries))[:, None]
    return filter_epsilon(d, res.ids, epsilon)


def topk_distinct_docs(
    dists: jax.Array, ids: jax.Array, doc_ids: jax.Array, k: int
):
    """Best-vector-per-document top-k.

    dists/ids: [Q, L] sorted beam results (vector ids). doc_ids: [N] vector
    id -> document id. Returns (doc_dists [Q, k], docs [Q, k], vec_ids
    [Q, k]) sorted ascending, PAD-padded — the MultiVectorSearchStopCondition
    contract (top-k distinct docs, each scored by its closest vector).
    """
    docs = jnp.where(
        ids >= 0, jnp.take(doc_ids, jnp.where(ids >= 0, ids, 0)), PAD_ID
    )
    # rows are distance-sorted, so the first occurrence of a doc is its best
    l = docs.shape[1]
    eq = docs[:, :, None] == docs[:, None, :]
    earlier = jnp.tril(jnp.ones((l, l), jnp.bool_), k=-1)
    dup = jnp.any(eq & earlier[None], axis=2) & (docs >= 0)
    d = jnp.where(dup | (docs < 0), PAD_DIST, dists)
    neg, idx = jax.lax.top_k(-d, min(k, l))
    out_d = -neg
    out_docs = jnp.take_along_axis(docs, idx, axis=1)
    out_vecs = jnp.take_along_axis(ids, idx, axis=1)
    out_docs = jnp.where(out_d < PAD_DIST, out_docs, PAD_ID)
    out_vecs = jnp.where(out_d < PAD_DIST, out_vecs, PAD_ID)
    return out_d, out_docs, out_vecs


def multivector_search(
    queries,
    data,
    norms,
    adj,
    init_ids,
    doc_ids,
    k: int,
    width: int | None = None,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
):
    """Top-k distinct documents via graph search over the vector level."""
    width = width or max(4 * k, 32)
    res = beam_search_chunked(
        queries, data, norms, adj, init_ids,
        width=width, metric=metric, max_hops=max_hops, expand=expand,
    )
    d = res.dists
    if metric == "l2":
        d = d + squared_norms(jnp.asarray(queries))[:, None]
    return topk_distinct_docs(d, res.ids, jnp.asarray(doc_ids), k)
