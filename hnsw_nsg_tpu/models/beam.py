"""Batched graph traversal: lockstep best-first beam + greedy descent.

This module is the TPU re-design of the reference's three traversal loops:

  * NSG ``Search`` (CNNS/src/nsg/index_nsg.cpp:506-568) — fixed-width sorted
    retset, expand lowest unexpanded, insert improving neighbors;
  * hnswlib ``searchBaseLayerST`` (hnswlib/hnswlib/hnswalg.h:309-440) — ef
    beam with candidate/result heaps;
  * hnswlib upper-level greedy descent (hnswalg.h:1278-1303).

All three become the same lockstep pattern: Q queries advance together under
``lax.while_loop``; each hop gathers the frontier nodes' padded adjacency
rows, computes a batched gathered-GEMM distance block on the MXU, and merges
into per-query sorted retsets with ``lax.top_k``. Queries that have converged
are masked out (their frontier contributes PAD entries) — the "active mask"
plan from SURVEY.md §7.

Termination/visited-set correctness: a sorted top-L retset only ever improves
its L-th best distance, so an evicted node can never re-enter, and the
per-slot expanded flag guarantees each retset occupant is expanded at most
once. Retset dedup (ops/topk.py) therefore replaces the reference's
VisitedList/bitset exactly, with the one behavioral delta that a node evicted
*before* expansion can have its distance recomputed if re-encountered — extra
MXU work, identical results.

Search metrics (hop and distance-evaluation counters) mirror the reference's
``metric_hops`` / ``metric_distance_computations`` (hnswalg.h:65-66).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID, gathered_dists
from ..ops.topk import init_retset, merge_into_retset


class BeamResult(NamedTuple):
    dists: jax.Array     # [Q, L] ascending (FastL2 values for metric="l2")
    ids: jax.Array       # [Q, L] PAD_ID-padded
    hops: jax.Array      # [Q] int32 — frontier expansions performed
    evals: jax.Array     # [Q] int32 — distance computations performed


def _select_frontier(ids, expanded, expand: int):
    """Pick the first `expand` unexpanded slots per query (retset is sorted,
    so these are the closest unexpanded candidates)."""
    q, width = ids.shape
    unexp = ~expanded
    slot = jax.lax.broadcasted_iota(jnp.int32, (q, width), 1)
    key = jnp.where(unexp, slot, width)
    # top_k of -key -> smallest slot indices first
    _, idxs = jax.lax.top_k(-key, expand)  # [Q, expand]
    sel_valid = jnp.take_along_axis(unexp, idxs, axis=1)
    sel_ids = jnp.take_along_axis(ids, idxs, axis=1)
    sel_ids = jnp.where(sel_valid, sel_ids, PAD_ID)
    new_expanded = expanded | jnp.any(
        (slot[:, None, :] == idxs[:, :, None]) & sel_valid[:, :, None],
        axis=1,
    )
    return sel_ids, sel_valid, new_expanded


@functools.partial(
    jax.jit,
    static_argnames=("width", "metric", "max_hops", "expand"),
)
def beam_search(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    adj: jax.Array,
    init_ids: jax.Array,
    width: int,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
) -> BeamResult:
    """Lockstep best-first search over a padded-adjacency graph.

    queries:  [Q, d]
    data:     [N, d], norms: [N] cached squared norms (l2 only, may be dummy
              for ip/cosine)
    adj:      [N, R] int32, PAD_ID-padded out-edges
    init_ids: [Q, I] int32 initial candidates (PAD_ID-padded)
    width:    retset width L (ef in hnswlib terms, L_search in NSG terms)
    expand:   frontier nodes expanded per hop (1 == reference semantics;
              >1 trades extra distance evals for fewer, fatter hops — better
              MXU utilization at the same recall level).

    Returns distances in FastL2 form for metric="l2" (exact = + ||q||^2).
    """
    init_d = gathered_dists(queries, data, init_ids, metric, norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, width)
    qn = queries.shape[0]
    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.sum(init_ids >= 0, axis=1).astype(jnp.int32)

    def cond(state):
        _, _, r_e, _, hops, _ = state
        return jnp.any(~r_e) & (jnp.max(hops) < max_hops)

    def body(state):
        r_d, r_i, r_e, it, hops, evals = state
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
        nbrs = jnp.take(adj, jnp.where(sel_ids >= 0, sel_ids, 0), axis=0)
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, PAD_ID)
        nbrs = nbrs.reshape(qn, -1)
        cd = gathered_dists(queries, data, nbrs, metric, norms)
        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, cd, nbrs)
        hops = hops + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        evals = evals + jnp.sum(nbrs >= 0, axis=1).astype(jnp.int32)
        return r_d, r_i, r_e, it + 1, hops, evals

    r_d, r_i, r_e, _, hops, evals = jax.lax.while_loop(
        cond, body, (r_d, r_i, r_e, jnp.int32(0), hops, evals)
    )
    return BeamResult(r_d, r_i, hops, evals)


@functools.partial(
    jax.jit,
    static_argnames=("expand", "n_hops", "metric", "use_kernel"),
)
def _scan_hops_adj(queries, data, norms, adj, r_d, r_i, r_e,
                   sel_ids, sel_valid, hops, evals,
                   expand: int, n_hops: int, metric: str, use_kernel: bool):
    """n_hops lockstep expansions over a padded-adjacency graph as ONE
    compiled scan (`beam_search`'s while_loop pays a ~0.5 ms host
    round-trip per data-dependent cond on this backend). Pipelined
    expand-first like records._scan_hops; the merge+select either runs the
    fused Pallas kernel (ops/merge_select.py) or the equivalent XLA
    composition (CPU)."""
    qn = queries.shape[0]

    def merge_select(r_d, r_i, r_e, cd, ci):
        if use_kernel:
            from ..ops.merge_select import fused_merge_select
            return fused_merge_select(r_d, r_i, r_e, cd, ci, expand)
        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, cd, ci)
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
        return r_d, r_i, r_e, sel_ids, sel_valid

    def body(carry, _):
        r_d, r_i, r_e, sel_ids, sel_valid, hops, evals = carry
        nbrs = jnp.take(adj, jnp.where(sel_ids >= 0, sel_ids, 0), axis=0)
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, PAD_ID)
        nbrs = nbrs.reshape(qn, -1)
        cd = gathered_dists(queries, data, nbrs, metric, norms)
        hops = hops + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        evals = evals + jnp.sum(nbrs >= 0, axis=1).astype(jnp.int32)
        r_d, r_i, r_e, sel_ids, sel_valid = merge_select(
            r_d, r_i, r_e, cd, nbrs
        )
        return (r_d, r_i, r_e, sel_ids, sel_valid, hops, evals), None

    (r_d, r_i, r_e, sel_ids, sel_valid, hops, evals), _ = jax.lax.scan(
        body, (r_d, r_i, r_e, sel_ids, sel_valid, hops, evals),
        None, length=n_hops,
    )
    return r_d, r_i, r_e, sel_ids, sel_valid, hops, evals


@jax.jit
def _compact_adj_batch(sel, live, q, r_d, r_i, r_e, sel_ids, sel_valid,
                       hops, evals, orig):
    take = functools.partial(jnp.take, indices=sel, axis=0)
    r_e_c = jnp.where(live[:, None], take(r_e), True)
    sid_c = jnp.where(live[:, None], take(sel_ids), PAD_ID)
    sva_c = jnp.where(live[:, None], take(sel_valid), False)
    orig_c = jnp.where(live, take(orig), jnp.iinfo(jnp.int32).max)
    return (take(q), take(r_d), take(r_i), r_e_c, sid_c, sva_c,
            take(hops), take(evals), orig_c)


@jax.jit
def _scatter_back(f_d, f_i, f_h, f_e, orig, r_d, r_i, hops, evals):
    f_d = f_d.at[orig].set(r_d, mode="drop")
    f_i = f_i.at[orig].set(r_i, mode="drop")
    f_h = f_h.at[orig].set(hops, mode="drop")
    f_e = f_e.at[orig].set(evals, mode="drop")
    return f_d, f_i, f_h, f_e


def beam_search_chunked(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    adj: jax.Array,
    init_ids: jax.Array,
    width: int,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
    chunk_hops: int = 32,
    min_compact: int = 256,
    use_kernel: bool | None = None,
) -> BeamResult:
    """``beam_search`` semantics, host-chunked: hops run in compiled
    ``lax.scan`` chunks with ONE host convergence check per chunk, the
    per-hop merge+select fused into a Pallas pass on TPU, and converged
    queries compacted out between chunks (see beam_search_records for the
    compaction rationale). Use this from host-driven code; ``beam_search``
    remains for callers inside jit/shard_map (parallel/mesh.py).
    """
    q = jnp.asarray(queries)
    qn = q.shape[0]
    init_d = gathered_dists(q, data, init_ids, metric, norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, width)
    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.sum(init_ids >= 0, axis=1).astype(jnp.int32)
    if use_kernel is None:
        from ..ops.merge_select import default_use_kernel
        use_kernel = default_use_kernel()

    sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
    final = None
    orig = jnp.arange(qn, dtype=jnp.int32)
    cur_q = qn
    hops_left = max_hops
    while hops_left > 0:
        n_hops = min(chunk_hops, hops_left)
        r_d, r_i, r_e, sel_ids, sel_valid, hops, evals = _scan_hops_adj(
            q, data, norms, adj, r_d, r_i, r_e, sel_ids, sel_valid,
            hops, evals, expand=expand, n_hops=n_hops, metric=metric,
            use_kernel=use_kernel,
        )
        hops_left -= n_hops
        act = np.asarray(jnp.any(sel_valid, axis=1))
        n_act = int(act.sum())
        if n_act == 0:
            break
        new_q = max(min_compact, 1 << int(np.ceil(np.log2(n_act))))
        if new_q <= cur_q // 2 and hops_left > 0:
            if final is None:
                final = (
                    jnp.zeros((qn, width), r_d.dtype),
                    jnp.full((qn, width), PAD_ID, jnp.int32),
                    jnp.zeros((qn,), jnp.int32),
                    jnp.zeros((qn,), jnp.int32),
                )
            final = _scatter_back(*final, orig, r_d, r_i, hops, evals)
            sel_np = np.zeros(new_q, np.int32)
            idx = np.nonzero(act)[0]
            sel_np[: n_act] = idx
            live_np = np.zeros(new_q, bool)
            live_np[: n_act] = True
            (q, r_d, r_i, r_e, sel_ids, sel_valid, hops, evals,
             orig) = _compact_adj_batch(
                jnp.asarray(sel_np), jnp.asarray(live_np),
                q, r_d, r_i, r_e, sel_ids, sel_valid, hops, evals, orig,
            )
            cur_q = new_q
    if final is None:
        return BeamResult(r_d, r_i, hops, evals)
    f_d, f_i, f_h, f_e = _scatter_back(*final, orig, r_d, r_i, hops, evals)
    return BeamResult(f_d, f_i, f_h, f_e)


@functools.partial(
    jax.jit,
    static_argnames=("expand", "n_hops", "metric", "use_kernel"),
)
def _scan_hops_collect(queries, data, norms, adj, r_d, r_i, r_e,
                       p_d, p_i, sel_ids, sel_valid, hops, evals,
                       expand: int, n_hops: int, metric: str,
                       use_kernel: bool):
    """_scan_hops_adj that additionally folds every evaluated candidate
    into a sorted top-`collect` pool (beam_search_collect's fullset).
    The pool fold reuses the fused merge kernel with a throwaway
    selection (pool expansion flags are meaningless and reset to False
    every hop, as in the while_loop variant)."""
    qn = queries.shape[0]
    p_e0 = jnp.zeros(p_d.shape, jnp.bool_)

    def merge_select(r_d, r_i, r_e, cd, ci):
        if use_kernel:
            from ..ops.merge_select import fused_merge_select
            return fused_merge_select(r_d, r_i, r_e, cd, ci, expand)
        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, cd, ci)
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
        return r_d, r_i, r_e, sel_ids, sel_valid

    def merge_pool(p_d, p_i, cd, ci):
        if use_kernel:
            from ..ops.merge_select import fused_merge_select
            p_d, p_i, _, _, _ = fused_merge_select(
                p_d, p_i, p_e0, cd, ci, 1
            )
            return p_d, p_i
        p_d, p_i, _ = merge_into_retset(p_d, p_i, p_e0, cd, ci)
        return p_d, p_i

    def body(carry, _):
        r_d, r_i, r_e, p_d, p_i, sel_ids, sel_valid, hops, evals = carry
        nbrs = jnp.take(adj, jnp.where(sel_ids >= 0, sel_ids, 0), axis=0)
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, PAD_ID)
        nbrs = nbrs.reshape(qn, -1)
        cd = gathered_dists(queries, data, nbrs, metric, norms)
        hops = hops + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        evals = evals + jnp.sum(nbrs >= 0, axis=1).astype(jnp.int32)
        p_d, p_i = merge_pool(p_d, p_i, cd, nbrs)
        r_d, r_i, r_e, sel_ids, sel_valid = merge_select(
            r_d, r_i, r_e, cd, nbrs
        )
        return (r_d, r_i, r_e, p_d, p_i, sel_ids, sel_valid,
                hops, evals), None

    carry, _ = jax.lax.scan(
        body,
        (r_d, r_i, r_e, p_d, p_i, sel_ids, sel_valid, hops, evals),
        None, length=n_hops,
    )
    return carry


def beam_search_collect_chunked(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    adj: jax.Array,
    init_ids: jax.Array,
    width: int,
    collect: int,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
    chunk_hops: int = 32,
    use_kernel: bool | None = None,
):
    """``beam_search_collect`` semantics, host-chunked with the fused
    merge kernel (see beam_search_chunked). No query compaction: the
    pool arrays are large and the collect path is build-time only.

    Returns (BeamResult, pool_ids [Q, collect], pool_dists [Q, collect]).
    """
    q = jnp.asarray(queries)
    qn = q.shape[0]
    init_d = gathered_dists(q, data, init_ids, metric, norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, width)
    p_d, p_i, _ = init_retset(init_d, init_ids, collect)
    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.sum(init_ids >= 0, axis=1).astype(jnp.int32)
    if use_kernel is None:
        from ..ops.merge_select import default_use_kernel
        use_kernel = default_use_kernel()

    sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
    hops_left = max_hops
    while hops_left > 0:
        n_hops = min(chunk_hops, hops_left)
        (r_d, r_i, r_e, p_d, p_i, sel_ids, sel_valid, hops,
         evals) = _scan_hops_collect(
            q, data, norms, adj, r_d, r_i, r_e, p_d, p_i,
            sel_ids, sel_valid, hops, evals,
            expand=expand, n_hops=n_hops, metric=metric,
            use_kernel=use_kernel,
        )
        hops_left -= n_hops
        if not bool(np.asarray(jnp.any(sel_valid))):
            break
    return BeamResult(r_d, r_i, hops, evals), p_i, p_d


@functools.partial(jax.jit, static_argnames=("metric", "max_hops"))
def greedy_descent(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    adj: jax.Array,
    start_ids: jax.Array,
    metric: str = "l2",
    max_hops: int = 256,
):
    """Batched 1-best greedy walk (hnswlib upper-level descent,
    hnswalg.h:1278-1303): move to the closest neighbor while it improves.

    queries: [Q, d]; start_ids: [Q] int32. Returns (ids [Q], dists [Q]) with
    dists in FastL2 form for l2.
    """
    cur_d = gathered_dists(
        queries, data, start_ids[:, None], metric, norms
    )[:, 0]
    cur = start_ids

    def cond(state):
        _, _, moved, it = state
        return jnp.any(moved) & (it < max_hops)

    def body(state):
        cur, cur_d, _, it = state
        nbrs = jnp.take(adj, jnp.where(cur >= 0, cur, 0), axis=0)  # [Q, R]
        nd = gathered_dists(queries, data, nbrs, metric, norms)
        best = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, best[:, None], axis=1)[:, 0]
        best_id = jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0]
        moved = best_d < cur_d
        cur = jnp.where(moved, best_id, cur)
        cur_d = jnp.where(moved, best_d, cur_d)
        return cur, cur_d, moved, it + 1

    cur, cur_d, _, _ = jax.lax.while_loop(
        cond, body,
        (cur, cur_d, jnp.ones_like(cur, dtype=jnp.bool_), jnp.int32(0)),
    )
    return cur, cur_d


@functools.partial(
    jax.jit,
    static_argnames=("width", "metric", "max_hops", "expand", "collect"),
)
def beam_search_collect(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    adj: jax.Array,
    init_ids: jax.Array,
    width: int,
    collect: int,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
):
    """beam_search that additionally keeps the closest `collect` evaluated
    (id, dist) pairs.

    This is the reference's ``get_neighbors`` (CNNS/src/nsg/index_nsg.cpp:
    150-285) feeding ``sync_prune``: get_neighbors collects the *fullset* of
    every candidate evaluated, sync_prune sorts it by distance and scans only
    the first C. Keeping a sorted top-`collect` pool during the search is
    exactly equivalent to (sort-full-pool, scan first C) while bounding
    memory to [Q, collect].

    Returns (BeamResult, pool_ids [Q, collect], pool_dists [Q, collect]),
    pool sorted ascending, PAD-padded, deduplicated.
    """
    qn = queries.shape[0]
    init_d = gathered_dists(queries, data, init_ids, metric, norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, width)
    p_d, p_i, _ = init_retset(init_d, init_ids, collect)
    p_e = jnp.zeros_like(p_i, dtype=jnp.bool_)  # pool has no expansion flags

    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.sum(init_ids >= 0, axis=1).astype(jnp.int32)

    def cond(state):
        r_e = state[2]
        hops = state[4]
        return jnp.any(~r_e) & (jnp.max(hops) < max_hops)

    def body(state):
        r_d, r_i, r_e, it, hops, evals, p_d, p_i = state
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
        nbrs = jnp.take(adj, jnp.where(sel_ids >= 0, sel_ids, 0), axis=0)
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, PAD_ID)
        nbrs = nbrs.reshape(qn, -1)
        cd = gathered_dists(queries, data, nbrs, metric, norms)
        p_d, p_i, _ = merge_into_retset(p_d, p_i, p_e, cd, nbrs)
        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, cd, nbrs)
        hops = hops + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        evals = evals + jnp.sum(nbrs >= 0, axis=1).astype(jnp.int32)
        return r_d, r_i, r_e, it + 1, hops, evals, p_d, p_i

    state = (r_d, r_i, r_e, jnp.int32(0), hops, evals, p_d, p_i)
    r_d, r_i, r_e, _, hops, evals, p_d, p_i = jax.lax.while_loop(
        cond, body, state
    )
    return BeamResult(r_d, r_i, hops, evals), p_i, p_d


@functools.partial(
    jax.jit,
    static_argnames=("width", "metric", "max_hops", "expand"),
)
def beam_search_filtered(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    adj: jax.Array,
    init_ids: jax.Array,
    width: int,
    accept: jax.Array,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
) -> BeamResult:
    """beam_search with *in-traversal* filtering.

    ``accept``: bool [N] — nodes allowed in results (filter functor pass +
    not deleted). Rejected nodes are still traversed (their edges are
    followed) but never enter the result pool, and — the part the post-hoc
    mask cannot do — exploration continues until ``width`` *accepted*
    results exist or the frontier is exhausted. This matches the
    reference's searchBaseLayerST<false> (hnswalg.h:309-440): candidates
    enter the candidate heap whenever ``dist < lowerBound or results not
    full`` (:397-404), results only if they pass filter+deleted checks
    (:406-425), and the loop breaks when the best candidate is worse than
    the full result heap's lower bound (:375-380).

    Returns the ACCEPTED result pool (dists FastL2-form for l2, ids
    PAD-padded). hops/evals count as in beam_search.
    """
    qn = queries.shape[0]
    init_d = gathered_dists(queries, data, init_ids, metric, norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, width)

    acc = jnp.asarray(accept, jnp.bool_)

    def accepted_only(d, i):
        ok = acc[jnp.where(i >= 0, i, 0)] & (i >= 0)
        return jnp.where(ok, d, PAD_DIST), jnp.where(ok, i, PAD_ID)

    p_d, p_i, _ = init_retset(*accepted_only(init_d, init_ids), width)
    p_e = jnp.zeros_like(p_i, dtype=jnp.bool_)

    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.sum(init_ids >= 0, axis=1).astype(jnp.int32)

    def cond(state):
        r_d, r_i, r_e, p_d, it, hops, evals, p_i = state
        # a query is live while it has an unexpanded candidate closer than
        # the accepted pool's lower bound (PAD_DIST while the pool is not
        # full -> keep exploring, hnswalg.h:375-380 with bare_bone=false)
        bound = p_d[:, -1]
        live = jnp.any(~r_e & (r_d < bound[:, None]), axis=1)
        return jnp.any(live) & (it < max_hops)

    def body(state):
        r_d, r_i, r_e, p_d, it, hops, evals, p_i = state
        bound = p_d[:, -1]
        # kill frontier slots at/beyond the bound before selection
        r_e = r_e | (r_d >= bound[:, None])
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
        nbrs = jnp.take(adj, jnp.where(sel_ids >= 0, sel_ids, 0), axis=0)
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, PAD_ID)
        nbrs = nbrs.reshape(qn, -1)
        cd = gathered_dists(queries, data, nbrs, metric, norms)
        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, cd, nbrs)
        ad, ai = accepted_only(cd, nbrs)
        p_d, p_i, _ = merge_into_retset(p_d, p_i, p_e, ad, ai)
        hops = hops + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        evals = evals + jnp.sum(nbrs >= 0, axis=1).astype(jnp.int32)
        return r_d, r_i, r_e, p_d, it + 1, hops, evals, p_i

    state = (r_d, r_i, r_e, p_d, jnp.int32(0), hops, evals, p_i)
    r_d, r_i, r_e, p_d, _, hops, evals, p_i = jax.lax.while_loop(
        cond, body, state
    )
    return BeamResult(p_d, p_i, hops, evals)


def random_fill_ids(key, n: int, shape, forbid=None):
    """Uniform random node ids, the reference's random init fill
    (index_nsg.cpp:522-528). forbid: optional [Q, F] ids to avoid exactly
    isn't needed — duplicates are dropped by retset dedup downstream."""
    return jax.random.randint(key, shape, 0, n, dtype=jnp.int32)
