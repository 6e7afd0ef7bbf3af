"""Hierarchical NSW (HNSW) — TPU-native engine.

Reference: ``HierarchicalNSW`` (hnswlib/hnswlib/hnswalg.h, 1412 LoC). The
mapping of its machinery onto TPU:

  * flat node arena + per-node malloc'd upper links (hnswalg.h:120-141) ->
    padded adjacency arrays: level 0 ``int32[cap, 2M]``, levels >= 1
    ``int32[cap, M]`` each (upper levels hold ~N/M^l live rows);
  * ``addPoint``'s per-element lock dance (hnswalg.h:954-992, 1153-1267) ->
    bulk-synchronous batched insertion: a whole batch descends greedily,
    beam-collects ef_construction candidates per level, prunes with the
    shared occlusion kernel (getNeighborsByHeuristic2, :443-483 — the same
    rule as NSG's sync_prune), links, and applies reverse edges with
    overflow re-pruning (mutuallyConnectNewElement, :506-630). Intra-batch
    connectivity comes from a batch-pairwise GEMM merged into the candidate
    pools (the sequential reference gets this for free; batched, it is one
    [B, B] distance block);
  * level sampling ``-log(U) * mult_`` with ``mult_ = 1/ln(M)``
    (hnswalg.h:207-211);
  * ``searchKnn`` (:1270-1324) -> batched greedy descent over upper levels +
    the shared lockstep ef-beam at level 0;
  * delete machinery (markDelete/unmarkDelete, :853-937) -> a boolean mask;
    deleted nodes stay traversable but are filtered from results, matching
    the reference's behavior;
  * ``resizeIndex`` (:633-656), label mapping, ``checkIntegrity`` (:1381-
    1410) and hop/distance metrics all have direct equivalents.

VisitedList pools, label-stripe locks and the global enterpoint lock have no
TPU counterpart — batched construction rounds replace fine-grained
concurrency (SURVEY.md §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import (
    PAD_DIST,
    PAD_ID,
    as_f32_queries,
    gathered_dists,
    pairwise_dists,
    squared_norms,
)
from ..ops.topk import topk_smallest
from ..utils.params import HNSWConfig
from .beam import (
    beam_search_chunked,
    beam_search_filtered,
    greedy_descent,
)
from .prune import occlusion_prune_padded

_BIG = np.float32(3.4e37)


@functools.partial(jax.jit, static_argnames=("metric", "n_valid"))
def _route_entry_gemm(q, data_up, norms_up, ids_up, metric, n_valid):
    """Exact level-0 entry selection: one MXU pass over every level>=1
    node. The upper hierarchy's only query-time job is picking a good
    level-0 entry (hnswalg.h:1278-1303 approximates "nearest level-1
    node" by greedy walking); with only ~N/M such nodes the whole
    candidate set fits one [Q, n1] GEMM, which returns the *optimal*
    entry with zero data-dependent gathers and zero sequential hops."""
    d = pairwise_dists(
        q.astype(data_up.dtype), data_up, metric, norms_up, exact=False
    )
    mask = jnp.arange(data_up.shape[0]) < n_valid
    d = jnp.where(mask[None, :], d, jnp.inf)
    return jnp.take(ids_up, jnp.argmin(d, axis=1))


@functools.partial(
    jax.jit, static_argnames=("cap_deg", "metric", "use_cache"),
)
def _reverse_insert_jit(adj_l, cache_d, data, norms, kept_i, kept_d,
                        cols, src, rows_j, live, cap_deg: int,
                        metric: str, use_cache: bool):
    """Whole reverse-edge insertion round as one compiled program
    (mutuallyConnectNewElement's second half, hnswalg.h:554-627):

      1. proposal scatter inc[dst, rand_col] = (src, d);
      2. existing-link distances from the adj0_d cache (``use_cache``) or
         recomputed by a gathered distance pass;
      3. pool = existing ++ incoming, sorted dedup merge (the room/append
         path) + overflow detection;
      4. occlusion re-prune over EVERY bucket row, applied only where the
         row actually overflows (jnp.where select). Pruning the
         non-overflow rows too wastes ~the overflow fraction's complement
         of prune work, but removes the mid-phase host sync and the
         overflow-count compile variants the previous two-program version
         paid — host dispatch round-trips dominated insert wall-clock.

    cache_d must be a real array even when use_cache=False (pass any f32
    array; it is returned untouched)."""
    cap = adj_l.shape[0]
    b, m = kept_i.shape
    bucket = rows_j.shape[0]
    dst_idx = jnp.where(kept_i >= 0, kept_i, cap)
    src_b = jnp.broadcast_to(src[:, None], (b, m))
    inc = jnp.full((cap, cap_deg), PAD_ID, jnp.int32).at[
        dst_idx.reshape(-1), cols.reshape(-1)
    ].set(src_b.reshape(-1), mode="drop")
    inc_d = jnp.full((cap, cap_deg), PAD_DIST, jnp.float32).at[
        dst_idx.reshape(-1), cols.reshape(-1)
    ].set(kept_d.reshape(-1), mode="drop")

    exist = jnp.take(adj_l, rows_j, axis=0)[:, :cap_deg]
    if use_cache:
        exist_d = jnp.take(cache_d, rows_j, axis=0)[:, :cap_deg]
    else:
        vecs_all = jnp.take(data, rows_j, axis=0)
        exist_d = gathered_dists(
            vecs_all, data, exist, metric, norms, exact=True,
        )
    pool_i = jnp.concatenate(
        [exist, jnp.take(inc, rows_j, axis=0)], axis=1
    )
    pool_d = jnp.concatenate(
        [exist_d, jnp.take(inc_d, rows_j, axis=0)], axis=1
    )
    # drop duplicate (dst already links src) via sorted-dedup merge;
    # result doubles as the "room" (append) path
    from ..ops.topk import merge_into_retset_sorted
    md, mi, _ = merge_into_retset_sorted(
        jnp.full((bucket, cap_deg), PAD_DIST, jnp.float32),
        jnp.full((bucket, cap_deg), PAD_ID, jnp.int32),
        jnp.ones((bucket, cap_deg), jnp.bool_),
        pool_d, pool_i,
    )
    sp = jnp.sort(pool_i, axis=1)
    distinct = (sp >= 0) & jnp.concatenate(
        [jnp.ones_like(sp[:, :1], dtype=jnp.bool_),
         sp[:, 1:] != sp[:, :-1]],
        axis=1,
    )
    overflow = (jnp.sum(distinct, axis=1) > cap_deg) & live

    from .prune import occlusion_prune_padded
    kept2_i, kept2_d = occlusion_prune_padded(
        jnp.take(data, rows_j, axis=0),
        jnp.where(live[:, None], pool_i, PAD_ID),
        pool_d,
        data, norms,
        max_keep=cap_deg, metric=metric, self_ids=rows_j,
    )
    new_rows = jnp.where(overflow[:, None], kept2_i, mi)
    new_d = jnp.where(overflow[:, None], kept2_d, md)

    w = adj_l.shape[1]
    if w > cap_deg:
        new_rows = jnp.concatenate(
            [new_rows,
             jnp.full((bucket, w - cap_deg), PAD_ID, jnp.int32)],
            axis=1,
        )
    write_rows = jnp.where(live, rows_j, cap)
    adj_l = adj_l.at[write_rows].set(new_rows, mode="drop")
    if use_cache:
        if w > cap_deg:
            new_d = jnp.concatenate(
                [new_d,
                 jnp.full((bucket, w - cap_deg), PAD_DIST, jnp.float32)],
                axis=1,
            )
        cache_d = cache_d.at[write_rows].set(new_d, mode="drop")
    return adj_l, cache_d


def _arena_cap(max_elements: int) -> int:
    """Arena row capacity for a requested element count.

    Arrays allocate at a bucketed capacity: kernel cache keys include the
    arena shape, so arbitrary capacities would recompile everything per
    index size. Power-of-two buckets up to 8M keep the bucket count
    log-small; beyond that the pow2 tax is ruinous (16.78M rows for a 10M
    index = ~1.7x the HBM for data+adjacency+norms), so large arenas
    round up at 2M granularity instead — waste is bounded by <2M rows
    while the distinct-shape count stays small.
    """
    if max_elements <= (1 << 23):
        cap = 1024
        while cap < max_elements:
            cap *= 2
        return cap
    g = 1 << 21
    return -(-max_elements // g) * g


class HNSWIndex:
    """Mutable HNSW index over a fixed-capacity arena."""

    def __init__(
        self,
        dim: int,
        max_elements: int,
        cfg: HNSWConfig = HNSWConfig(),
        metric: str = "l2",
        dtype=jnp.float32,
    ):
        self.dim = dim
        self.max_elements = int(max_elements)
        self.cap = _arena_cap(self.max_elements)
        self.cfg = cfg
        self.metric = metric
        self.dtype = dtype

        self.n = 0
        self.max_level = -1
        self.ep = PAD_ID

        self.data = jnp.zeros((self.cap, dim), dtype)
        self.norms = jnp.zeros((self.cap,), jnp.float32)
        self.levels = np.zeros((self.cap,), np.int32)
        self.adj0 = jnp.full((self.cap, 2 * cfg.M), PAD_ID, jnp.int32)
        # optional cached exact metric distance of every level-0 link:
        # adj0_d[i, j] = d(data[i], data[adj0[i, j]]) (PAD_DIST on pads).
        # Reverse-edge insertion needs the receiving node's existing link
        # distances every batch; with the whole round fused into one
        # jitted program (_reverse_insert_jit) the in-jit gathered
        # recompute measures CHEAPER than maintaining this cache (the
        # cache adds a full-array copy per batch: 1,423 vs 1,138 pts/s at
        # 200k, round-4 insert A/B), so it is OFF by default —
        # HNSWConfig.link_dist_cache opts in. None also after file loads.
        self.adj0_d: jax.Array | None = (
            jnp.full((self.cap, 2 * cfg.M), PAD_DIST, jnp.float32)
            if cfg.link_dist_cache else None
        )
        self.adj_up: list[jax.Array] = []  # level l adjacency at index l-1

        self.deleted = np.zeros((self.cap,), bool)
        self.num_deleted = 0
        self.labels = np.full((self.cap,), -1, np.int64)
        self.label_to_id: dict[int, int] = {}

        self._rng = np.random.default_rng(cfg.random_seed)
        # derived int8 record layout for accelerated level-0 search
        # (models/records.py); rebuilt on demand, invalidated by mutation
        # unless add_items(accel=True) maintains it incrementally
        self._records = None
        self._dataq = None        # [cap, 4, nw] quantized vectors
        self._maintain_records = False
        # cached (ids, bf16 rows, norms) of level>=1 nodes for routed
        # entry selection; invalidated by any mutation
        self._router = None
        # search metrics (metric_hops / metric_distance_computations,
        # hnswalg.h:65-66)
        self.metric_hops = 0
        self.metric_distance_computations = 0

    # ------------------------------------------------------------------
    # construction

    def _sample_levels(self, b: int) -> np.ndarray:
        u = self._rng.random(b)
        return (-np.log(u) * self.cfg.mult).astype(np.int32)

    def _adj_at(self, level: int) -> jax.Array:
        return self.adj0 if level == 0 else self.adj_up[level - 1]

    def _set_adj(self, level: int, adj: jax.Array) -> None:
        if level == 0:
            self.adj0 = adj
        else:
            self.adj_up[level - 1] = adj

    def _ensure_levels(self, lvl: int) -> None:
        while len(self.adj_up) < lvl:
            self.adj_up.append(
                jnp.full((self.cap, self.cfg.M), PAD_ID, jnp.int32)
            )

    def add_items(self, vecs, labels=None, batch_size: int = 4096,
                  repair: bool = True, accel: bool = False):
        """Batched insertion (the reference's parallel addItems,
        bindings.cpp:251-300, as bulk-synchronous rounds).

        ``repair``: run level-0 connectivity repair afterwards. The
        reference's sequential insert keeps the graph connected implicitly
        (an unreachable cluster's first points can only link to reachable
        nodes); bulk batches lose that mechanism on strongly clustered
        data, so we restore the invariant explicitly, NSG-tree_grow style
        (CNNS/src/nsg/index_nsg.cpp:748-764).

        ``accel``: maintain the packed int8 record layout incrementally and
        run the level-0 candidate beam over it — one fat-row gather per
        expansion instead of ~2M scattered ones (see models/records.py). Pool
        distances are re-computed exactly before pruning, so link selection
        quality is unchanged; the search simply walks the same graph
        through the fat-row layout. Leaves the index with live records, so
        subsequent knn_query calls take the accelerated path too."""
        if accel:
            self._maintain_records = True
        self._router = None
        vecs = np.asarray(vecs, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None]
        b_total = vecs.shape[0]
        if labels is None:
            labels = np.arange(self.n, self.n + b_total, dtype=np.int64)
        labels = np.asarray(labels, np.int64).reshape(b_total)
        if self.n + b_total > self.max_elements:
            raise RuntimeError(
                "The number of elements exceeds the specified limit"
            )  # hnswalg.h:1177-1179 wording
        pad_to = min(batch_size, max(self.cap - self.n, 1))
        s = 0
        if self.n == 0 and b_total > 64:
            # cold start: exponentially growing sub-batches. A sequential
            # insert's early points can only link to already-inserted
            # (possibly far) nodes, which is what stitches well-separated
            # clusters together; a single huge first batch would give every
            # point same-cluster candidates only. Doubling keeps the cost
            # O(batch) while reproducing that structure. All sub-batches are
            # padded to the same bucket so only one kernel set compiles.
            sub = 32
            while s < b_total and sub < batch_size:
                e = min(s + sub, b_total)
                self._insert_batch(vecs[s:e], labels[s:e], pad_to=pad_to)
                s = e
                sub *= 2
        for s in range(s, b_total, batch_size):
            e = min(s + batch_size, b_total)
            self._insert_batch(vecs[s:e], labels[s:e], pad_to=pad_to)
        if repair:
            self.repair_connectivity()

    def repair_connectivity(self, max_rounds: int = 32) -> int:
        """Make every node reachable from the enterpoint at level 0.

        Host BFS over the level-0 adjacency; each round batch-searches up
        to 256 unreachable component representatives from the enterpoint
        and links them from their nearest reachable candidate (findroot,
        index_nsg.cpp:712-747). Returns the number of edges added."""
        if self.n <= 1:
            return 0
        if not self._maintain_records:
            self._records = None
        adj0 = np.array(self.adj0[: self.n])
        cap0 = 2 * self.cfg.M

        def bfs(seeds, visited):
            frontier = np.asarray(seeds, dtype=np.int64)
            visited[frontier] = True
            while len(frontier):
                nxt = adj0[frontier].reshape(-1)
                nxt = nxt[nxt >= 0]
                nxt = np.unique(nxt)
                nxt = nxt[~visited[nxt]]
                visited[nxt] = True
                frontier = nxt
            return visited

        visited = bfs([self.ep], np.zeros(self.n, bool))
        added = 0
        touched_l = []
        edge_triples = []  # (attach, slot, root) for the dist cache
        for _ in range(max_rounds):
            if visited.all():
                break
            reps = np.nonzero(~visited)[0][:256]
            res = beam_search_chunked(
                jnp.take(self.data, jnp.asarray(reps), axis=0),
                self.data, self.norms, jnp.asarray(adj0),
                jnp.full((len(reps), 1), self.ep, jnp.int32),
                width=self.cfg.ef_construction, metric=self.metric,
                max_hops=256, expand=self.cfg.insert_expand,
            )
            ids = np.asarray(res.ids)
            for b, root in enumerate(reps):
                if visited[root]:
                    continue
                cand = ids[b]
                cand = cand[cand >= 0]
                cand = cand[visited[cand]] if len(cand) else cand
                attach = int(cand[0]) if len(cand) else int(self.ep)
                deg = int((adj0[attach] >= 0).sum())
                slot = deg if deg < cap0 else cap0 - 1
                adj0[attach, slot] = root
                touched_l.append(attach)
                edge_triples.append((attach, slot, root))
                added += 1
                visited = bfs([root], visited)
        self.adj0 = self.adj0.at[: self.n].set(jnp.asarray(adj0))
        if edge_triples and self.adj0_d is not None:
            at, sl, rt = (np.asarray(v, np.int32)
                          for v in zip(*edge_triples))
            dd = gathered_dists(
                jnp.take(self.data, jnp.asarray(at), axis=0),
                self.data, jnp.asarray(rt)[:, None], self.metric,
                self.norms, exact=True,
            )[:, 0]
            self.adj0_d = self.adj0_d.at[(jnp.asarray(at),
                                          jnp.asarray(sl))].set(dd)
        if added and self._maintain_records and self._records is not None:
            self._refresh_record_rows(np.asarray(touched_l, np.int64).astype(np.int32))
        return added

    def _init_records_state(self, x_sample: np.ndarray,
                            max_degree: int = 30) -> None:
        """Allocate the maintained record arena + quantized-vector store."""
        from .records import RecordGraph, _layout, build_record_graph

        deg = min(max_degree, self.adj0.shape[1])
        scale = max(float(np.abs(x_sample).max()), 1e-20) * 1.25 / 127.0
        g = build_record_graph(
            self.data, self.adj0[:, :deg], self.norms, scale=scale
        )
        self._records = g
        nw, _ = _layout(deg, self.dim)
        from .records import quantize_rows
        self._dataq = quantize_rows(self.data, jnp.float32(scale), nw)

    def _refresh_record_rows(self, dirty_ids: np.ndarray) -> None:
        """Repack the records of rows whose adjacency changed."""
        from .records import RecordGraph, _layout, update_record_rows

        g = self._records
        nw, _ = _layout(g.r, g.d)
        dirty = np.unique(dirty_ids[dirty_ids >= 0]).astype(np.int32)
        if len(dirty) == 0:
            return
        bucket = 1024
        while bucket < len(dirty):
            bucket *= 2
        pad = np.full(bucket, -1, np.int32)
        pad[: len(dirty)] = dirty
        rows_j = jnp.asarray(np.where(pad >= 0, pad, 0))
        adj_rows = jnp.take(self.adj0, rows_j, axis=0)[:, : g.r]
        new_rows = update_record_rows(
            g.rows, self._dataq, self.norms, adj_rows,
            jnp.asarray(pad), nw=nw,
        )
        self._records = RecordGraph(
            rows=new_rows, scale=g.scale, r=g.r, d=g.d
        )

    def _insert_batch(self, x: np.ndarray, labels: np.ndarray,
                      pad_to: int | None = None) -> None:
        # HNSW_PROFILE=1: per-phase wall clock (device-synchronized) on
        # stderr — insert-throughput tuning aid, zero cost when unset
        import os as _os
        _prof = bool(_os.environ.get("HNSW_PROFILE"))
        if _prof:
            import sys as _sys
            import time as _time
            _marks = [("start", _time.time())]

            def _mark(name, *arrs):
                jax.block_until_ready(
                    [a for a in arrs if a is not None] or self.adj0
                )
                jax.block_until_ready(self.adj0)
                _marks.append((name, _time.time()))
        else:
            def _mark(name, *arrs):
                pass
        if not self._maintain_records:
            self._records = None
        elif self._records is None:
            self._init_records_state(x)
        accel = self._maintain_records and self._records is not None
        cfg = self.cfg
        b_real = x.shape[0]
        # pad the batch to a fixed bucket so every insert compiles the same
        # kernels regardless of (sub-)batch size; dummy rows get level=-1 and
        # are excluded from every write
        b = max(pad_to or b_real, b_real)
        if b > b_real:
            x = np.concatenate(
                [x, np.broadcast_to(x[:1], (b - b_real, x.shape[1]))]
            )
        ids_np = np.arange(self.n, self.n + b, dtype=np.int32)
        new_levels = self._sample_levels(b)
        new_levels[b_real:] = -1
        batch_max_level = int(new_levels.max())
        self._ensure_levels(batch_max_level)

        xj = jnp.asarray(x, self.dtype)
        self.data = jax.lax.dynamic_update_slice_in_dim(
            self.data, xj[:b_real], self.n, axis=0
        )
        self.norms = jax.lax.dynamic_update_slice_in_dim(
            self.norms, squared_norms(xj[:b_real]), self.n, axis=0
        )
        self.levels[self.n : self.n + b_real] = new_levels[:b_real]
        self.labels[self.n : self.n + b_real] = labels
        for i, lab in enumerate(labels):
            self.label_to_id[int(lab)] = int(ids_np[i])

        ids = jnp.asarray(ids_np)
        qn = squared_norms(xj) if self.metric == "l2" else jnp.zeros((b,))
        if accel:
            # append the batch to the quantized store so reverse-edge
            # record refreshes can reference the new ids
            from .records import _layout, quantize_rows
            nw, _ = _layout(self._records.r, self.dim)
            self._dataq = jax.lax.dynamic_update_slice(
                self._dataq,
                quantize_rows(xj[:b_real], self._records.scale, nw),
                (self.n, 0, 0),
            )

        # ---- phase 1: collect candidate pools per level from the old
        # graph. Pools store EXACT metric distances (pruning needs them on
        # the pair-distance scale).
        pools: dict[int, tuple] = {}
        if self.n > 0:
            cur = jnp.full((b,), self.ep, jnp.int32)
            for lvl in range(self.max_level, -1, -1):
                adj_l = self._adj_at(lvl)
                beam_rows = new_levels >= lvl
                if not beam_rows.any():
                    cur, _ = greedy_descent(
                        xj, self.data, self.norms, adj_l, cur,
                        metric=self.metric,
                    )
                    continue
                if lvl == 0 and accel:
                    # record-layout beam: same graph walk, one fat-row
                    # gather per expansion; its int8 distances are NOT
                    # used — the pool is re-distanced exactly below
                    from .records import beam_search_records
                    res = beam_search_records(
                        xj, self.data, self.norms, self._records,
                        cur[:, None], width=cfg.ef_construction,
                        metric=self.metric, max_hops=256,
                        expand=cfg.insert_expand,
                    )
                    pd = gathered_dists(
                        xj, self.data, res.ids, self.metric, self.norms,
                        exact=True,
                    )
                else:
                    res = beam_search_chunked(
                        xj, self.data, self.norms, adj_l, cur[:, None],
                        width=cfg.ef_construction, metric=self.metric,
                        max_hops=256, expand=cfg.insert_expand,
                    )
                    pd = res.dists + (
                        qn[:, None] if self.metric == "l2" else 0.0
                    )
                pools[lvl] = (pd, res.ids)
                cur = res.ids[:, 0]
        else:
            pools = {}
        _mark("beams", *(p[0] for p in pools.values()))

        # ---- phase 2: intra-batch candidates (one [B, B] GEMM)
        if b > 1:
            bb = pairwise_dists(
                jnp.asarray(x), jnp.asarray(x), self.metric, exact=True
            )
            eye = jnp.eye(b, dtype=jnp.bool_)
            bb = jnp.where(eye, PAD_DIST, bb)
            take = min(cfg.ef_construction, b - 1)
            bb_d, bb_j = jax.lax.top_k(-bb, take)
            bb_d = -bb_d
            bb_ids = ids[bb_j]  # global ids of batch peers
            bb_peer_levels = jnp.asarray(new_levels)[bb_j]
        else:
            bb_d = bb_ids = bb_peer_levels = None
        _mark("intra_batch", bb_d)

        # ---- phase 3: per level, prune + link + reverse insert.
        # Row sets are padded to power-of-two buckets: their lengths differ
        # every batch, and unbucketed they would force a fresh compile of
        # every eager op each batch (the dominant cost on a
        # remote-compilation TPU).
        new_edges = []  # (level, src, dst, dist) accumulated then applied
        for lvl in range(batch_max_level, -1, -1):
            rows = np.nonzero(new_levels >= lvl)[0]
            if len(rows) == 0:
                continue
            bucket = 64
            while bucket < len(rows):
                bucket *= 2
            bucket = min(bucket, b)
            rows_pad = np.full(bucket, -1, np.int64)
            rows_pad[: len(rows)] = rows
            live = jnp.asarray(rows_pad >= 0)
            rows_j = jnp.asarray(np.where(rows_pad >= 0, rows_pad, 0))
            parts_i, parts_d = [], []
            if lvl in pools:
                pd, pi = pools[lvl]  # already exact metric values
                parts_i.append(pi[rows_j])
                parts_d.append(pd[rows_j])
            if bb_ids is not None:
                ok = bb_peer_levels[rows_j] >= lvl
                parts_i.append(jnp.where(ok, bb_ids[rows_j], PAD_ID))
                parts_d.append(
                    jnp.where(ok, bb_d[rows_j], PAD_DIST)
                )
            if not parts_i:
                continue
            pool_i = jnp.where(
                live[:, None], jnp.concatenate(parts_i, axis=1), PAD_ID
            )
            pool_d = jnp.concatenate(parts_d, axis=1)
            kept_i, kept_d = occlusion_prune_padded(
                xj[rows_j], pool_i, pool_d, self.data, self.norms,
                max_keep=cfg.M, metric=self.metric,
                self_ids=ids[rows_j],
            )
            # write the new nodes' rows (padded to row width; dead rows drop)
            adj_l = self._adj_at(lvl)
            w = adj_l.shape[1]
            rowbuf = jnp.full((bucket, w), PAD_ID, jnp.int32)
            rowbuf = rowbuf.at[:, : cfg.M].set(kept_i)
            write_rows = jnp.where(live, jnp.take(ids, rows_j), self.cap)
            adj_l = adj_l.at[write_rows].set(rowbuf, mode="drop")
            self._set_adj(lvl, adj_l)
            if lvl == 0 and self.adj0_d is not None:
                dbuf = jnp.full((bucket, w), PAD_DIST, jnp.float32)
                dbuf = dbuf.at[:, : cfg.M].set(kept_d)
                self.adj0_d = self.adj0_d.at[write_rows].set(
                    dbuf, mode="drop"
                )
            new_edges.append(
                (lvl, np.where(rows_pad >= 0, ids_np[0] + rows_pad, -1),
                 kept_i, kept_d)
            )

        _mark("prune_link")
        dirty = [ids_np[:b_real]]
        for lvl, src_ids, kept_i, kept_d in new_edges:
            dsts = self._reverse_insert(lvl, src_ids, kept_i, kept_d)
            if lvl == 0 and dsts is not None:
                dirty.append(dsts)
        _mark("reverse_insert")

        # ---- phase 4: enterpoint/bookkeeping
        if batch_max_level > self.max_level:
            self.max_level = batch_max_level
            self.ep = int(ids_np[int(np.argmax(new_levels))])
        if self.ep == PAD_ID:
            self.ep = int(ids_np[0])
        self.n += b_real
        if accel:
            self._refresh_record_rows(
                np.concatenate(dirty).astype(np.int32)
            )
        if _prof:
            _mark("records_refresh",
                  self._records.rows if self._records is not None else None)
            parts = " ".join(
                f"{name}={t1 - t0:.3f}s" for (_, t0), (name, t1)
                in zip(_marks, _marks[1:])
            )
            total = _marks[-1][1] - _marks[0][1]
            print(f"[insert_batch b={b_real} n={self.n}] total={total:.3f}s "
                  f"{parts}", file=_sys.stderr, flush=True)

    def _reverse_insert(
        self, lvl: int, src: np.ndarray, kept_i, kept_d,
    ) -> None:
        """Bidirectional linking with overflow re-prune
        (mutuallyConnectNewElement's second half, hnswalg.h:554-627).

        ONE device program per level (``_reverse_insert_jit``): proposals
        scatter into per-destination buffers (random-column reservoir,
        matching the batch's inherent nondeterminism); destinations with
        room merge-append (dedup by distance-sort, order-free equivalent
        of the reference's free-slot append); overflowing destinations
        occlusion-re-prune, selected by an in-program mask. Only the tiny
        destination-id list crosses to the host — the adjacency never
        does, and there is no mid-phase host sync (the pre-round-4
        eager-op version cost ~20 dispatches/level and dominated insert
        wall-clock at 1M)."""
        cap_deg = 2 * self.cfg.M if lvl == 0 else self.cfg.M
        kept_i = jnp.asarray(kept_i)
        kept_d = jnp.asarray(kept_d)
        kept_np = np.asarray(kept_i)
        dsts = np.unique(kept_np[kept_np >= 0])
        if len(dsts) == 0:
            return None
        adj_l = self._adj_at(lvl)

        b, m = kept_np.shape
        rng_cols = self._rng.integers(0, cap_deg, (b, m))
        # bucket the receiving-destination list (host side, tiny)
        bucket = 512
        while bucket < len(dsts):
            bucket *= 2
        rows_np = np.full(bucket, -1, np.int64)
        rows_np[: len(dsts)] = dsts

        use_cache = lvl == 0 and self.adj0_d is not None
        cache_arr = self.adj0_d if use_cache else self.norms  # dummy
        adj_l, cache_out = _reverse_insert_jit(
            adj_l, cache_arr, self.data, self.norms,
            kept_i, kept_d,
            jnp.asarray(rng_cols, jnp.int32),
            jnp.asarray(src, jnp.int32),
            jnp.asarray(np.where(rows_np >= 0, rows_np, 0)),
            jnp.asarray(rows_np >= 0),
            cap_deg=cap_deg, metric=self.metric, use_cache=use_cache,
        )
        self._set_adj(lvl, adj_l)
        if use_cache:
            self.adj0_d = cache_out
        return dsts

    # ------------------------------------------------------------------
    # search

    def build_accel(self, max_degree: int = 30) -> None:
        """Derive the packed int8 record layout for level-0 traversal
        (models/records.py — the OptimizeGraph analogue). One frontier
        expansion then costs one row gather instead of ~2M of them; with
        max_degree=30 and d<=128 a record is a single 4 KB row. Rebuild
        after mutations (add/replace invalidate it automatically)."""
        from .records import build_record_graph

        deg = min(max_degree, self.adj0.shape[1])
        # adjacency rows are ascending by distance (occlusion prune +
        # sorted reverse merge), so the first `deg` columns are the
        # closest neighbors
        self._records = build_record_graph(
            self.data, self.adj0[:, :deg], self.norms
        )

    def clear_accel(self) -> None:
        self._records = None

    def _entry_points(self, q: jax.Array) -> jax.Array:
        """Level-0 entry per query ([Q] int32): routed GEMM over the
        level>=1 nodes when any exist, else the global enterpoint.

        Replaces the per-level greedy descent of searchKnn
        (hnswalg.h:1278-1303) — see _route_entry_gemm. The descent path
        remains available via knn_query(entry="descend") for parity
        checks; routed entries dominate it on both hops (the entry is
        the true nearest upper node) and wall clock (no per-hop
        gathers)."""
        nq = q.shape[0]
        if self.max_level < 1:
            return jnp.full((nq,), self.ep, jnp.int32)
        if self._router is None:
            up = np.nonzero(self.levels[: max(self.n, 1)] >= 1)[0]
            if up.size == 0:
                return jnp.full((nq,), self.ep, jnp.int32)
            n1 = int(up.size)
            pad = -(-n1 // 128) * 128
            ids_np = np.full(pad, 0, np.int32)
            ids_np[:n1] = up
            ids_up = jnp.asarray(ids_np)
            rows = jnp.take(self.data, ids_up, axis=0)
            self._router = (
                ids_up,
                rows.astype(jnp.bfloat16),
                squared_norms(rows),
                n1,
            )
        ids_up, rows, nrm, n1 = self._router
        return _route_entry_gemm(q, rows, nrm, ids_up, self.metric, n1)

    def _descend_entry(self, q: jax.Array) -> jax.Array:
        cur = jnp.full((q.shape[0],), self.ep, jnp.int32)
        for lvl in range(self.max_level, 0, -1):
            cur, _ = greedy_descent(
                q, self.data, self.norms, self.adj_up[lvl - 1], cur,
                metric=self.metric,
            )
        return cur

    def knn_query(
        self,
        queries,
        k: int = 1,
        ef: int | None = None,
        filter_ids: np.ndarray | None = None,
        expand: int = 1,
        entry: str = "routed",
    ):
        """Batched searchKnn (hnswalg.h:1270-1324). Returns
        (labels [Q, k] int64, dists [Q, k] exact metric values).

        filter_ids: optional bool mask [cap] over internal ids (the
        BaseFilterFunctor analogue, applied to result candidates).
        entry: "routed" (default, GEMM over level>=1 nodes) or
        "descend" (the reference's per-level greedy walk)."""
        if self.n == 0:
            raise RuntimeError("cannot query an empty index")
        ef = max(ef or self.cfg.ef, k)
        q = as_f32_queries(queries)
        nq = q.shape[0]

        if entry == "descend":
            cur = self._descend_entry(q)
        else:
            cur = self._entry_points(q)
        if self.num_deleted == 0 and filter_ids is None:
            if self._records is not None:
                from .inline_graph import rerank_exact
                from .records import beam_search_records

                res = beam_search_records(
                    q, self.data, self.norms, self._records,
                    cur[:, None], width=ef, metric=self.metric,
                    expand=expand,
                )
                # int8 traversal can misorder near-ties: re-rank the head
                # of the retset exactly (one k+pad-row f32 gather + one
                # small GEMM — negligible next to the traversal)
                head = min(ef, k + 16)
                self.metric_hops += int(jnp.sum(res.hops))
                self.metric_distance_computations += int(jnp.sum(res.evals))
                d, i = rerank_exact(
                    q, self.data, self.norms, res.ids[:, :head], k,
                    metric=self.metric,
                )
                i_np = np.asarray(i)
                labels = np.where(
                    i_np >= 0, self.labels[np.clip(i_np, 0, None)], -1
                )
                return labels, np.asarray(d)
            res = beam_search_chunked(
                q, self.data, self.norms, self.adj0, cur[:, None],
                width=ef, metric=self.metric, expand=expand,
            )
            d, i = res.dists, res.ids
        else:
            # in-traversal filtering: rejected nodes stay traversable but
            # never fill result slots, and the search keeps exploring until
            # ef *accepted* results exist (searchBaseLayerST filter/deleted
            # handling, hnswalg.h:397-425). The retset width is still the
            # exploration budget, so widen it with the rejected fraction.
            accept = ~self.deleted
            if filter_ids is not None:
                accept = accept & np.asarray(filter_ids, bool)[: len(accept)]
            frac_rej = 1.0 - accept[: self.n].sum() / max(self.n, 1)
            ef_eff = min(
                int(ef * (1.0 + 3.0 * frac_rej)) + (
                    0 if filter_ids is None else ef
                ),
                max(self.n, ef),
            )
            res = beam_search_filtered(
                q, self.data, self.norms, self.adj0, cur[:, None],
                width=ef_eff, accept=jnp.asarray(accept),
                metric=self.metric, expand=expand,
            )
            d, i = res.dists, res.ids
        self.metric_hops += int(jnp.sum(res.hops))
        self.metric_distance_computations += int(jnp.sum(res.evals))
        d = jnp.where(i < 0, PAD_DIST, d)
        d, i = topk_smallest(d, i, k)
        if self.metric == "l2":
            d = d + squared_norms(q)[:, None]
        i_np = np.asarray(i)
        labels = np.where(i_np >= 0, self.labels[np.clip(i_np, 0, None)], -1)
        return labels, np.asarray(d)

    def epsilon_query(
        self,
        queries,
        epsilon: float,
        max_candidates: int,
        expand: int = 1,
    ):
        """Range search: every point with metric distance <= epsilon among
        the ``max_candidates`` closest explored — ``searchStopConditionClosest``
        + ``EpsilonSearchStopCondition`` (hnswalg.h:1327-1378,
        stop_condition.h:218-275). Returns (labels [Q, C] int64 -1-padded,
        dists [Q, C], counts [Q])."""
        from .extensions import epsilon_search

        if self.n == 0:
            raise RuntimeError("cannot query an empty index")
        q = as_f32_queries(queries)
        cur = self._entry_points(q)
        d, i, counts = epsilon_search(
            q, self.data, self.norms, self.adj0, cur[:, None],
            epsilon=epsilon, max_candidates=max_candidates,
            metric=self.metric, expand=expand,
        )
        i_np = np.asarray(i)
        labels = np.where(i_np >= 0, self.labels[np.clip(i_np, 0, None)], -1)
        return labels, np.asarray(d), np.asarray(counts)

    # ------------------------------------------------------------------
    # mutation API (markDelete etc., hnswalg.h:853-992)

    def mark_deleted(self, label: int) -> None:
        iid = self.label_to_id[int(label)]
        if not self.deleted[iid]:
            self.deleted[iid] = True
            self.num_deleted += 1

    def unmark_deleted(self, label: int) -> None:
        iid = self.label_to_id[int(label)]
        if self.deleted[iid]:
            self.deleted[iid] = False
            self.num_deleted -= 1

    def is_marked_deleted(self, label: int) -> bool:
        return bool(self.deleted[self.label_to_id[int(label)]])

    def replace_point(self, slot: int, vec, label: int) -> None:
        """Reuse a (deleted) slot for a new point: update the vector in
        place, rebuild the slot's out-links at its existing levels, and
        repair the in-links of its former neighborhood — the updatePoint /
        repairConnectionsForUpdate analogue (hnswalg.h:995-1139). Without
        the repair, the old neighborhood keeps edges whose distances were
        chosen for the *old* vector; under churn those stale edges degrade
        recall (the regression bindings_test_replace.py:155 guards)."""
        self._records = None
        self._dataq = None
        self._maintain_records = False
        self._router = None
        # in-links to `slot` may exist from nodes outside old_nbrs; their
        # cached distances would go stale when the vector changes, so the
        # cache is dropped (subsequent inserts use the gather fallback)
        self.adj0_d = None
        cfg = self.cfg
        x = jnp.asarray(np.asarray(vec, np.float32)[None])
        # capture the old neighborhoods BEFORE the vector changes: these
        # nodes' link choices referenced the old point (updatePoint's sCand
        # set, hnswalg.h:1000-1032)
        node_level = int(self.levels[slot])
        old_nbrs = {
            lvl: np.asarray(self._adj_at(lvl)[slot])
            for lvl in range(0, node_level + 1)
        }
        self.data = self.data.at[slot].set(x[0])
        self.norms = self.norms.at[slot].set(squared_norms(x)[0])
        if self.deleted[slot]:
            self.deleted[slot] = False
            self.num_deleted -= 1
        self.labels[slot] = label
        self.label_to_id[int(label)] = slot

        cur = jnp.full((1,), self.ep, jnp.int32)
        sid = jnp.asarray([slot], jnp.int32)
        for lvl in range(self.max_level, -1, -1):
            adj_l = self._adj_at(lvl)
            res = beam_search_chunked(
                x, self.data, self.norms, adj_l, cur[:, None],
                width=cfg.ef_construction, metric=self.metric, max_hops=256,
            )
            cur = res.ids[:, 0]
            if lvl > node_level:
                continue
            pd = res.dists
            if self.metric == "l2":
                pd = pd + squared_norms(x)[:, None]
            kept_i, kept_d = occlusion_prune_padded(
                x, res.ids, pd, self.data, self.norms,
                max_keep=cfg.M, metric=self.metric, self_ids=sid,
            )
            w = adj_l.shape[1]
            rowbuf = jnp.full((1, w), PAD_ID, jnp.int32)
            rowbuf = rowbuf.at[:, : cfg.M].set(kept_i)
            self._set_adj(lvl, adj_l.at[sid].set(rowbuf))
            if lvl == 0 and self.adj0_d is not None:
                dbuf = jnp.full((1, w), PAD_DIST, jnp.float32)
                dbuf = dbuf.at[:, : cfg.M].set(kept_d)
                self.adj0_d = self.adj0_d.at[sid].set(dbuf)
            self._reverse_insert(
                lvl, np.array([slot], np.int32),
                np.asarray(kept_i), np.asarray(kept_d),
            )
            self._repair_in_links(lvl, old_nbrs[lvl], slot)

    def _repair_in_links(self, lvl: int, nbr_ids: np.ndarray,
                         slot: int) -> None:
        """Re-select the out-links of the nodes that used to neighbor
        ``slot`` (repairConnectionsForUpdate, hnswalg.h:1074-1139).

        Each such node u re-runs the occlusion rule over a pool of its
        current links plus the old neighborhood (each other and the moved
        node) with distances recomputed against the *new* vector store, so
        edges kept for the old vector are re-justified or replaced."""
        nbrs = np.unique(nbr_ids[nbr_ids >= 0])
        if len(nbrs) == 0:
            return
        cap_deg = 2 * self.cfg.M if lvl == 0 else self.cfg.M
        adj_l = self._adj_at(lvl)
        bucket = 64
        while bucket < len(nbrs):
            bucket *= 2
        rows_np = np.full(bucket, -1, np.int64)
        rows_np[: len(nbrs)] = nbrs
        live = jnp.asarray(rows_np >= 0)
        rows_j = jnp.asarray(np.where(rows_np >= 0, rows_np, 0))
        vecs = jnp.take(self.data, rows_j, axis=0)
        exist = jnp.take(adj_l, rows_j, axis=0)[:, :cap_deg]
        # candidate pool: current links + the old neighborhood + slot
        extra_np = np.concatenate([nbrs, [slot]]).astype(np.int32)
        pad = -(-len(extra_np) // 8) * 8
        extra_np = np.pad(extra_np, (0, pad - len(extra_np)),
                          constant_values=PAD_ID)
        extra = jnp.broadcast_to(
            jnp.asarray(extra_np)[None, :], (bucket, pad)
        )
        pool_i = jnp.concatenate([exist, extra], axis=1)
        pool_i = jnp.where(live[:, None], pool_i, PAD_ID)
        pool_d = gathered_dists(
            vecs, self.data, pool_i, self.metric, self.norms, exact=True
        )
        kept_i, kept_d = occlusion_prune_padded(
            vecs, pool_i, pool_d, self.data, self.norms,
            max_keep=cap_deg, metric=self.metric, self_ids=rows_j,
        )
        w = adj_l.shape[1]
        if w > cap_deg:
            kept_i = jnp.concatenate(
                [kept_i, jnp.full((bucket, w - cap_deg), PAD_ID, jnp.int32)],
                axis=1,
            )
            kept_d = jnp.concatenate(
                [kept_d,
                 jnp.full((bucket, w - cap_deg), PAD_DIST, jnp.float32)],
                axis=1,
            )
        write_rows = jnp.where(live, rows_j, self.cap)
        self._set_adj(lvl, adj_l.at[write_rows].set(kept_i, mode="drop"))
        if lvl == 0 and self.adj0_d is not None:
            self.adj0_d = self.adj0_d.at[write_rows].set(
                kept_d, mode="drop"
            )

    def resize_index(self, new_cap: int) -> None:
        """resizeIndex (hnswalg.h:633-656)."""
        if new_cap < self.n:
            raise ValueError("new capacity below current element count")
        self.max_elements = int(new_cap)
        alloc = max(self.cap, _arena_cap(new_cap))
        grow = alloc - self.cap
        if grow <= 0:
            return
        self._records = None
        self._dataq = None
        self._router = None
        new_cap = alloc
        self.data = jnp.concatenate(
            [self.data, jnp.zeros((grow, self.dim), self.dtype)], axis=0
        )
        self.norms = jnp.concatenate(
            [self.norms, jnp.zeros((grow,), jnp.float32)], axis=0
        )
        self.adj0 = jnp.concatenate(
            [self.adj0,
             jnp.full((grow, self.adj0.shape[1]), PAD_ID, jnp.int32)],
            axis=0,
        )
        if self.adj0_d is not None:
            self.adj0_d = jnp.concatenate(
                [self.adj0_d,
                 jnp.full((grow, self.adj0_d.shape[1]), PAD_DIST,
                          jnp.float32)],
                axis=0,
            )
        self.adj_up = [
            jnp.concatenate(
                [a, jnp.full((grow, a.shape[1]), PAD_ID, jnp.int32)], axis=0
            )
            for a in self.adj_up
        ]
        self.levels = np.concatenate([self.levels, np.zeros(grow, np.int32)])
        self.deleted = np.concatenate([self.deleted, np.zeros(grow, bool)])
        self.labels = np.concatenate(
            [self.labels, np.full(grow, -1, np.int64)]
        )
        self.cap = new_cap

    def get_items(self, labels) -> np.ndarray:
        iids = np.array([self.label_to_id[int(l)] for l in np.atleast_1d(labels)])
        return np.asarray(self.data)[iids]

    def get_ids_list(self):
        return [int(l) for l in self.labels[: self.n] if l >= 0]

    # ------------------------------------------------------------------
    # integrity / persistence

    def check_integrity(self) -> bool:
        """checkIntegrity (hnswalg.h:1381-1410): degree bounds, no self or
        duplicate edges, positive inbound degree."""
        inbound = np.zeros(self.n, np.int64)
        for lvl in range(0, self.max_level + 1):
            adj = np.asarray(self._adj_at(lvl))[: self.n]
            cap_deg = 2 * self.cfg.M if lvl == 0 else self.cfg.M
            live = self.levels[: self.n] >= lvl
            rows = adj[live]
            if ((rows >= 0).sum(axis=1) > cap_deg).any():
                return False
            row_ids = np.nonzero(live)[0]
            if (rows == row_ids[:, None]).any():
                return False
            for r in rows:
                v = r[r >= 0]
                if len(np.unique(v)) != len(v):
                    return False
            v = rows[rows >= 0]
            np.add.at(inbound, v, 1)
        return bool((inbound[: self.n] > 0).all() or self.n <= 1)

    def save(self, path: str) -> None:
        # np.savez given a str appends ".npz"; a file object keeps the
        # exact path the caller asked for.
        with open(path, "wb") as f:
            self._savez(f)

    def _savez(self, f) -> None:
        np.savez(
            f,
            data=np.asarray(self.data[: self.n]),
            adj0=np.asarray(self.adj0[: self.n]),
            adj_up=np.stack(
                [np.asarray(a[: self.n]) for a in self.adj_up]
            ) if self.adj_up else np.zeros((0, self.n, self.cfg.M), np.int32),
            levels=self.levels[: self.n],
            labels=self.labels[: self.n],
            deleted=self.deleted[: self.n],
            meta=np.array(
                [self.n, self.cap, self.max_level, self.ep, self.cfg.M,
                 self.cfg.ef_construction, self.num_deleted]
            ),
            metric=self.metric,
        )

    def save_hnswlib_format(self, path: str) -> None:
        """Write the reference's binary index format (hnswalg.h:685-713) —
        loadable by stock hnswlib."""
        from ..utils.hnswlib_format import write_hnswlib_index

        n = self.n
        write_hnswlib_index(
            path,
            np.asarray(self.data[:n]),
            self.labels[:n],
            self.levels[:n],
            np.asarray(self.adj0[:n]),
            [np.asarray(a[:n]) for a in self.adj_up],
            self.deleted[:n],
            m=self.cfg.M,
            ef_construction=self.cfg.ef_construction,
            enterpoint=self.ep,
            maxlevel=self.max_level,
            mult=self.cfg.mult,
        )

    @classmethod
    def load_hnswlib_format(
        cls, path: str, metric: str = "l2",
        max_elements: int | None = None,
    ) -> "HNSWIndex":
        """Load an index written by the reference (or by
        save_hnswlib_format)."""
        from ..utils.hnswlib_format import read_hnswlib_index

        z = read_hnswlib_index(path)
        n = z["data"].shape[0]
        cap = max(max_elements or z["max_elements"], n)
        cfg = HNSWConfig(M=z["M"], ef_construction=z["ef_construction"])
        idx = cls(z["data"].shape[1], cap, cfg, metric)
        idx.n = n
        idx.max_level = z["maxlevel"]
        idx.ep = int(z["enterpoint"])
        idx.data = idx.data.at[:n].set(jnp.asarray(z["data"]))
        idx.norms = idx.norms.at[:n].set(
            squared_norms(jnp.asarray(z["data"]))
        )
        pad0 = jnp.full((cap, 2 * cfg.M), PAD_ID, jnp.int32)
        a0 = np.full((n, 2 * cfg.M), PAD_ID, np.int32)
        a0[:, : z["adj0"].shape[1]] = z["adj0"][:, : 2 * cfg.M]
        idx.adj0 = pad0.at[:n].set(jnp.asarray(a0))
        idx.adj0_d = None  # unknown link distances; gather fallback
        idx.adj_up = []
        for a in z["adj_up"]:
            arr = jnp.full((cap, cfg.M), PAD_ID, jnp.int32)
            au = np.full((n, cfg.M), PAD_ID, np.int32)
            au[:, : a.shape[1]] = a[:, : cfg.M]
            idx.adj_up.append(arr.at[:n].set(jnp.asarray(au)))
        idx.levels[:n] = z["levels"]
        idx.labels[:n] = z["labels"]
        idx.deleted[:n] = z["deleted"]
        idx.num_deleted = int(z["deleted"].sum())
        idx.label_to_id = {
            int(l): i for i, l in enumerate(z["labels"])
        }
        return idx

    @classmethod
    def load(cls, path: str, max_elements: int | None = None) -> "HNSWIndex":
        z = np.load(path, allow_pickle=False)
        n, cap, max_level, ep, m, efc, ndel = (int(v) for v in z["meta"])
        cap = max(max_elements or cap, n)
        cfg = HNSWConfig(M=m, ef_construction=efc)
        idx = cls(z["data"].shape[1], cap, cfg, str(z["metric"]))
        idx.n = n
        idx.max_level = max_level
        idx.ep = ep
        idx.num_deleted = ndel
        idx.data = idx.data.at[:n].set(jnp.asarray(z["data"]))
        idx.norms = idx.norms.at[:n].set(squared_norms(jnp.asarray(z["data"])))
        idx.adj0 = idx.adj0.at[:n].set(jnp.asarray(z["adj0"]))
        idx.adj0_d = None  # unknown link distances; gather fallback
        idx.adj_up = []
        for lvl in range(z["adj_up"].shape[0]):
            a = jnp.full((cap, m), PAD_ID, jnp.int32)
            idx.adj_up.append(a.at[:n].set(jnp.asarray(z["adj_up"][lvl])))
        idx.levels[:n] = z["levels"]
        idx.labels[:n] = z["labels"]
        idx.deleted[:n] = z["deleted"]
        idx.label_to_id = {
            int(l): i for i, l in enumerate(z["labels"]) if l >= 0
        }
        return idx
