"""NSG (Navigating Spreading-out Graph): TPU-native build and search.

Reference: ``IndexNSG`` (CNNS/src/nsg/index_nsg.cpp, hnsw_nsg/src/index_nsg.cpp).
Build pipeline (reference ``Build``, index_nsg.cpp:465-504):

  1. medoid entry point (``init_graph``, :287-303) — here computed exactly:
     nearest point to the dataset centroid is one brute-force GEMM;
  2. per node, collect a candidate pool by graph search from the medoid
     (``get_neighbors``, :150-285) — here ``beam_search_collect`` over the
     input kNN graph, batched over node blocks;
  3. MRNG occlusion pruning (``sync_prune``, :305-355) — batched
     ``occlusion_prune`` with scan cap C and degree cap R;
  4. reverse-edge insertion (``InterInsert``, :357-424) — bulk-synchronous:
     scatter all edges, group by destination (host), append when room else
     re-prune destination pools on device;
  5. connectivity repair (``tree_grow``/``DFS``/``findroot``, :684-764) —
     host BFS over the final adjacency; unreachable components are attached
     via batched graph searches for their representatives.

The reference's per-node OpenMP loop with per-node locks becomes
bulk-synchronous batched rounds — same graph semantics, no locks
(SURVEY.md §2.9).

Search (``Search``, :506-568): init = medoid's neighbors + random fill to
L_search, then the shared lockstep beam. ``search_from_enterpoint`` is the
hnsw_nsg variant (hnsw_nsg/src/index_nsg.cpp:703-783): arbitrary per-query
entry ids, 2-hop init expansion, random fill.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID, gathered_dists, squared_norms
from ..ops.bruteforce import brute_force_topk
from ..utils import io as io_utils
from ..utils.params import NSGBuildConfig
from .beam import beam_search_chunked, beam_search_collect_chunked
from .prune import occlusion_prune, occlusion_prune_padded


@dataclasses.dataclass
class NSGIndex:
    """Immutable search-time NSG: padded adjacency + entry point."""

    data: jax.Array        # [N, d]
    norms: jax.Array       # [N]
    adj: jax.Array         # [N, R] int32, PAD_ID-padded
    ep: int                # medoid entry point
    metric: str = "l2"
    # packed int8 record layout (models/records.py) — one gather per
    # expansion instead of R; build with build_accel()
    records: object = dataclasses.field(default=None, compare=False)

    @property
    def n(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.adj.shape[1]

    def build_accel(self, chunk: int = 1 << 16) -> None:
        """Derive the packed int8 record layout over the NSG adjacency
        (the OptimizeGraph analogue, index_nsg.cpp:570-657: repack each
        node's search state into one contiguous block). Subsequent
        searches traverse records (one fat-row gather per expansion
        moving R*(d+8) bytes once, instead of R scattered f32 rows at 4x
        the bytes plus separate id/norm loads) and re-rank the retset
        head exactly."""
        from .records import build_record_graph

        self.records = build_record_graph(
            self.data, self.adj, self.norms, chunk=chunk
        )

    def _beam(self, q, init, k, l_search, expand, max_hops):
        """Dispatch one lockstep beam over records when built, else the
        plain padded-adjacency layout. Returns (exact dists, ids)."""
        if self.records is not None:
            from .inline_graph import rerank_exact
            from .records import beam_search_records

            res = beam_search_records(
                q, self.data, self.norms, self.records, init,
                width=l_search, metric=self.metric, expand=expand,
                max_hops=max_hops,
            )
            head = min(l_search, k + 16)
            return rerank_exact(
                q, self.data, self.norms, res.ids[:, :head], k,
                metric=self.metric,
            )
        res = beam_search_chunked(
            q, self.data, self.norms, self.adj, init,
            width=l_search, metric=self.metric, max_hops=max_hops,
            expand=expand,
        )
        d, i = res.dists[:, :k], res.ids[:, :k]
        if self.metric == "l2":
            d = d + squared_norms(q)[:, None]
        return d, i

    def search(
        self,
        queries: jax.Array,
        k: int,
        l_search: int = 100,
        seed: int = 0,
        expand: int = 1,
        max_hops: int = 512,
    ):
        """Batched NSG search (index_nsg.cpp:506-568 semantics).

        Returns (dists [Q, k] exact metric values, ids [Q, k]).
        """
        q = jnp.asarray(queries)
        nq = q.shape[0]
        ep_nbrs = self.adj[self.ep]  # [R]
        init = jnp.broadcast_to(ep_nbrs[None, :], (nq, ep_nbrs.shape[0]))
        n_fill = max(l_search - ep_nbrs.shape[0], 0)
        if n_fill:
            key = jax.random.PRNGKey(seed)
            rand = jax.random.randint(
                key, (nq, n_fill), 0, self.n, dtype=jnp.int32
            )
            init = jnp.concatenate([init, rand], axis=1)
        return self._beam(q, init, k, l_search, expand, max_hops)

    def search_from_enterpoint(
        self,
        queries: jax.Array,
        entry_ids: jax.Array,
        k: int,
        l_search: int = 100,
        seed: int = 0,
        expand: int = 1,
        max_hops: int = 512,
    ):
        """hnsw_nsg's SearchFromEnterpoint (hnsw_nsg/src/index_nsg.cpp:
        703-783): per-query entry id, init from its neighbors plus a 2-hop
        expansion "to enhance the locality", random fill to L."""
        q = jnp.asarray(queries)
        nq = q.shape[0]
        entry = jnp.asarray(entry_ids, jnp.int32).reshape(nq)
        hop1 = jnp.take(self.adj, entry, axis=0)  # [Q, R]
        two_hop_take = min(self.width, max(l_search // self.width, 2))
        hop2 = jnp.take(
            self.adj,
            jnp.where(hop1[:, :two_hop_take] >= 0, hop1[:, :two_hop_take], 0),
            axis=0,
        ).reshape(nq, -1)
        init = jnp.concatenate([entry[:, None], hop1, hop2], axis=1)
        if init.shape[1] < l_search:
            key = jax.random.PRNGKey(seed)
            rand = jax.random.randint(
                key, (nq, l_search - init.shape[1]), 0, self.n,
                dtype=jnp.int32,
            )
            init = jnp.concatenate([init, rand], axis=1)
        else:
            init = init[:, : max(l_search, self.width + 1)]
        return self._beam(q, init, k, l_search, expand, max_hops)

    # -- persistence ------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez(
            path,
            adj=np.asarray(self.adj),
            ep=self.ep,
            metric=self.metric,
        )

    @classmethod
    def load(cls, path: str, data) -> "NSGIndex":
        z = np.load(path, allow_pickle=False)
        data = jnp.asarray(data)
        return cls(
            data=data,
            norms=squared_norms(data),
            adj=jnp.asarray(z["adj"]),
            ep=int(z["ep"]),
            metric=str(z["metric"]),
        )

    def save_reference_format(self, path: str) -> None:
        """Write the reference's .nsg byte format (index_nsg.cpp:37-49)."""
        io_utils.write_nsg(path, np.asarray(self.adj), self.ep, self.width)

    @classmethod
    def load_reference_format(cls, path: str, data, metric="l2") -> "NSGIndex":
        adj, ep, _ = io_utils.read_nsg(path)
        data = jnp.asarray(data)
        return cls(
            data=data, norms=squared_norms(data), adj=jnp.asarray(adj),
            ep=ep, metric=metric,
        )


# ---------------------------------------------------------------------------
# Build


def find_medoid(data: jax.Array, metric: str = "l2") -> int:
    """Exact medoid: nearest point to the centroid, one GEMM
    (exact version of init_graph, index_nsg.cpp:287-303)."""
    center = jnp.mean(jnp.asarray(data, jnp.float32), axis=0, keepdims=True)
    _, ids = brute_force_topk(center, data, 1, metric=metric)
    return int(ids[0, 0])


def _collect_and_prune_block(
    node_ids, data, norms, knn_adj, init_ids, cfg: NSGBuildConfig, metric
):
    """Stages 2+3 for one node block: candidate pool by graph search from
    the medoid, union with the node's kNN row, occlusion prune."""
    vecs = jnp.take(data, node_ids, axis=0)
    _, log_ids, log_d = beam_search_collect_chunked(
        vecs, data, norms, knn_adj, init_ids,
        width=cfg.L, collect=cfg.C, metric=metric,
    )
    own_knn = jnp.take(knn_adj, node_ids, axis=0)
    own_d = gathered_dists(vecs, data, own_knn, metric, norms)
    pool_ids = jnp.concatenate([log_ids, own_knn], axis=1)
    pool_d = jnp.concatenate([log_d, own_d], axis=1)
    if metric == "l2":
        # beam/gathered distances are FastL2 (missing ||q||^2); the occlusion
        # rule compares them against exact pair distances, so shift to exact.
        # Padded slots stay past PAD_DIST and are dropped by the pruner.
        pool_d = pool_d + jnp.take(norms, node_ids, axis=0)[:, None]
    return occlusion_prune(
        vecs, pool_ids, pool_d, data, norms,
        max_keep=cfg.R, scan_cap=cfg.C, metric=metric, self_ids=node_ids,
    )


def _interinsert(
    data, norms, adj_np, dists_np, cfg: NSGBuildConfig, metric, block
):
    """Stage 4: reverse-edge insertion (InterInsert, index_nsg.cpp:357-424).

    Bulk-synchronous version: every directed edge (n -> v) proposes n as an
    in-neighbor of v. Destinations with room append (dedup-checked, like the
    reference's free-slot path); overflowing destinations re-prune
    {existing ∪ incoming} with the same occlusion rule.
    """
    n, r = adj_np.shape
    src = np.repeat(np.arange(n, dtype=np.int32), r)
    dst = adj_np.reshape(-1)
    d = dists_np.reshape(-1)
    keep = dst >= 0
    src, dst, d = src[keep], dst[keep], d[keep]

    # drop proposals where dst already links back to src (the reference's
    # dup check), chunked to bound memory
    present = np.zeros(len(src), dtype=bool)
    chunk = 1 << 20
    for s in range(0, len(src), chunk):
        present[s : s + chunk] = (
            adj_np[dst[s : s + chunk]] == src[s : s + chunk, None]
        ).any(axis=1)
    src, dst, d = src[~present], dst[~present], d[~present]

    if len(dst) == 0:
        return adj_np, dists_np

    # group by destination, closest incoming first
    order = np.lexsort((d, dst))
    src, dst, d = src[order], dst[order], d[order]
    uniq, start_idx, counts = np.unique(
        dst, return_index=True, return_counts=True
    )
    cap_in = min(int(counts.max()), r)
    inc_ids = np.full((len(uniq), cap_in), PAD_ID, np.int32)
    inc_d = np.full((len(uniq), cap_in), np.float32(3.4e37), np.float32)
    for col in range(cap_in):
        sel = counts > col
        inc_ids[sel, col] = src[start_idx[sel] + col]
        inc_d[sel, col] = d[start_idx[sel] + col]

    deg = (adj_np >= 0).sum(axis=1)
    n_inc = np.minimum(counts, cap_in)
    overflow = deg[uniq] + n_inc > r

    # room: append at first free slots (the reference's free-slot path)
    room = np.nonzero(~overflow)[0]
    if len(room):
        rows = uniq[room]
        base = deg[rows]
        for col in range(cap_in):
            m = n_inc[room] > col
            adj_np[rows[m], base[m] + col] = inc_ids[room[m], col]
            dists_np[rows[m], base[m] + col] = inc_d[room[m], col]

    # overflow: batched occlusion re-prune of existing ∪ incoming
    ov_rows = uniq[overflow]
    if len(ov_rows):
        ov_sel = np.nonzero(overflow)[0]
        for s in range(0, len(ov_rows), block):
            rows = ov_rows[s : s + block]
            sel = ov_sel[s : s + block]
            pool_ids = np.concatenate(
                [adj_np[rows], inc_ids[sel]], axis=1
            )
            pool_d = np.concatenate([dists_np[rows], inc_d[sel]], axis=1)
            kept_i, kept_d = occlusion_prune_padded(
                jnp.take(data, jnp.asarray(rows), axis=0),
                jnp.asarray(pool_ids),
                jnp.asarray(pool_d),
                data, norms,
                max_keep=r, scan_cap=pool_ids.shape[1], metric=metric,
                self_ids=jnp.asarray(rows),
            )
            adj_np[rows] = np.asarray(kept_i)
            dists_np[rows] = np.asarray(kept_d)
    return adj_np, dists_np


def _tree_grow(data, norms, adj_np, ep, cfg: NSGBuildConfig, metric):
    """Stage 5: connectivity repair (tree_grow/DFS/findroot,
    index_nsg.cpp:684-764). Host BFS; unreachable components get attached by
    batched graph searches for their representative points."""
    n, r = adj_np.shape
    adj_j = jnp.asarray(adj_np)

    def bfs_reach(seeds, visited):
        frontier = np.array(seeds, dtype=np.int64)
        visited[frontier] = True
        while len(frontier):
            nxt = adj_np[frontier].reshape(-1)
            nxt = nxt[nxt >= 0]
            nxt = np.unique(nxt)
            nxt = nxt[~visited[nxt]]
            visited[nxt] = True
            frontier = nxt
        return visited

    visited = np.zeros(n, dtype=bool)
    visited = bfs_reach([ep], visited)
    guard = 0
    while not visited.all() and guard < 64:
        guard += 1
        unvis = np.nonzero(~visited)[0]
        reps = unvis[:256]
        res = beam_search_chunked(
            jnp.take(data, jnp.asarray(reps), axis=0),
            data, norms, adj_j,
            jnp.full((len(reps), 1), ep, jnp.int32),
            width=cfg.L, metric=metric,
        )
        ids = np.asarray(res.ids)  # [B, L] reachable-side candidates
        for b, root in enumerate(reps):
            if visited[root]:
                continue
            cand = ids[b]
            cand = cand[(cand >= 0)]
            cand = cand[visited[cand]] if len(cand) else cand
            attach = int(cand[0]) if len(cand) else int(ep)
            deg = int((adj_np[attach] >= 0).sum())
            slot = deg if deg < r else r - 1
            adj_np[attach, slot] = root
            visited = bfs_reach([root], visited)
        adj_j = jnp.asarray(adj_np)
    return adj_np


def build_nsg(
    data,
    knn_adj,
    cfg: NSGBuildConfig = NSGBuildConfig(),
    metric: str = "l2",
    block: int = 1024,
    seed: int = 0,
    ep: int | None = None,
    pad_to_bucket: bool = False,
) -> NSGIndex:
    """Build an NSG from a dataset and its (approximate) kNN graph.

    data: [N, d]; knn_adj: [N, K] int32 (nn-descent output or exact).

    pad_to_bucket: pad N to the next power of two with cyclic duplicate
    rows and strip them afterwards. Kernel cache keys include N, so callers
    building many variable-size graphs (CNNS per-cluster builds) would
    otherwise recompile per size. Duplicates are distance-identical to
    their sources, so remapping pad edges back to the source row preserves
    graph semantics exactly (duplicate edges are dropped).
    """
    if pad_to_bucket:
        data_np = np.asarray(data)
        n0 = data_np.shape[0]
        bucket = 1024
        while bucket < n0:
            bucket *= 2
        if bucket != n0:
            reps = np.arange(bucket - n0) % n0
            data_p = np.concatenate([data_np, data_np[reps]])
            knn_np = np.asarray(knn_adj, np.int32)
            knn_p = np.concatenate([knn_np, knn_np[reps]])
            idx = build_nsg(
                data_p, knn_p, cfg, metric=metric, block=block,
                seed=seed, ep=ep, pad_to_bucket=False,
            )
            adj = np.asarray(idx.adj[:n0])
            # remap edges into the pad region back to their source rows,
            # then drop duplicates / self edges created by the remap
            adj = np.where(adj >= n0, (adj - n0) % n0, adj)
            adj = np.where(adj == np.arange(n0)[:, None], PAD_ID, adj)
            srt = np.sort(adj, axis=1)
            dup_sorted = np.concatenate(
                [np.zeros((n0, 1), bool), srt[:, 1:] == srt[:, :-1]], axis=1
            )
            # mark later occurrences as PAD via rank trick
            order = np.argsort(adj, axis=1, kind="stable")
            undo = np.argsort(order, axis=1, kind="stable")
            dup = np.take_along_axis(dup_sorted, undo, axis=1)
            adj = np.where(dup & (adj >= 0), PAD_ID, adj)
            ep_out = idx.ep if idx.ep < n0 else (idx.ep - n0) % n0
            data_j = jnp.asarray(data_np)
            return NSGIndex(
                data=data_j, norms=squared_norms(data_j),
                adj=jnp.asarray(adj), ep=int(ep_out), metric=metric,
            )
    data = jnp.asarray(data)
    knn_adj = jnp.asarray(knn_adj, jnp.int32)
    n = data.shape[0]
    norms = squared_norms(data)
    if ep is None:
        ep = find_medoid(data, metric)

    ep_row = knn_adj[ep]
    # large builds amortize per-block dispatch chains over bigger blocks
    # and accumulate on device (donated update-slice) instead of a host
    # fetch per block — the 1M build was serialized on those syncs
    if n >= (1 << 18):
        block = max(block, 4096)
    adj_dev = jnp.full((n, cfg.R), PAD_ID, jnp.int32)
    dists_dev = jnp.full((n, cfg.R), jnp.float32(3.4e37), jnp.float32)
    store = jax.jit(
        lambda buf, blk, s: jax.lax.dynamic_update_slice(buf, blk, (s, 0)),
        donate_argnums=(0,),
    )

    for s in range(0, n, block):
        node_ids = jnp.arange(s, min(s + block, n), dtype=jnp.int32)
        b = node_ids.shape[0]
        init = jnp.broadcast_to(ep_row[None, :], (b, ep_row.shape[0]))
        kept_i, kept_d = _collect_and_prune_block(
            node_ids, data, norms, knn_adj, init, cfg, metric
        )
        adj_dev = store(adj_dev, kept_i, jnp.int32(s))
        dists_dev = store(dists_dev, kept_d, jnp.int32(s))
    adj_np = np.array(adj_dev)      # writable copies: _interinsert
    dists_np = np.array(dists_dev)  # mutates them in place

    adj_np, dists_np = _interinsert(
        data, norms, adj_np, dists_np, cfg, metric, block
    )
    adj_np = _tree_grow(data, norms, adj_np, ep, cfg, metric)

    return NSGIndex(
        data=data, norms=norms, adj=jnp.asarray(adj_np), ep=ep, metric=metric
    )
