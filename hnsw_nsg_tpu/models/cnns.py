"""CNNS cluster pipeline: k-means partition -> per-cluster index -> routed
multi-cluster search with global top-k merge.

Reference flow (SURVEY.md §2.4):
  * build stage 1 (CNNS/tests/cluster_IVF_nndescent.cpp): faiss IVF k-means,
    per-cluster files {centroid + m random representatives, member data,
    local->global mapping, nn-descent graph};
  * build stage 2 (CNNS/tests/nndescent_nsg.cpp): per-cluster NSG;
  * search (CNNS/tests/cluster_hnsw_nsg_search.cpp): HNSW over the
    representative points routes each query to nprobe reps, clusters ranked
    by rep hit count, per-cluster NSG search + exact re-distance +
    local->global remap, global top-k with early stop.

TPU re-design:
  * k-means on device (models/kmeans.py) replaces faiss IVF;
  * the router is a single GEMM over all n_clusters*(m+1) representative
    points — on TPU a batched exact top-nprobe beats an HNSW walk (SURVEY.md
    §7 design table), and it is exactly the reference's
    ``cluster_knn_*`` ablation variant (experiment_feature/);
  * clusters live as padded arrays [C, maxc, ...] (the mmap'd per-cluster
    files become HBM-resident slabs);
  * ``local_index="flat"``: probed clusters are searched exactly — one
    gathered GEMM per probe slot (the ``cluster_knn_knn`` ablation, and the
    TPU-fastest configuration since a ~1-4k-point cluster scan is a single
    MXU tile pass);
  * ``local_index="nsg"``: per-cluster NSGs laid out in one flat arena
    [C*maxc, ...] with intra-cluster edges only; ALL probed clusters are
    searched by ONE lockstep beam whose init seeds every probed cluster's
    medoid neighborhood — the beam's shared top-L retset performs the
    cross-cluster merge + early-stop pruning that the reference does with
    a mutex-guarded bound (cluster_hnsw_nsg_search.cpp:237-251) for free:
    clusters whose candidates cannot enter the retset stop contributing
    frontier nodes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID, pairwise_dists, squared_norms
from ..ops.topk import topk_smallest
from ..utils.params import CNNSConfig, NSGBuildConfig
from .beam import beam_search
from .kmeans import kmeans
from .nsg import build_nsg
from .rptree import knn_graph_rp
from ..ops.bruteforce import knn_graph_exact


@functools.partial(
    jax.jit, static_argnames=("nprobe", "metric", "rank_by")
)
def _route_clusters(q, reps, nprobe: int, metric: str, rank_by="hits"):
    """Rank clusters for probing. rank_by="hits": representative hit count
    (reference default, cluster_hnsw_nsg_search.cpp:146-173), ties broken by
    best rep rank; rank_by="min_dist": closest-representative order (the
    sort_by_min_dist ablation, experiment_feature/sort_by_min_dist.cpp:
    280-287). Returns visit list [Q, nprobe] of cluster ids (PAD padded)."""
    c, m1, d = reps.shape
    rep_flat = reps.reshape(c * m1, d)
    rd = pairwise_dists(q, rep_flat, metric, exact=False)
    n_rep = min(nprobe * m1, c * m1)
    _, rep_idx = jax.lax.top_k(-rd, n_rep)      # [Q, n_rep]
    cid = rep_idx // m1                          # [Q, n_rep]
    # hit count per slot's cluster; first-occurrence dedup
    eq = cid[:, :, None] == cid[:, None, :]
    counts = jnp.sum(eq, axis=2)
    first = ~jnp.any(
        eq & jnp.tril(jnp.ones((n_rep, n_rep), jnp.bool_), -1)[None],
        axis=2,
    )
    # score: hits desc then earlier rep rank; or pure rep-rank order
    rank = jax.lax.broadcasted_iota(jnp.int32, cid.shape, 1)
    if rank_by == "min_dist":
        score = n_rep - rank
    else:
        score = counts * n_rep - rank
    score = jnp.where(first, score, -1)
    _, order = jax.lax.top_k(score, min(nprobe, n_rep))
    visit = jnp.take_along_axis(cid, order, axis=1)
    got = jnp.take_along_axis(score, order, axis=1) >= 0
    return jnp.where(got, visit, PAD_ID)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "q_block")
)
def _flat_probe_search(q, visit, data_c, ids_c, cnorms_c, k, metric,
                       q_block: int = 2048):
    """Exact search of each query's probed clusters, one jitted program.

    lax.map over query blocks (bounds the gathered-slab working set to
    [q_block, maxc, d] — the full [Q, maxc, d] gather OOMs HBM for f32
    slabs at Q~8k x maxc~4k), each block a lax.scan over probe slots:
    gathered cluster slab x query GEMM + running top-k merge."""
    nq, dim = q.shape
    nv = visit.shape[1]
    b = min(q_block, nq)
    nb = -(-nq // b)
    if nb * b != nq:
        q = jnp.concatenate([q, jnp.zeros((nb * b - nq, dim), q.dtype)])
        visit = jnp.concatenate(
            [visit, jnp.full((nb * b - nq, nv), PAD_ID, visit.dtype)]
        )

    def block_fn(args):
        qb, vb = args
        qf = qb.astype(jnp.float32)
        qn = squared_norms(qf) if metric == "l2" else jnp.zeros((b,))
        # dots in the slab dtype: with bf16 slabs the gather moves half
        # the bytes (the probe-slot gather is the whole cost of this
        # search) and the MXU runs at full rate; norms stay exact f32
        qc = qf.astype(data_c.dtype)

        def slot_fn(carry, cid):
            best_d, best_i = carry
            ok = cid >= 0
            safe = jnp.where(ok, cid, 0)
            xc = jnp.take(data_c, safe, axis=0)    # [B, maxc, d]
            ic = jnp.take(ids_c, safe, axis=0)     # [B, maxc]
            dots = jnp.einsum(
                "qd,qmd->qm", qc, xc,
                preferred_element_type=jnp.float32,
            )
            if metric in ("ip", "cosine"):
                d = 1.0 - dots
            else:
                nrm = jnp.take(cnorms_c, safe, axis=0)
                d = nrm - 2.0 * dots + qn[:, None]
            valid = (ic >= 0) & ok[:, None]
            d = jnp.where(valid, d, PAD_DIST)
            ic = jnp.where(valid, ic, PAD_ID)
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, ic], axis=1)
            return topk_smallest(cat_d, cat_i, k), None

        init = (
            jnp.full((b, k), PAD_DIST, jnp.float32),
            jnp.full((b, k), PAD_ID, jnp.int32),
        )
        (bd, bi), _ = jax.lax.scan(slot_fn, init, vb.T)
        return bd, bi

    bd, bi = jax.lax.map(
        block_fn, (q.reshape(nb, b, dim), visit.reshape(nb, b, nv))
    )
    return bd.reshape(nb * b, k)[:nq], bi.reshape(nb * b, k)[:nq]


@dataclasses.dataclass
class CNNSIndex:
    reps: jax.Array          # [C, m+1, d] centroid + m member reps
    data_c: jax.Array        # [C, maxc, d] padded cluster slabs
    ids_c: jax.Array         # [C, maxc] global ids (PAD_ID padded)
    sizes: np.ndarray        # [C]
    metric: str = "l2"
    local_index: str = "flat"
    # nsg-local arena (flat layout, intra-cluster edges in flat ids)
    flat_adj: jax.Array | None = None   # [C*maxc, R]
    eps_flat: np.ndarray | None = None  # [C] entry points in flat ids
    cnorms_c: jax.Array | None = None   # [C, maxc] cached cluster norms

    def __post_init__(self):
        if self.cnorms_c is None and self.metric == "l2":
            # squared_norms upcasts, so bf16 slabs still get f32 norms
            self.cnorms_c = squared_norms(self.data_c)

    @property
    def n_clusters(self) -> int:
        return self.reps.shape[0]

    @property
    def maxc(self) -> int:
        return self.data_c.shape[1]

    def _route(self, q: jax.Array, nprobe: int, rank_by: str = "hits"):
        return _route_clusters(q, self.reps, nprobe, self.metric, rank_by)

    def search(
        self,
        queries,
        k: int = 100,
        nprobe: int | None = None,
        l_search: int = 100,
        expand: int = 1,
        rank_by: str = "hits",
    ):
        """Returns (dists [Q, k] exact, global ids [Q, k])."""
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        nprobe = nprobe or max(1, self.n_clusters // 8)
        visit = self._route(q, nprobe, rank_by)  # [Q, V]

        if self.local_index == "flat":
            return self._search_flat(q, visit, k)
        return self._search_nsg(q, visit, k, l_search, expand)

    def _search_flat(self, q, visit, k):
        cnorms = (
            self.cnorms_c if self.cnorms_c is not None
            else jnp.zeros(self.ids_c.shape, jnp.float32)
        )
        return _flat_probe_search(
            q, visit, self.data_c, self.ids_c, cnorms, k, self.metric
        )

    def _search_nsg(self, q, visit, k, l_search, expand):
        c, maxc, d = self.data_c.shape
        flat_data = self.data_c.reshape(c * maxc, d)
        flat_norms = squared_norms(flat_data)
        flat_ids = self.ids_c.reshape(c * maxc)
        nq = q.shape[0]
        # init: every probed cluster's entry point + its neighbors
        safe = jnp.where(visit >= 0, visit, 0)
        eps = jnp.asarray(self.eps_flat)[safe]            # [Q, V]
        ep_nbrs = jnp.take(self.flat_adj, eps, axis=0)    # [Q, V, R]
        init = jnp.concatenate(
            [eps[:, :, None], ep_nbrs], axis=2
        ).reshape(nq, -1)
        init = jnp.where(
            jnp.repeat(visit >= 0, init.shape[1] // visit.shape[1], axis=1),
            init, PAD_ID,
        )
        res = beam_search(
            q, flat_data, flat_norms, self.flat_adj, init,
            width=max(l_search, k), metric=self.metric, expand=expand,
        )
        ids = res.ids[:, :k]
        dd = res.dists[:, :k]
        if self.metric == "l2":
            dd = dd + squared_norms(q)[:, None]
        gids = jnp.where(ids >= 0, flat_ids[jnp.where(ids >= 0, ids, 0)],
                         PAD_ID)
        return dd, gids

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        d_np = np.asarray(self.data_c)
        if d_np.dtype.name == "bfloat16":  # npz has no bf16: store raw bits
            d_np = d_np.view(np.uint16)
        np.savez(
            path,
            slab_dtype=self.data_c.dtype.name,
            reps=np.asarray(self.reps),
            data_c=d_np,
            ids_c=np.asarray(self.ids_c),
            sizes=self.sizes,
            metric=self.metric,
            local_index=self.local_index,
            flat_adj=(np.asarray(self.flat_adj)
                      if self.flat_adj is not None else np.zeros((0, 0), np.int32)),
            eps_flat=(self.eps_flat if self.eps_flat is not None
                      else np.zeros(0, np.int64)),
        )

    @classmethod
    def load(cls, path: str) -> "CNNSIndex":
        z = np.load(path, allow_pickle=False)
        flat_adj = z["flat_adj"]
        d_np = z["data_c"]
        if "slab_dtype" in z and str(z["slab_dtype"]) == "bfloat16":
            d_np = jnp.asarray(d_np).view(jnp.bfloat16)
        return cls(
            reps=jnp.asarray(z["reps"]),
            data_c=jnp.asarray(d_np),
            ids_c=jnp.asarray(z["ids_c"]),
            sizes=z["sizes"],
            metric=str(z["metric"]),
            local_index=str(z["local_index"]),
            flat_adj=jnp.asarray(flat_adj) if flat_adj.size else None,
            eps_flat=z["eps_flat"] if z["eps_flat"].size else None,
        )


def build_cnns(
    data,
    cfg: CNNSConfig = CNNSConfig(),
    metric: str = "l2",
    local_index: str = "flat",
    seed: int = 0,
    verbose: bool = False,
    slab_dtype=None,
) -> CNNSIndex:
    """Build the full CNNS pipeline (both reference build stages).

    slab_dtype: dtype of the probed cluster slabs. f32 default = exact
    scans (the reference's flat search semantics). bf16 halves the bytes
    the probe-slot gather moves — the entire cost of flat search — for
    ~2x QPS; ranking then carries bf16 rounding (norms stay f32), so it
    is the benchmark/production mode, gated on measured recall."""
    data = jnp.asarray(data)
    n, d = data.shape
    rng = np.random.default_rng(seed)

    centroids, assign = kmeans(
        data, cfg.n_clusters, iters=cfg.kmeans_iters, seed=seed
    )
    assign = np.asarray(assign)
    k0 = centroids.shape[0]

    # slab layout: oversized clusters are split into multiple slabs so the
    # common pad width maxc stays ~2x the mean cluster size — padding width
    # is paid on every probe, so balance is throughput
    order = np.argsort(assign, kind="stable")
    sizes0 = np.bincount(assign, minlength=k0)
    target = max(int(np.ceil(n / k0)), 8)
    maxc = int(((2 * target + 7) // 8) * 8)

    # slab layout fully vectorized (the per-cluster Python loop dominated
    # build time at C >= 2k): a cluster of size s becomes ceil(s/maxc)
    # slabs; every sorted point gets (slab row, slot) coordinates
    n_slabs0 = np.maximum(-(-sizes0 // maxc), 1)
    slab_base = np.concatenate([[0], np.cumsum(n_slabs0)])
    c = int(slab_base[-1])
    cluster_of_point = np.repeat(np.arange(k0), sizes0)
    starts = np.concatenate([[0], np.cumsum(sizes0)])
    off_in_cluster = np.arange(n) - starts[cluster_of_point]
    slab_row = slab_base[cluster_of_point] + off_in_cluster // maxc
    slot = off_in_cluster % maxc

    data_np = np.asarray(data)
    ids_c = np.full((c, maxc), PAD_ID, np.int32)
    ids_c[slab_row, slot] = order
    data_c = np.zeros((c, maxc, d), np.float32)
    valid = ids_c >= 0
    data_c[valid] = data_np[ids_c[valid]]
    sizes = valid.sum(axis=1)

    # representatives: centroid (slab mean) + m random members
    # (cluster_IVF_nndescent.cpp:143-186)
    reps = np.zeros((c, cfg.m + 1, d), np.float32)
    safe_sz = np.maximum(sizes, 1)
    reps[:, 0] = data_c.sum(axis=1) / safe_sz[:, None]
    reps[sizes == 0, 0] = data_np[0]
    pick = (rng.random((c, cfg.m)) * safe_sz[:, None]).astype(np.int64)
    reps[:, 1:] = data_c[np.arange(c)[:, None], pick]

    flat_adj = None
    eps_flat = None
    if local_index == "nsg":
        r_deg = cfg.nsg.R
        flat_adj_np = np.full((c * maxc, r_deg), PAD_ID, np.int32)
        eps_flat = np.zeros(c, np.int64)
        for ci in range(c):
            sz = int(sizes[ci])
            if sz <= 1:
                eps_flat[ci] = ci * maxc
                continue
            xc = data_c[ci, :sz]
            kk = min(cfg.nndescent.K, sz - 1)
            if sz <= 4096:
                knn = knn_graph_exact(jnp.asarray(xc), kk, query_block=4096)
            else:
                knn = knn_graph_rp(xc, kk, metric=metric, seed=seed + ci)
            nsg = build_nsg(
                xc, knn, cfg.nsg, metric=metric, seed=seed + ci,
                pad_to_bucket=True,
            )
            adj_local = np.asarray(nsg.adj)
            remap = np.where(adj_local >= 0, adj_local + ci * maxc, PAD_ID)
            flat_adj_np[ci * maxc : ci * maxc + sz, : adj_local.shape[1]] = (
                remap
            )
            eps_flat[ci] = nsg.ep + ci * maxc
            if verbose:
                print(f"cluster {ci + 1}/{c}: NSG built over {sz} points")
        flat_adj = jnp.asarray(flat_adj_np)

    if slab_dtype is None:
        slab_dtype = jnp.float32
    cnorms = squared_norms(jnp.asarray(data_c)) if metric == "l2" else None
    return CNNSIndex(
        reps=jnp.asarray(reps),
        data_c=jnp.asarray(data_c).astype(slab_dtype),
        ids_c=jnp.asarray(ids_c),
        sizes=sizes,
        metric=metric,
        local_index=local_index,
        flat_adj=flat_adj,
        eps_flat=eps_flat,
        cnorms_c=cnorms,
    )
