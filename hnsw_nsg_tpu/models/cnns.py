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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import (
    PAD_DIST, PAD_ID, as_f32_queries, pairwise_dists, squared_norms,
)
from ..ops.topk import topk_smallest
from ..utils.params import CNNSConfig, NSGBuildConfig
from .beam import beam_search_chunked
from .kmeans import kmeans

# scoped-VMEM budget for the gq kernel's resident query block (the 16 MB
# stack minus headroom for the scan transients); above it the grouped
# scan pre-gathers query rows instead (see _grouped_probe_search)
_GQ_VMEM_BUDGET = 12 << 20


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "metric", "rank_by", "route_m", "n_valid"),
)
def _route_clusters(q, reps, nprobe: int, metric: str, rank_by="hits",
                    route_m: int | None = None,
                    n_valid: int | None = None):
    """Rank clusters for probing. rank_by="hits": representative hit count
    (reference default, cluster_hnsw_nsg_search.cpp:146-173), ties broken by
    best rep rank; rank_by="min_dist": closest-representative order (the
    sort_by_min_dist ablation, experiment_feature/sort_by_min_dist.cpp:
    280-287). Returns visit list [Q, nprobe] of cluster ids (PAD padded)."""
    if route_m is not None:
        # route on the first route_m representatives only (route_m=1 ==
        # centroid-only routing, the knn-router ablation with m=0); the
        # rep GEMM and the approximate top-k shrink proportionally
        reps = reps[:, :route_m]
    c, m1, d = reps.shape
    rep_flat = reps.reshape(c * m1, d)
    # bf16 rep distances + hardware approximate top-k: routing is rank
    # selection at cluster granularity, insensitive to both (measured
    # 0.988 top-40 overlap with the exact f32 route; exact lax.top_k over
    # the ~10k-wide rep row is 5-2000x slower on TPU)
    rd = pairwise_dists(
        q.astype(jnp.bfloat16), rep_flat.astype(jnp.bfloat16),
        metric, exact=False,
    )
    if n_valid is not None and n_valid < c:
        # padded sentinel reps cannot be excluded by value alone: a
        # huge-magnitude vector has huge |inner product| too, so for the
        # ip metric it would WIN routing for half the queries — mask
        # padded clusters by index instead
        col_cid = jax.lax.broadcasted_iota(
            jnp.int32, (1, c * m1), 1
        ) // m1
        rd = jnp.where(col_cid >= n_valid, PAD_DIST, rd)
    n_rep = min(nprobe * m1, c * m1)
    if c * m1 > 4 * n_rep and c * m1 >= 256:
        _, rep_idx = jax.lax.approx_max_k(
            -rd, n_rep, recall_target=0.95
        )
    else:
        _, rep_idx = jax.lax.top_k(-rd, n_rep)  # [Q, n_rep]
    return _rank_rep_hits(rep_idx, m1, nprobe, rank_by)


@functools.partial(jax.jit, static_argnames=("m1", "nprobe", "rank_by"))
def _rank_rep_hits(rep_idx, m1: int, nprobe: int, rank_by: str):
    """Rep hit list [Q, n_rep] -> ranked visit list [Q, nprobe].

    Shared by every router (flat GEMM or HNSW-over-reps): hit count per
    cluster with first-occurrence dedup, ties broken by best rep rank
    (cluster_hnsw_nsg_search.cpp:146-173), or pure rep-rank order for the
    sort_by_min_dist ablation."""
    n_rep = rep_idx.shape[1]
    cid = jnp.where(rep_idx >= 0, rep_idx // m1, PAD_ID)   # [Q, n_rep]
    eq = (cid[:, :, None] == cid[:, None, :]) & (cid[:, :, None] >= 0)
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
    score = jnp.where(first & (cid >= 0), score, -1)
    _, order = jax.lax.top_k(score, min(nprobe, n_rep))
    visit = jnp.take_along_axis(cid, order, axis=1)
    got = jnp.take_along_axis(score, order, axis=1) >= 0
    return jnp.where(got, visit, PAD_ID)


def _load_qshift(v):
    """qshift from npz: scalar (uint8 space) or [d] array (quantized)."""
    a = np.asarray(v, np.float32)
    return float(a) if a.ndim == 0 else a


def _cast_q(qf, slab_dtype, q_round: bool = True):
    """Queries in the slab's compute dtype. int8 slabs with integral
    data (uint8 spaces stored shift-by-128, sift_1b.cpp:243-247 analogue)
    round the already-integral shifted queries — exact. Quantized int8
    slabs (qscale != 1) keep the query bf16 instead (q_round=False):
    rounding it would double the quantization noise, and the kernels
    upcast the slab tile to bf16 for the mixed dot."""
    if slab_dtype == jnp.int8:
        if q_round:
            return jnp.round(qf).astype(jnp.int8)
        return qf.astype(jnp.bfloat16)
    return qf.astype(slab_dtype)


def _einsum_operands(qb, slab):
    """XLA einsum operands + precision for a slab block: int8 is computed
    exactly as f32 (values are small integers; the MXU int path is the
    Pallas kernel's job), f32 stays HIGHEST, bf16 native."""
    if slab.dtype == jnp.int8:
        return (qb.astype(jnp.float32), slab.astype(jnp.float32),
                jax.lax.Precision.HIGHEST)
    if slab.dtype == jnp.float32:
        return qb, slab, jax.lax.Precision.HIGHEST
    return qb, slab, jax.lax.Precision.DEFAULT


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "q_block", "q_round")
)
def _flat_probe_search(q, visit, data_c, ids_c, cnorms_c, k, metric,
                       q_block: int = 2048, q_round: bool = True):
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
        qc = _cast_q(qf, data_c.dtype, q_round)

        def slot_fn(carry, cid):
            best_d, best_i = carry
            ok = cid >= 0
            safe = jnp.where(ok, cid, 0)
            xc = jnp.take(data_c, safe, axis=0)    # [B, maxc, d]
            ic = jnp.take(ids_c, safe, axis=0)     # [B, maxc]
            qe, xe, prec = _einsum_operands(qc, xc)
            dots = jnp.einsum(
                "qd,qmd->qm", qe, xe,
                preferred_element_type=jnp.float32,
                precision=prec,
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


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "cap", "block", "approx", "pallas",
                     "q_round", "k_out", "sp_budget"),
)
def _grouped_probe_search(q, visit, data_c, ids_c, cnorms_c, k, metric,
                          cap: int, block: int, approx: bool,
                          pallas: bool = False, q_round: bool = True,
                          k_out: int | None = None,
                          sp_budget: int | None = None):
    """Inverted, cluster-major probe scan.

    The per-query slot scan (_flat_probe_search) gathers each probed slab
    once PER QUERY — at Q=8k x nprobe=8 that re-reads the popular slabs
    thousands of times and the search is slab-gather bandwidth-bound
    (~88 GB/s measured => ~45k QPS at 1M). Grouping inverts the loop: sort
    the (cluster, query) probe pairs by cluster, give every cluster a
    fixed-capacity query list, and sweep the slab table ONCE in contiguous
    blocks — each probed slab is read a single time per batch and the MXU
    does one [cap, d] x [d, maxc] GEMM per cluster. Probe pairs beyond
    ``cap`` for an over-popular cluster are dropped, like the reference's
    early-stop skipping low-ranked clusters (cluster_hnsw_nsg_search.cpp:
    237-251) — capacity is sized ~2x the mean so drops are rare tail
    events on the lowest-ranked probes.

    Per-(cluster, slot) top-k uses the TPU-native approximate top-k
    (``approx=True``; bound by its recall_target=0.99 per slot) or exact
    ``lax.top_k``. FastL2 values merge correctly across clusters because
    the per-query ||q||^2 shift is constant within a query row.
    """
    qn, d = q.shape
    c, maxc = ids_c.shape
    npr = visit.shape[1]
    qf = q.astype(jnp.float32)
    qc = _cast_q(qf, data_c.dtype, q_round)

    # ---- invert: (cluster, query) pairs sorted by (cluster, probe rank)
    # -> [C, cap] query lists. Ranking by probe rank makes any capacity
    # overflow fall on the LOWEST-ranked probes; the overflow pairs are
    # then searched exactly through the per-query path below, so capacity
    # only shifts work, never drops it.
    flat_cid = visit.reshape(-1)
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, (qn, npr), 1
    ).reshape(-1)
    pair_q = jax.lax.broadcasted_iota(
        jnp.int32, (qn, npr), 0
    ).reshape(-1)
    sort_key = jnp.where(
        flat_cid >= 0, flat_cid * npr + slot_iota, c * npr
    )
    order = jnp.argsort(sort_key, stable=True)
    scid = jnp.where(flat_cid[order] >= 0, flat_cid[order], c)
    sq = pair_q[order]
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (qn * npr, 1), 0)[:, 0]
        - jnp.searchsorted(scid, scid, side="left").astype(jnp.int32)
    )
    ok = (scid < c) & (pos < cap)
    spilled = (scid < c) & (pos >= cap)
    qidx = jnp.full((c, cap), PAD_ID, jnp.int32).at[
        jnp.where(ok, scid, c), jnp.where(ok, pos, 0)
    ].set(jnp.where(ok, sq, PAD_ID), mode="drop")

    # ---- contiguous slab sweep
    if pallas:
        # fused Pallas kernel: per-cluster MXU GEMM + in-VMEM exact top-k
        # (ops/pallas_scan.py) — no [cap, maxc] HBM materialization, no
        # separate top_k pass, and the per-slot query block is gathered
        # ON the MXU via one-hot matmul instead of jnp.take's C*cap
        # scattered row gathers (which an earlier standalone pass made the
        # dominant cost of the whole search; fusing keeps the gathered
        # block in VMEM and off the HBM round-trip entirely)
        from ..ops.pallas_scan import (
            grouped_cluster_topk, grouped_cluster_topk_gq,
            grouped_cluster_topk_gq_dblk,
        )

        if metric in ("ip", "cosine"):
            bias = jnp.where(ids_c >= 0, 1.0, jnp.inf).astype(jnp.float32)
            scale = 1.0
        else:
            bias = jnp.where(
                ids_c >= 0, cnorms_c, jnp.inf
            ).astype(jnp.float32)
            scale = 2.0
        # The gq kernel keeps the WHOLE query set VMEM-resident across
        # the grid (that is what makes its one-hot gather free) — at
        # large d it no longer fits the 16 MB scoped-VMEM stack
        # (qn*d bf16 alone is 15.7 MB at 8192x960). In that regime the
        # d-BLOCKED gq kernel takes over: the query set rides in
        # [qn, dblk] chunks with a VMEM dots accumulator, so the one-hot
        # MXU gather survives at any d (round 2's pre-gathered fallback
        # materialized C*cap jnp.take rows through HBM — ~70-190 ms at
        # the GIST shape, the dominant cost of the whole scan). The
        # pre-gathered
        # kernel remains as the last resort when even the per-cluster
        # accumulator footprint (cap*maxc f32) would not fit.
        gq_vmem = (
            qc.size * qc.dtype.itemsize
            + maxc * d * data_c.dtype.itemsize
            + 2 * cap * maxc * 4          # dist + masked-update temps
            + cap * qc.shape[0]           # one-hot sel tile
        )
        interp = jax.default_backend() == "cpu"
        if gq_vmem <= _GQ_VMEM_BUDGET:
            td, li = grouped_cluster_topk_gq(
                qc, qidx, data_c, bias, k, scale, interpret=interp,
            )
        else:
            dblk = 256
            dblk_vmem = (
                qc.shape[0] * dblk * max(qc.dtype.itemsize, 2)
                + maxc * dblk * data_c.dtype.itemsize
                + 3 * cap * maxc * 4      # acc scratch + dist temps
                + 2 * cap * qc.shape[0]   # one-hot sel tile (>=bf16)
            )
            if dblk_vmem <= _GQ_VMEM_BUDGET:
                td, li = grouped_cluster_topk_gq_dblk(
                    qc, qidx, data_c, bias, k, scale, dblk=dblk,
                    interpret=interp,
                )
            else:
                qv = jnp.where(
                    (qidx >= 0)[:, :, None],
                    jnp.take(qc, jnp.where(qidx >= 0, qidx, 0), axis=0),
                    0,
                )                                      # [C, cap, d]
                td, li = grouped_cluster_topk(
                    qv, data_c, bias, k, scale, interpret=interp,
                )
        live = (qidx >= 0)[:, :, None]
        gi = jnp.take_along_axis(ids_c[:, None, :], li, axis=2)
        gi = jnp.where(live & jnp.isfinite(td), gi, PAD_ID)
        td = jnp.where(gi >= 0, td, PAD_DIST)
    else:
        qv = jnp.where(
            (qidx >= 0)[:, :, None],
            jnp.take(qc, jnp.where(qidx >= 0, qidx, 0), axis=0),
            0,
        )                                              # [C, cap, d]
        td, gi = _xla_slab_sweep(
            qv, data_c, ids_c, cnorms_c, qidx, k, metric, cap, block,
            approx,
        )

    # ---- route results back to query rows and merge the probe slots.
    # (vals, ids) ride PACKED in one int32 [C, cap, 2k] tensor so the
    # route-back costs ONE data-dependent row gather + ONE scatter
    # instead of two of each (halving the scattered-row HBM round trips
    # and fusion barriers; P = qn*npr = 32k rows at the bench shape)
    safe_cid = jnp.where(ok, scid, 0)
    safe_pos = jnp.where(ok, pos, 0)
    packed = jnp.concatenate(
        [jax.lax.bitcast_convert_type(td, jnp.int32), gi], axis=2
    )                                                   # [C, cap, 2k]
    rp = packed[safe_cid, safe_pos]                     # [P, 2k]
    rd = jnp.where(
        ok[:, None],
        jax.lax.bitcast_convert_type(rp[:, :k], jnp.float32), PAD_DIST,
    )
    ri = jnp.where(ok[:, None], rp[:, k:], PAD_ID)
    # invalid pairs (PAD cluster) target the out-of-bounds slot npr and
    # are dropped, so they can never clobber a real (q, slot) cell
    slot = jnp.where(flat_cid[order] >= 0, slot_iota[order], npr)
    out_p = jnp.full((qn, npr, 2 * k), 0, jnp.int32).at[
        sq, slot
    ].set(
        jnp.concatenate(
            [jax.lax.bitcast_convert_type(rd, jnp.int32), ri], axis=1
        ),
        mode="drop",
    )
    out_d = jax.lax.bitcast_convert_type(
        out_p[:, :, :k], jnp.float32
    ).reshape(qn, npr * k)
    out_i = out_p[:, :, k:].reshape(qn, npr * k)
    # unset cells scatter-initialized to 0 bits: 0.0f dist / id 0 — mask
    # them via the per-(q, slot) occupancy instead of sentinel init
    occupied = jnp.zeros((qn, npr), jnp.bool_).at[sq, slot].set(
        ok, mode="drop"
    )
    occ = jnp.repeat(occupied, k, axis=1)
    out_d = jnp.where(occ & (out_i >= 0), out_d, PAD_DIST)
    out_i = jnp.where(occ & (out_i >= 0), out_i, PAD_ID)
    if metric == "l2":
        out_d = jnp.where(
            out_i >= 0, out_d + squared_norms(qf)[:, None], PAD_DIST
        )

    # ---- overflow pairs: compact them into a pair list and scan each
    # pair's slab directly (cost proportional to the spill count, not Q).
    # Pairs beyond the spill budget — beyond-rare, and by construction the
    # lowest-ranked probes of the most over-subscribed clusters — drop.
    if sp_budget is None:
        sp_budget = max(
            256, min(1 << (int(qn * npr / 16)).bit_length(), 2048)
        )
    order2 = jnp.argsort(~spilled, stable=True)[:sp_budget]
    m = spilled[order2]
    pq = jnp.where(m, sq[order2], 0)
    pc = jnp.where(m, scid[order2], 0)
    ps = jnp.where(m, slot[order2], 0)

    def sp_blk(args):
        pq_b, pc_b, m_b = args
        slab = jnp.take(data_c, pc_b, axis=0)       # [B, maxc, d]
        ic = jnp.take(ids_c, pc_b, axis=0)
        xq = jnp.take(qc, pq_b, axis=0)
        qe, xe, prec = _einsum_operands(xq, slab)
        dots = jnp.einsum(
            "pd,pmd->pm", qe, xe,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if metric in ("ip", "cosine"):
            dist = 1.0 - dots
        else:
            dist = jnp.take(cnorms_c, pc_b, axis=0) - 2.0 * dots
        valid = (ic >= 0) & m_b[:, None]
        dist = jnp.where(valid, dist, PAD_DIST)
        return topk_smallest(dist, jnp.where(valid, ic, PAD_ID), k)

    spb = 512
    nsp = sp_budget // spb if sp_budget % spb == 0 else 1
    if nsp > 1:
        sp_d, sp_i = jax.lax.map(
            sp_blk,
            (pq.reshape(nsp, spb), pc.reshape(nsp, spb),
             m.reshape(nsp, spb)),
        )
        sp_d = sp_d.reshape(sp_budget, k)
        sp_i = sp_i.reshape(sp_budget, k)
    else:
        sp_d, sp_i = sp_blk((pq, pc, m))
    if metric == "l2":
        qn_all = squared_norms(qf)
        sp_d = jnp.where(
            sp_i >= 0, sp_d + qn_all[pq][:, None], PAD_DIST
        )
    # spilled (q, slot) cells are empty in the grouped output, so the
    # scatter cannot collide with grouped results; masked budget rows
    # target an out-of-bounds row and drop
    pq_dst = jnp.where(m, pq, qn)
    out_d = out_d.reshape(qn, npr, k).at[pq_dst, ps].set(
        sp_d, mode="drop"
    ).reshape(qn, npr * k)
    out_i = out_i.reshape(qn, npr, k).at[pq_dst, ps].set(
        sp_i, mode="drop"
    ).reshape(qn, npr * k)
    # k_out > k widens only this final cross-cluster merge (spilled
    # indexes fetch 2k so id-dedup can still return k unique); the
    # per-cluster kernel k stays small, where extraction passes cost
    return topk_smallest(out_d, out_i, min(k_out or k, npr * k))


def _xla_slab_sweep(qv, data_c, ids_c, cnorms_c, qidx, k, metric,
                    cap: int, block: int, approx: bool):
    """XLA fallback sweep (CPU / debugging): scan over cluster blocks,
    einsum + top_k per block. Exact lax.top_k by default — measured
    FASTER than approx_max_k at the production shapes (PROGRESS.md)."""
    c, maxc = ids_c.shape
    d = data_c.shape[2]
    nb = c // block

    def blk(_, i):
        slab = jax.lax.dynamic_slice(
            data_c, (i * block, 0, 0), (block, maxc, d)
        )
        ids_b = jax.lax.dynamic_slice(ids_c, (i * block, 0), (block, maxc))
        qb = jax.lax.dynamic_slice(qv, (i * block, 0, 0), (block, cap, d))
        live = jax.lax.dynamic_slice(
            qidx, (i * block, 0), (block, cap)
        ) >= 0
        qe, xe, prec = _einsum_operands(qb, slab)
        dots = jnp.einsum(
            "bcd,bmd->bcm", qe, xe,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if metric in ("ip", "cosine"):
            dist = 1.0 - dots
        else:
            nrm = jax.lax.dynamic_slice(
                cnorms_c, (i * block, 0), (block, maxc)
            )
            dist = nrm[:, None, :] - 2.0 * dots
        dist = jnp.where(
            (ids_b >= 0)[:, None, :] & live[:, :, None], dist, PAD_DIST
        )
        flat = dist.reshape(block * cap, maxc)
        if approx:
            neg, ti = jax.lax.approx_max_k(-flat, k, recall_target=0.99)
        else:
            neg, ti = jax.lax.top_k(-flat, k)
        td = -neg
        gi = jnp.take_along_axis(
            jnp.broadcast_to(
                ids_b[:, None, :], (block, cap, maxc)
            ).reshape(block * cap, maxc),
            ti, axis=1,
        )
        gi = jnp.where(td < PAD_DIST, gi, PAD_ID)
        return None, (td.reshape(block, cap, k), gi.reshape(block, cap, k))

    _, (td, gi) = jax.lax.scan(
        blk, None, jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]
    )
    return td.reshape(c, cap, k), gi.reshape(c, cap, k)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "nprobe", "rank_by", "route_m",
                     "cap", "block", "approx", "n_valid", "pallas",
                     "q_round", "k_out"),
)
def _route_and_group(q, reps, data_c, ids_c, cnorms_c, k, metric,
                     nprobe, rank_by, route_m, cap, block, approx,
                     n_valid=None, pallas=False, q_round=True,
                     k_out=None):
    """Route + grouped scan as ONE device program: per-dispatch overhead
    on the tunneled TPU is ~30-50 ms, a large fraction of a ~100 ms
    batch, so the two stages fuse."""
    visit = _route_clusters(q, reps, nprobe, metric, rank_by, route_m,
                            n_valid=n_valid)
    return _grouped_probe_search(
        q, visit, data_c, ids_c, cnorms_c, k, metric,
        cap=cap, block=block, approx=approx, pallas=pallas,
        q_round=q_round, k_out=k_out,
    )


def _default_pallas() -> bool:
    """The fused Pallas sweep is the production path on TPU; the XLA
    sweep serves CPU (tests) and debugging. CNNS_PALLAS=0/1 overrides
    (used by bench.py's breakdown mode to attribute kernel-vs-XLA
    throughput deltas)."""
    ov = os.environ.get("CNNS_PALLAS")
    if ov is not None:
        return ov != "0"
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("k",))
def dedup_topk(d, i, k: int):
    """Drop duplicate ids from distance-ascending (dists, ids) rows,
    keeping the first (closest) occurrence, and return the top k.

    Spilled indexes hold each boundary point in two slabs; when both are
    probed the candidate list carries the id twice. Each id appears at
    most twice, so 2k candidates always contain >= k unique ids."""
    k2 = i.shape[1]
    eq = (i[:, :, None] == i[:, None, :]) & (i[:, :, None] >= 0)
    earlier = jnp.tril(jnp.ones((k2, k2), jnp.bool_), -1)[None]
    dup = jnp.any(eq & earlier, axis=2)
    dd = jnp.where(dup, PAD_DIST, d)
    ii = jnp.where(dup, PAD_ID, i)
    nd, sel = jax.lax.top_k(-dd, k)
    return -nd, jnp.take_along_axis(ii, sel, axis=1)


@dataclasses.dataclass
class CNNSIndex:
    reps: jax.Array          # [C, m+1, d] centroid + m member reps
    data_c: jax.Array        # [C, maxc, d] padded cluster slabs
    ids_c: jax.Array         # [C, maxc] global ids (PAD_ID padded)
    sizes: np.ndarray        # [C]
    metric: str = "l2"
    local_index: str = "flat"
    n_real: int | None = None    # clusters before slab-count padding
    # int8 slab transform: slabs stored round((x - qshift) / qscale).
    # uint8 spaces (sift_1b.cpp:243-247) use qshift=128, qscale=1 (exact
    # integer math, L2 shift-invariant); arbitrary f32 data quantizes with
    # a per-dim shift + global scale (distances come back in scaled units
    # and are rescaled by qscale^2 on return)
    qshift: object = 0.0      # float or [d] np.ndarray
    qscale: float = 1.0
    # nsg-local arena (flat layout, intra-cluster edges in flat ids)
    flat_adj: jax.Array | None = None   # [C*maxc, R]
    eps_flat: np.ndarray | None = None  # [C] entry points in flat ids
    cnorms_c: jax.Array | None = None   # [C, maxc] cached cluster norms
    # pad slots carry boundary-point replicas (CNNSConfig.replicate):
    # searches fetch 2k candidates and dedup ids in the final merge
    replicated: bool = False

    def __post_init__(self):
        if self.n_real is None:
            self.n_real = self.reps.shape[0]
        if self.cnorms_c is None and self.metric == "l2":
            # squared_norms upcasts, so bf16 slabs still get f32 norms
            self.cnorms_c = squared_norms(self.data_c)

    @property
    def n_clusters(self) -> int:
        return self.reps.shape[0]

    @property
    def maxc(self) -> int:
        return self.data_c.shape[1]

    def _route(self, q: jax.Array, nprobe: int, rank_by: str = "hits",
               route_m: int | None = None, router: str = "flat"):
        if router == "hnsw":
            return self._route_hnsw(q, nprobe, rank_by)
        return _route_clusters(
            q, self.reps, nprobe, self.metric, rank_by, route_m,
            n_valid=self.n_real,
        )

    def build_router_hnsw(self, M: int = 32, ef_construction: int = 100):
        """HNSW over the representative points — the reference's actual
        router (faiss IndexHNSWFlat(dim, M=32) over n_clusters*(m+1) reps,
        cluster_IVF_nndescent.cpp:189-193). Exists for the router ablation
        (cluster_hnsw_hnsw_search.cpp:129-265); on TPU the flat
        representative GEMM is a single MXU pass and measures faster."""
        from .hnsw import HNSWIndex
        from ..utils.params import HNSWConfig

        c, m1, d = self.reps.shape
        n_real = self.n_real or c
        reps_real = np.asarray(self.reps[:n_real]).reshape(n_real * m1, d)
        idx = HNSWIndex(
            d, n_real * m1,
            HNSWConfig(M=M, ef_construction=ef_construction),
            self.metric,
        )
        idx.add_items(reps_real)
        self._router_hnsw = idx
        return idx

    def _route_hnsw(self, q, nprobe: int, rank_by: str = "hits"):
        if getattr(self, "_router_hnsw", None) is None:
            self.build_router_hnsw()
        m1 = self.reps.shape[1]
        n_rep = min(nprobe * m1, (self.n_real or self.n_clusters) * m1)
        labels, _ = self._router_hnsw.knn_query(
            np.asarray(q), k=n_rep, ef=max(2 * n_rep, 64)
        )
        # rep labels are sequential row ids -> rep index directly
        return _rank_rep_hits(
            jnp.asarray(labels.astype(np.int32)), m1, nprobe, rank_by
        )

    def search(
        self,
        queries,
        k: int = 100,
        nprobe: int | None = None,
        l_search: int = 100,
        expand: int = 1,
        rank_by: str = "hits",
        group: bool | None = None,
        route_m: int | None = None,
        router: str = "flat",
    ):
        """Returns (dists [Q, k] exact, global ids [Q, k]).

        group: use the cluster-major grouped scan (each probed slab read
        once per batch) instead of the per-query slot scan. Default: auto —
        group when the batch is large enough that probe pairs per cluster
        exceed ~2 (the regime where the per-query scan re-reads slabs).

        router: "flat" (one GEMM over the representatives — the
        cluster_knn_* ablation and TPU default) or "hnsw" (graph walk over
        the representatives — the reference's faiss router,
        cluster_hnsw_*_search.cpp)."""
        d, i = self._search_impl(
            queries, k, nprobe, l_search, expand, rank_by, group,
            route_m, router,
        )
        if self.replicated:
            # replicated boundary points can surface from two probed
            # slabs; the impl fetched 2k candidates and deduped here
            d, i = dedup_topk(d, i, k)
        if self.qscale != 1.0:
            # slabs live in the quantized domain; report metric-unit
            # dists. Rescale filled slots only — unfilled PAD_DIST
            # sentinels (3.4e37) would overflow to inf at qscale >= ~2
            d = jnp.where(i >= 0, d * jnp.float32(self.qscale) ** 2, d)
        return d, i

    def _search_impl(self, queries, k, nprobe, l_search, expand, rank_by,
                     group, route_m, router):
        q = as_f32_queries(queries)
        if self.qscale != 1.0 or np.any(self.qshift):
            # reps/slabs are stored shifted (+scaled): match the domain
            q = (q - jnp.asarray(self.qshift, jnp.float32)) / jnp.float32(
                self.qscale
            )
        nprobe = nprobe or max(1, (self.n_real or self.n_clusters) // 8)
        n_real = self.n_real or self.n_clusters
        nprobe = min(nprobe, n_real)

        if router != "flat":
            visit = self._route(q, nprobe, rank_by, route_m, router)
            if self.local_index == "flat":
                return self._search_flat(q, visit, k, group=group)
            return self._search_nsg(q, visit, k, l_search, expand)

        if self.local_index == "flat":
            c = self.data_c.shape[0]
            pairs = q.shape[0] * nprobe
            if group is None:
                group = pairs >= 2 * c and c % 64 == 0
            if group and c % 64 == 0 and 512 * c >= 2 * pairs:
                # (demand beyond the 512 cap ceiling falls through to
                # _search_flat's multi-pass grouped scan below)
                cap = 8
                while cap * c < 2 * pairs and cap < 512:
                    cap *= 2
                cnorms = (
                    self.cnorms_c if self.cnorms_c is not None
                    else jnp.zeros(self.ids_c.shape, jnp.float32)
                )
                return _route_and_group(
                    q, self.reps, self.data_c, self.ids_c, cnorms, k,
                    self.metric, nprobe, rank_by,
                    route_m, cap, 64, False, n_real,
                    pallas=_default_pallas(),
                    q_round=self.qscale == 1.0,
                    k_out=2 * k if self.replicated else None,
                )
        visit = self._route(q, nprobe, rank_by, route_m)  # [Q, V]
        if self.local_index == "flat":
            # pass the resolved group choice through: beyond the cap
            # ceiling this reaches _search_flat's multi-pass grouped scan
            return self._search_flat(q, visit, k, group=group)
        return self._search_nsg(q, visit, k, l_search, expand)

    def _search_flat(self, q, visit, k, group=None):
        cnorms = (
            self.cnorms_c if self.cnorms_c is not None
            else jnp.zeros(self.ids_c.shape, jnp.float32)
        )
        c = self.data_c.shape[0]
        npr = visit.shape[1]
        pairs = q.shape[0] * npr
        if group is None:
            group = pairs >= 2 * c and c % 64 == 0
        if group and c % 64 == 0:
            cap = 8
            while cap * c < 2 * pairs and cap < 512:
                cap *= 2
            kk = 2 * k if self.replicated else k
            if cap * c < 2 * pairs:
                # demand exceeds the kernel's cap ceiling (512, VMEM):
                # on low-structure data at large nprobe every cluster is
                # probed by ~Q*npr/C queries and single-pass grouping
                # would silently drop the overflow (measured: uniform1m
                # recall saturating at 0.487 from nprobe=64 on). Chunk
                # the probe slots so each pass fits the cap — the slab
                # sweep repeats per pass (~ms), correctness is restored.
                # Sizing uses the REAL cluster count (demand concentrates
                # on real slabs; pad slabs are never routed to), keeping
                # expected per-cluster demand <= cap/2 per pass; residual
                # skew overflow rides the grouped scan's exact per-pair
                # spill path (sp_budget)
                nr = self.n_real or c
                npr_chunk = max(1, (512 * nr) // (2 * q.shape[0]))
                # spill budget scaled to the pass size: single-slot skew
                # (one popular cluster drawing far more than the mean)
                # routinely spills thousands of pairs here, and the
                # default 2048 cap measurably dropped probes (round-5:
                # 943/131k pairs, -0.35% recall vs the per-query oracle)
                spb = 1 << max(12, (q.shape[0] // 2 - 1).bit_length())
                best_d = best_i = None
                for s in range(0, npr, npr_chunk):
                    gd, gi = _grouped_probe_search(
                        q, visit[:, s : s + npr_chunk], self.data_c,
                        self.ids_c, cnorms, k, self.metric, cap=512,
                        block=64, approx=False, pallas=_default_pallas(),
                        q_round=self.qscale == 1.0, k_out=kk,
                        sp_budget=spb,
                    )
                    if best_d is None:
                        best_d, best_i = gd, gi
                    else:
                        cd = jnp.concatenate([best_d, gd], axis=1)
                        ci = jnp.concatenate([best_i, gi], axis=1)
                        best_d, best_i = topk_smallest(cd, ci, kk)
                return best_d, best_i
            return _grouped_probe_search(
                q, visit, self.data_c, self.ids_c, cnorms, k,
                self.metric, cap=cap, block=64, approx=False,
                pallas=_default_pallas(), q_round=self.qscale == 1.0,
                k_out=2 * k if self.replicated else None,
            )
        # the per-query path's running merge must carry the duplicates,
        # so the whole scan widens to 2k for spilled indexes
        return _flat_probe_search(
            q, visit, self.data_c, self.ids_c, cnorms,
            2 * k if self.replicated else k, self.metric,
            q_round=self.qscale == 1.0,
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
        res = beam_search_chunked(
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
            n_real=np.int64(self.n_real or self.reps.shape[0]),
            qshift=np.asarray(self.qshift, np.float64),
            qscale=np.float64(self.qscale),
            slab_dtype=self.data_c.dtype.name,
            reps=np.asarray(self.reps),
            data_c=d_np,
            ids_c=np.asarray(self.ids_c),
            sizes=self.sizes,
            metric=self.metric,
            local_index=self.local_index,
            replicated=np.bool_(self.replicated),
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
            n_real=(int(z["n_real"]) if "n_real" in z else None),
            qshift=(_load_qshift(z["qshift"]) if "qshift" in z else 0.0),
            qscale=(float(z["qscale"]) if "qscale" in z else 1.0),
            reps=jnp.asarray(z["reps"]),
            data_c=jnp.asarray(d_np),
            ids_c=jnp.asarray(z["ids_c"]),
            sizes=z["sizes"],
            metric=str(z["metric"]),
            local_index=str(z["local_index"]),
            replicated=(bool(z["replicated"])
                        if "replicated" in z else False),
            flat_adj=jnp.asarray(flat_adj) if flat_adj.size else None,
            eps_flat=z["eps_flat"] if z["eps_flat"].size else None,
        )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=())
def _pack_slab_chunk(buf, nrm, cents, data, ids_chunk, qshift, inv_scale,
                     start):
    """Pack one chunk of slabs from DEVICE-resident data: row gather +
    (shift, scale) transform (+ int8 rounding) + norms + slab means, all
    on device. The host-side pack at 1M x 960 spent ~60 s of numpy copies
    plus the full slab transfer through the tunnel."""
    b, maxc = ids_chunk.shape
    d = data.shape[1]
    ok = ids_chunk >= 0
    rows = jnp.take(
        data, jnp.where(ok, ids_chunk, 0).reshape(-1), axis=0
    ).reshape(b, maxc, d).astype(jnp.float32)
    rows = (rows - qshift[None, None, :]) * inv_scale
    if buf.dtype == jnp.int8:
        rows = jnp.round(rows)
    rows = jnp.where(ok[:, :, None], rows, 0.0)
    buf = jax.lax.dynamic_update_slice(
        buf, rows.astype(buf.dtype), (start, 0, 0)
    )
    if nrm is not None:
        nrm = jax.lax.dynamic_update_slice(
            nrm, squared_norms(rows), (start, 0)
        )
    counts = jnp.maximum(ok.sum(axis=1), 1)[:, None].astype(jnp.float32)
    cents = jax.lax.dynamic_update_slice(
        cents, rows.sum(axis=1) / counts, (start, 0)
    )
    return buf, nrm, cents


def _pack_device_slabs(data_dev, ids_c_np, qshift, qscale, slab_dtype,
                       metric, chunk: int = 256):
    """Chunked device slab pack. Returns (slabs, norms, slab means) —
    means in the transformed (shift/scale) domain, like the slabs."""
    c, maxc = ids_c_np.shape
    d = data_dev.shape[1]
    buf = jnp.zeros((c, maxc, d), slab_dtype)
    nrm = jnp.zeros((c, maxc), jnp.float32) if metric == "l2" else None
    cents = jnp.zeros((c, d), jnp.float32)
    shift = jnp.broadcast_to(
        jnp.asarray(qshift, jnp.float32).reshape(-1), (d,)
    )
    inv = jnp.float32(1.0 / qscale)
    starts = list(range(0, max(c - chunk, 0) + 1, chunk))
    if starts[-1] + chunk < c:
        starts.append(c - chunk)
    if c <= chunk:
        starts = [0]
        chunk = c
    for s in starts:
        buf, nrm, cents = _pack_slab_chunk(
            buf, nrm, cents, data_dev,
            jnp.asarray(ids_c_np[s : s + chunk]), shift, inv, jnp.int32(s),
        )
    return buf, nrm, cents


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
def _fill_slab_chunk(buf, nrm, blk, start):
    buf = jax.lax.dynamic_update_slice(
        buf, blk.astype(buf.dtype), (start, 0, 0)
    )
    if nrm is not None:
        nrm = jax.lax.dynamic_update_slice(
            nrm, squared_norms(blk), (start, 0)
        )
    return buf, nrm


def _fill_device_slabs(data_c_np, slab_dtype, metric, chunk: int = 64):
    c, maxc, d = data_c_np.shape
    buf = jnp.zeros((c, maxc, d), slab_dtype)
    nrm = jnp.zeros((c, maxc), jnp.float32) if metric == "l2" else None
    if c <= chunk:
        return _fill_slab_chunk(
            buf, nrm, jnp.asarray(data_c_np), jnp.int32(0)
        )
    starts = list(range(0, c - chunk + 1, chunk))
    if starts[-1] + chunk < c:
        starts.append(c - chunk)
    for s in starts:
        buf, nrm = _fill_slab_chunk(
            buf, nrm, jnp.asarray(data_c_np[s : s + chunk]), jnp.int32(s)
        )
    return buf, nrm


@functools.partial(jax.jit, donate_argnums=(0,))
def _slab_mean_chunk(cents, data, ids_chunk, qshift, inv_scale, start):
    """Mean of each slab's ORIGINAL members in the transformed domain
    (the routing representative must not drift when boundary replicas are
    packed into the pad slots afterwards)."""
    b, maxc = ids_chunk.shape
    d = data.shape[1]
    ok = ids_chunk >= 0
    rows = jnp.take(
        data, jnp.where(ok, ids_chunk, 0).reshape(-1), axis=0
    ).reshape(b, maxc, d).astype(jnp.float32)
    rows = (rows - qshift[None, None, :]) * inv_scale
    rows = jnp.where(ok[:, :, None], rows, 0.0)
    counts = jnp.maximum(ok.sum(axis=1), 1)[:, None].astype(jnp.float32)
    return jax.lax.dynamic_update_slice(
        cents, rows.sum(axis=1) / counts, (start, 0)
    )


def _slab_means(data_dev, ids_c_np, qshift, qscale, chunk: int = 256):
    c, _ = ids_c_np.shape
    d = data_dev.shape[1]
    cents = jnp.zeros((c, d), jnp.float32)
    shift = jnp.broadcast_to(
        jnp.asarray(qshift, jnp.float32).reshape(-1), (d,)
    )
    inv = jnp.float32(1.0 / qscale)
    chunk = min(chunk, c)
    starts = list(range(0, c - chunk + 1, chunk))
    if starts[-1] + chunk < c:
        starts.append(c - chunk)
    for s in starts:
        cents = _slab_mean_chunk(
            cents, data_dev, jnp.asarray(ids_c_np[s : s + chunk]),
            shift, inv, jnp.int32(s),
        )
    return cents


@functools.partial(jax.jit, static_argnames=("metric",))
def _replica_top2_chunk(x_chunk, cents, qshift, inv_scale, metric):
    """Two nearest slab representatives of each point (bf16 GEMM — rank
    selection at slab granularity, insensitive to rounding)."""
    xq = (x_chunk.astype(jnp.float32) - qshift[None, :]) * inv_scale
    dd = pairwise_dists(
        xq.astype(jnp.bfloat16), cents.astype(jnp.bfloat16),
        metric, exact=False,
    )
    nd, ni = jax.lax.top_k(-dd, 2)
    return -nd, ni


def _replica_fill_ids(data_dev, ids_c, sizes, home_slab, cents_np,
                      qshift, qscale, metric, n_real, chunk=1 << 15):
    """Fill each slab's free pad slots with replicas of the points whose
    nearest OTHER slab it is, closest first.

    The probe kernel scans the full padded slab width whether the slots
    hold data or zeros, so replication is free at query time: a boundary
    point becomes reachable from both of its closest clusters, raising
    recall at fixed nprobe. (The reference has no analogue — its clusters
    are exact partitions — but IVF spilled/soft assignment is standard
    practice; this variant spends only bytes that padding already wastes.)
    Returns ids_c with replicas appended after each slab's members.
    """
    n = data_dev.shape[0]
    c, maxc = ids_c.shape
    # unusable replica targets: slab-count padding, empty slabs
    cents_m = cents_np.copy()
    cents_m[n_real:] = 1e15
    cents_m[sizes[:len(cents_m)] == 0] = 1e15
    cents_dev = jnp.asarray(cents_m)
    shift = jnp.broadcast_to(
        jnp.asarray(qshift, jnp.float32).reshape(-1),
        (data_dev.shape[1],),
    )
    inv = jnp.float32(1.0 / qscale)
    top2_d = np.empty((n, 2), np.float32)
    top2_i = np.empty((n, 2), np.int32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        dchunk, ichunk = _replica_top2_chunk(
            data_dev[s:e], cents_dev, shift, inv, metric
        )
        top2_d[s:e] = np.asarray(dchunk, np.float32)
        top2_i[s:e] = np.asarray(ichunk)

    use2 = top2_i[:, 0] == home_slab
    target = np.where(use2, top2_i[:, 1], top2_i[:, 0])
    t_dist = np.where(use2, top2_d[:, 1], top2_d[:, 0])
    ok = (target != home_slab) & (target < n_real) & (sizes[target] > 0)
    g = np.nonzero(ok)[0]
    target = target[g]
    t_dist = t_dist[g]

    free = np.where(sizes > 0, maxc - sizes, 0)
    order = np.lexsort((t_dist, target))
    t_sorted = target[order]
    g_sorted = g[order]
    # rank within each target group (groups are contiguous after lexsort)
    boundaries = np.concatenate(
        [[0], np.nonzero(np.diff(t_sorted))[0] + 1, [len(t_sorted)]]
    )
    grp_start = np.repeat(boundaries[:-1], np.diff(boundaries))
    pos = np.arange(len(t_sorted)) - grp_start
    take = pos < free[t_sorted]
    t_sel = t_sorted[take]
    out = ids_c.copy()
    out[t_sel, sizes[t_sel] + pos[take]] = g_sorted[take]
    return out


@functools.partial(jax.jit, static_argnames=("pool_w", "metric"))
def _cluster_exact_pools(slab, sizes_b, base_ids, pool_w: int, metric: str):
    """Exact per-node candidate pools for one block of clusters.

    slab: [B, M, d] f32; sizes_b: [B] valid counts; base_ids: [B] flat-id
    base (ci * maxc). Returns (pool_ids [B, M, pool_w] FLAT ids,
    pool_d [B, M, pool_w] exact distances) — the top-pool_w in-cluster
    neighbors of every member from ONE slab GEMM. This replaces the
    reference's get_neighbors beam (index_nsg.cpp:150-285) for cluster
    locals: a cluster fits one slab, so the candidate pool the beam
    approximates is computable exactly on the MXU.
    """
    b, m, d = slab.shape
    dots = jnp.einsum(
        "bqd,bmd->bqm", slab, slab, preferred_element_type=jnp.float32
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    valid = slot < sizes_b[:, None]
    if metric in ("ip", "cosine"):
        pd = 1.0 - dots
    else:
        nrm = jnp.sum(slab * slab, axis=2)
        pd = nrm[:, :, None] + nrm[:, None, :] - 2.0 * dots
    # mask self and invalid slots (both as candidates and as nodes)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    )
    pd = jnp.where(eye[None], PAD_DIST, pd)
    pd = jnp.where(valid[:, None, :], pd, PAD_DIST)
    npd, idx = jax.lax.top_k(-pd, pool_w)        # [B, M, pool_w] local
    pool_d = -npd
    pool_ids = jnp.where(
        (pool_d < PAD_DIST) & valid[:, :, None],
        base_ids[:, None, None] + idx,
        PAD_ID,
    )
    pool_d = jnp.where(pool_ids >= 0, pool_d, PAD_DIST)
    return pool_ids, pool_d


def _cluster_medoids(slab, sizes_b):
    """Exact per-cluster medoid slots ([B] int32): nearest member to the
    masked slab mean (init_graph, index_nsg.cpp:287-303, batched)."""
    b, m, d = slab.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    valid = slot < sizes_b[:, None]
    cnt = jnp.maximum(sizes_b, 1).astype(jnp.float32)
    mean = jnp.sum(
        jnp.where(valid[:, :, None], slab, 0.0), axis=1
    ) / cnt[:, None]
    d2 = jnp.sum((slab - mean[:, None, :]) ** 2, axis=2)
    d2 = jnp.where(valid, d2, PAD_DIST)
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def local_nsg_arena(
    data_c: np.ndarray,
    sizes: np.ndarray,
    cfg,
    metric: str,
    block_clusters: int | None = None,
    verbose: bool = False,
):
    """Per-cluster NSG locals built BATCHED (nndescent_nsg.cpp:62-125, the
    reference's stage-2 per-cluster loop, as dense block dispatches).

    The per-cluster sequential loop (kNN graph + beam collect + prune per
    cluster) is replaced by: (1) exact top-C candidate pools for every
    member of a block of clusters from one slab GEMM (`_cluster_exact_pools`
    — no kNN graph or beam needed: the pool the reference's get_neighbors
    beam approximates is exact here); (2) one global occlusion prune over
    the flat arena; (3) the shared bulk-synchronous InterInsert; (4)
    multi-seed connectivity repair (every cluster's medoid seeds the BFS,
    unreachable components attach within their own cluster).

    Returns (flat_adj [C*maxc, R] device, eps_flat [C] int64).
    """
    from .nsg import _interinsert
    from .prune import occlusion_prune

    c, maxc, d = data_c.shape
    r_deg = cfg.R
    pool_w = min(cfg.C, maxc)
    if block_clusters is None:
        # bound the [B, M, M] pair block at ~512 MB
        block_clusters = max(1, (1 << 27) // (maxc * maxc))
    sizes_j = jnp.asarray(sizes, jnp.int32)
    flat_data = jnp.asarray(data_c.reshape(c * maxc, d))
    flat_norms = squared_norms(flat_data)

    adj_np = np.full((c * maxc, r_deg), PAD_ID, np.int32)
    dists_np = np.full((c * maxc, r_deg), np.float32(3.4e37), np.float32)
    eps_flat = np.zeros(c, np.int64)

    prune_bs = max(1, (1 << 22) // (pool_w * 4))  # node rows per prune call
    for s in range(0, c, block_clusters):
        e = min(s + block_clusters, c)
        slab = jnp.asarray(data_c[s:e])
        base = (jnp.arange(s, e, dtype=jnp.int32)) * maxc
        med = _cluster_medoids(slab, sizes_j[s:e])
        eps_flat[s:e] = np.asarray(med, np.int64) + (
            np.arange(s, e, dtype=np.int64) * maxc
        )
        pool_ids, pool_d = _cluster_exact_pools(
            slab, sizes_j[s:e], base, pool_w=pool_w, metric=metric
        )
        bm = (e - s) * maxc
        pool_ids = pool_ids.reshape(bm, pool_w)
        pool_d = pool_d.reshape(bm, pool_w)
        node_ids = (
            base[:, None]
            + jax.lax.broadcasted_iota(jnp.int32, (e - s, maxc), 1)
        ).reshape(bm)
        for ps in range(0, bm, prune_bs):
            pe = min(ps + prune_bs, bm)
            kept_i, kept_d = occlusion_prune(
                jnp.take(flat_data, node_ids[ps:pe], axis=0),
                pool_ids[ps:pe], pool_d[ps:pe],
                flat_data, flat_norms,
                max_keep=r_deg, scan_cap=pool_w, metric=metric,
                self_ids=node_ids[ps:pe],
            )
            rs = s * maxc + ps
            adj_np[rs : rs + (pe - ps)] = np.asarray(kept_i)
            dists_np[rs : rs + (pe - ps)] = np.asarray(kept_d)
        if verbose:
            print(f"local NSG: clusters {e}/{c} pooled+pruned")

    # nodes in dead pad slots must stay edge-free
    slot_of = np.arange(c * maxc) % maxc
    dead_rows = slot_of >= np.repeat(sizes[:c], maxc)
    adj_np[dead_rows] = PAD_ID
    dists_np[dead_rows] = np.float32(3.4e37)

    adj_np, _ = _interinsert(
        flat_data, flat_norms, adj_np, dists_np, cfg, metric, 4096
    )
    adj_np[dead_rows] = PAD_ID

    # multi-seed connectivity repair (tree_grow per cluster): one global
    # BFS from every medoid; stragglers attach to the nearest reachable
    # member of their own cluster (findroot, index_nsg.cpp:712-747 — the
    # in-cluster search is exact here)
    visited = np.zeros(c * maxc, bool)
    visited[dead_rows] = True
    frontier = eps_flat[sizes[:c] > 0]
    visited[frontier] = True
    while len(frontier):
        nxt = adj_np[frontier].reshape(-1)
        nxt = nxt[nxt >= 0]
        nxt = np.unique(nxt)
        nxt = nxt[~visited[nxt]]
        visited[nxt] = True
        frontier = nxt
    bad_clusters = np.unique(np.nonzero(~visited)[0] // maxc)
    for ci in bad_clusters:
        rows = slice(ci * maxc, ci * maxc + int(sizes[ci]))
        xc = data_c[ci, : int(sizes[ci])]
        vis_c = visited[rows]
        while not vis_c.all():
            u = int(np.nonzero(~vis_c)[0][0])
            reach = np.nonzero(vis_c)[0]
            dd = ((xc[reach] - xc[u]) ** 2).sum(axis=1)
            a = int(reach[np.argmin(dd)]) + ci * maxc
            deg = int((adj_np[a] >= 0).sum())
            adj_np[a, deg if deg < r_deg else r_deg - 1] = u + ci * maxc
            # BFS from u within the cluster
            fr = np.array([u + ci * maxc])
            vis_c[u] = True
            visited[u + ci * maxc] = True
            while len(fr):
                nxt = adj_np[fr].reshape(-1)
                nxt = nxt[nxt >= 0]
                nxt = np.unique(nxt)
                nxt = nxt[~visited[nxt]]
                visited[nxt] = True
                vis_c[nxt - ci * maxc] = True
                fr = nxt
    return jnp.asarray(adj_np), eps_flat


def local_hnsw_arena(
    data_c: np.ndarray,
    sizes: np.ndarray,
    metric: str,
    m_local: int = 8,
    ef_construction: int = 60,
    verbose: bool = False,
):
    """Per-cluster HNSW local graphs (the cluster_hnsw_hnsw ablation,
    experiment_feature/cluster_hnsw_hnsw_search.cpp:129-265: faiss
    IndexHNSWFlat per cluster). Level-0 adjacencies land in the same
    flat arena the NSG local path uses; the upper levels collapse into
    the stored enterpoint since probed clusters are small enough that
    the shared lockstep beam replaces the descent.

    ABLATION-ONLY, small-N: this builds one ``HNSWIndex`` per cluster in
    a sequential host loop (each a full batched-insert build), so cost
    scales as C independent builds — minutes at the 65k-point ablation
    shape, hours at 1M/1k-cluster scale. The NSG locals got the batched
    exact-slab-pool treatment (``local_nsg_arena``/``_cluster_exact_pools``)
    because they are a measured configuration; the HNSW locals exist to
    complete the reference's router x local ablation matrix
    (experiment_feature/), which the reference itself only runs at
    experiment scale. Use ``local_index="flat"`` (production) or ``"nsg"``
    at large N.

    Returns (flat_adj [C*maxc, 2*m_local] device, eps_flat [C] int64)."""
    from .hnsw import HNSWIndex
    from ..utils.params import HNSWConfig

    c, maxc, d = data_c.shape
    flat_adj_np = np.full((c * maxc, 2 * m_local), PAD_ID, np.int32)
    eps_flat = np.zeros(c, np.int64)
    for ci in range(c):
        sz = int(sizes[ci])
        if sz <= 1:
            eps_flat[ci] = ci * maxc
            continue
        hidx = HNSWIndex(
            d, sz,
            HNSWConfig(M=m_local, ef_construction=ef_construction), metric,
        )
        hidx.add_items(data_c[ci, :sz])
        adj_local = np.asarray(hidx.adj0[:sz])
        remap = np.where(adj_local >= 0, adj_local + ci * maxc, PAD_ID)
        flat_adj_np[ci * maxc : ci * maxc + sz] = remap
        eps_flat[ci] = max(hidx.ep, 0) + ci * maxc
        if verbose:
            print(f"cluster {ci + 1}/{c}: HNSW built over {sz} points")
    return jnp.asarray(flat_adj_np), eps_flat


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
    if cfg.replicate and local_index != "flat":
        # validate BEFORE the k-means/arena work (an after-the-fact raise
        # burned a full local-index build in the error-path test)
        raise ValueError(
            "boundary replication requires local_index='flat'")
    data_np = np.asarray(data, np.float32)
    n, d = data_np.shape
    rng = np.random.default_rng(seed)

    data_dev = jnp.asarray(data_np)
    centroids, assign = kmeans(
        data_dev, cfg.n_clusters, iters=cfg.kmeans_iters, seed=seed
    )
    assign = np.asarray(assign)
    k0 = centroids.shape[0]
    flat = local_index == "flat"
    if not flat:
        # free the k-means device copy before the slab tensor allocates:
        # at Deep10M scale both do not fit HBM together. The flat path
        # keeps it — slabs pack FROM it on device (no host data_c, no
        # slab transfer through the tunnel).
        del data_dev
    del data

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

    ids_c = np.full((c, maxc), PAD_ID, np.int32)
    ids_c[slab_row, slot] = order
    valid = ids_c >= 0
    sizes = valid.sum(axis=1)
    data_c = None
    if not flat:
        data_c = np.zeros((c, maxc, d), np.float32)
        data_c[valid] = data_np[ids_c[valid]]

    # representatives: centroid (slab mean) + m random members
    # (cluster_IVF_nndescent.cpp:143-186). Flat path: the centroid row is
    # filled from the device pack's slab means below.
    reps = np.zeros((c, cfg.m + 1, d), np.float32)
    safe_sz = np.maximum(sizes, 1)
    if not flat:
        reps[:, 0] = data_c.sum(axis=1) / safe_sz[:, None]
        reps[sizes == 0, 0] = data_np[0]
    pick = (rng.random((c, cfg.m)) * safe_sz[:, None]).astype(np.int64)
    member_gids = np.take_along_axis(
        ids_c, pick.astype(np.int64), axis=1
    )
    member_gids = np.where(member_gids >= 0, member_gids, 0)
    reps[:, 1:] = data_np[member_gids]

    flat_adj = None
    eps_flat = None
    if local_index == "hnsw":
        flat_adj, eps_flat = local_hnsw_arena(
            data_c, sizes, metric, verbose=verbose
        )
    elif local_index == "nsg":
        flat_adj, eps_flat = local_nsg_arena(
            data_c, sizes, cfg.nsg, metric, verbose=verbose
        )

    n_real = c
    n_real_pre = c
    # pad the slab count to a multiple of 64 so the grouped cluster-major
    # sweep can use contiguous fixed-size blocks; padded slabs have
    # far-away representatives (never probed), PAD ids, zero data
    c_pad = -(-c // 64) * 64
    if c_pad != c:
        pad = c_pad - c
        reps = np.concatenate(
            [reps, np.full((pad, cfg.m + 1, d), 1e15, np.float32)]
        )
        if data_c is not None:
            data_c = np.concatenate(
                [data_c, np.zeros((pad, maxc, d), np.float32)]
            )
        ids_c = np.concatenate(
            [ids_c, np.full((pad, maxc), PAD_ID, np.int32)]
        )
        sizes = np.concatenate([sizes, np.zeros(pad, sizes.dtype)])
        if flat_adj is not None:
            flat_adj = jnp.concatenate([
                flat_adj,
                jnp.full((pad * maxc, flat_adj.shape[1]), PAD_ID,
                         jnp.int32),
            ])
            eps_flat = np.concatenate(
                [eps_flat, np.zeros(pad, eps_flat.dtype)]
            )
        c = c_pad

    if slab_dtype is None:
        slab_dtype = jnp.float32
    qshift = 0.0
    qscale = 1.0
    if slab_dtype == jnp.int8:
        if metric != "l2":
            raise ValueError("int8 slabs support the l2 metric only")
        def _chunked_all(pred, arr, step=1 << 19):
            return all(
                pred(arr[s : s + step]) for s in range(0, len(arr), step)
            )

        if (
            data_np.min() >= 0.0 and data_np.max() <= 255.0
            and _chunked_all(
                lambda a: np.array_equal(a, np.round(a)), data_np
            )
        ):
            # uint8 space (L2SpaceI, space_l2.h:294-323; sift_1b.cpp
            # uint8 flow): store x-128 as int8 — L2 is shift-invariant
            # and the int8 MXU path is exact integer math
            qshift = 128.0
            if data_c is not None:
                data_c = data_c - np.float32(qshift)
            reps = reps - np.float32(qshift)
        else:
            # arbitrary f32 data: per-dim shift (L2 is invariant to any
            # vector shift) + global symmetric scale into [-127, 127];
            # scans then carry int8 quantization noise in the ranking
            # (norms stay f32-exact in the quantized domain), distances
            # are rescaled by qscale^2 on return
            qshift = data_np.mean(axis=0).astype(np.float32)
            mx = max(
                float(np.abs(data_np[s : s + (1 << 19)] - qshift).max())
                for s in range(0, n, 1 << 19)
            )
            qscale = (mx / 127.0) or 1.0
            if data_c is not None:
                for s2 in range(0, len(data_c), 64):  # in-place, chunked
                    blk = data_c[s2 : s2 + 64]
                    blk -= qshift
                    blk /= np.float32(qscale)
                    np.round(blk, out=blk)
                data_c[ids_c < 0] = 0.0   # pads would overflow int8
            reps = (reps - qshift) / np.float32(qscale)
    if flat:
        if cfg.replicate:
            # routing reps = means of the ORIGINAL members, computed
            # before replicas land in the pad slots
            cents_np = np.asarray(
                _slab_means(data_dev, ids_c, qshift, qscale)
            )
            home = np.empty(n, np.int32)
            home[order] = slab_row.astype(np.int32)
            ids_c = _replica_fill_ids(
                data_dev, ids_c, sizes, home, cents_np,
                qshift, qscale, metric, n_real_pre,
            )
        # device-resident pack: gather rows from the resident dataset,
        # transform, norm — no host data_c, no slab tensor through the
        # tunnel (measured ~60 s numpy pack + ~23-240 s transfer at 1M+)
        slabs, cnorms, cents = _pack_device_slabs(
            data_dev, ids_c, qshift, qscale, slab_dtype, metric
        )
        del data_dev
        reps[:, 0] = cents_np if cfg.replicate else np.asarray(cents)
        if (sizes == 0).any():
            empty = np.nonzero(sizes == 0)[0]
            empty = empty[empty < n_real_pre]
            reps[empty, 0] = reps[empty, 1]
    else:
        # device slabs filled in chunks: one whole-tensor f32 transfer
        # plus a separate cast allocates ~3x the slab bytes at once and
        # OOMs HBM at Deep10M scale; chunked fill peaks at slab bytes +
        # one chunk
        slabs, cnorms = _fill_device_slabs(data_c, slab_dtype, metric)
    return CNNSIndex(
        qshift=qshift,
        qscale=qscale,
        n_real=n_real,
        reps=jnp.asarray(reps),
        data_c=slabs,
        ids_c=jnp.asarray(ids_c),
        sizes=sizes,
        metric=metric,
        local_index=local_index,
        replicated=bool(cfg.replicate),
        flat_adj=flat_adj,
        eps_flat=eps_flat,
        cnorms_c=cnorms,
    )
