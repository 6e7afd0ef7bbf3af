"""Cluster-join kNN-graph construction — the large-N build path.

Reference pipeline: EFANNA randomized KD-trees initialize a kNN graph and
nn-descent refines it (CNNS/efanna_graph/src/index_kdtree.cpp,
index_graph.cpp:22-136). nn-descent's join is a scatter/gather algorithm:
every node pulls ~hundreds of scattered candidate rows per iteration.
On this TPU, data-dependent row gathers have a hard ~0.75 us floor
(PROGRESS.md "gather physics"), so one nn-descent iteration at N=1M costs
~20 minutes and trips the worker watchdog — the algorithm shape itself is
wrong for the hardware.

TPU-native replacement: the dataset is k-means-partitioned into C
clusters laid out as padded slabs (exactly the CNNS layout); each
cluster's member block is scored against the CONCATENATION of its own +
(M-1) nearest clusters' slabs — one [maxc, d] x [M*maxc, d]^T MXU pass
per cluster through the fused Pallas scan kernel (ops/pallas_scan.py).
All memory traffic is contiguous slab reads (memcpy-speed, not the
gather floor). A point's true neighbors lie in its own or a nearby
cluster, so recall tracks IVF recall at nprobe=M.

This is the same insight the reference itself uses at the pipeline level
(cluster first, then build within clusters — cluster_IVF_nndescent.cpp),
promoted to the kNN-graph build itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID, pairwise_dists, squared_norms
from .kmeans import kmeans


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "row_chunk", "interpret")
)
def _cluster_join(data_c, ids_c, cnorms_c, nbrs, k, metric,
                  row_chunk: int, interpret: bool):
    """For every cluster row block, exact top-k against the stacked slabs
    of its ``nbrs`` clusters. Returns (vals, global ids) [C, maxc, k]."""
    from ..ops.pallas_scan import cluster_join_topk

    c, maxc, d = data_c.shape
    m = nbrs.shape[1]
    # stacked candidate slabs: whole-slab gathers are contiguous ~MB
    # reads — memcpy speed, not the row-gather floor
    stack = jnp.take(data_c, nbrs, axis=0).reshape(c, m * maxc, d)
    sids = jnp.take(ids_c, nbrs, axis=0).reshape(c, m * maxc)
    if metric in ("ip", "cosine"):
        bias = jnp.where(sids >= 0, 1.0, jnp.inf).astype(jnp.float32)
        scale = 1.0
    else:
        snrm = jnp.take(cnorms_c, nbrs, axis=0).reshape(c, m * maxc)
        bias = jnp.where(sids >= 0, snrm, jnp.inf).astype(jnp.float32)
        scale = 2.0

    v, li = cluster_join_topk(
        data_c, stack, bias, k, scale, row_chunk=row_chunk,
        interpret=interpret,
    )
    gi = jnp.take_along_axis(sids[:, None, :], li, axis=2)
    gi = jnp.where(jnp.isfinite(v), gi, PAD_ID)
    v = jnp.where(jnp.isfinite(v), v, PAD_DIST)
    return v, gi


def knn_graph_ivf(
    data,
    k: int,
    metric: str = "l2",
    n_clusters: int | None = None,
    probes: int = 8,
    kmeans_iters: int = 8,
    seed: int = 0,
    row_chunk: int = 128,
    slab_dtype=jnp.bfloat16,
    verbose: bool = False,
) -> np.ndarray:
    """Approximate kNN graph via cluster joins. Returns int32 [N, k].

    probes: clusters joined per cluster (own + probes-1 nearest by
    centroid) — the recall knob, analogous to IVF nprobe."""
    data_np = np.asarray(data, np.float32)
    n, d = data_np.shape
    c_target = n_clusters or max(n // 1024, 1)

    data_dev = jnp.asarray(data_np)
    cents, assign = kmeans(data_dev, c_target, iters=kmeans_iters,
                           seed=seed)
    assign = np.asarray(assign)
    k0 = cents.shape[0]
    del data_dev

    # CNNS slab layout (models/cnns.py): oversized clusters split so the
    # pad width stays ~2x the mean
    order = np.argsort(assign, kind="stable")
    sizes0 = np.bincount(assign, minlength=k0)
    target = max(int(np.ceil(n / k0)), 8)
    # 64-aligned so the join kernel's row chunking keeps MXU-shaped tiles
    # after the VMEM-budget shrink (pallas_scan.cluster_join_topk)
    maxc = int(((2 * target + 63) // 64) * 64)
    n_slabs0 = np.maximum(-(-sizes0 // maxc), 1)
    slab_base = np.concatenate([[0], np.cumsum(n_slabs0)])
    c = int(slab_base[-1])
    cluster_of_point = np.repeat(np.arange(k0), sizes0)
    starts = np.concatenate([[0], np.cumsum(sizes0)])
    off = np.arange(n) - starts[cluster_of_point]
    slab_row = slab_base[cluster_of_point] + off // maxc
    slot = off % maxc

    ids_c = np.full((c, maxc), PAD_ID, np.int32)
    ids_c[slab_row, slot] = order
    data_c = np.zeros((c, maxc, d), np.float32)
    valid = ids_c >= 0
    data_c[valid] = data_np[ids_c[valid]]

    # slab centroids (split slabs get their own) -> M nearest slabs each.
    # Probing by slab rather than original cluster keeps the join width
    # fixed and still covers the original cluster (its slabs are mutual
    # nearest neighbors).
    sizes = valid.sum(axis=1)
    safe = np.maximum(sizes, 1)[:, None]
    slab_cents = jnp.asarray(data_c.sum(axis=1) / safe)
    m = min(probes, c)
    cd = pairwise_dists(slab_cents, slab_cents, "l2", exact=False)
    _, nbrs = jax.lax.top_k(-cd, m)          # [C, M] nearest slabs (self
    nbrs = jnp.asarray(nbrs, jnp.int32)      # included at rank 0)

    # bf16 join slabs: halves the stacked-candidate HBM footprint (x
    # probes duplication) and doubles MXU rate; norms stay exact f32 so
    # ranking error is a bf16 dot rounding only — the same tradeoff the
    # CNNS production search makes (recall impact ~1e-3, gated by tests)
    data_f32 = jnp.asarray(data_c)
    cnorms = squared_norms(data_f32) if metric == "l2" else jnp.zeros(
        (c, maxc), jnp.float32
    )
    data_dev = data_f32.astype(slab_dtype)
    del data_f32
    ids_dev = jnp.asarray(ids_c)
    while maxc % row_chunk:
        row_chunk //= 2
    interpret = jax.default_backend() == "cpu"
    kk = min(k + 2, m * maxc)  # margin for dropping self
    vals, gids = _cluster_join(
        data_dev, ids_dev, cnorms, nbrs, kk, metric, max(row_chunk, 1),
        interpret,
    )
    if verbose:
        print(f"cluster join done: C={c} maxc={maxc} probes={m}")

    gids = np.asarray(gids)     # [C, maxc, kk]
    vals = np.asarray(vals)
    own = ids_c[:, :, None]
    drop = (gids == own) | (gids < 0)
    vals = np.where(drop, np.inf, vals)
    ordk = np.argsort(vals, axis=2, kind="stable")[:, :, :k]
    out_rows = np.take_along_axis(gids, ordk, axis=2)
    out_rows[np.take_along_axis(vals, ordk, axis=2) == np.inf] = PAD_ID

    adj = np.full((n, k), PAD_ID, np.int32)
    adj[ids_c[valid]] = out_rows[valid]
    return adj
