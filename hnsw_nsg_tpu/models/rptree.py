"""Random-projection-tree kNN-graph initialization — EFANNA's tree stage.

Reference: ``IndexKDtree`` (CNNS/efanna_graph/src/index_kdtree.cpp) builds
TreeNum randomized KD-trees (mean-of-sampled-dims splits, :23-74), merges
leaf-level candidate sets into an initial kNN graph (:225-), which nn-descent
then refines (``test_nndescent_refine`` flow).

TPU re-design: coordinate-split KD-trees are pointer-chasing; the
accelerator-native equivalent is a *balanced random-projection tree*:

  * each level projects all points onto one random direction (a [N, d] x
    [d] GEMV) and median-splits every node's segment — implemented as one
    ``jnp.lexsort`` by (segment, projection), keeping every segment
    contiguous and exactly balanced;
  * after ``levels`` rounds the permutation lays leaves out contiguously, so
    the leaf all-pairs distance stage is a pure batched GEMM over
    [leaf, leaf] tiles on the MXU — zero gathers in the hot loop;
  * per-tree leaf top-k candidates merge across trees with the shared
    sorted-retset merge; ``nn_descent(init_adj=...)`` polishes the result
    (RefineGraph, index_graph.cpp:235-262).

Splitting by median (not mean) keeps leaves exactly `leaf_size`, which is
what makes the compute regular enough for the MXU; recall-wise the two are
equivalent in practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID
from ..ops.topk import merge_into_retset_sorted, empty_retset
from ..utils.params import NNDescentConfig
from .nndescent import nn_descent


@functools.partial(jax.jit, static_argnames=("levels",))
def _rp_permutation(key, data, levels: int):
    """Build the leaf layout: lexsort by (segment, random projection) per
    level. Returns perm [N] such that perm reshaped [n_leaves, leaf] gives
    contiguous balanced leaves."""
    n, d = data.shape
    perm = jnp.arange(n, dtype=jnp.int32)
    keys = jax.random.split(key, max(levels, 1))
    for lvl in range(levels):
        vec = jax.random.normal(keys[lvl], (d,), dtype=jnp.float32)
        proj = jnp.take(data, perm, axis=0).astype(jnp.float32) @ vec
        seg_size = n >> lvl  # 2^lvl segments at this level
        seg = jnp.arange(n, dtype=jnp.int32) // jnp.int32(seg_size)
        order = jnp.lexsort((proj, seg))
        perm = jnp.take(perm, order)
    return perm


@functools.partial(
    jax.jit, static_argnames=("leaf", "k", "metric", "group")
)
def _leaf_topk_impl(data, perm, leaf: int, k: int, metric: str, group: int):
    n, d = data.shape
    n_leaves = n // leaf
    x = jnp.take(data, perm, axis=0).reshape(n_leaves, leaf, d)
    gids = perm.reshape(n_leaves, leaf)

    ng = n_leaves // group

    def block(args):
        xb, gb = args  # [G, leaf, d], [G, leaf]
        # bf16 all-pairs + hardware approximate top-k: this stage only
        # PROPOSES candidates (trees are merged and nn-descent refines), so
        # exactness buys nothing — and exact lax.top_k over the leaf-wide
        # row is the dominant cost of the whole build (PROGRESS.md router
        # finding: orders of magnitude slower than PartialReduce)
        xf = xb.astype(jnp.bfloat16)
        dots = jnp.einsum(
            "gld,gmd->glm", xf, xf, preferred_element_type=jnp.float32,
        )
        if metric in ("ip", "cosine"):
            dist = 1.0 - dots
        else:
            x32 = xb.astype(jnp.float32)
            nrm = jnp.sum(x32 * x32, axis=-1)
            dist = nrm[:, :, None] + nrm[:, None, :] - 2.0 * dots
        # mask self
        eye = jnp.eye(leaf, dtype=jnp.bool_)
        dist = jnp.where(eye[None], PAD_DIST, dist)
        kk = min(k, leaf - 1)
        g_, l_, m_ = dist.shape
        if m_ >= 8 * kk and m_ >= 256:
            neg, idx = jax.lax.approx_max_k(
                -dist.reshape(g_ * l_, m_), kk, recall_target=0.95
            )
            neg = neg.reshape(g_, l_, kk)
            idx = idx.reshape(g_, l_, kk)
        else:
            neg, idx = jax.lax.top_k(-dist, kk)
        ids = jnp.take_along_axis(
            jnp.broadcast_to(gb[:, None, :], (gb.shape[0], leaf, leaf)),
            idx, axis=2,
        )
        return -neg, ids

    dists, ids = jax.lax.map(
        block,
        (x.reshape(ng, group, leaf, d), gids.reshape(ng, group, leaf)),
    )
    kk = dists.shape[-1]
    # scatter back to original order
    out_d = jnp.zeros((n, kk), jnp.float32).at[perm.reshape(-1)].set(
        dists.reshape(n, kk)
    )
    out_i = jnp.full((n, kk), PAD_ID, jnp.int32).at[perm.reshape(-1)].set(
        ids.reshape(n, kk)
    )
    return out_d, out_i


def knn_graph_rp(
    data,
    k: int,
    metric: str = "l2",
    n_trees: int = 8,
    leaf_size: int = 1024,
    seed: int = 0,
    group: int = 8,
    refine: NNDescentConfig | None = None,
    pool_width: int | None = None,
    verbose: bool = False,
    refine_chunk: int = 4096,
) -> np.ndarray:
    """Approximate kNN graph via merged RP-tree leaves (+ optional
    nn-descent refinement). Returns int32 [N, k].

    The fast path for large flat datasets: all distance work is contiguous
    batched GEMM. n_trees repetitions with independent projections; recall
    grows with n_trees. ``refine`` runs nn-descent warm-started from the
    merged graph (EFANNA's tree+descent pipeline).
    """
    data = jnp.asarray(data)
    n_real, d = data.shape
    width = pool_width or k

    # pad N to a power-of-two multiple of leaf count handling
    levels = max(int(np.floor(np.log2(max(n_real // leaf_size, 1)))), 0)
    n_leaves = 1 << levels
    leaf = -(-n_real // n_leaves)  # ceil
    leaf = ((leaf + 7) // 8) * 8
    n = n_leaves * leaf
    if n != n_real:
        pad = jnp.broadcast_to(data[:1], (n - n_real, d))
        data_p = jnp.concatenate([data, pad], axis=0)
    else:
        data_p = data
    while n_leaves % group:
        group //= 2
    group = max(group, 1)

    key = jax.random.PRNGKey(seed)
    r_d, r_i, r_e = empty_retset(n, width)
    for t in range(n_trees):
        key, sub = jax.random.split(key)
        perm = _rp_permutation(sub, data_p, levels)
        c_d, c_i = _leaf_topk_impl(data_p, perm, leaf, k, metric, group)
        # padded duplicate rows must not become neighbors of real rows
        c_i = jnp.where(c_i >= n_real, PAD_ID, c_i)
        c_d = jnp.where(c_i < 0, PAD_DIST, c_d)
        r_d, r_i, r_e = merge_into_retset_sorted(r_d, r_i, r_e, c_d, c_i)
        if verbose:
            print(f"rp-tree {t + 1}/{n_trees} merged")

    adj = np.asarray(r_i[:n_real, :k])
    if refine is not None:
        adj = nn_descent(
            np.asarray(data), refine, metric=metric, seed=seed + 1,
            init_adj=adj, verbose=verbose, chunk=refine_chunk,
        )
    return adj
