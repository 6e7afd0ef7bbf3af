"""Batched occlusion (MRNG) edge pruning — shared by NSG and HNSW.

The reference implements the same rule twice:
  * NSG ``sync_prune`` (CNNS/src/nsg/index_nsg.cpp:305-355): scan candidates
    in ascending distance-to-q order; keep p unless some already-kept t has
    d(t, p) < d(q, p); cap kept at R, scan at C.
  * hnswlib ``getNeighborsByHeuristic2`` (hnswlib/hnswlib/hnswalg.h:443-483):
    identical occlusion test, kept cap M.

Here it is one batched kernel: B nodes prune in lockstep under a
``fori_loop`` over the sorted candidate list; each step tests one candidate
per node against that node's kept set with a [B, R] batched distance block
on the MXU.

Duplicate candidates need no explicit dedup: a duplicate of an already-kept
id has pair-distance 0 < d(q, p), so the occlusion test rejects it (the
reference additionally short-circuits on id equality — same outcome).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.distance import PAD_DIST, PAD_ID


@functools.partial(
    jax.jit, static_argnames=("max_keep", "scan_cap", "metric")
)
def occlusion_prune(
    node_vecs: jax.Array,
    cand_ids: jax.Array,
    cand_dists: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    max_keep: int,
    scan_cap: int | None = None,
    metric: str = "l2",
    self_ids: jax.Array | None = None,
):
    """Select up to ``max_keep`` diverse neighbors per node.

    node_vecs:  [B, d] the vectors whose out-edges are being chosen.
    cand_ids:   [B, C] candidate ids (PAD_ID-padded, duplicates allowed).
    cand_dists: [B, C] their EXACT distances to the node. Exactness matters:
                the occlusion rule compares candidate-to-node distances with
                candidate-to-kept pair distances, so both must be on the same
                scale (FastL2 would shift one side by ||node||^2). PAD slots
                must hold >= PAD_DIST.
    data/norms: the full vector store for pair-distance tests.
    scan_cap:   at most this many sorted candidates are examined (the
                reference's C; defaults to all of C).
    self_ids:   [B] optional; candidates equal to the node itself are
                dropped (sync_prune's `pool[start].id == q` skip).

    Returns (kept_ids [B, max_keep] PAD-padded, kept_dists [B, max_keep]).
    Kept lists are in ascending-distance order, matching the reference.
    """
    b, c = cand_ids.shape
    scan = min(scan_cap or c, c)

    d = jnp.where(cand_ids < 0, PAD_DIST, cand_dists)
    if self_ids is not None:
        d = jnp.where(cand_ids == self_ids[:, None], PAD_DIST, d)
    order = jnp.argsort(d, axis=1)
    s_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    s_d = jnp.take_along_axis(d, order, axis=1)

    node_f = node_vecs.astype(jnp.float32)
    dim = data.shape[1]

    kept_ids = jnp.full((b, max_keep), PAD_ID, jnp.int32)
    kept_vecs = jnp.zeros((b, max_keep, dim), jnp.float32)
    kept_norms = jnp.zeros((b, max_keep), jnp.float32)
    kept_n = jnp.zeros((b,), jnp.int32)
    kept_d = jnp.full((b, max_keep), PAD_DIST, jnp.float32)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (b, max_keep), 1)

    def step(j, carry):
        kept_ids, kept_vecs, kept_norms, kept_d, kept_n = carry
        cid = jax.lax.dynamic_slice_in_dim(s_ids, j, 1, axis=1)[:, 0]  # [B]
        cdist = jax.lax.dynamic_slice_in_dim(s_d, j, 1, axis=1)[:, 0]
        valid = (cid >= 0) & (cdist < PAD_DIST)
        v = jnp.take(data, jnp.where(valid, cid, 0), axis=0).astype(
            jnp.float32
        )  # [B, d]
        # exact pair distances candidate <-> kept set
        dots = jnp.einsum(
            "bd,bkd->bk", v, kept_vecs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric in ("ip", "cosine"):
            pair = 1.0 - dots
        else:
            vn = jnp.take(norms, jnp.where(valid, cid, 0), axis=0)
            pair = kept_norms + vn[:, None] - 2.0 * dots
        kept_valid = kept_ids >= 0
        occluded = jnp.any(kept_valid & (pair < cdist[:, None]), axis=1)
        accept = valid & ~occluded & (kept_n < max_keep)
        write = accept[:, None] & (slot_iota == kept_n[:, None])
        kept_ids = jnp.where(write, cid[:, None], kept_ids)
        kept_d = jnp.where(write, cdist[:, None], kept_d)
        kept_vecs = jnp.where(write[:, :, None], v[:, None, :], kept_vecs)
        if metric == "l2":
            vn_b = jnp.take(norms, jnp.where(valid, cid, 0), axis=0)
            kept_norms_new = jnp.where(write, vn_b[:, None], kept_norms)
        else:
            kept_norms_new = kept_norms
        kept_n = kept_n + accept.astype(jnp.int32)
        return kept_ids, kept_vecs, kept_norms_new, kept_d, kept_n

    kept_ids, _, _, kept_d, _ = jax.lax.fori_loop(
        0, scan, step, (kept_ids, kept_vecs, kept_norms, kept_d, kept_n)
    )
    return kept_ids, kept_d
