"""Fixed-width sorted candidate pools — the TPU replacement for heaps.

The reference maintains per-query priority heaps (hnswlib searchBaseLayerST,
hnswalg.h:309-440) and fixed-capacity sorted arrays with binary insertion
(``InsertIntoPool``, CNNS/efanna_graph/include/efanna2e/neighbor.h:107-135).
On TPU both become the same thing: a sorted (dist, id, flag) retset of static
width L, updated each hop by concat + dedup + ``lax.top_k``. Eviction from a
top-L retset is permanent (the L-th best distance only improves), so retset
dedup alone guarantees no node is ever expanded twice — replacing the
reference's VisitedList epoch array (hnswlib/hnswlib/visited_list_pool.h)
with zero extra memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distance import PAD_DIST, PAD_ID


def empty_retset(batch: int, width: int):
    """An all-padding retset: dists=PAD_DIST, ids=PAD_ID, expanded=True.

    Padded slots are marked expanded so the frontier-selection step never
    picks them.
    """
    dists = jnp.full((batch, width), PAD_DIST, dtype=jnp.float32)
    ids = jnp.full((batch, width), PAD_ID, dtype=jnp.int32)
    expanded = jnp.ones((batch, width), dtype=jnp.bool_)
    return dists, ids, expanded


def mask_internal_dups(ids: jax.Array) -> jax.Array:
    """Mark duplicate ids within each row (keeping the first occurrence).

    ids: [Q, K] -> bool [Q, K], True where the slot repeats an earlier slot.
    """
    k = ids.shape[-1]
    eq = ids[..., :, None] == ids[..., None, :]  # [Q, K, K]
    earlier = jnp.tril(jnp.ones((k, k), dtype=jnp.bool_), k=-1)
    return jnp.any(eq & earlier, axis=-1) & (ids >= 0)


def merge_into_retset(
    r_dists: jax.Array,
    r_ids: jax.Array,
    r_expanded: jax.Array,
    c_dists: jax.Array,
    c_ids: jax.Array,
):
    """Merge candidate (dist, id) pairs into a sorted retset.

    r_*: [Q, L] current retset (sorted ascending by dist).
    c_*: [Q, K] new candidates; c_ids may contain PAD_ID and duplicates.

    Returns the new (dists, ids, expanded) sorted ascending. Candidates that
    duplicate a retset entry or another candidate are dropped; surviving new
    entries arrive with expanded=False. This is the batched analogue of
    ``InsertIntoPool`` (neighbor.h:107-135) including its duplicate check.
    """
    dup_vs_retset = jnp.any(
        c_ids[:, :, None] == r_ids[:, None, :], axis=-1
    ) & (c_ids >= 0)
    dup_internal = mask_internal_dups(c_ids)
    drop = dup_vs_retset | dup_internal | (c_ids < 0)
    cd = jnp.where(drop, PAD_DIST, c_dists)
    ci = jnp.where(drop, PAD_ID, c_ids)

    all_d = jnp.concatenate([r_dists, cd], axis=1)
    all_i = jnp.concatenate([r_ids, ci], axis=1)
    all_e = jnp.concatenate(
        [r_expanded, jnp.zeros_like(cd, dtype=jnp.bool_)], axis=1
    )

    width = r_dists.shape[1]
    neg_vals, idx = jax.lax.top_k(-all_d, width)
    new_d = -neg_vals
    new_i = jnp.take_along_axis(all_i, idx, axis=1)
    new_e = jnp.take_along_axis(all_e, idx, axis=1)
    # Anything that is still padding must stay marked expanded.
    new_e = new_e | (new_i < 0)
    return new_d, new_i, new_e


def merge_into_retset_sorted(
    r_dists: jax.Array,
    r_ids: jax.Array,
    r_expanded: jax.Array,
    c_dists: jax.Array,
    c_ids: jax.Array,
):
    """merge_into_retset with O((L+C) log) sort-based dedup.

    Identical semantics; preferable when the candidate width C is large
    (e.g. nn-descent pulls hundreds of candidates per node), where the
    quadratic pairwise dedup of merge_into_retset would dominate.
    Dedup: stable sort the concatenated pool by id (retset entries first,
    so they win duplicates and keep their expanded flags), drop adjacent
    equal ids, then top-L by distance.
    """
    width = r_dists.shape[1]
    cd = jnp.where(c_ids < 0, PAD_DIST, c_dists)
    all_d = jnp.concatenate([r_dists, cd], axis=1)
    all_i = jnp.concatenate([r_ids, c_ids], axis=1)
    all_e = jnp.concatenate(
        [r_expanded, jnp.zeros_like(cd, dtype=jnp.bool_)], axis=1
    )
    # sort by id; PAD_ID groups at front and stays PAD
    o = jnp.argsort(all_i, axis=1, stable=True)
    si = jnp.take_along_axis(all_i, o, axis=1)
    sd = jnp.take_along_axis(all_d, o, axis=1)
    se = jnp.take_along_axis(all_e, o, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(si[:, :1], dtype=jnp.bool_), si[:, 1:] == si[:, :-1]],
        axis=1,
    ) & (si >= 0)
    sd = jnp.where(dup, PAD_DIST, sd)
    si = jnp.where(dup, PAD_ID, si)
    neg_vals, idx = jax.lax.top_k(-sd, width)
    new_d = -neg_vals
    new_i = jnp.take_along_axis(si, idx, axis=1)
    new_e = jnp.take_along_axis(se, idx, axis=1) | (new_i < 0)
    return new_d, new_i, new_e


def init_retset(c_dists: jax.Array, c_ids: jax.Array, width: int):
    """Build a fresh sorted retset of the given width from raw candidates."""
    q = c_dists.shape[0]
    d0, i0, e0 = empty_retset(q, width)
    return merge_into_retset(d0, i0, e0, c_dists, c_ids)


def topk_smallest(dists: jax.Array, ids: jax.Array, k: int):
    """Row-wise k smallest (dist, id) pairs, sorted ascending."""
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return -neg_vals, jnp.take_along_axis(ids, idx, axis=-1)
