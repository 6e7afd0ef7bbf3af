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
    # sort candidates ascending; entries past the scan cap are dropped
    order = jnp.argsort(d, axis=1)
    s_ids = jnp.take_along_axis(cand_ids, order, axis=1)[:, :scan]
    s_d = jnp.take_along_axis(d, order, axis=1)[:, :scan]
    c = scan

    # The greedy scan is equivalent to max_keep ROUNDS of "take the closest
    # not-yet-occluded candidate, then occlude everything it dominates".
    # All pair distances are precomputed in one batched [C, d] x [d, C]
    # GEMM per row chunk (proper MXU shape); the rounds themselves are pure
    # mask updates on the VPU — no distance work in the sequential part.
    # The batch is padded UP to a multiple of the chunk (shapes are static
    # at trace time, so this costs nothing at runtime) rather than shrinking
    # the chunk to a divisor of b, which for odd b would serialize the loop
    # into per-row lax.map steps.
    chunk = max(min(b, (1 << 26) // (c * c)), 8)  # ~256MB pair blocks
    chunk = 1 << (chunk.bit_length() - 1)
    bp = -(-b // chunk) * chunk
    if bp != b:
        s_ids = jnp.concatenate(
            [s_ids, jnp.full((bp - b, c), PAD_ID, jnp.int32)], axis=0
        )
        s_d = jnp.concatenate(
            [s_d, jnp.full((bp - b, c), PAD_DIST, jnp.float32)], axis=0
        )
    nb = bp // chunk

    def block_fn(args):
        s_ids_b, s_d_b = args
        safe = jnp.where(s_ids_b >= 0, s_ids_b, 0)
        # bf16 gather+dots on accelerators: the TPU einsum at DEFAULT
        # precision already truncated f32 operands to bf16 on the MXU, so
        # casting at the gather halves the [B, C, d] HBM traffic (the
        # prune's dominant cost) with bit-identical pair distances there.
        # CPU keeps f32 (its DEFAULT einsum is exact, and the scalar
        # sync_prune parity test relies on it). The occlusion RULE only
        # compares pair dists against exact candidate dists — stored link
        # distances always come from cand_dists, never from these dots.
        # TPU only: there DEFAULT-precision einsum already truncates f32
        # operands to bf16, so the cast is bit-identical; on GPU (tf32/f32
        # DEFAULT) it would genuinely lose precision vs f32 inputs
        dtype = (
            jnp.bfloat16
            if data.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            else data.dtype
        )
        vecs = jnp.take(data, safe, axis=0).astype(dtype)  # [B,C,d]
        dots = jnp.einsum(
            "bcd,bed->bce", vecs, vecs,
            preferred_element_type=jnp.float32,
        )
        if metric in ("ip", "cosine"):
            pair = 1.0 - dots
        else:
            nrm = jnp.take(norms, safe, axis=0)
            pair = nrm[:, :, None] + nrm[:, None, :] - 2.0 * dots

        bb = s_ids_b.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (bb, c), 1)
        kept_ids = jnp.full((bb, max_keep), PAD_ID, jnp.int32)
        kept_d = jnp.full((bb, max_keep), PAD_DIST, jnp.float32)
        dead = ~((s_ids_b >= 0) & (s_d_b < PAD_DIST))

        def round_fn(r, carry):
            kept_ids, kept_d, dead = carry
            key = jnp.where(dead, c, col)
            pick = jnp.argmin(key, axis=1)  # [B]
            got = ~jnp.take_along_axis(dead, pick[:, None], axis=1)[:, 0]
            pid = jnp.take_along_axis(s_ids_b, pick[:, None], axis=1)[:, 0]
            pdist = jnp.take_along_axis(s_d_b, pick[:, None], axis=1)[:, 0]
            kept_ids = kept_ids.at[:, r].set(jnp.where(got, pid, PAD_ID))
            kept_d = kept_d.at[:, r].set(
                jnp.where(got, pdist, PAD_DIST)
            )
            prow = jnp.take_along_axis(
                pair, pick[:, None, None], axis=1
            )[:, 0, :]  # [B, C] distances from the new kept to everyone
            dead = dead | (got[:, None] & (prow < s_d_b)) | (
                col == pick[:, None]
            )
            return kept_ids, kept_d, dead

        kept_ids, kept_d, _ = jax.lax.fori_loop(
            0, max_keep, round_fn, (kept_ids, kept_d, dead)
        )
        return kept_ids, kept_d

    if nb == 1:
        out_i, out_d = block_fn((s_ids, s_d))
        return out_i[:b], out_d[:b]
    out_i, out_d = jax.lax.map(
        block_fn,
        (s_ids.reshape(nb, chunk, c), s_d.reshape(nb, chunk, c)),
    )
    return out_i.reshape(bp, max_keep)[:b], out_d.reshape(bp, max_keep)[:b]


def _next_bucket(x: int, minimum: int) -> int:
    b = minimum
    while b < x:
        b *= 2
    return b


def occlusion_prune_padded(
    node_vecs,
    cand_ids,
    cand_dists,
    data,
    norms,
    max_keep: int,
    scan_cap: int | None = None,
    metric: str = "l2",
    self_ids=None,
):
    """occlusion_prune with batch/width padded to power-of-two buckets.

    Callers like reverse-edge insertion produce wildly varying (B, C)
    shapes; padding to buckets keeps the number of distinct compiled
    kernels logarithmic instead of per-call.
    """
    b, c = cand_ids.shape
    bp = _next_bucket(b, 512)
    # 64 is the smallest lane-aligned width; a 128 minimum used to pad
    # the reverse-insert's 64-wide (level-0) and 32-wide (upper) pools
    # 2-4x, quadrupling the [B, C, C] pair einsum + doubling the vector
    # gather of the insert hot path for nothing (round-4 insert profile)
    cp = _next_bucket(c, 64)
    if bp != b:
        node_vecs = jnp.concatenate(
            [node_vecs,
             jnp.zeros((bp - b, node_vecs.shape[1]), node_vecs.dtype)],
            axis=0,
        )
        if self_ids is not None:
            self_ids = jnp.concatenate(
                [jnp.asarray(self_ids),
                 jnp.full((bp - b,), -2, jnp.int32)], axis=0
            )
    if bp != b or cp != c:
        ids_p = jnp.full((bp, cp), PAD_ID, jnp.int32)
        d_p = jnp.full((bp, cp), PAD_DIST, jnp.float32)
        cand_ids = ids_p.at[:b, :c].set(cand_ids)
        cand_dists = d_p.at[:b, :c].set(cand_dists)
    kept_i, kept_d = occlusion_prune(
        node_vecs, cand_ids, cand_dists, data, norms,
        max_keep=max_keep, scan_cap=scan_cap, metric=metric,
        self_ids=self_ids,
    )
    return kept_i[:b], kept_d[:b]
