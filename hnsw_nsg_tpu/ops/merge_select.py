"""Fused retset merge + frontier select — the traversal hop's Pallas core.

Per-hop budget at the 1M bench shape (scripts/hop_budget.py, round 5:
Q=8192, ef=64, R=30, 4 KB record rows, 30-hop lax.scan chains, TPU
v5e): gather-only 1.42 ms/hop, gather+int8 dot 1.20 ms/hop, full hop
with this kernel 2.47 ms/hop, full hop with the unfused XLA merge chain
(two top_k + dedup masks + payload gathers) 11.09 ms/hop. Traversal is
therefore MERGE-bound on the XLA path (~9.9 ms of the 11.1) and the
kernel removes ~87% of that, leaving merge+select ~1.3 ms/hop — on par
with the gather+dot floor it sits behind. The data-dependent 4 KB-row
gather itself measures ~174 ns/row, 24 GB/s effective (round 2's
"0.75 us/row floor" overstated it ~4x by timing dispatch; round 4's
"~15 ns/row" understated it ~10x from a non-chained rep loop the
compiler could pipeline — the round-5 number is a data-dependent
chained scan, the honest shape).

This kernel performs, entirely in VMEM per query block:

  1. candidate dedup (vs the retset and internally, keep-first) —
     ``merge_into_retset``'s semantics (ops/topk.py);
  2. a bitonic sort of [retset ++ candidates] by (dist, position) —
     position-stable, so results are BIT-IDENTICAL to the XLA path's
     stable ``lax.top_k`` (ties keep the earlier slot, retset first);
  3. the take-L prefix becomes the new sorted retset;
  4. frontier selection: the first ``expand`` unexpanded slots are
     returned compacted ([Q, E] ids + validity) and marked expanded —
     ``beam._select_frontier``'s semantics.

One VPU-resident sorting network replaces the per-hop XLA chain of two
top_k sorts, dedup masks and payload gathers; together with the XLA row
gather staying outside (jnp.take is 3x faster than manual Pallas DMA for
data-dependent rows) this takes the hop from ~29 ms to the ~2 ms
gather+dot bill.

Reference semantics: hnswlib searchBaseLayerST's candidate/result heaps
(hnswlib/hnswlib/hnswalg.h:309-440) and NSG's InsertIntoPool
(CNNS/efanna_graph/include/efanna2e/neighbor.h:107-135); see
models/beam.py for the retset-equivalence argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import PAD_DIST, PAD_ID
from .topk import merge_into_retset

_POS_MASK = 0xFFFF  # low meta bits: concat position (stability tiebreak)
_EXP_BIT = 16       # high meta bit: expanded flag rides the sort


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _bitonic_stage(d, meta, ids, j: int, k: int, lane):
    """One compare-exchange stage of a bitonic sort over the lane axis.

    Ascending-by-(d, pos) blocks of size k; j is the partner distance.
    meta's low 16 bits (concat position, unique) make the order strict and
    total, so both partners compute consistent swap decisions.
    """
    n = d.shape[-1]
    up_d, dn_d = pltpu.roll(d, n - j, 1), pltpu.roll(d, j, 1)
    up_m, dn_m = pltpu.roll(meta, n - j, 1), pltpu.roll(meta, j, 1)
    up_i, dn_i = pltpu.roll(ids, n - j, 1), pltpu.roll(ids, j, 1)
    is_lower = (lane & j) == 0
    d_p = jnp.where(is_lower, up_d, dn_d)
    m_p = jnp.where(is_lower, up_m, dn_m)
    i_p = jnp.where(is_lower, up_i, dn_i)
    less = (d < d_p) | (
        (d == d_p) & ((meta & _POS_MASK) < (m_p & _POS_MASK))
    )
    dir_asc = (lane & k) == 0
    # keep mine iff (is_lower == dir_asc) == less; bool==bool comparisons
    # and bool-valued selects both crash the Mosaic compiler, so build the
    # double equivalence from and/or only
    same = (is_lower & dir_asc) | (~is_lower & ~dir_asc)
    keep_mine = (same & less) | (~same & ~less)
    return (
        jnp.where(keep_mine, d, d_p),
        jnp.where(keep_mine, meta, m_p),
        jnp.where(keep_mine, ids, i_p),
    )


def _merge_select_kernel(rd_ref, ri_ref, re_ref, cd_ref, ci_ref,
                         od_ref, oi_ref, oe_ref, sid_ref, sva_ref,
                         *, l: int, c: int, c0: int, expand: int):
    b = rd_ref.shape[0]
    n = l + c
    r_d, r_i = rd_ref[:], ri_ref[:]
    r_e = re_ref[:]
    c_d, c_i = cd_ref[:], ci_ref[:]

    # --- dedup (merge_into_retset semantics: keep-first) ---------------
    # Only the first c0 columns carry real candidates (the rest is pad the
    # wrapper added to make l+c a power of two) — the O(c*(l+c)) dedup
    # broadcasts stay at the true candidate width or VMEM blows up.
    h_i = c_i[:, :c0]
    dup_vs_retset = jnp.any(
        h_i[:, :, None] == r_i[:, None, :], axis=-1
    ) & (h_i >= 0)
    eq = h_i[:, :, None] == h_i[:, None, :]
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (b, c0, c0), 2)
        < jax.lax.broadcasted_iota(jnp.int32, (b, c0, c0), 1)
    )
    dup_internal = jnp.any(eq & earlier, axis=-1) & (h_i >= 0)
    # concatenating i1 vectors trips a Mosaic vreg bitcast — carry i32
    drop_h = (dup_vs_retset | dup_internal).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
    drop_i = jnp.concatenate(
        [drop_h, jnp.zeros((b, c - c0), jnp.int32)], axis=1
    ) if c > c0 else drop_h
    drop = (drop_i > 0) | (c_i < 0) | (col >= c0)
    c_d = jnp.where(drop, PAD_DIST, c_d)
    c_i = jnp.where(drop, PAD_ID, c_i)

    # --- bitonic sort of the concat by (dist, position) ----------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    pos = lane
    e_all = jnp.concatenate(
        [r_e.astype(jnp.int32),
         jnp.zeros((b, c), jnp.int32)], axis=1,
    )
    meta = pos | (e_all << _EXP_BIT)
    d_all = jnp.concatenate([r_d, c_d], axis=1)
    i_all = jnp.concatenate([r_i, c_i], axis=1)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            d_all, meta, i_all = _bitonic_stage(
                d_all, meta, i_all, j, k, lane
            )
            j //= 2
        k *= 2

    new_d = d_all[:, :l]
    new_i = i_all[:, :l]
    new_e = ((meta[:, :l] >> _EXP_BIT) & 1) | (new_i < 0).astype(jnp.int32)

    # --- frontier select (beam._select_frontier semantics) -------------
    unexp = 1 - new_e
    # inclusive prefix sum over the lane axis (Hillis-Steele)
    csum = unexp
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    s = 1
    while s < l:
        shifted = pltpu.roll(csum, s, 1)
        csum = csum + jnp.where(slot >= s, shifted, 0)
        s *= 2
    rank = csum - unexp                      # exclusive rank among unexp
    selected = (unexp == 1) & (rank < expand)
    new_e = new_e | selected.astype(jnp.int32)

    for e in range(expand):
        onehot = selected & (rank == e)
        valid = jnp.max(onehot.astype(jnp.int32), axis=1)
        picked = jnp.sum(jnp.where(onehot, new_i, 0), axis=1)
        # invalid select slots must read PAD_ID (matches _select_frontier)
        sid_ref[:, e] = jnp.where(valid > 0, picked, PAD_ID)
        sva_ref[:, e] = valid.astype(jnp.int8)

    od_ref[:] = new_d
    oi_ref[:] = new_i
    oe_ref[:] = new_e.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("expand", "block", "interpret")
)
def fused_merge_select(r_d, r_i, r_e, c_d, c_i, expand: int,
                       block: int = 128, interpret: bool = False):
    """Merge candidates into the sorted retset and select the next
    frontier, in one Pallas pass.

    Exactly equivalent (bit-identical, including stability and PAD
    handling) to::

        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, c_d, c_i)
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)

    r_d/r_i/r_e: [Q, L] sorted retset (dists asc, PAD-padded, expanded
    flags). c_d/c_i: [Q, C] candidates (PAD_ID and duplicates allowed).
    Returns (r_d, r_i, r_e, sel_ids [Q, expand], sel_valid [Q, expand]).
    Q is padded to a block multiple and C to make L+C a power of two.
    """
    q, l = r_d.shape
    c0 = c_d.shape[1]
    n = _next_pow2(l + c0)
    cp = n - l
    if cp != c0:
        pad = ((0, 0), (0, cp - c0))
        c_d = jnp.pad(c_d, pad, constant_values=PAD_DIST)
        c_i = jnp.pad(c_i, pad, constant_values=PAD_ID)
    # cap the block so the O(block*c0*(l+c0)) dedup broadcasts fit the
    # ~16 MB scoped-VMEM stack. Mosaic's stack usage is not an exact
    # function of this product (round-5 probe: l=64,c0=64 OOMed at
    # block=128 under the old 4 MB constant while larger-product shapes
    # passed), so the constant is set conservatively at 1 MB — measured
    # kernel time is insensitive to block across 16..128 (0.03-0.08 ms
    # at Q=8192), so the safety margin costs nothing
    budget = 1 * 2**20 // max(1, 4 * c0 * max(l, c0))
    block = max(8, min(block, (budget // 8) * 8))
    qp = -(-q // block) * block
    if qp != q:
        pad = ((0, qp - q), (0, 0))
        r_d = jnp.pad(r_d, pad, constant_values=PAD_DIST)
        r_i = jnp.pad(r_i, pad, constant_values=PAD_ID)
        r_e = jnp.pad(r_e, pad, constant_values=True)
        c_d = jnp.pad(c_d, pad, constant_values=PAD_DIST)
        c_i = jnp.pad(c_i, pad, constant_values=PAD_ID)

    kernel = functools.partial(
        _merge_select_kernel, l=l, c=cp, c0=c0, expand=expand
    )
    grid = (qp // block,)
    bs = lambda w: pl.BlockSpec(  # noqa: E731
        (block, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_d, out_i, out_e, sid, sva = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs(l), bs(l), bs(l), bs(cp), bs(cp)],
        out_specs=(bs(l), bs(l), bs(l), bs(expand), bs(expand)),
        out_shape=(
            jax.ShapeDtypeStruct((qp, l), jnp.float32),
            jax.ShapeDtypeStruct((qp, l), jnp.int32),
            jax.ShapeDtypeStruct((qp, l), jnp.int8),
            jax.ShapeDtypeStruct((qp, expand), jnp.int32),
            jax.ShapeDtypeStruct((qp, expand), jnp.int8),
        ),
        interpret=interpret,
    )(r_d, r_i, r_e.astype(jnp.int8), c_d, c_i)
    return (out_d[:q], out_i[:q], out_e[:q].astype(jnp.bool_),
            sid[:q], sva[:q].astype(jnp.bool_))


def merge_select_reference(r_d, r_i, r_e, c_d, c_i, expand: int):
    """The XLA composition the kernel replaces (CPU path / parity oracle)."""
    from ..models.beam import _select_frontier

    r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, c_d, c_i)
    sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
    return r_d, r_i, r_e, sel_ids, sel_valid


def default_use_kernel() -> bool:
    return jax.default_backend() == "tpu"
