"""Packed int8 neighbor-record graph: the HBM-scale traversal layout.

The TPU re-design of the reference's ``OptimizeGraph`` repack
(CNNS/src/nsg/index_nsg.cpp:570-682) for graphs too big for VMEM. Measured
physics on the target chip (round-3 hop profile, ops/merge_select.py):

  * XLA's data-dependent row gather runs at ~15 ns per 4 KB row ON-DEVICE
    inside a compiled loop (round 2's "~0.75 us/row floor" was a
    measurement artifact: it timed per-dispatch overhead through the
    tunnel, not the gather). Gather cost is HBM-bandwidth-shaped:
    bytes_moved / ~800 GB/s, plus a small per-row issue cost;
  * manual Pallas DMA for data-dependent rows is ~3x slower than XLA's
    gather, so record rows are fetched with ``jnp.take`` and only the
    merge/select stage is a hand-written kernel;
  * the hop's dominant cost is the retset MERGE, not the gather: the XLA
    merge chain was ~20 ms of a ~29 ms hop at the 1M bench shape; the
    fused in-VMEM kernel (ops/merge_select.py) takes the hop to ~2 ms.

The packed row still wins, for bandwidth reasons rather than issue-rate
ones: ONE gathered row carries everything a frontier expansion needs —
the node's R neighbors' int8-quantized vectors, their ids, and their
exact f32 squared norms — so an expansion moves R*(d+8) bytes once
instead of touching R scattered f32 rows (4x the bytes) plus separate
id/norm loads. Traversal distances use the FastL2 trick
(CNNS/efanna_graph/include/efanna2e/distance.h: d = ||x||^2 - 2<q,x>) with
the dot in int8-unpacked bf16 on the MXU and the norm exact.

Row layout (int32 words, row = S x 128 words, S a multiple of 8 so the
(8,128)-tiled HBM layout pads nothing):

  [ R x nw vec words | R ids | R norm-bits | pad ]     nw = ceil(d/4)

Vector packing is "split-quarter": word w of neighbor r stores dims
{w, nw+w, 2nw+w, 3nw+w} in its 4 bytes, so unpacking byte k of the word
block yields the contiguous dim range [k*nw, (k+1)*nw) — dot products are
then 4 einsums against the matching query quarter, no interleave shuffles.

Scale: one global symmetric scale (max|x|/127). SIFT-family data is
natively uint8 so quantization is near-lossless there; for arbitrary f32
data the traversal ranking is approximate and callers re-rank exactly
(``inline_graph.rerank_exact``) when exact distances are required.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID, gathered_dists
from ..ops.topk import init_retset, merge_into_retset
from .beam import BeamResult, _select_frontier


class RecordGraph(NamedTuple):
    """Host-side container; pass .rows/.scale into jitted code."""

    rows: jax.Array    # [N, S, 128] int32
    scale: jax.Array   # [] f32 — dequantization scale
    r: int             # neighbors per record
    d: int             # vector dims

    @property
    def n(self) -> int:
        return self.rows.shape[0]

    @property
    def s(self) -> int:
        return self.rows.shape[1]

    def nbytes(self) -> int:
        return self.rows.size * 4


def _layout(r: int, d: int):
    nw = -(-d // 4)
    need = r * nw + 2 * r
    s = 8 * (-(-need // 1024))
    return nw, s


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("nw",))
def _fill_chunk(rows, data_q, norms, adj_c, start, nw: int):
    """Pack one chunk of nodes' records. data_q: [N, 4, nw] int32-valued
    quantized dims split by quarter (dim k*nw+w at [:, k, w])."""
    b, r = adj_c.shape
    ok = adj_c >= 0
    safe = jnp.where(ok, adj_c, 0)
    q4 = jnp.take(data_q, safe, axis=0)            # [b, r, 4, nw] int32
    q4 = jnp.where(ok[:, :, None, None], q4, 0)
    # bytes k=0..3 -> bits 8k..8k+7 of the word
    w = (
        (q4[:, :, 0] & 0xFF)
        | ((q4[:, :, 1] & 0xFF) << 8)
        | ((q4[:, :, 2] & 0xFF) << 16)
        | ((q4[:, :, 3] & 0xFF) << 24)
    )                                               # [b, r, nw]
    ids = jnp.where(ok, adj_c, PAD_ID)
    nb = jnp.where(ok, jnp.take(norms, safe), PAD_DIST)
    nb = jax.lax.bitcast_convert_type(nb, jnp.int32)
    s128 = rows.shape[1] * 128
    pad = jnp.zeros((b, s128 - r * nw - 2 * r), jnp.int32)
    row = jnp.concatenate(
        [w.reshape(b, r * nw), ids, nb, pad], axis=1
    ).reshape(b, rows.shape[1], 128)
    return jax.lax.dynamic_update_slice(rows, row, (start, 0, 0))


def build_record_graph(
    data: jax.Array,
    adj,
    norms: jax.Array,
    scale: float | None = None,
    chunk: int = 1 << 16,
) -> RecordGraph:
    """Derive the packed record layout from (data, padded adjacency).

    adj: [N, R] int32 (PAD_ID-padded). R is capped so one record row stays
    within one S-sublane block; callers with fatter adjacency should slice
    to the closest R neighbors first (degree order is how the engines
    store rows).
    """
    data = jnp.asarray(data)
    n, d = data.shape
    adj = jnp.asarray(adj, jnp.int32)
    r = adj.shape[1]
    nw, s = _layout(r, d)

    if scale is None:
        scale = float(jnp.max(jnp.abs(data.astype(jnp.float32)))) / 127.0
    scale = max(scale, 1e-30)

    # quantize once, pre-split by quarter: [N, 4, nw]
    @jax.jit
    def quantize(x):
        qv = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int32)
        pad_d = 4 * nw - d
        if pad_d:
            qv = jnp.concatenate(
                [qv, jnp.zeros((x.shape[0], pad_d), jnp.int32)], axis=1
            )
        return qv.reshape(x.shape[0], 4, nw)

    data_q = quantize(data)
    rows = jnp.zeros((n, s, 128), jnp.int32)
    if n <= chunk:
        rows = _fill_chunk(rows, data_q, norms, adj, jnp.int32(0), nw=nw)
    else:
        # fixed-size chunks (one compile); the last one slides back and
        # overlaps — refilling a row is idempotent
        starts = list(range(0, n - chunk + 1, chunk))
        if starts[-1] + chunk < n:
            starts.append(n - chunk)
        for st in starts:
            rows = _fill_chunk(
                rows, data_q, norms, adj[st : st + chunk],
                jnp.int32(st), nw=nw,
            )
    return RecordGraph(
        rows=rows, scale=jnp.float32(scale), r=r, d=d
    )


@functools.partial(jax.jit, static_argnames=("nw",))
def quantize_rows(x, scale, nw: int):
    """Quantize a batch of vectors to the split-quarter int layout
    ([B, 4, nw] int32-valued int8) used by record packing."""
    d = x.shape[1]
    qv = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int32)
    pad_d = 4 * nw - d
    if pad_d:
        qv = jnp.concatenate(
            [qv, jnp.zeros((x.shape[0], pad_d), jnp.int32)], axis=1
        )
    return qv.reshape(x.shape[0], 4, nw)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("nw",))
def update_record_rows(rows, data_q, norms, adj_rows, row_ids, nw: int):
    """Repack a scattered set of record rows in place (donated).

    The incremental maintenance op behind construction-time acceleration:
    after a bulk-synchronous insert round rewrites some adjacency rows,
    only those rows' records are repacked. row_ids: [B] int32 (PAD_ID
    entries dropped). adj_rows: [B, R] the new adjacency of those rows.
    """
    b, r = adj_rows.shape
    ok = adj_rows >= 0
    safe = jnp.where(ok, adj_rows, 0)
    q4 = jnp.take(data_q, safe, axis=0)
    q4 = jnp.where(ok[:, :, None, None], q4, 0)
    w = (
        (q4[:, :, 0] & 0xFF)
        | ((q4[:, :, 1] & 0xFF) << 8)
        | ((q4[:, :, 2] & 0xFF) << 16)
        | ((q4[:, :, 3] & 0xFF) << 24)
    )
    ids = jnp.where(ok, adj_rows, PAD_ID)
    nb = jnp.where(ok, jnp.take(norms, safe), PAD_DIST)
    nb = jax.lax.bitcast_convert_type(nb, jnp.int32)
    s = rows.shape[1]
    pad = jnp.zeros((b, s * 128 - r * nw - 2 * r), jnp.int32)
    row = jnp.concatenate(
        [w.reshape(b, r * nw), ids, nb, pad], axis=1
    ).reshape(b, s, 128)
    dst = jnp.where(row_ids >= 0, row_ids, rows.shape[0])
    return rows.at[dst].set(row, mode="drop")


def _record_dists(q_bf, rows_g, scale, r: int, nw: int, metric: str):
    """rows_g: [Q, E, S, 128] gathered records -> (dists [Q, E*R] f32,
    ids [Q, E*R] i32). q_bf: [Q, 4, nw] query split by quarter (bf16)."""
    qn, e = rows_g.shape[:2]
    flat = rows_g.reshape(qn, e, -1)
    vec = flat[..., : r * nw].reshape(qn, e, r, nw)
    dots = jnp.zeros((qn, e, r), jnp.float32)
    for k in range(4):
        bk = jnp.asarray(
            (vec << (24 - 8 * k)) >> 24, jnp.int32
        ).astype(jnp.bfloat16)
        dots = dots + jnp.einsum(
            "qh,qerh->qer", q_bf[:, k], bk,
            preferred_element_type=jnp.float32,
        )
    ids = flat[..., r * nw : r * nw + r].reshape(qn, -1)
    if metric in ("ip", "cosine"):
        cd = 1.0 - scale * dots
    else:
        nb = jax.lax.bitcast_convert_type(
            flat[..., r * nw + r : r * nw + 2 * r], jnp.float32
        )
        cd = nb - 2.0 * scale * dots
    cd = jnp.where(ids >= 0, cd.reshape(qn, -1), PAD_DIST)
    return cd, ids


def _split_query(q: jax.Array, d: int, nw: int) -> jax.Array:
    qf = q.astype(jnp.float32)
    pad_d = 4 * nw - d
    if pad_d:
        qf = jnp.concatenate(
            [qf, jnp.zeros((q.shape[0], pad_d), jnp.float32)], axis=1
        )
    return qf.reshape(q.shape[0], 4, nw).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("expand", "n_hops", "metric", "r", "nw", "use_kernel"),
)
def _scan_hops(q_bf, rows, scale, r_d, r_i, r_e, sel_ids, sel_valid,
               hops, evals, expand: int, n_hops: int, metric: str,
               r: int, nw: int, use_kernel: bool):
    """n_hops lockstep expansions compiled as ONE program (a while_loop
    cond costs a ~0.5 ms host round-trip per hop on this backend — scan
    instead, with one host convergence check per chunk).

    The loop is pipelined expand-first: the carry holds the frontier the
    previous step selected; each step gathers+scores it and then runs one
    fused merge+select (``ops.merge_select``: candidate dedup, bitonic
    retset merge, frontier pick — one Pallas pass in VMEM instead of the
    ~20 ms XLA chain of two top_k sorts and payload gathers per hop).
    Results are bit-identical to the XLA composition; ``use_kernel=False``
    keeps that composition for CPU runs.
    """

    def merge_select(r_d, r_i, r_e, cd, ci):
        if use_kernel:
            from ..ops.merge_select import fused_merge_select
            return fused_merge_select(r_d, r_i, r_e, cd, ci, expand)
        r_d, r_i, r_e = merge_into_retset(r_d, r_i, r_e, cd, ci)
        sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
        return r_d, r_i, r_e, sel_ids, sel_valid

    def body(carry, _):
        r_d, r_i, r_e, sel_ids, sel_valid, hops, evals = carry
        safe = jnp.where(sel_ids >= 0, sel_ids, 0)
        rows_g = jnp.take(rows, safe, axis=0)      # [Q, E, S, 128]
        cd, ci = _record_dists(q_bf, rows_g, scale, r, nw, metric)
        ci = jnp.where(
            jnp.repeat(sel_valid, r, axis=1), ci, PAD_ID
        )
        cd = jnp.where(ci >= 0, cd, PAD_DIST)
        hops = hops + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        evals = evals + jnp.sum(ci >= 0, axis=1).astype(jnp.int32)
        r_d, r_i, r_e, sel_ids, sel_valid = merge_select(
            r_d, r_i, r_e, cd, ci
        )
        return (r_d, r_i, r_e, sel_ids, sel_valid, hops, evals), None

    (r_d, r_i, r_e, sel_ids, sel_valid, hops, evals), _ = jax.lax.scan(
        body, (r_d, r_i, r_e, sel_ids, sel_valid, hops, evals),
        None, length=n_hops,
    )
    return r_d, r_i, r_e, sel_ids, sel_valid, hops, evals


@jax.jit
def _scatter_final(f_d, f_i, f_h, f_e, orig, r_d, r_i, hops, evals):
    """Write the current (possibly compacted) batch's rows back to their
    original query slots. orig entries >= len(f_d) are pad rows (drop)."""
    f_d = f_d.at[orig].set(r_d, mode="drop")
    f_i = f_i.at[orig].set(r_i, mode="drop")
    f_h = f_h.at[orig].set(hops, mode="drop")
    f_e = f_e.at[orig].set(evals, mode="drop")
    return f_d, f_i, f_h, f_e


@jax.jit
def _compact_batch(sel, live, q_bf, r_d, r_i, r_e, sel_ids, sel_valid,
                   hops, evals, orig):
    """Gather the still-active queries into a smaller batch. Pad rows
    (live=False) get fully-expanded retsets and empty frontiers so they
    do no work (one dead row-0 gather per expand slot per hop)."""
    take = functools.partial(jnp.take, indices=sel, axis=0)
    r_e_c = jnp.where(live[:, None], take(r_e), True)
    sid_c = jnp.where(live[:, None], take(sel_ids), PAD_ID)
    sva_c = jnp.where(live[:, None], take(sel_valid), False)
    orig_c = jnp.where(live, take(orig), jnp.iinfo(jnp.int32).max)
    return (take(q_bf), take(r_d), take(r_i), r_e_c, sid_c, sva_c,
            take(hops), take(evals), orig_c)


def beam_search_records(
    queries: jax.Array,
    data: jax.Array,
    norms: jax.Array,
    g: RecordGraph,
    init_ids: jax.Array,
    width: int,
    metric: str = "l2",
    max_hops: int = 512,
    expand: int = 1,
    chunk_hops: int = 32,
    min_compact: int = 256,
    use_kernel: bool | None = None,
) -> BeamResult:
    """Lockstep best-first search over the packed record layout.

    Semantics match ``beam.beam_search`` (hnswlib searchBaseLayerST / NSG
    Search): sorted top-``width`` retset, expand the closest unexpanded,
    merge, until every slot is expanded. Distances returned are FastL2-form
    f32 from int8 dots with exact norms; use ``inline_graph.rerank_exact``
    for exact metric values.

    Converged-query compaction: lockstep batches pay the slowest query's
    hop count — the convergence tail (a minority of queries needing 3-10x
    the median hops) would otherwise multiply the whole batch's gather
    bill. After each scan chunk the still-active queries are compacted
    into a power-of-two bucket once they fall below half the batch, so
    tail hops cost only the tail's own gathers. Each per-query result is
    scattered back to its original slot at compaction/exit.
    """
    q = jnp.asarray(queries)
    qn = q.shape[0]
    init_d = gathered_dists(q, data, init_ids, metric, norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, width)
    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.sum(init_ids >= 0, axis=1).astype(jnp.int32)
    if use_kernel is None:
        from ..ops.merge_select import default_use_kernel
        use_kernel = default_use_kernel()

    nw, _ = _layout(g.r, g.d)
    q_bf = _split_query(q, g.d, nw)
    # the scan loop is expand-first: pick the initial frontier here
    sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, expand)
    final = None   # (f_d, f_i, f_h, f_e) once compaction starts
    orig = jnp.arange(qn, dtype=jnp.int32)
    cur_q = qn
    hops_left = max_hops
    while hops_left > 0:
        n_hops = min(chunk_hops, hops_left)
        r_d, r_i, r_e, sel_ids, sel_valid, hops, evals = _scan_hops(
            q_bf, g.rows, g.scale, r_d, r_i, r_e, sel_ids, sel_valid,
            hops, evals, expand=expand, n_hops=n_hops, metric=metric,
            r=g.r, nw=nw, use_kernel=use_kernel,
        )
        hops_left -= n_hops
        # one host sync per chunk: a query is live iff it has a pending
        # frontier to expand
        act = np.asarray(jnp.any(sel_valid, axis=1))
        n_act = int(act.sum())
        if n_act == 0:
            break
        new_q = max(min_compact, 1 << int(np.ceil(np.log2(n_act))))
        if new_q <= cur_q // 2 and hops_left > 0:
            if final is None:
                final = (
                    jnp.zeros((qn, width), r_d.dtype),
                    jnp.full((qn, width), PAD_ID, jnp.int32),
                    jnp.zeros((qn,), jnp.int32),
                    jnp.zeros((qn,), jnp.int32),
                )
            final = _scatter_final(*final, orig, r_d, r_i, hops, evals)
            sel_np = np.zeros(new_q, np.int32)
            idx = np.nonzero(act)[0]
            sel_np[: n_act] = idx
            live_np = np.zeros(new_q, bool)
            live_np[: n_act] = True
            (q_bf, r_d, r_i, r_e, sel_ids, sel_valid, hops, evals,
             orig) = _compact_batch(
                jnp.asarray(sel_np), jnp.asarray(live_np),
                q_bf, r_d, r_i, r_e, sel_ids, sel_valid,
                hops, evals, orig,
            )
            cur_q = new_q
    if final is None:
        return BeamResult(r_d, r_i, hops, evals)
    f_d, f_i, f_h, f_e = _scatter_final(
        *final, orig, r_d, r_i, hops, evals
    )
    return BeamResult(f_d, f_i, f_h, f_e)
