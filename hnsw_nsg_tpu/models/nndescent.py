"""nn-descent kNN-graph construction, fully on-device.

Reference: ``IndexGraph`` (CNNS/efanna_graph/src/index_graph.cpp) — per
iteration, ``join`` (:22-33) evaluates all pairs among each node's sampled
new/old neighbor lists under per-node mutex heaps, and ``update`` (:34-120)
re-sorts pools, samples <=S new entries (clearing flags) and builds reverse
lists capped at R.

TPU re-design — the scatter-heavy local join becomes a *pull*: if nodes u
and v both appear in node w's join lists, then u discovers v by gathering
the pools of its join partners (w's pool contains v), and symmetrically for
v. So each iteration is, entirely on device under one jit:

  1. sample S new-flagged + S old pool entries per node (flags cleared),
     [N, S] each — update()'s forward sampling;
  2. approximate reverse lists by random-slot scatter: rev[dst, rand_col] =
     src (collisions = random reservoir replacement, matching the
     reference's R-capped random replacement, index_graph.cpp:92-118);
  3. partners = fwd ∪ rev; candidates = partners ∪ the top-T pool entries
     of every partner (gathered);
  4. one batched gathered-GEMM distance block per node chunk (lax.map to
     bound memory);
  5. merge candidates into the [N, L] sorted pools with the shared
     dedup-top-k retset merge; surviving inserts get new=True.

No locks, no host round-trips; the convergence signal (count of pool
inserts) is the only scalar read back per iteration. Per-iteration
control-set recall telemetry mirrors index_graph.cpp:122-172.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bruteforce import brute_force_topk
from ..ops.distance import PAD_DIST, PAD_ID, gathered_dists, squared_norms
from ..ops.topk import merge_into_retset_sorted
from ..utils.params import NNDescentConfig
from .beam import beam_search


def _sample_masked(key, mask, s):
    """Per row, uniformly choose up to `s` slots where mask is True.
    Returns (slot_idx [N, s], got [N, s])."""
    n, l = mask.shape
    noise = jax.random.uniform(key, (n, l))
    score = jnp.where(mask, noise, -1.0)
    _, idx = jax.lax.top_k(score, s)
    got = jnp.take_along_axis(mask, idx, axis=1)
    return idx, got


def _reverse_scatter(key, fwd, n, r):
    """Approximate reverse sampling: rev[fwd[u,j], rand_col] = u.
    Collisions overwrite at random — reservoir-style replacement."""
    s = fwd.shape[1]
    cols = jax.random.randint(key, fwd.shape, 0, r, dtype=jnp.int32)
    src = jax.lax.broadcasted_iota(jnp.int32, fwd.shape, 0)
    dst = jnp.where(fwd >= 0, fwd, n)  # invalid -> dropped
    rev = jnp.full((n, r), PAD_ID, jnp.int32)
    return rev.at[dst.reshape(-1), cols.reshape(-1)].set(
        src.reshape(-1), mode="drop"
    )


@functools.partial(
    jax.jit,
    static_argnames=("s", "r", "t", "metric", "chunk"),
)
def _iteration(
    key, data, norms, pool_ids, pool_d, pool_new, n_valid,
    s, r, t, metric, chunk,
):
    n, l = pool_ids.shape
    k_new, k_old, k_rn, k_ro = jax.random.split(key, 4)
    valid = pool_ids >= 0

    new_idx, new_got = _sample_masked(k_new, valid & pool_new, s)
    old_idx, old_got = _sample_masked(k_old, valid & ~pool_new, s)
    s_new = jnp.where(
        new_got, jnp.take_along_axis(pool_ids, new_idx, axis=1), PAD_ID
    )
    s_old = jnp.where(
        old_got, jnp.take_along_axis(pool_ids, old_idx, axis=1), PAD_ID
    )
    # clear sampled-new flags
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, l), 1)
    cleared = jnp.any(
        (slot[:, None, :] == new_idx[:, :, None]) & new_got[:, :, None],
        axis=1,
    )
    pool_new = pool_new & ~cleared

    r_new = _reverse_scatter(k_rn, s_new, n, r)
    r_old = _reverse_scatter(k_ro, s_old, n, r)
    partners = jnp.concatenate([s_new, s_old, r_new, r_old], axis=1)  # [N,W]
    top_pool = pool_ids[:, :t] if t else None

    # chunked distance + merge. The candidate tensor (partners + each
    # partner's pulled join lists) is [N, W*(2S+T)] — ~7 GB at N=1M — so
    # it is materialized PER CHUNK inside the map from the small global
    # sample tables (s_new/s_old/top_pool are [N, S]/[N, T]).
    nb = n // chunk
    qn_all = norms if metric == "l2" else jnp.zeros_like(norms)

    def block_fn(args):
        rows, part_b, pd_b, pi_b, pn_b = args
        # candidates: partners + each partner's sampled join lists (the
        # faithful pull of join(w): pairs within join(w) are exactly
        # "u pulls w's samples" for u in join(w)) + top-T closest pool
        # rows of each partner (neighbor-of-neighbor exploitation)
        safe_p = jnp.where(part_b >= 0, part_b, 0)
        pulled = jnp.concatenate(
            [
                jnp.take(s_new, safe_p, axis=0),
                jnp.take(s_old, safe_p, axis=0),
            ]
            + ([jnp.take(top_pool, safe_p, axis=0)]
               if top_pool is not None else []),
            axis=2,
        )  # [B, W, 2S (+T)]
        pulled = jnp.where(part_b[:, :, None] >= 0, pulled, PAD_ID)
        cand_b = jnp.concatenate(
            [part_b, pulled.reshape(rows.shape[0], -1)], axis=1
        )
        # drop self references and padding-duplicate rows (>= n_valid)
        cand_b = jnp.where(
            (cand_b == rows[:, None]) | (cand_b >= n_valid), PAD_ID, cand_b
        )
        q = jnp.take(data, rows, axis=0)
        cd = gathered_dists(q, data, cand_b, metric, norms)
        if metric == "l2":
            cd = jnp.where(
                cand_b >= 0, cd + jnp.take(qn_all, rows, axis=0)[:, None],
                PAD_DIST,
            )
        nd, ni, ne = merge_into_retset_sorted(pd_b, pi_b, ~pn_b, cd, cand_b)
        return nd, ni, ~ne

    rows = jnp.arange(n, dtype=jnp.int32).reshape(nb, chunk)
    out_d, out_i, out_new = jax.lax.map(
        block_fn,
        (
            rows,
            partners.reshape(nb, chunk, -1),
            pool_d.reshape(nb, chunk, l),
            pool_ids.reshape(nb, chunk, l),
            pool_new.reshape(nb, chunk, l),
        ),
    )
    new_pool_d = out_d.reshape(n, l)
    new_pool_ids = out_i.reshape(n, l)
    new_pool_new = out_new.reshape(n, l) & (new_pool_ids >= 0)
    changed = jnp.sum(new_pool_ids != pool_ids)
    return new_pool_ids, new_pool_d, new_pool_new, changed


def _pad_to_multiple(n, m):
    return ((n + m - 1) // m) * m


def nn_descent(
    data,
    cfg: NNDescentConfig = NNDescentConfig(),
    metric: str = "l2",
    seed: int = 0,
    chunk: int = 4096,
    top_t: int = 8,
    rev_cap: int | None = None,
    init_adj=None,
    eval_recall_every: int = 0,
    verbose: bool = False,
    min_changed_frac: float = 0.001,
) -> np.ndarray:
    """Build an approximate kNN graph. Returns int32 [N, K] adjacency.

    cfg: K (output degree), L (pool width), iters, S (sample), R (reverse
         cap) — the reference's parameter surface (SURVEY.md §2.8).
    top_t: pool entries pulled per join partner.
    init_adj: optional warm start (RefineGraph, index_graph.cpp:235-262);
    default random init (IndexRandom, src/index_random.cpp:24-27).
    """
    data = jnp.asarray(data)
    n_real = data.shape[0]
    k, l = cfg.K, max(cfg.L, cfg.K)
    rcap = rev_cap if rev_cap is not None else min(cfg.R, 2 * cfg.S)
    # auto-shrink the node chunk so the per-chunk candidate gather
    # ([chunk, cand_w, d] f32 inside gathered_dists, plus an einsum copy)
    # stays within a few GB of HBM at any (N, d, S, R, T) — the refine
    # configs that buy reference-grade recall OOM'd at 1M with the old
    # fixed chunk=4096
    w = 2 * cfg.S + 2 * rcap
    cand_w = w * (2 * cfg.S + top_t + 1)
    max_chunk = max(int(3e9 / (cand_w * data.shape[1] * 8)), 256)
    chunk = min(chunk, 1 << int(np.floor(np.log2(max_chunk))))
    chunk = min(chunk, _pad_to_multiple(n_real, 8))
    n = _pad_to_multiple(n_real, chunk)
    if n != n_real:
        # pad with duplicates of row 0; padded rows never enter real pools
        # because candidates are drawn from pools initialized to real ids
        pad = jnp.broadcast_to(data[:1], (n - n_real, data.shape[1]))
        data = jnp.concatenate([data, pad], axis=0)
    norms = squared_norms(data)
    rng = np.random.default_rng(seed)

    if init_adj is not None:
        init_ids = np.asarray(init_adj, np.int32)[:, :l]
        if init_ids.shape[1] < l:
            fill = rng.integers(
                0, n_real, (n_real, l - init_ids.shape[1]), dtype=np.int32
            )
            init_ids = np.concatenate([init_ids, fill], axis=1)
        if n != n_real:
            init_ids = np.concatenate(
                [init_ids,
                 rng.integers(0, n_real, (n - n_real, l), dtype=np.int32)],
                axis=0,
            )
    else:
        init_ids = rng.integers(0, n_real, (n, l), dtype=np.int32)
    init_ids = np.where(
        init_ids == np.arange(n, dtype=np.int32)[:, None], PAD_ID, init_ids
    )

    key = jax.random.PRNGKey(seed)

    # seed pools: merge the init ids as candidates into empty pools
    def seed_block(args):
        rows, cand_b = args
        q = jnp.take(data, rows, axis=0)
        cd = gathered_dists(q, data, cand_b, metric, norms)
        if metric == "l2":
            cd = jnp.where(
                cand_b >= 0, cd + jnp.take(norms, rows, axis=0)[:, None],
                PAD_DIST,
            )
        d0 = jnp.full((rows.shape[0], l), PAD_DIST, jnp.float32)
        i0 = jnp.full((rows.shape[0], l), PAD_ID, jnp.int32)
        e0 = jnp.ones((rows.shape[0], l), jnp.bool_)
        nd, ni, ne = merge_into_retset_sorted(d0, i0, e0, cd, cand_b)
        return nd, ni, ~ne

    nb = n // chunk
    rows = jnp.arange(n, dtype=jnp.int32).reshape(nb, chunk)
    out_d, out_i, out_new = jax.lax.map(
        seed_block, (rows, jnp.asarray(init_ids).reshape(nb, chunk, l))
    )
    pool_d = out_d.reshape(n, l)
    pool_ids = out_i.reshape(n, l)
    pool_new = out_new.reshape(n, l) & (pool_ids >= 0)

    control_ids = control_gt = None
    if eval_recall_every:
        control_ids = rng.integers(0, n_real, min(100, n_real))
        _, cgt = brute_force_topk(
            jnp.take(data, jnp.asarray(control_ids), axis=0),
            data[:n_real], k + 1, metric=metric,
        )
        control_gt = np.asarray(cgt)[:, 1:]

    for it in range(cfg.iters):
        key, sub = jax.random.split(key)
        pool_ids, pool_d, pool_new, changed = _iteration(
            sub, data, norms, pool_ids, pool_d, pool_new,
            jnp.int32(n_real), cfg.S, rcap, top_t, metric, chunk,
        )
        changed = int(changed)
        if eval_recall_every and (it + 1) % eval_recall_every == 0:
            pids = np.asarray(pool_ids[:, :k])
            hits = sum(
                len(np.intersect1d(pids[c], control_gt[ci][:k]))
                for ci, c in enumerate(control_ids)
            )
            print(
                f"nn-descent iter {it + 1}/{cfg.iters}: "
                f"recall={hits / (len(control_ids) * k):.4f} "
                f"changed={changed}"
            )
        elif verbose:
            print(f"nn-descent iter {it + 1}/{cfg.iters}: changed={changed}")
        if changed <= min_changed_frac * n * 1:
            break

    out = np.asarray(pool_ids[:n_real, :k])
    # padded duplicate rows may have slipped into pools as ids >= n_real
    out = np.where(out >= n_real, PAD_ID, out)
    return out


# ---------------------------------------------------------------------------
# Incremental kNN-graph insertion (GraphAdd)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("metric", "chunk"))
def _pools_from_adj(data, norms, adj, metric, chunk):
    """Exact pool distances for every adjacency row (the reference's
    compact_to_Lockgraph, index_graph.cpp:483-497: each existing edge gets
    its distance recomputed so bounded inserts can rank against it)."""
    n, k = adj.shape
    nb = n // chunk

    def block_fn(args):
        rows, adj_b = args
        q = jnp.take(data, rows, axis=0)
        cd = gathered_dists(q, data, adj_b, metric, norms)
        if metric == "l2":
            cd = cd + jnp.take(norms, rows, axis=0)[:, None]
        return jnp.where(adj_b >= 0, cd, PAD_DIST)

    rows = jnp.arange(n, dtype=jnp.int32).reshape(nb, chunk)
    out = jax.lax.map(block_fn, (rows, adj.reshape(nb, chunk, k)))
    return out.reshape(n, k)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "l_add", "rrev", "max_hops"),
    donate_argnums=(4, 5),
)
def _graph_add_batch(
    key, data, norms, rows, adj, pool_d, n0, metric, l_add, rrev,
    max_hops,
):
    """Insert one batch of new nodes into the growing graph.

    rows: [B] global ids of this batch's new points (PAD_ID tail padding).
    Semantics per get_neighbor_to_add (index_graph.cpp:430-479): an
    l_add-wide beam over the current graph seeded with random old ids +
    random new ids, then the top-K results become the new node's out-edges
    and bounded reverse edges (parallel_graph_insert, :379-390). Reverse
    inserts go through a random-slot candidate list + one retset merge —
    collisions drop a candidate, the lock-free analogue of the reference's
    racy bounded pools.
    """
    n_tot = data.shape[0]
    k = adj.shape[1]
    b = rows.shape[0]
    safe_rows = jnp.where(rows >= 0, rows, 0)
    q = jnp.take(data, safe_rows, axis=0)

    k1, k2, k3 = jax.random.split(key, 3)
    h = l_add // 2
    init_old = jax.random.randint(k1, (b, l_add - h), 0, n0, dtype=jnp.int32)
    init_new = jax.random.randint(k2, (b, h), n0, n_tot, dtype=jnp.int32)
    init = jnp.concatenate([init_old, init_new], axis=1)
    init = jnp.where(init == rows[:, None], PAD_ID, init)

    res = beam_search(
        q, data, norms, adj, init, width=l_add, metric=metric,
        max_hops=max_hops,
    )
    e_i = res.ids[:, :k]
    e_d = res.dists[:, :k]
    if metric == "l2":
        e_d = e_d + jnp.take(norms, safe_rows, axis=0)[:, None]
    valid = (e_i >= 0) & (e_i != rows[:, None]) & (rows >= 0)[:, None]
    e_i = jnp.where(valid, e_i, PAD_ID)
    e_d = jnp.where(valid, e_d, PAD_DIST)

    # the batch rows' own pools (tail-padded rows scatter to a dropped slot)
    dst_row = jnp.where(rows >= 0, rows, n_tot)
    adj = adj.at[dst_row].set(e_i, mode="drop")
    pool_d = pool_d.at[dst_row].set(e_d, mode="drop")

    # bounded reverse inserts: rev[e_i[u,j], rand_col] = u
    cols = jax.random.randint(k3, (b, k), 0, rrev, dtype=jnp.int32)
    dst = jnp.where(valid, e_i, n_tot)
    src = jnp.broadcast_to(rows[:, None], (b, k))
    rev_i = jnp.full((n_tot, rrev), PAD_ID, jnp.int32).at[
        dst.reshape(-1), cols.reshape(-1)
    ].set(src.reshape(-1), mode="drop")
    rev_d = jnp.full((n_tot, rrev), PAD_DIST, jnp.float32).at[
        dst.reshape(-1), cols.reshape(-1)
    ].set(e_d.reshape(-1), mode="drop")
    no_flags = jnp.zeros_like(adj, dtype=jnp.bool_)
    pool_d, adj, _ = merge_into_retset_sorted(
        pool_d, adj, no_flags, rev_d, rev_i
    )
    return adj, pool_d


def graph_add(
    data,
    adj,
    new_data,
    metric: str = "l2",
    seed: int = 0,
    l_add: int | None = None,
    batch: int = 4096,
    chunk: int = 4096,
    max_hops: int = 128,
):
    """Append points to an existing kNN graph (``GraphAdd``,
    CNNS/efanna_graph/src/index_graph.cpp:379-498).

    data: [N0, d] points the graph was built over; adj: [N0, K] their kNN
    adjacency (PAD_ID-padded); new_data: [B, d] points to insert.

    TPU redesign: instead of per-point OMP threads mutating lock-guarded
    pools, new points arrive in bulk-synchronous batches — each batch beam
    searches the frozen graph of everything inserted so far, writes its
    own top-K out-edges, and reverse edges land through one scattered
    retset merge over all pools. Returns (data_all [N0+B, d],
    adj_all [N0+B, K]) as numpy, adjacency rows distance-sorted (the
    reference also returns pools re-sorted by distance).
    """
    data = np.asarray(data, np.float32)
    new_data = np.asarray(new_data, np.float32)
    n0, d = data.shape
    n_new = new_data.shape[0]
    k = adj.shape[1]
    l_add = l_add or max(2 * k, 32)
    batch = min(batch, max(n_new, 1))

    data_all = jnp.asarray(np.concatenate([data, new_data], axis=0))
    n_tot = n0 + n_new
    norms = squared_norms(data_all)

    # existing pools with exact distances; new rows start empty
    c = min(chunk, n0)
    while n0 % c:
        c //= 2
    pool0 = _pools_from_adj(
        jnp.asarray(data), squared_norms(jnp.asarray(data)),
        jnp.asarray(np.asarray(adj, np.int32)), metric, max(c, 1),
    )
    adj_all = jnp.concatenate([
        jnp.asarray(np.asarray(adj, np.int32)),
        jnp.full((n_new, k), PAD_ID, jnp.int32),
    ])
    pool_d = jnp.concatenate([
        pool0, jnp.full((n_new, k), PAD_DIST, jnp.float32)
    ])

    key = jax.random.PRNGKey(seed)
    rows_np = np.arange(n0, n_tot, dtype=np.int32)
    nb = -(-n_new // batch)
    pad = nb * batch - n_new
    if pad:
        rows_np = np.concatenate(
            [rows_np, np.full(pad, PAD_ID, np.int32)]
        )
    for i in range(nb):
        key, sub = jax.random.split(key)
        adj_all, pool_d = _graph_add_batch(
            sub, data_all, norms,
            jnp.asarray(rows_np[i * batch : (i + 1) * batch]),
            adj_all, pool_d, n0, metric, l_add, 2 * k, max_hops,
        )
    return np.asarray(data_all), np.asarray(adj_all)
