"""Post-fusion traversal hop budget at the 1M bench shape (VERDICT r3 #2).

Decomposes one record-layout traversal hop (models/records.py _scan_hops)
into its device components, each timed as an n_hops lax.scan so the
numbers are per-hop ON-DEVICE costs (not per-dispatch ones — conflating
those is exactly what produced round 2's bogus "0.75 us/row gather
floor"):

  gather        jnp.take of [Q, E] record rows (S*128 int32 words each)
  gather+dot    + _record_dists (int8 unpack + 4 bf16 einsums + FastL2)
  full (kernel) + fused merge+select Pallas pass  == the production hop
  full (XLA)    + the unfused XLA merge chain     == the pre-round-3 hop

Also reports per-dispatch overhead (time of an empty jit call) so the
published ceiling separates device work from host dispatch.

Needs a saved 1M index (BENCH_SAVE_INDEX from bench.py's hnsw arm):
  HOP_INDEX=/tmp/hnsw1m.npz [HOP_Q=8192] python scripts/hop_budget.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_nsg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

N_HOPS = 30
REPS = 5


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    from hnsw_nsg_tpu.models.hnsw import HNSWIndex
    from hnsw_nsg_tpu.models.records import (
        _layout, _record_dists, _scan_hops, _split_query, init_retset,
        _select_frontier,
    )
    from hnsw_nsg_tpu.ops.distance import gathered_dists

    path = os.environ.get("HOP_INDEX", "/tmp/hnsw1m.npz")
    qn = int(os.environ.get("HOP_Q", 8192))
    ef = int(os.environ.get("HOP_EF", 64))
    idx = HNSWIndex.load(path)
    if idx._records is None:
        t0 = time.time()
        idx.build_accel()
        print(f"build_accel: {time.time() - t0:.1f}s", flush=True)
    g = idx._records
    nw, s = _layout(g.r, g.d)
    rng = np.random.default_rng(7)
    # bench-shaped queries: perturbed dataset rows
    base = np.asarray(idx.data[rng.integers(0, idx.n, qn)])
    q = jnp.asarray(
        base + rng.standard_normal(base.shape).astype(np.float32)
    )
    q_bf = _split_query(q, g.d, nw)
    cur = idx._entry_points(q)
    init_ids = cur[:, None]
    init_d = gathered_dists(q, idx.data, init_ids, idx.metric, idx.norms)
    r_d, r_i, r_e = init_retset(init_d, init_ids, ef)
    sel_ids, sel_valid, r_e = _select_frontier(r_i, r_e, 1)
    hops = jnp.zeros((qn,), jnp.int32)
    evals = jnp.zeros((qn,), jnp.int32)

    row_bytes = s * 128 * 4
    print(f"shape: Q={qn} ef={ef} R={g.r} d={g.d} row={row_bytes} B "
          f"N={idx.n}", flush=True)

    # per-dispatch overhead: an empty-ish program
    f_nop = jax.jit(lambda a: a + 1)
    one = jnp.zeros((8,), jnp.int32)
    disp = timed(lambda a: np.asarray(f_nop(a)), one)
    print(f"dispatch+fetch overhead: {disp * 1e3:.1f} ms", flush=True)

    rows = g.rows

    # rows/q_bf ride as ARGUMENTS, not closure captures: a captured
    # device array is embedded in the lowered program as a constant and
    # shipped to the remote compiler (4.3 GB through the tunnel)
    @jax.jit
    def gather_only(sel0, rows):
        def body(carry, _):
            sel, acc = carry
            rows_g = jnp.take(rows, sel, axis=0)  # [Q, 1, S, 128]
            # derive the next frontier from the gathered data so the
            # compiler cannot hoist/parallelize the chain (data dependence
            # mirrors the real hop's)
            nxt = jnp.abs(rows_g[:, 0, 0, :1]) % jnp.int32(rows.shape[0] - 1)
            acc = acc + rows_g[:, 0, -1, -1]
            return (nxt, acc), None
        (sel, acc), _ = jax.lax.scan(
            body, (sel0, jnp.zeros((qn,), jnp.int32)), None, length=N_HOPS
        )
        return acc

    @jax.jit
    def gather_dot(sel0, rows, q_bf):
        def body(carry, _):
            sel, acc = carry
            rows_g = jnp.take(rows, sel, axis=0)
            cd, ci = _record_dists(q_bf, rows_g, g.scale, g.r, nw,
                                   idx.metric)
            j = jnp.argmin(cd, axis=1)
            nxt = jnp.take_along_axis(ci, j[:, None], axis=1)
            nxt = jnp.where(nxt >= 0, nxt, 0)
            acc = acc + jnp.min(cd, axis=1)
            return (nxt, acc), None
        (sel, acc), _ = jax.lax.scan(
            body, (sel0, jnp.zeros((qn,), jnp.float32)), None,
            length=N_HOPS,
        )
        return acc

    sel0 = jnp.where(sel_ids >= 0, sel_ids, 0)
    t_gather = timed(gather_only, sel0, rows)
    t_gdot = timed(gather_dot, sel0, rows, q_bf)

    def full(kernel):
        return _scan_hops(
            q_bf, rows, g.scale, r_d, r_i, r_e, sel_ids, sel_valid,
            hops, evals, expand=1, n_hops=N_HOPS, metric=idx.metric,
            r=g.r, nw=nw, use_kernel=kernel,
        )

    t_full_k = timed(full, True)
    t_full_x = timed(full, False)

    gb = qn * row_bytes * N_HOPS / 1e9
    print(
        f"per-hop budget (Q={qn}, {N_HOPS}-hop scans, median of {REPS}):\n"
        f"  gather-only       {t_gather / N_HOPS * 1e3:7.2f} ms/hop "
        f"({gb / t_gather:.0f} GB/s effective)\n"
        f"  gather+dot        {t_gdot / N_HOPS * 1e3:7.2f} ms/hop\n"
        f"  full hop (fused)  {t_full_k / N_HOPS * 1e3:7.2f} ms/hop "
        f"(merge+select {(t_full_k - t_gdot) / N_HOPS * 1e3:.2f})\n"
        f"  full hop (XLA)    {t_full_x / N_HOPS * 1e3:7.2f} ms/hop "
        f"(merge+select {(t_full_x - t_gdot) / N_HOPS * 1e3:.2f})",
        flush=True,
    )
    per_row_ns = t_gather / N_HOPS / qn * 1e9
    print(f"  gather cost/row: {per_row_ns:.0f} ns ({row_bytes} B rows)",
          flush=True)


if __name__ == "__main__":
    main()
