"""Construction-beam tuning at the insert shape (VERDICT r4 item 6).

Round 4 fused reverse-edge insertion and left the efC beam as ~60% of
steady insert batch time. This script isolates that beam: it loads a
built 1M index (BENCH_SAVE_INDEX artifact) and times
``beam_search_chunked`` at the exact insert shape — batch 4096 queries
(perturbed dataset rows, i.e. realistic new points), width=
ef_construction=100, level-0 adjacency — across the (expand x
chunk_hops) grid, reporting ms/batch and the implied steady insert
points/s if the beam were the whole batch (lower bound on speedup).

The trade: larger `expand` lowers the sequential hop count (each hop
expands E frontier nodes -> E*R candidates on the MXU together) at the
cost of more total distance evals; larger `chunk_hops` amortizes the
per-chunk host convergence fetch (a tunnel round-trip) against wasted
in-chunk hops after convergence.

Usage: [TUNE_INDEX=/tmp/hnsw1m.npz] [TUNE_B=4096]
       python scripts/insert_beam_tune.py
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

B = int(os.environ.get("TUNE_B", 4096))
WIDTH = int(os.environ.get("TUNE_WIDTH", 100))
REPS = 3


def main():
    from hnsw_nsg_tpu.models.beam import beam_search_chunked
    from hnsw_nsg_tpu.models.hnsw import HNSWIndex

    path = os.environ.get("TUNE_INDEX", "/tmp/hnsw1m.npz")
    idx = HNSWIndex.load(path)
    rng = np.random.default_rng(11)
    base = np.asarray(idx.data[rng.integers(0, idx.n, B)])
    q = jnp.asarray(
        base + rng.standard_normal(base.shape).astype(np.float32)
    )
    cur = jnp.full((B,), idx.ep, jnp.int32)
    # descend upper levels once (greedy), exactly like _insert_batch
    from hnsw_nsg_tpu.models.beam import greedy_descent
    for lvl in range(idx.max_level, 0, -1):
        cur, _ = greedy_descent(
            q, idx.data, idx.norms, idx._adj_at(lvl), cur,
            metric=idx.metric,
        )
    cur = jax.block_until_ready(cur)
    print(f"index n={idx.n} B={B} width={WIDTH} (level-0 beam only)",
          flush=True)
    print(f"{'expand':6} {'chunk':5} {'ms/batch':>9} {'hops(med/max)':>13} "
          f"{'evals(med)':>10} {'pts/s if beam-only':>18}", flush=True)
    for expand in (2, 4, 8):
        for chunk_hops in (16, 32, 64):
            def run():
                return beam_search_chunked(
                    q, idx.data, idx.norms, idx.adj0, cur[:, None],
                    width=WIDTH, metric=idx.metric, max_hops=256,
                    expand=expand, chunk_hops=chunk_hops,
                )
            res = run()  # compile + correctness handle
            jax.block_until_ready(res.dists)
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                r2 = run()
                jax.block_until_ready(r2.dists)
                ts.append(time.time() - t0)
            dt = sorted(ts)[len(ts) // 2]
            hops = np.asarray(res.hops)
            evals = np.asarray(res.evals)
            print(
                f"{expand:6d} {chunk_hops:5d} {dt * 1e3:9.0f} "
                f"{int(np.median(hops)):6d}/{hops.max():4d} "
                f"{int(np.median(evals)):10d} {B / dt:18.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
