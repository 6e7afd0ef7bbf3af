"""HNSW insert-throughput A/B: adj0_d link-distance cache on vs off.

VERDICT r3 item 3: the adj0_d cache (models/hnsw.py) landed in round 3
explicitly to kill the reverse-insert link-distance recompute — the
profile-named largest insert cost at 1M — but no before/after number was
ever taken. This script builds the same index twice at BENCH-shaped data
(N defaults to 200k so the A/B fits a few chip-minutes) with
HNSWConfig.link_dist_cache=True and =False (the default; the flag routes
_reverse_insert through the gather path), reporting warm points/s for
each, plus an HNSW_PROFILE-style phase breakdown of the last batches.

Reference counterpart: parallel addPoint over OpenMP threads
(hnswlib/tests/cpp/sift_1b.cpp:303-344); here insertion is bulk-
synchronous batched rounds, so throughput = batch size / round latency.

Usage: [AB_N=200000] [AB_BATCH=4096] python scripts/insert_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hnsw_nsg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

N = int(os.environ.get("AB_N", 200_000))
BATCH = int(os.environ.get("AB_BATCH", 4096))
D = 128


def make_data(n, d, seed=0):
    rng = np.random.default_rng(seed)
    n_centers = max(n // 2500, 8)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    assign = rng.integers(0, n_centers, n)
    x = centers[assign] + rng.standard_normal((n, d), dtype=np.float32)
    return x


def build(x, use_cache: bool, accel: bool = False):
    from hnsw_nsg_tpu.models.hnsw import HNSWIndex
    from hnsw_nsg_tpu.utils.params import HNSWConfig
    import jax

    n = x.shape[0]
    idx = HNSWIndex(
        D, n,
        HNSWConfig(M=16, ef_construction=100, link_dist_cache=use_cache),
        "l2",
    )
    # warmup/compile phase: first quarter (compiles every bucket size)
    n_warm = n // 4
    t0 = time.time()
    idx.add_items(x[:n_warm], batch_size=BATCH, repair=False, accel=accel)
    jax.block_until_ready(idx.adj0)
    warm_s = time.time() - t0
    # steady state: remaining three quarters
    t0 = time.time()
    idx.add_items(x[n_warm:], batch_size=BATCH, repair=False, accel=accel)
    jax.block_until_ready(idx.adj0)
    steady_s = time.time() - t0
    t0 = time.time()
    idx.repair_connectivity()
    repair_s = time.time() - t0
    return idx, warm_s, steady_s, repair_s


def main():
    global BATCH
    x = make_data(N, D)
    cases = (
        ("cache=ON ", True, False),
        ("cache=OFF", False, False),
        ("cache=ON+accel", True, True),
    )
    base = BATCH
    for b in (base, base * 4):
        BATCH = b
        # batch-size scaling probes dispatch amortization: only the
        # default configuration repeats at the bigger batch
        _run_cases(x, cases if b == base else cases[:1])


def _run_cases(x, cases):
    for label, use_cache, accel in cases:
        t0 = time.time()
        idx, warm_s, steady_s, repair_s = build(x, use_cache, accel)
        total = time.time() - t0
        n_steady = N - N // 4
        print(
            f"[{label}] N={N} batch={BATCH}: total={total:.1f}s "
            f"warm_quarter={warm_s:.1f}s "
            f"steady={steady_s:.1f}s ({n_steady / steady_s:.0f} pts/s warm) "
            f"repair={repair_s:.1f}s",
            flush=True,
        )
        del idx


if __name__ == "__main__":
    main()
