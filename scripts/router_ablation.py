"""Router x cluster-ranking ablation at 1M (VERDICT r3 item 7).

The reference's experiment matrix searches the same per-cluster indexes
under different routers and cluster orderings:
  * faiss-HNSW router over the representatives, ranked by rep hit count
    (CNNS/tests/cluster_hnsw_nsg_search.cpp:141-173);
  * exact (flat) router (experiment_feature/cluster_knn_*);
  * min-representative-distance ordering
    (experiment_feature/sort_by_min_dist.cpp:280-287).

This driver builds ONE cnns_flat index at the bench shape and tabulates
router in {flat, hnsw} x rank_by in {hits, min_dist} at the same nprobe
sweep, so the long-asserted "the flat GEMM router is faster on TPU" claim
gets its 4-row table. Uses bench.py's cached dataset/GT when present.

Usage: [ABL_N=1000000] [ABL_Q=8192] python scripts/router_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_nsg_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

N = int(os.environ.get("ABL_N", 1_000_000))
NQ = int(os.environ.get("ABL_Q", 8192))
K = 10


def main():
    import jax.numpy as jnp
    from hnsw_nsg_tpu.models.cnns import build_cnns
    from hnsw_nsg_tpu.ops import brute_force_topk, recall
    from hnsw_nsg_tpu.utils.params import CNNSConfig

    cache = f"/tmp/bench_data_v2_sift1m_{N}_{NQ}.npz"
    gt_cache = f"/tmp/bench_gt_v2_sift1m_{N}_{NQ}_{K}.npy"
    if os.path.exists(cache):
        z = np.load(cache)
        x, q = z["x"], z["q"]
    else:
        sys.exit(f"run bench.py first to populate {cache}")
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(x), K)
        gt = np.asarray(gt)
        np.save(gt_cache, gt)

    n_clusters = max(N // 1024, 8)
    t0 = time.time()
    idx = build_cnns(
        x, CNNSConfig(n_clusters=n_clusters, m=4, kmeans_iters=12,
                      replicate=True),
        metric="l2", local_index="flat", slab_dtype=jnp.bfloat16,
    )
    print(f"build: {time.time() - t0:.1f}s C={idx.n_clusters} "
          f"maxc={idx.maxc}", flush=True)
    qd = jnp.asarray(q)

    t0 = time.time()
    idx.build_router_hnsw()  # M=32 like faiss IndexHNSWFlat(dim, 32)
    print(f"router hnsw build ({idx.reps.shape[0] * idx.reps.shape[1]} "
          f"reps): {time.time() - t0:.1f}s", flush=True)

    routers = tuple(
        os.environ.get("ABL_ROUTERS", "flat,hnsw").split(",")
    )
    print(f"{'router':8} {'rank_by':9} {'nprobe':6} {'recall@10':9} "
          f"{'qps':>9}", flush=True)
    for router in routers:
        for rank_by in ("hits", "min_dist"):
            for nprobe in (1, 2, 3, 4, 6, 8):
                dd, ii = idx.search(qd, k=K, nprobe=nprobe,
                                    rank_by=rank_by, router=router)
                r = recall(np.asarray(ii), gt)
                ts = []
                for _ in range(5):
                    t0 = time.time()
                    dd, ii = idx.search(qd, k=K, nprobe=nprobe,
                                        rank_by=rank_by, router=router)
                    np.asarray(ii)
                    ts.append(time.time() - t0)
                qps = NQ / sorted(ts)[len(ts) // 2]
                print(f"{router:8} {rank_by:9} {nprobe:6d} {r:9.4f} "
                      f"{qps:9.0f}", flush=True)
                if r >= 0.95:
                    break


if __name__ == "__main__":
    main()
