"""Full CNNS pipeline (reference: CNNS/tests/cluster_IVF_nndescent.cpp +
nndescent_nsg.cpp + cluster_hnsw_nsg_search.cpp, as a library flow)."""

import numpy as np

from hnsw_nsg_tpu.models.cnns import build_cnns
from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.utils.params import CNNSConfig

rng = np.random.default_rng(5)
centers = rng.standard_normal((30, 64)).astype(np.float32) * 3
x = (centers[rng.integers(0, 30, 30000)]
     + rng.standard_normal((30000, 64))).astype(np.float32)
q = (centers[rng.integers(0, 30, 100)]
     + rng.standard_normal((100, 64))).astype(np.float32)

idx = build_cnns(x, CNNSConfig(n_clusters=32, m=4, kmeans_iters=10))
dists, ids = idx.search(q, k=10, nprobe=4)

_, gt = brute_force_topk(q, x, 10)
print("recall@10:", recall(np.asarray(ids), np.asarray(gt)))
