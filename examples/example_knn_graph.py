"""kNN-graph construction three ways (reference: efanna_graph drivers
test_nndescent.cpp / test_kdtree_graph.cpp building the .graph file that
seeds NSG, CNNS/efanna_graph/).

TPU-native: the production large-N path is the cluster join
(models/knn_ivf.py) — k-means slabs, each cluster joined against its M
nearest slabs with one fused MXU kernel pass; contiguous slab reads
instead of nn-descent's scattered gathers (PROGRESS.md gather physics).
"""

import numpy as np

from hnsw_nsg_tpu.models.knn_ivf import knn_graph_ivf
from hnsw_nsg_tpu.models.rptree import knn_graph_rp
from hnsw_nsg_tpu.ops import knn_graph_exact, recall

rng = np.random.default_rng(3)
centers = rng.standard_normal((20, 32)).astype(np.float32)
x = (centers[rng.integers(0, 20, 20_000)]
     + rng.standard_normal((20_000, 32))).astype(np.float32)

gt = np.asarray(knn_graph_exact(x, 10, query_block=4096))

adj_ivf = knn_graph_ivf(x, 10, n_clusters=20, probes=6)
adj_rp = np.asarray(knn_graph_rp(x, 10, n_trees=8))

print(f"cluster-join graph quality: {recall(adj_ivf, gt):.4f}")
print(f"rp-tree      graph quality: {recall(adj_rp, gt):.4f}")
assert recall(adj_ivf, gt) > 0.9

# the graph seeds an NSG build exactly like the efanna .graph file does
from hnsw_nsg_tpu.models.nsg import build_nsg
from hnsw_nsg_tpu.utils.params import NSGBuildConfig

sub = x[:5000]
adj_sub = knn_graph_ivf(sub, 10, n_clusters=8, probes=4)
nsg = build_nsg(sub, adj_sub, NSGBuildConfig(L=20, R=14, C=100))
print("NSG over the joined graph: mean degree",
      float((np.asarray(nsg.adj) >= 0).sum(1).mean()))
