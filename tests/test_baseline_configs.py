"""Coverage for the BASELINE.md config axes: high-dim (GIST-960 shape) and
inner-product/cosine (GloVe shape) paths through the full engines."""

import numpy as np
import pytest

from hnsw_nsg_tpu.api import Index
from hnsw_nsg_tpu.models.cnns import build_cnns
from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.utils.params import CNNSConfig, HNSWConfig


@pytest.mark.slow
def test_gist_dim_960(rng):
    """960-d vectors (GIST1M shape): distance tiling correctness across a
    non-multiple-of-128 feature dim."""
    x = rng.standard_normal((1500, 960)).astype(np.float32)
    q = rng.standard_normal((16, 960)).astype(np.float32)
    p = Index(space="l2", dim=960)
    p.init_index(1500, M=12, ef_construction=60)
    p.add_items(x, batch_size=800)
    _, gt = brute_force_topk(q, x, 10)
    labels, dists = p.knn_query(q, k=10, ef=80)
    assert recall(labels, np.asarray(gt)) >= 0.9
    # exact distance check at full dim
    true = ((q[0] - x[labels[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], true, rtol=1e-3)


@pytest.mark.slow
def test_glove_style_ip(rng):
    """Inner-product MIPS path (GloVe shape) through HNSW."""
    x = rng.standard_normal((2000, 100)).astype(np.float32)
    q = rng.standard_normal((16, 100)).astype(np.float32)
    p = Index(space="ip", dim=100)
    p.init_index(2000, M=12, ef_construction=60)
    p.add_items(x, batch_size=1000)
    _, gt = brute_force_topk(q, x, 10, metric="ip")
    labels, _ = p.knn_query(q, k=10, ef=100)
    assert recall(labels, np.asarray(gt)) >= 0.85


def test_cnns_ip_metric(rng):
    x = rng.standard_normal((3000, 64)).astype(np.float32)
    q = x[:16] + 0.01 * rng.standard_normal((16, 64)).astype(np.float32)
    idx = build_cnns(
        x, CNNSConfig(n_clusters=8, m=2, kmeans_iters=5), metric="ip"
    )
    _, gt = brute_force_topk(q, x, 10, metric="ip")
    d, i = idx.search(q, k=10, nprobe=8)
    assert recall(np.asarray(i), np.asarray(gt)) > 0.95
