"""uint8 vector storage (L2SpaceI parity, space_l2.h:294-323) and the
metrics/observability utilities."""

import numpy as np
import jax.numpy as jnp

from hnsw_nsg_tpu.models.hnsw import HNSWIndex
from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.utils.metrics import StopW, device_memory_stats, timed
from hnsw_nsg_tpu.utils.params import HNSWConfig


def test_uint8_storage_and_recall(rng):
    x8 = rng.integers(0, 255, (2000, 32)).astype(np.uint8)
    idx = HNSWIndex(32, 2000, HNSWConfig(M=12, ef_construction=60),
                    dtype=jnp.uint8)
    idx.add_items(x8, batch_size=1000)
    assert idx.data.dtype == jnp.uint8  # half the HBM of f32
    q = x8[:16].astype(np.float32)
    _, gt = brute_force_topk(
        jnp.asarray(q), jnp.asarray(x8, jnp.float32), 10
    )
    lab, _ = idx.knn_query(q, k=10, ef=60)
    assert recall(lab, np.asarray(gt)) >= 0.95


def test_search_metrics_counters(rng):
    x = rng.standard_normal((500, 16)).astype(np.float32)
    idx = HNSWIndex(16, 500, HNSWConfig(M=8, ef_construction=40))
    idx.add_items(x)
    h0, d0 = idx.metric_hops, idx.metric_distance_computations
    idx.knn_query(x[:8], k=5, ef=30)
    assert idx.metric_hops > h0
    assert idx.metric_distance_computations > d0


def test_stopwatch_and_memory():
    w = StopW()
    assert w.micros() >= 0
    stats = device_memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}
    with timed() as t:
        sum(range(1000))
    assert t.elapsed >= 0
