"""uint8 vector storage (L2SpaceI parity, space_l2.h:294-323) and the
metrics/observability utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

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


class TestUint8CNNS:
    """uint8 space through the CNNS pipeline: int8 slabs (x-128), exact
    integer math (sift_1b.cpp:243-344 uint8 L2SpaceI analogue)."""

    def test_int8_slabs_match_f32(self):
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.utils.params import CNNSConfig
        from hnsw_nsg_tpu.ops import brute_force_topk, recall

        rng = np.random.default_rng(5)
        centers = rng.integers(40, 215, (16, 32))
        xa = rng.integers(0, 16, 20_000)
        x = np.clip(
            centers[xa] + rng.normal(0, 20, (20_000, 32)), 0, 255
        ).astype(np.uint8)
        q = np.clip(
            centers[rng.integers(0, 16, 96)]
            + rng.normal(0, 20, (96, 32)), 0, 255
        ).astype(np.uint8)

        xf = x.astype(np.float32)
        qf = q.astype(np.float32)
        i8 = build_cnns(xf, CNNSConfig(n_clusters=16, m=2, kmeans_iters=6),
                        slab_dtype=jnp.int8)
        f32 = build_cnns(xf, CNNSConfig(n_clusters=16, m=2, kmeans_iters=6))
        assert i8.qshift == 128.0 and i8.data_c.dtype == jnp.int8

        d8, ids8 = i8.search(qf, k=10, nprobe=6)
        df, idsf = f32.search(qf, k=10, nprobe=6)
        _, gt = brute_force_topk(jnp.asarray(qf), jnp.asarray(xf), 10)
        r8 = recall(np.asarray(ids8), np.asarray(gt))
        rf = recall(np.asarray(idsf), np.asarray(gt))
        # int8 math is exact on integer-valued data -> identical recall
        assert r8 >= rf - 1e-6, (r8, rf)
        # distances are exact integer L2^2
        d8 = np.asarray(d8)
        for r in range(8):
            for j in range(10):
                if ids8[r, j] >= 0:
                    ref = ((qf[r] - xf[ids8[r, j]]) ** 2).sum()
                    np.testing.assert_allclose(d8[r, j], ref, rtol=1e-6)

    def test_int8_requires_l2(self):
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        rng = np.random.default_rng(6)
        x = rng.random((2000, 16)).astype(np.float32)
        with pytest.raises(ValueError, match="l2"):
            build_cnns(x, CNNSConfig(n_clusters=8, m=1, kmeans_iters=3),
                       metric="ip", slab_dtype=jnp.int8)


class TestQuantizedInt8CNNS:
    """int8 slabs over arbitrary (non-integral) f32 data: per-dim shift +
    global scale quantization. Unlike the uint8 space this carries
    quantization noise in the ranking — the gate is recall within a point
    of the f32 scan and distances back in metric units."""

    def test_quantized_slabs_near_f32(self):
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.utils.params import CNNSConfig
        from hnsw_nsg_tpu.ops import brute_force_topk, recall

        # realistic dim (the mode targets bandwidth-bound large-d configs
        # like GIST-960; int8 noise averages out over dims — at toy d=24
        # the same noise costs several recall points)
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((16, 96)).astype(np.float32) * 2
        x = (centers[rng.integers(0, 16, 20_000)]
             + rng.standard_normal((20_000, 96))).astype(np.float32)
        q = (centers[rng.integers(0, 16, 96)]
             + rng.standard_normal((96, 96)).astype(np.float32))

        i8 = build_cnns(x, CNNSConfig(n_clusters=16, m=2, kmeans_iters=6),
                        slab_dtype=jnp.int8)
        f32 = build_cnns(x, CNNSConfig(n_clusters=16, m=2, kmeans_iters=6))
        assert i8.qscale != 1.0 and i8.data_c.dtype == jnp.int8
        assert np.asarray(i8.qshift).shape == (96,)

        d8, ids8 = i8.search(q, k=10, nprobe=6)
        df, idsf = f32.search(q, k=10, nprobe=6)
        _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(x), 10)
        r8 = recall(np.asarray(ids8), np.asarray(gt))
        rf = recall(np.asarray(idsf), np.asarray(gt))
        # contract: <= ~3 recall points at d>=96 for 2x scan bandwidth
        # (slab-side int8 noise only; queries stay bf16 — q_round=False)
        assert r8 >= rf - 0.035, (r8, rf)
        # distances rescaled to metric units (quantization-level tolerance)
        d8 = np.asarray(d8)
        ids8 = np.asarray(ids8)
        for r in range(8):
            ref = ((q[r] - x[ids8[r, 0]]) ** 2).sum()
            np.testing.assert_allclose(d8[r, 0], ref, rtol=0.2, atol=0.5)

    def test_quantized_save_load(self, tmp_path):
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.cnns import CNNSIndex, build_cnns
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        rng = np.random.default_rng(9)
        x = rng.standard_normal((2000, 16)).astype(np.float32)
        idx = build_cnns(x, CNNSConfig(n_clusters=8, m=2, kmeans_iters=4),
                         slab_dtype=jnp.int8)
        p = str(tmp_path / "q.npz")
        idx.save(p)
        idx2 = CNNSIndex.load(p)
        assert idx2.qscale == idx.qscale
        np.testing.assert_allclose(np.asarray(idx2.qshift),
                                   np.asarray(idx.qshift))
        q = x[:8]
        d1, i1 = idx.search(q, k=5, nprobe=4)
        d2, i2 = idx2.search(q, k=5, nprobe=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
