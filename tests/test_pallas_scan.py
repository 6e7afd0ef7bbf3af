"""Fused Pallas grouped-scan kernel vs the XLA sweep (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.ops.pallas_scan import grouped_cluster_topk
from hnsw_nsg_tpu.models.cnns import (
    _grouped_probe_search, build_cnns,
)
from hnsw_nsg_tpu.utils.params import CNNSConfig
from hnsw_nsg_tpu.ops import brute_force_topk, recall


def test_kernel_exactness_vs_xla():
    rng = np.random.default_rng(0)
    c, cap, maxc, d, k = 4, 16, 64, 32, 10
    qv = jnp.asarray(
        rng.standard_normal((c, cap, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    slabs = jnp.asarray(
        rng.standard_normal((c, maxc, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    norms = (np.asarray(slabs, np.float32) ** 2).sum(-1)
    valid = rng.random((c, maxc)) < 0.8
    bias = jnp.asarray(np.where(valid, norms, np.inf).astype(np.float32))
    vals, idx = grouped_cluster_topk(qv, slabs, bias, k, 2.0,
                                     interpret=True)
    dots = jnp.einsum("bcd,bmd->bcm", qv, slabs,
                      preferred_element_type=jnp.float32)
    dist = np.asarray(bias)[:, None, :] - 2.0 * np.asarray(dots)
    vref = np.sort(dist, axis=2)[:, :, :k]
    np.testing.assert_allclose(np.asarray(vals), vref, rtol=1e-5,
                               atol=1e-4)
    iref = np.argsort(dist, axis=2)[:, :, :k]
    ov = np.mean([
        len(set(a) & set(b)) / k
        for a, b in zip(np.asarray(idx).reshape(-1, k),
                        iref.reshape(-1, k))
    ])
    assert ov >= 0.99, ov


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_grouped_search_pallas_matches_xla(metric):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((16, 24)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 16, 8000)]
         + rng.standard_normal((8000, 24))).astype(np.float32)
    q = (centers[rng.integers(0, 16, 96)]
         + rng.standard_normal((96, 24))).astype(np.float32)
    if metric == "ip":
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx = build_cnns(x, CNNSConfig(n_clusters=16, m=2, kmeans_iters=6),
                     metric=metric)
    visit = idx._route(jnp.asarray(q), 6)
    cnorms = (idx.cnorms_c if idx.cnorms_c is not None
              else jnp.zeros(idx.ids_c.shape, jnp.float32))
    args = (jnp.asarray(q), visit, idx.data_c, idx.ids_c, cnorms, 10,
            metric)
    d_x, i_x = _grouped_probe_search(*args, cap=64, block=64,
                                     approx=False, pallas=False)
    d_p, i_p = _grouped_probe_search(*args, cap=64, block=64,
                                     approx=False, pallas=True)
    _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(x), 10,
                             metric=metric)
    r_x = recall(np.asarray(i_x), np.asarray(gt))
    r_p = recall(np.asarray(i_p), np.asarray(gt))
    assert r_p >= r_x - 0.01, (r_p, r_x)
    # f32 slabs: identical arithmetic -> identical results
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-5, atol=1e-4)


def test_gq_kernel_matches_take_path():
    """One-hot in-kernel query gather == explicit jnp.take gather."""
    from hnsw_nsg_tpu.ops.pallas_scan import grouped_cluster_topk_gq
    rng = np.random.default_rng(3)
    c, cap, maxc, d, k, qn = 4, 16, 64, 32, 8, 48
    qc = jnp.asarray(rng.standard_normal((qn, d)).astype(np.float32))
    qidx = np.full((c, cap), -1, np.int32)
    for ci in range(c):
        cnt = rng.integers(1, cap + 1)
        qidx[ci, :cnt] = rng.choice(qn, cnt, replace=False)
    qidx = jnp.asarray(qidx)
    slabs = jnp.asarray(rng.standard_normal((c, maxc, d)).astype(np.float32))
    norms = (np.asarray(slabs) ** 2).sum(-1)
    bias = jnp.asarray(norms.astype(np.float32))
    v_gq, i_gq = grouped_cluster_topk_gq(qc, qidx, slabs, bias, k, 2.0,
                                         interpret=True)
    qv = jnp.where((qidx >= 0)[:, :, None],
                   jnp.take(qc, jnp.where(qidx >= 0, qidx, 0), axis=0), 0)
    v_tk, i_tk = grouped_cluster_topk(qv, slabs, bias, k, 2.0,
                                      interpret=True)
    live = np.asarray(qidx) >= 0
    np.testing.assert_allclose(np.asarray(v_gq)[live],
                               np.asarray(v_tk)[live], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_gq)[live],
                                  np.asarray(i_tk)[live])


def test_gq_dblk_kernel_matches_gq():
    """d-blocked gq kernel (large-d path) == plain gq kernel, including
    d not a multiple of the block (zero-padded contraction)."""
    from hnsw_nsg_tpu.ops.pallas_scan import (
        grouped_cluster_topk_gq, grouped_cluster_topk_gq_dblk,
    )
    rng = np.random.default_rng(5)
    c, cap, maxc, d, k, qn = 4, 16, 64, 40, 8, 48
    qc = jnp.asarray(rng.standard_normal((qn, d)).astype(np.float32))
    qidx = np.full((c, cap), -1, np.int32)
    for ci in range(c):
        cnt = rng.integers(1, cap + 1)
        qidx[ci, :cnt] = rng.choice(qn, cnt, replace=False)
    qidx = jnp.asarray(qidx)
    slabs = jnp.asarray(
        rng.standard_normal((c, maxc, d)).astype(np.float32)
    )
    norms = (np.asarray(slabs) ** 2).sum(-1)
    bias = jnp.asarray(norms.astype(np.float32))
    v_gq, i_gq = grouped_cluster_topk_gq(qc, qidx, slabs, bias, k, 2.0,
                                         interpret=True)
    v_db, i_db = grouped_cluster_topk_gq_dblk(
        qc, qidx, slabs, bias, k, 2.0, dblk=16, interpret=True,
    )
    live = np.asarray(qidx) >= 0
    np.testing.assert_allclose(np.asarray(v_db)[live],
                               np.asarray(v_gq)[live], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_db)[live],
                                  np.asarray(i_gq)[live])


def test_large_d_vmem_fallback(monkeypatch):
    """At large d the gq kernel's VMEM-resident query block exceeds the
    scoped stack (measured: 8192x960 bf16 = 15.7 MB > 16 MB limit at the
    GIST shape) and _grouped_probe_search must select the pre-gathered
    kernel. Forcing the budget to 0 exercises that path at a small shape;
    results must be identical to the gq path (same fused scan)."""
    from hnsw_nsg_tpu.models import cnns as cnns_mod
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 24)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 8, 4000)]
         + rng.standard_normal((4000, 24))).astype(np.float32)
    q = (centers[rng.integers(0, 8, 64)]
         + rng.standard_normal((64, 24))).astype(np.float32)
    idx = build_cnns(x, CNNSConfig(n_clusters=8, m=2, kmeans_iters=4))
    visit = idx._route(jnp.asarray(q), 4)
    cnorms = (idx.cnorms_c if idx.cnorms_c is not None
              else jnp.zeros(idx.ids_c.shape, jnp.float32))
    args = (jnp.asarray(q), visit, idx.data_c, idx.ids_c, cnorms, 10,
            "l2")
    d_gq, i_gq = _grouped_probe_search(*args, cap=64, block=64,
                                       approx=False, pallas=True)
    monkeypatch.setattr(cnns_mod, "_GQ_VMEM_BUDGET", 0)
    d_fb, i_fb = _grouped_probe_search(*args, cap=64, block=64,
                                       approx=False, pallas=True)
    np.testing.assert_array_equal(np.asarray(i_fb), np.asarray(i_gq))
    np.testing.assert_allclose(np.asarray(d_fb), np.asarray(d_gq),
                               rtol=1e-5, atol=1e-4)
