"""k-means, CNNS pipeline (flat + nsg local), hybrid index."""

import numpy as np
import pytest

from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.models.kmeans import kmeans
from hnsw_nsg_tpu.models.cnns import CNNSIndex, build_cnns
from hnsw_nsg_tpu.models.hybrid import HybridHNSWNSG
from hnsw_nsg_tpu.utils.params import (
    CNNSConfig, HNSWConfig, NSGBuildConfig, NNDescentConfig,
)


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((20, 16)).astype(np.float32) * 4
    assign = rng.integers(0, 20, 4000)
    x = (centers[assign] + rng.standard_normal((4000, 16))).astype(np.float32)
    q = (centers[rng.integers(0, 20, 48)]
         + rng.standard_normal((48, 16))).astype(np.float32)
    return x, q


class TestKMeans:
    def test_partitions_clustered_data(self, clustered):
        x, _ = clustered
        cents, assign = kmeans(x, 20, iters=15, seed=0, chunk=4000)
        assign = np.asarray(assign)
        sizes = np.bincount(assign, minlength=20)
        assert (sizes > 0).all()
        # within-cluster distance far below global mean distance
        cents = np.asarray(cents)
        within = np.mean(((x - cents[assign]) ** 2).sum(-1))
        total = np.mean(((x - x.mean(0)) ** 2).sum(-1))
        assert within < total * 0.5

    def test_k_greater_than_heads(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((50, 4)).astype(np.float32)
        cents, assign = kmeans(x, 8, iters=5, chunk=50)
        assert cents.shape == (8, 4)
        assert np.asarray(assign).max() < 8


class TestCNNSFlat:
    def test_recall_full_probe(self, clustered):
        """Probing every cluster with flat local search == brute force."""
        x, q = clustered
        idx = build_cnns(x, CNNSConfig(n_clusters=16, m=3, kmeans_iters=10))
        d, i = idx.search(q, k=10, nprobe=16)
        _, gt = brute_force_topk(q, x, 10)
        assert recall(np.asarray(i), np.asarray(gt)) > 0.999

    def test_recall_partial_probe(self, clustered):
        x, q = clustered
        idx = build_cnns(x, CNNSConfig(n_clusters=16, m=3, kmeans_iters=10))
        d, i = idx.search(q, k=10, nprobe=4)
        _, gt = brute_force_topk(q, x, 10)
        r = recall(np.asarray(i), np.asarray(gt))
        assert r > 0.85, f"nprobe=4 recall {r}"

    def test_save_load(self, clustered, tmp_path):
        x, q = clustered
        idx = build_cnns(x, CNNSConfig(n_clusters=8, m=2, kmeans_iters=5))
        p = str(tmp_path / "cnns.npz")
        idx.save(p)
        idx2 = CNNSIndex.load(p)
        d1, i1 = idx.search(q[:8], k=5, nprobe=4)
        d2, i2 = idx2.search(q[:8], k=5, nprobe=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestCNNSNsg:
    @pytest.mark.slow
    def test_nsg_local_recall(self, clustered):
        x, q = clustered
        cfg = CNNSConfig(
            n_clusters=8, m=3, kmeans_iters=10,
            nndescent=NNDescentConfig(K=16),
            nsg=NSGBuildConfig(L=20, R=12, C=80),
        )
        idx = build_cnns(x, cfg, local_index="nsg")
        d, i = idx.search(q, k=10, nprobe=4, l_search=64)
        _, gt = brute_force_topk(q, x, 10)
        r = recall(np.asarray(i), np.asarray(gt))
        assert r > 0.8, f"nsg-local recall {r}"


class TestHybrid:
    @pytest.mark.slow  # covered faster end-to-end by test_cli hybrid e2e
    def test_build_and_search(self, clustered):
        x, q = clustered
        hy = HybridHNSWNSG(
            16, 4000, HNSWConfig(M=12, ef_construction=60),
            NSGBuildConfig(L=20, R=14, C=100),
        )
        hy.add_points(x, batch_size=2000)
        hy.build_nsg_layer()
        _, gt = brute_force_topk(q, x, 10)
        labels64, _ = hy.search_knn(q, k=10, ef=64)
        labels256, _ = hy.search_knn(q, k=10, ef=256)
        r64 = recall(labels64, np.asarray(gt))
        r256 = recall(labels256, np.asarray(gt))
        # ef-sweep shape: locality-biased init costs recall at small ef on
        # clustered data, converges high (reference behaves the same way)
        assert r64 > 0.6, f"hybrid recall@ef64 {r64}"
        assert r256 > 0.95, f"hybrid recall@ef256 {r256}"

    def test_search_before_build_raises(self, clustered):
        x, q = clustered
        hy = HybridHNSWNSG(16, 100)
        hy.add_points(x[:100])
        with pytest.raises(RuntimeError, match="build_nsg_layer"):
            hy.search_knn(q[:2], k=1)

    @pytest.mark.slow  # persistence is covered fast by TestCNNS save/load
    def test_save_load(self, clustered, tmp_path):
        x, q = clustered
        hy = HybridHNSWNSG(
            16, 1000, HNSWConfig(M=8, ef_construction=40),
            NSGBuildConfig(L=16, R=10, C=60),
        )
        hy.add_points(x[:1000], batch_size=1000)
        hy.build_nsg_layer()
        prefix = str(tmp_path / "hy")
        hy.save(prefix)
        hy2 = HybridHNSWNSG.load(prefix)
        l1, _ = hy.search_knn(q[:8], k=5, ef=32)
        l2, _ = hy2.search_knn(q[:8], k=5, ef=32)
        np.testing.assert_array_equal(l1, l2)


class TestGroupedFlat:
    """Cluster-major grouped scan == per-query slot scan (with exact
    spill handling for capacity overflow)."""

    def test_grouped_matches_per_query(self, clustered):
        x, q = clustered
        idx = build_cnns(x, CNNSConfig(n_clusters=16, m=3, kmeans_iters=10))
        assert idx.data_c.shape[0] % 64 == 0  # slab count padded
        _, gt = brute_force_topk(q, x, 10)
        for nprobe in (4, 16):
            d1, i1 = idx.search(q, k=10, nprobe=nprobe, group=False)
            d2, i2 = idx.search(q, k=10, nprobe=nprobe, group=True)
            r1 = recall(np.asarray(i1), np.asarray(gt))
            r2 = recall(np.asarray(i2), np.asarray(gt))
            assert r2 >= r1 - 0.015, (nprobe, r1, r2)
            com = np.asarray(i1[:, 0]) == np.asarray(i2[:, 0])
            np.testing.assert_allclose(
                np.asarray(d1)[com, 0], np.asarray(d2)[com, 0], rtol=1e-4
            )

    def test_multipass_beyond_cap_ceiling_no_probe_drops(self):
        """Demand beyond the grouped kernel's 512 cap ceiling must chunk
        into multiple passes instead of silently dropping probes (round-5
        uniform1m: recall saturated at 0.487 from nprobe=64 on because
        ~half the probe pairs overflowed). Uniform data + nprobe spanning
        most clusters: every cluster is probed by ~Q*npr/C >> cap
        queries; the multi-pass result must match the exact per-query
        path."""
        rng = np.random.default_rng(5)
        x = rng.standard_normal((4000, 16)).astype(np.float32)
        q = rng.standard_normal((4096, 16)).astype(np.float32)
        idx = build_cnns(x, CNNSConfig(n_clusters=8, m=2, kmeans_iters=6))
        c = idx.data_c.shape[0]
        nprobe = min(8, idx.n_real)
        # demand check: this shape must actually exceed the ceiling
        assert 2 * q.shape[0] * nprobe > 512 * c, (q.shape[0], nprobe, c)
        d1, i1 = idx.search(q, k=10, nprobe=nprobe, group=False)
        d2, i2 = idx.search(q, k=10, nprobe=nprobe, group=True)
        i1, i2 = np.asarray(i1), np.asarray(i2)
        # same probes scanned -> identical result sets (order-stable
        # merges both sides; distances equal where ids agree)
        assert (np.sort(i1, axis=1) == np.sort(i2, axis=1)).mean() > 0.999
        com = i1[:, 0] == i2[:, 0]
        np.testing.assert_allclose(
            np.asarray(d1)[com, 0], np.asarray(d2)[com, 0], rtol=1e-4
        )


class TestReplicate:
    """Boundary replication into dead pad slots (CNNSConfig.replicate):
    recall-per-probe rises at zero extra memory/scan cost; results stay
    duplicate-free via the merge dedup."""

    @pytest.fixture(scope="class")
    def pair(self, clustered):
        x, q = clustered
        base = build_cnns(
            x, CNNSConfig(n_clusters=16, m=3, kmeans_iters=10)
        )
        rep = build_cnns(
            x, CNNSConfig(n_clusters=16, m=3, kmeans_iters=10,
                          replicate=True)
        )
        return x, q, base, rep

    def test_replicas_fill_pad_slots(self, pair):
        x, _, base, rep = pair
        ids0 = np.asarray(base.ids_c)
        ids1 = np.asarray(rep.ids_c)
        assert (ids1 >= 0).sum() > (ids0 >= 0).sum()
        # every point still present, each id at most twice, never twice
        # in the same slab
        counts = np.bincount(ids1[ids1 >= 0], minlength=x.shape[0])
        assert counts.min() >= 1 and counts.max() <= 2
        for row in ids1:
            rr = row[row >= 0]
            assert len(np.unique(rr)) == len(rr)
        # memory identical: same slab tensor shape/dtype
        assert rep.data_c.shape == base.data_c.shape
        assert rep.data_c.dtype == base.data_c.dtype

    @pytest.mark.parametrize("group", [False, True])
    def test_recall_improves_no_duplicates(self, pair, group):
        x, q, base, rep = pair
        _, gt = brute_force_topk(q, x, 10)
        gt = np.asarray(gt)
        for nprobe in (1, 2):
            _, i0 = base.search(q, k=10, nprobe=nprobe, group=group)
            _, i1 = rep.search(q, k=10, nprobe=nprobe, group=group)
            i1 = np.asarray(i1)
            for row in i1:
                rr = row[row >= 0]
                assert len(set(rr.tolist())) == len(rr)
            assert (recall(i1, gt)
                    >= recall(np.asarray(i0), gt) - 0.005)

    def test_full_probe_still_exact(self, pair):
        x, q, _, rep = pair
        d, i = rep.search(q, k=10, nprobe=16)
        _, gt = brute_force_topk(q, x, 10)
        assert recall(np.asarray(i), np.asarray(gt)) > 0.999

    def test_save_load_keeps_flag(self, pair, tmp_path):
        x, q, _, rep = pair
        p = str(tmp_path / "rep.npz")
        rep.save(p)
        idx2 = CNNSIndex.load(p)
        assert idx2.replicated
        _, i = idx2.search(q, k=10, nprobe=2)
        _, gt = brute_force_topk(q, x, 10)
        assert recall(np.asarray(i), np.asarray(gt)) > 0.9

    def test_requires_flat_local(self, clustered):
        x, _ = clustered
        with pytest.raises(ValueError):
            build_cnns(
                x, CNNSConfig(n_clusters=16, replicate=True),
                local_index="nsg",
            )


class TestSpill:
    """Host-spill search under an HBM budget (the cgroup-harness analogue,
    CNNS/script/test_with_cgroup.sh + the lazy pipeline driver)."""

    def test_budgeted_matches_resident_and_respects_budget(self):
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.cnns import build_cnns, _flat_probe_search
        from hnsw_nsg_tpu.models.spill import SpillCNNSIndex
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        rng = np.random.default_rng(11)
        centers = rng.standard_normal((32, 32)).astype(np.float32) * 2.5
        xa = rng.integers(0, 32, 20_000)
        x = (centers[xa]
             + rng.standard_normal((20_000, 32))).astype(np.float32)
        qa = rng.integers(0, 32, 128)
        q = (centers[qa]
             + rng.standard_normal((128, 32))).astype(np.float32)
        idx = build_cnns(x, CNNSConfig(n_clusters=48, m=2, kmeans_iters=6))

        budget = 10 * idx.data_c[0].nbytes  # forces multiple groups
        sp = SpillCNNSIndex(idx, hbm_budget_bytes=budget, group_pad=4)
        sd, si = sp.search(q, k=10, nprobe=6)

        visit = idx._route(jnp.asarray(q), 6, "hits")
        rd, ri = _flat_probe_search(
            jnp.asarray(q), visit, idx.data_c, idx.ids_c, idx.cnorms_c,
            10, idx.metric,
        )
        np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(sd), np.asarray(rd), rtol=1e-5, atol=1e-4
        )
        assert sp.stats.transfer_rounds >= 2
        assert sp.stats.peak_group_bytes <= budget
        # recall sanity against the exact oracle
        _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(x), 10)
        assert recall(np.asarray(si), np.asarray(gt)) > 0.85

    def test_replicated_spill_matches_resident_search(self):
        """Replicated indexes hold boundary points in two slabs; the spill
        search must carry 2k candidates and dedup like the resident
        CNNSIndex.search — without it, duplicate ids eat top-k slots and
        recall FALLS as nprobe grows (the round-4 bench-smoke bug)."""
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.models.spill import SpillCNNSIndex
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        rng = np.random.default_rng(13)
        centers = rng.standard_normal((16, 24)).astype(np.float32) * 2.0
        xa = rng.integers(0, 16, 12_000)
        x = (centers[xa]
             + rng.standard_normal((12_000, 24))).astype(np.float32)
        q = (centers[rng.integers(0, 16, 96)]
             + rng.standard_normal((96, 24))).astype(np.float32)
        idx = build_cnns(
            x, CNNSConfig(n_clusters=24, m=2, kmeans_iters=6,
                          replicate=True),
        )
        assert idx.replicated
        budget = 8 * idx.data_c[0].nbytes
        sp = SpillCNNSIndex(idx, hbm_budget_bytes=budget, group_pad=4)
        sd, si = sp.search(q, k=10, nprobe=6)
        rd, ri = idx.search(q, k=10, nprobe=6)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(sd), np.asarray(rd), rtol=1e-5, atol=1e-4
        )
        si_np = np.asarray(si)
        assert all(
            len(np.unique(row[row >= 0])) == (row >= 0).sum()
            for row in si_np
        ), "duplicate ids in deduped spill results"
        assert sp.stats.transfer_rounds >= 2

    def test_budget_too_small_raises(self):
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.models.spill import SpillCNNSIndex
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        rng = np.random.default_rng(12)
        x = rng.standard_normal((2_000, 16)).astype(np.float32)
        idx = build_cnns(x, CNNSConfig(n_clusters=8, m=1, kmeans_iters=3))
        with pytest.raises(ValueError):
            SpillCNNSIndex(idx, hbm_budget_bytes=1, group_pad=4)


class TestRouterAndLocalAblations:
    """Router x local-index ablation matrix
    (experiment_feature/cluster_hnsw_hnsw_search.cpp:129-265)."""

    @pytest.fixture(scope="class")
    def clustered(self):
        rng = np.random.default_rng(31)
        centers = rng.standard_normal((24, 24)).astype(np.float32) * 2.0
        xa = rng.integers(0, 24, 12_000)
        x = (centers[xa]
             + rng.standard_normal((12_000, 24))).astype(np.float32)
        qa = rng.integers(0, 24, 96)
        q = (centers[qa]
             + rng.standard_normal((96, 24))).astype(np.float32)
        import jax.numpy as jnp
        _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(x), 10)
        return x, q, np.asarray(gt)

    def test_hnsw_router_matches_flat_router(self, clustered):
        x, q, gt = clustered
        idx = build_cnns(
            x, CNNSConfig(n_clusters=24, m=2, kmeans_iters=6)
        )
        df, i_flat = idx.search(q, k=10, nprobe=6, router="flat")
        dh, i_hnsw = idx.search(q, k=10, nprobe=6, router="hnsw")
        r_flat = recall(np.asarray(i_flat), gt)
        r_hnsw = recall(np.asarray(i_hnsw), gt)
        # the HNSW router walks the same representative set the flat GEMM
        # scans; routing quality must be comparable
        assert r_hnsw >= r_flat - 0.05, (r_hnsw, r_flat)
        assert r_hnsw > 0.85

    @pytest.mark.slow  # ablation-completeness path, not a production gate
    def test_hnsw_local_index(self, clustered):
        x, q, gt = clustered
        idx = build_cnns(
            x, CNNSConfig(n_clusters=16, m=2, kmeans_iters=6),
            local_index="hnsw",
        )
        assert idx.local_index == "hnsw"
        d, ids = idx.search(q, k=10, nprobe=6, l_search=64)
        r = recall(np.asarray(ids), gt)
        assert r > 0.8, r


class TestRouteQuality:
    """Regression gate on the routing approximations (VERDICT r2 weak #7).

    Production routing runs bf16 representative distances plus hardware
    approx_max_k (cnns.py _route_clusters). That stack was validated by a
    one-off 0.988 top-40 overlap measurement; this test pins the contract:
    at a 1M-shaped rep row (C=1024 clusters x m1=5 reps = 5120-wide), the
    approximate route must keep >= 0.97 mean top-nprobe overlap with an
    exact f32 route under identical ranking. A silent quality regression
    here would otherwise surface only as mysterious end-to-end recall loss.
    """

    def test_bf16_approx_route_matches_exact_f32(self):
        import jax
        import jax.numpy as jnp
        from hnsw_nsg_tpu.models.cnns import _rank_rep_hits, _route_clusters
        from hnsw_nsg_tpu.ops.distance import pairwise_dists

        rng = np.random.default_rng(7)
        c, m1, d, nq, nprobe = 1024, 5, 128, 512, 4
        # reps drawn like CNNS reps: cluster centroid + nearby members
        centers = rng.standard_normal((c, d)).astype(np.float32)
        reps = (centers[:, None]
                + 0.3 * rng.standard_normal((c, m1, d))).astype(np.float32)
        q = (centers[rng.integers(0, c, nq)]
             + rng.standard_normal((nq, d))).astype(np.float32)
        qd = jnp.asarray(q)
        reps_d = jnp.asarray(reps)

        visit_approx = _route_clusters(qd, reps_d, nprobe, "l2")
        # exact reference route: f32 rep distances, exact top_k, identical
        # hit ranking
        rd = pairwise_dists(qd, reps_d.reshape(c * m1, d), "l2", exact=True)
        _, rep_idx = jax.lax.top_k(-rd, nprobe * m1)
        visit_exact = _rank_rep_hits(rep_idx, m1, nprobe, "hits")

        va = np.asarray(visit_approx)
        ve = np.asarray(visit_exact)
        overlap = np.mean([
            len(set(va[i][va[i] >= 0]) & set(ve[i][ve[i] >= 0]))
            / max(1, (ve[i] >= 0).sum())
            for i in range(nq)
        ])
        assert overlap >= 0.97, overlap
