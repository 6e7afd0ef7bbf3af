"""Core ops: distances vs numpy, top-k pools, brute-force oracle, IO formats."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.ops import (
    PAD_DIST,
    PAD_ID,
    brute_force_topk,
    gathered_dists,
    init_retset,
    mask_internal_dups,
    merge_into_retset,
    normalize,
    pairwise_dists,
    recall,
    squared_norms,
    topk_smallest,
)
from hnsw_nsg_tpu.utils import io


def np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


class TestDistance:
    def test_pairwise_l2_matches_numpy(self, rng):
        q = rng.standard_normal((7, 33)).astype(np.float32)
        x = rng.standard_normal((19, 33)).astype(np.float32)
        # the |q|^2+|x|^2-2qx expansion loses a few float bits vs diff^2
        d = np.asarray(pairwise_dists(q, x, "l2"))
        np.testing.assert_allclose(d, np_l2(q, x), rtol=3e-3, atol=1e-2)

    def test_pairwise_ip(self, rng):
        q = rng.standard_normal((5, 16)).astype(np.float32)
        x = rng.standard_normal((9, 16)).astype(np.float32)
        d = np.asarray(pairwise_dists(q, x, "ip"))
        np.testing.assert_allclose(d, 1.0 - q @ x.T, rtol=1e-5, atol=1e-5)

    def test_fastl2_is_monotone_shift(self, rng):
        q = rng.standard_normal((4, 24)).astype(np.float32)
        x = rng.standard_normal((11, 24)).astype(np.float32)
        fast = np.asarray(pairwise_dists(q, x, "l2", exact=False))
        exact = np.asarray(pairwise_dists(q, x, "l2", exact=True))
        shift = exact - fast
        np.testing.assert_allclose(
            shift, np.broadcast_to(shift[:, :1], shift.shape), rtol=1e-3,
            atol=1e-3,
        )

    def test_gathered_matches_pairwise(self, rng):
        q = rng.standard_normal((6, 32)).astype(np.float32)
        x = rng.standard_normal((50, 32)).astype(np.float32)
        ids = rng.integers(0, 50, size=(6, 12)).astype(np.int32)
        ids[0, 3] = PAD_ID
        norms = squared_norms(x)
        d = np.asarray(gathered_dists(q, x, ids, "l2", norms, exact=True))
        full = np_l2(q, x)
        for i in range(6):
            for j in range(12):
                if ids[i, j] < 0:
                    assert d[i, j] >= 1e30
                else:
                    np.testing.assert_allclose(
                        d[i, j], full[i, ids[i, j]], rtol=1e-3, atol=1e-3
                    )

    def test_normalize(self, rng):
        x = rng.standard_normal((8, 10)).astype(np.float32) * 5
        n = np.asarray(normalize(x))
        np.testing.assert_allclose(
            (n ** 2).sum(-1), np.ones(8), rtol=1e-5, atol=1e-5
        )


class TestTopk:
    def test_merge_dedups_and_sorts(self):
        r_d, r_i, r_e = init_retset(
            jnp.array([[3.0, 1.0, 7.0]]), jnp.array([[30, 10, 70]]), 4
        )
        assert r_i[0].tolist() == [10, 30, 70, PAD_ID]
        assert not bool(r_e[0, 0])
        # insert: one dup (30), one better (0.5), one pad
        d2, i2, e2 = merge_into_retset(
            r_d, r_i, r_e,
            jnp.array([[2.5, 0.5, 9.0]]), jnp.array([[30, 5, PAD_ID]]),
        )
        assert i2[0].tolist() == [5, 10, 30, 70]
        np.testing.assert_allclose(
            np.asarray(d2[0]), [0.5, 1.0, 3.0, 7.0], rtol=1e-6
        )

    def test_merge_preserves_expanded_flags(self):
        r_d, r_i, r_e = init_retset(
            jnp.array([[1.0, 2.0]]), jnp.array([[1, 2]]), 2
        )
        r_e = r_e.at[0, 0].set(True)  # expanded node 1
        d2, i2, e2 = merge_into_retset(
            r_d, r_i, r_e, jnp.array([[1.5]]), jnp.array([[3]])
        )
        assert i2[0].tolist() == [1, 3]
        assert bool(e2[0, 0]) and not bool(e2[0, 1])

    def test_internal_dups(self):
        m = mask_internal_dups(jnp.array([[4, 4, 2, PAD_ID, 2]]))
        assert m[0].tolist() == [False, True, False, False, True]

    def test_topk_smallest(self):
        d = jnp.array([[5.0, 1.0, 3.0, 2.0]])
        i = jnp.array([[50, 10, 30, 20]])
        td, ti = topk_smallest(d, i, 2)
        assert ti[0].tolist() == [10, 20]


class TestBruteForce:
    @pytest.mark.parametrize("metric", ["l2", "ip"])
    def test_matches_numpy(self, rng, metric):
        q = rng.standard_normal((9, 20)).astype(np.float32)
        x = rng.standard_normal((300, 20)).astype(np.float32)
        d, i = brute_force_topk(q, x, 10, metric=metric, tile=128)
        if metric == "l2":
            full = np_l2(q, x)
        else:
            full = 1.0 - q @ x.T
        gt = np.argsort(full, axis=1)[:, :10]
        assert recall(np.asarray(i), gt) > 0.999

    def test_valid_n_mask(self, rng):
        q = rng.standard_normal((3, 8)).astype(np.float32)
        x = rng.standard_normal((64, 8)).astype(np.float32)
        d, i = brute_force_topk(q, x, 5, valid_n=jnp.int32(20), tile=16)
        assert np.asarray(i).max() < 20

    def test_recall_fn(self):
        assert recall(np.array([[1, 2, 3]]), np.array([[3, 4, 1]])) == pytest.approx(2 / 3)


class TestIO:
    def test_fvecs_roundtrip(self, tmp_path, rng):
        x = rng.standard_normal((17, 33)).astype(np.float32)
        p = str(tmp_path / "a.fvecs")
        io.write_fvecs(p, x)
        np.testing.assert_array_equal(io.read_fvecs(p), x)

    def test_ivecs_bvecs_roundtrip(self, tmp_path, rng):
        iv = rng.integers(0, 1000, (5, 9)).astype(np.int32)
        bv = rng.integers(0, 255, (5, 12)).astype(np.uint8)
        io.write_ivecs(str(tmp_path / "a.ivecs"), iv)
        io.write_bvecs(str(tmp_path / "a.bvecs"), bv)
        np.testing.assert_array_equal(io.read_ivecs(str(tmp_path / "a.ivecs")), iv)
        np.testing.assert_array_equal(io.read_bvecs(str(tmp_path / "a.bvecs")), bv)

    def test_nsg_roundtrip(self, tmp_path):
        adj = np.array([[1, 2, PAD_ID], [0, PAD_ID, PAD_ID], [0, 1, 2]], np.int32)
        p = str(tmp_path / "g.nsg")
        io.write_nsg(p, adj, ep=2, width=3)
        adj2, ep, width = io.read_nsg(p)
        assert ep == 2 and width == 3
        np.testing.assert_array_equal(adj2, adj)

    def test_knn_graph_roundtrip(self, tmp_path):
        adj = np.array([[1, 2], [0, 2], [0, PAD_ID]], np.int32)
        p = str(tmp_path / "g.graph")
        io.write_knn_graph(p, adj)
        np.testing.assert_array_equal(io.read_knn_graph(p), adj)

    def test_centroids_roundtrip(self, tmp_path, rng):
        reps = rng.standard_normal((4, 3, 16)).astype(np.float32)
        p = str(tmp_path / "centroids.fvecs")
        io.write_centroids(p, reps)
        np.testing.assert_array_equal(io.read_centroids(p), reps)

    def test_mapping_roundtrip(self, tmp_path):
        m = np.array([5, 9, 2, 11], np.int64)
        p = str(tmp_path / "mapping_0")
        io.write_mapping(p, m)
        np.testing.assert_array_equal(io.read_mapping(p), m)
