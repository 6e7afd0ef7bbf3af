"""hnswlib-compatible API surface, modeled on the reference's python test
suite (hnswlib/tests/python/bindings_test*.py)."""

import numpy as np
import pytest

from hnsw_nsg_tpu.api import BFIndex, Index


@pytest.fixture
def small():
    rng = np.random.default_rng(17)
    return rng.standard_normal((400, 16)).astype(np.float32)


class TestIndex:
    def test_basic_flow(self, small):
        """bindings_test.py shape: init, add, query self, recall ~1."""
        p = Index(space="l2", dim=16)
        p.init_index(max_elements=500, M=16, ef_construction=80)
        p.set_ef(40)
        p.add_items(small)
        labels, dists = p.knn_query(small[:50], k=1)
        assert (labels[:, 0] == np.arange(50)).mean() > 0.95
        assert dists.shape == (50, 1)

    def test_uninitialized_raises(self, small):
        p = Index(space="l2", dim=16)
        with pytest.raises(RuntimeError, match="init_index"):
            p.add_items(small)

    def test_bad_space(self):
        with pytest.raises(ValueError, match="not available"):
            Index(space="hamming", dim=8)

    def test_wrong_dim(self, small):
        p = Index(space="l2", dim=16)
        p.init_index(100)
        with pytest.raises(ValueError, match="dimensionality"):
            p.add_items(np.zeros((3, 8), np.float32))

    def test_cosine_space(self, small):
        p = Index(space="cosine", dim=16)
        p.init_index(500, M=16, ef_construction=80)
        p.add_items(small)
        labels, dists = p.knn_query(small[:20] * 7.0, k=1, ef=40)
        # scaling must not change cosine neighbors; self dist ~ 0
        assert (labels[:, 0] == np.arange(20)).mean() > 0.9
        assert np.abs(dists).max() < 1e-3

    def test_labels_persistence_roundtrip(self, small, tmp_path):
        """bindings_test_labels.py shape."""
        p = Index(space="l2", dim=16)
        p.init_index(500)
        ids = np.arange(5000, 5400)
        p.add_items(small, ids)
        path = str(tmp_path / "idx.npz")
        p.save_index(path)
        q = Index(space="l2", dim=16)
        q.load_index(path)
        assert q.get_current_count() == 400
        l1, _ = p.knn_query(small[:10], k=3, ef=30)
        l2, _ = q.knn_query(small[:10], k=3, ef=30)
        np.testing.assert_array_equal(l1, l2)
        assert set(q.get_ids_list()) == set(ids.tolist())
        got = q.get_items([5007])
        np.testing.assert_allclose(got[0], small[7], rtol=1e-6)

    def test_filter(self, small):
        """bindings_test_filter.py shape."""
        p = Index(space="l2", dim=16)
        p.init_index(500)
        p.add_items(small)
        labels, _ = p.knn_query(small[:5], k=5, ef=50,
                                filter=lambda l: l % 2 == 0)
        assert (labels % 2 == 0).all()

    def test_replace_deleted(self, small):
        """bindings_test_replace.py shape."""
        p = Index(space="l2", dim=16)
        p.init_index(500, allow_replace_deleted=True)
        p.add_items(small[:300])
        for lab in range(10):
            p.mark_deleted(lab)
        new = small[300:310]
        p.add_items(new, np.arange(1000, 1010), replace_deleted=True)
        assert p.get_current_count() == 300  # slots reused
        labels, _ = p.knn_query(new, k=1, ef=40)
        assert (labels[:, 0] >= 1000).mean() > 0.8
        # deleted labels gone
        for lab in range(10):
            assert lab not in p.get_ids_list()

    def test_replace_without_allow_raises(self, small):
        p = Index(space="l2", dim=16)
        p.init_index(500)
        p.add_items(small[:10])
        with pytest.raises(RuntimeError, match="allow_replace_deleted"):
            p.add_items(small[10:20], replace_deleted=True)

    def test_k_too_large_raises(self, small):
        p = Index(space="l2", dim=16)
        p.init_index(100)
        p.add_items(small[:5])
        with pytest.raises(RuntimeError):
            p.knn_query(small[:1], k=10)


class TestBFIndex:
    def test_exact_and_delete(self, small):
        bf = BFIndex(space="l2", dim=16)
        bf.init_index(500)
        bf.add_items(small)
        labels, dists = bf.knn_query(small[:10], k=1)
        np.testing.assert_array_equal(labels[:, 0], np.arange(10))
        bf.delete_vector(0)
        labels, _ = bf.knn_query(small[:1], k=1)
        assert labels[0, 0] != 0

    def test_bf_as_oracle(self, small):
        """The reference's recall test pattern: HNSW vs BFIndex."""
        p = Index(space="l2", dim=16)
        p.init_index(500, M=16, ef_construction=100)
        p.add_items(small)
        bf = BFIndex(space="l2", dim=16)
        bf.init_index(500)
        bf.add_items(small)
        rng = np.random.default_rng(0)
        q = rng.standard_normal((32, 16)).astype(np.float32)
        lh, _ = p.knn_query(q, k=10, ef=100)
        lb, _ = bf.knn_query(q, k=10)
        hits = sum(
            len(np.intersect1d(lh[i], lb[i])) for i in range(32)
        )
        assert hits / (32 * 10) >= 0.95
