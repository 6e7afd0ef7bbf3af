"""HNSW engine: recall vs brute force, CRUD, deletes, resize, persistence.

Mirrors the reference's test spine (SURVEY.md §4): BF-oracle recall
threshold (bindings_test_recall.py), label/persistence round-trips,
delete semantics, integrity checks.
"""

import copy

import numpy as np
import pytest

from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.models.hnsw import HNSWIndex
from hnsw_nsg_tpu.utils.params import HNSWConfig


def clone(idx: HNSWIndex) -> HNSWIndex:
    """Cheap test-local copy: jax arrays are immutable (replaced on
    mutation), so only the mutable host-side state needs copying. Lets
    mutating tests share one built fixture instead of paying a fresh
    insert-compile each (the CRUD tests were ~30-55 s apiece)."""
    c = copy.copy(idx)
    c.levels = idx.levels.copy()
    c.labels = idx.labels.copy()
    c.deleted = idx.deleted.copy()
    c.label_to_id = dict(idx.label_to_id)
    c.adj_up = list(idx.adj_up)
    return c


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(21)
    x = rng.standard_normal((5000, 32)).astype(np.float32)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    idx = HNSWIndex(32, 6000, HNSWConfig(M=16, ef_construction=100))
    idx.add_items(x, batch_size=1024)
    return x, q, idx


class TestBuildSearch:
    def test_recall_threshold(self, built):
        """The reference CI gate (bindings_test_recall.py:14): >= 0.95."""
        x, q, idx = built
        labels, d = idx.knn_query(q, k=10, ef=100)
        _, gt = brute_force_topk(q, x, 10)
        r = recall(labels, np.asarray(gt))
        assert r >= 0.95, f"recall {r}"

    def test_exact_distances(self, built):
        x, q, idx = built
        labels, d = idx.knn_query(q[:4], k=3, ef=50)
        for qi in range(4):
            true = ((q[qi] - x[labels[qi, 0]]) ** 2).sum()
            np.testing.assert_allclose(d[qi, 0], true, rtol=1e-3)

    def test_integrity(self, built):
        _, _, idx = built
        assert idx.check_integrity()

    def test_adj0_dist_cache_exact(self, rng):
        """The opt-in level-0 link-distance cache (hnsw.adj0_d,
        HNSWConfig.link_dist_cache) must hold the EXACT metric distance
        of every live link: reverse-edge insertion merges and prunes
        against these values, so staleness would silently distort link
        selection."""
        x = rng.standard_normal((1500, 24)).astype(np.float32)
        idx = HNSWIndex(
            24, 1500,
            HNSWConfig(M=8, ef_construction=60, link_dist_cache=True),
        )
        idx.add_items(x, batch_size=1024)
        assert idx.adj0_d is not None
        adj = np.asarray(idx.adj0[: idx.n])
        cached = np.asarray(idx.adj0_d[: idx.n])
        live = adj >= 0
        true = ((x[:, None, :] - x[np.where(live, adj, 0)]) ** 2).sum(-1)
        np.testing.assert_allclose(
            cached[live], true[live], rtol=1e-4, atol=1e-4
        )

    def test_ef_sweep_monotone(self, built):
        x, q, idx = built
        _, gt = brute_force_topk(q, x, 10)
        recalls = []
        for ef in (10, 40, 160):
            labels, _ = idx.knn_query(q, k=10, ef=ef)
            recalls.append(recall(labels, np.asarray(gt)))
        assert recalls[-1] >= recalls[0]
        assert recalls[-1] >= 0.95

    def test_levels_geometric(self, built):
        _, _, idx = built
        lv = idx.levels[: idx.n]
        # ~1/M of nodes above level 0
        frac = (lv >= 1).mean()
        assert 0.02 < frac < 0.15

    def test_routed_entry_matches_descend(self, built):
        """The routed entry (one GEMM over level>=1 nodes) must be at
        least as good as the reference-style greedy descent it replaces
        (it returns the node the descent approximates)."""
        x, q, idx = built
        _, gt = brute_force_topk(q, x, 10)
        l_r, _ = idx.knn_query(q, k=10, ef=64)  # routed default
        l_d, _ = idx.knn_query(q, k=10, ef=64, entry="descend")
        r_r = recall(l_r, np.asarray(gt))
        r_d = recall(l_d, np.asarray(gt))
        assert r_r >= r_d - 0.02, (r_r, r_d)
        assert r_r >= 0.95

    def test_routed_entry_is_nearest_upper_node(self, built):
        x, q, idx = built
        ent = np.asarray(idx._entry_points(np.asarray(q[:8])))
        upper = np.nonzero(idx.levels[: idx.n] >= 1)[0]
        d_all = ((q[:8, None, :] - x[None, upper, :]) ** 2).sum(-1)
        best = upper[np.argmin(d_all, axis=1)]
        # bf16 router dots may flip exact ties/near-ties; entry must be
        # within a whisker of the true nearest upper node
        d_ent = ((q[:8] - x[ent]) ** 2).sum(-1)
        d_best = d_all.min(axis=1)
        np.testing.assert_allclose(d_ent, d_best, rtol=0.05)
        assert (ent == best).mean() >= 0.7


class TestCRUD:
    """Lifecycle semantics on shared fixtures: one small custom-label
    build covers labels/get_items/query/resize in sequence; delete and
    filter semantics run on clones of the module's built index (no
    per-test insert compile)."""

    def test_lifecycle_labels_query_resize(self, rng):
        x = rng.standard_normal((100, 8)).astype(np.float32)
        idx = HNSWIndex(8, 100)
        labels = np.arange(1000, 1100)
        idx.add_items(x, labels)
        # labels + get_items (bindings getAnnData semantics)
        got = idx.get_items([1005, 1050])
        np.testing.assert_allclose(got, x[[5, 50]], rtol=1e-6)
        assert set(idx.get_ids_list()) == set(labels.tolist())
        # queries return labels, not internal ids
        lab, _ = idx.knn_query(x[:5], k=1, ef=20)
        assert lab[:, 0].tolist() == [1000, 1001, 1002, 1003, 1004]
        # capacity exhausted -> error; resize -> further inserts land
        with pytest.raises(RuntimeError):
            idx.add_items(rng.standard_normal((10, 8)).astype(np.float32))
        idx.resize_index(200)
        idx.add_items(
            rng.standard_normal((10, 8)).astype(np.float32),
            np.arange(2000, 2010),
        )
        assert idx.n == 110
        lab, _ = idx.knn_query(x[3], k=1, ef=20)
        assert lab[0, 0] == 1003

    def test_mark_deleted_excluded(self, built):
        x, _, idx0 = built
        idx = clone(idx0)
        lab, _ = idx.knn_query(x[7], k=1, ef=30)
        assert lab[0, 0] == 7
        idx.mark_deleted(7)
        lab, _ = idx.knn_query(x[7], k=3, ef=30)
        assert 7 not in lab[0]
        idx.unmark_deleted(7)
        lab, _ = idx.knn_query(x[7], k=1, ef=30)
        assert lab[0, 0] == 7
        # the clone never leaked state into the shared fixture
        assert not idx0.deleted.any()

    def test_filter_mask(self, built):
        x, _, idx = built
        mask = np.zeros(idx.cap, bool)
        mask[:100] = True  # only first hundred allowed
        lab, _ = idx.knn_query(x[150], k=5, ef=50, filter_ids=mask)
        assert (lab[0] < 100).all()

    def test_capacity_error_message(self, rng):
        idx = HNSWIndex(8, 10)
        with pytest.raises(RuntimeError, match="exceeds the specified limit"):
            idx.add_items(rng.standard_normal((11, 8)).astype(np.float32))


class TestPersistence:
    def test_save_load_roundtrip(self, built, tmp_path):
        x, q, idx = built
        p = str(tmp_path / "hnsw.npz")
        idx.save(p)
        idx2 = HNSWIndex.load(p)
        l1, d1 = idx.knn_query(q[:8], k=5, ef=50)
        l2, d2 = idx2.knn_query(q[:8], k=5, ef=50)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_allclose(d1, d2, rtol=1e-5)

    @pytest.mark.slow
    def test_load_with_bigger_capacity_and_append(self, tmp_path, rng):
        x = rng.standard_normal((100, 8)).astype(np.float32)
        idx = HNSWIndex(8, 100)
        idx.add_items(x)
        p = str(tmp_path / "h.npz")
        idx.save(p)
        idx2 = HNSWIndex.load(p, max_elements=200)
        idx2.add_items(
            rng.standard_normal((50, 8)).astype(np.float32),
            np.arange(100, 150),
        )
        assert idx2.n == 150


class TestHnswlibFormat:
    def test_binary_format_roundtrip(self, built, tmp_path):
        """The reference's saveIndex/loadIndex byte format (hnswalg.h:
        685-822) must round-trip through our reader/writer."""
        x, q, idx = built
        p = str(tmp_path / "ref_format.bin")
        idx.save_hnswlib_format(p)
        from hnsw_nsg_tpu.models.hnsw import HNSWIndex as H
        idx2 = H.load_hnswlib_format(p)
        assert idx2.n == idx.n
        assert idx2.ep == idx.ep and idx2.max_level == idx.max_level
        l1, d1 = idx.knn_query(q[:8], k=5, ef=50)
        l2, d2 = idx2.knn_query(q[:8], k=5, ef=50)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_allclose(d1, d2, rtol=1e-5)

    def test_binary_format_fields(self, built, tmp_path):
        x, q, idx = built
        p = str(tmp_path / "ref2.bin")
        idx.mark_deleted(3)
        idx.save_hnswlib_format(p)
        from hnsw_nsg_tpu.utils.hnswlib_format import read_hnswlib_index
        z = read_hnswlib_index(p)
        assert z["M"] == idx.cfg.M and z["maxM0"] == 2 * idx.cfg.M
        assert z["deleted"][3]
        np.testing.assert_allclose(z["data"], np.asarray(x), rtol=1e-6)
        idx.unmark_deleted(3)

    def test_foreign_file(self, tmp_path):
        """Load a file assembled BY HAND here, field by field from the
        reference's saveIndex spec (hnswalg.h:685-713) — independent of our
        own writer, so a matched read/write bug cannot hide. 3 nodes, dim=2,
        M=2 (maxM0=4); node 0 at level 1, enterpoint 0, node 2 deleted."""
        import struct

        dim, m, max_m, max_m0 = 2, 2, 2, 4
        size_links0 = 4 + max_m0 * 4
        data_off = size_links0
        label_off = data_off + dim * 4
        stride = label_off + 8
        buf = b""
        # header: offsetLevel0, max_elements, cur_count, stride, label_off,
        # data_off (size_t each), maxlevel i32, enterpoint u32, maxM, maxM0,
        # M (size_t), mult f64, ef_construction (size_t)
        buf += struct.pack(
            "<QQQQQQiIQQQdQ", 0, 3, 3, stride, label_off, data_off,
            1, 0, max_m, max_m0, m, 1.0 / np.log(2.0), 200,
        )
        vecs = [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]
        links0 = [[1, 2], [0], [0, 1]]
        flags = [0, 0, 1]  # node 2 carries DELETE_MARK
        for i in range(3):
            row = links0[i] + [0] * (max_m0 - len(links0[i]))
            buf += struct.pack("<HH", len(links0[i]), flags[i])
            buf += struct.pack(f"<{max_m0}I", *row)
            buf += struct.pack("<2f", *vecs[i])
            buf += struct.pack("<q", 100 + i)  # label
        # per-node linkListSize + upper blocks ([u16 cnt, u16 pad, maxM ids])
        buf += struct.pack("<I", 4 + max_m * 4)      # node 0: one level
        buf += struct.pack("<HH", 1, 0) + struct.pack("<2I", 1, 0)
        buf += struct.pack("<I", 0)                  # node 1
        buf += struct.pack("<I", 0)                  # node 2
        p = str(tmp_path / "foreign.bin")
        with open(p, "wb") as f:
            f.write(buf)

        from hnsw_nsg_tpu.utils.hnswlib_format import read_hnswlib_index
        z = read_hnswlib_index(p)
        np.testing.assert_allclose(z["data"], np.asarray(vecs, np.float32))
        np.testing.assert_array_equal(z["labels"], [100, 101, 102])
        np.testing.assert_array_equal(z["levels"], [1, 0, 0])
        np.testing.assert_array_equal(
            z["adj0"], [[1, 2, -1, -1], [0, -1, -1, -1], [0, 1, -1, -1]]
        )
        np.testing.assert_array_equal(z["adj_up"][0], [[1, -1], [-1, -1],
                                                       [-1, -1]])
        np.testing.assert_array_equal(z["deleted"], [False, False, True])
        assert z["enterpoint"] == 0 and z["maxlevel"] == 1 and z["M"] == m

        # and the full engine loads + searches it through the API layer
        from hnsw_nsg_tpu import api
        idx = api.Index(space="l2", dim=2)
        idx.load_index(p)
        labels, dists = idx.knn_query(np.array([[1.0, 2.0]]), k=2, ef=4)
        assert labels[0, 0] == 100  # exact hit; node 102 is deleted
        assert 102 not in labels[0]
        np.testing.assert_allclose(dists[0, 0], 0.0, atol=1e-6)
