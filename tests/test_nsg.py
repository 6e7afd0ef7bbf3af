"""NSG build + search vs brute-force oracle; prune properties; persistence."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_nsg_tpu.ops import (
    PAD_ID,
    brute_force_topk,
    knn_graph_exact,
    recall,
    squared_norms,
)
from hnsw_nsg_tpu.models.nsg import NSGIndex, build_nsg, find_medoid
from hnsw_nsg_tpu.models.prune import occlusion_prune
from hnsw_nsg_tpu.utils.params import NSGBuildConfig


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((3000, 32)).astype(np.float32)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    knn = knn_graph_exact(x, 24, query_block=1024)
    cfg = NSGBuildConfig(L=24, R=16, C=120)
    idx = build_nsg(x, knn, cfg, block=1024)
    return x, q, idx, cfg


class TestPrune:
    def test_occlusion_semantics_vs_scalar(self, rng):
        """Batched pruner must match a scalar transcription of sync_prune."""
        x = rng.standard_normal((200, 16)).astype(np.float32)
        norms = np.asarray(squared_norms(x))
        node = 0
        cand = np.arange(1, 60, dtype=np.int32)
        cd = ((x[cand] - x[node]) ** 2).sum(-1).astype(np.float32)

        # scalar reference semantics (index_nsg.cpp:326-345)
        order = np.argsort(cd)
        kept = []
        for j in order[:50]:
            p, dp = cand[j], cd[j]
            occ = False
            for t in kept:
                if ((x[t] - x[p]) ** 2).sum() < dp:
                    occ = True
                    break
            if not occ:
                kept.append(int(p))
            if len(kept) == 8:
                break

        got_i, got_d = occlusion_prune(
            jnp.asarray(x[node][None]),
            jnp.asarray(cand[None]),
            jnp.asarray(cd[None]),
            jnp.asarray(x), jnp.asarray(norms),
            max_keep=8, scan_cap=50,
        )
        got = [i for i in np.asarray(got_i)[0].tolist() if i >= 0]
        assert got == kept

    def test_prune_drops_self_and_dups(self, rng):
        x = rng.standard_normal((50, 8)).astype(np.float32)
        cand = np.array([[3, 3, 0, 7]], np.int32)
        cd = ((x[cand[0]] - x[0]) ** 2).sum(-1)[None].astype(np.float32)
        got_i, _ = occlusion_prune(
            jnp.asarray(x[:1]), jnp.asarray(cand), jnp.asarray(cd),
            jnp.asarray(x), squared_norms(x),
            max_keep=4, self_ids=jnp.array([0]),
        )
        got = np.asarray(got_i)[0]
        valid = got[got >= 0]
        assert 0 not in valid  # self dropped
        assert len(np.unique(valid)) == len(valid)  # dups occluded


class TestBuild:
    def test_medoid_exact(self, rng):
        x = rng.standard_normal((500, 8)).astype(np.float32)
        m = find_medoid(x)
        c = x.mean(0)
        d = ((x - c) ** 2).sum(-1)
        assert m == np.argmin(d)

    def test_degree_bounds_and_no_self_edges(self, built):
        x, _, idx, cfg = built
        adj = np.asarray(idx.adj)
        assert adj.shape[1] == cfg.R
        assert (adj != np.arange(len(adj))[:, None]).all()

    def test_connectivity(self, built):
        """tree_grow guarantee: every node reachable from the entry point."""
        x, _, idx, _ = built
        adj = np.asarray(idx.adj)
        visited = np.zeros(len(adj), bool)
        frontier = np.array([idx.ep])
        visited[idx.ep] = True
        while len(frontier):
            nxt = adj[frontier].reshape(-1)
            nxt = np.unique(nxt[nxt >= 0])
            nxt = nxt[~visited[nxt]]
            visited[nxt] = True
            frontier = nxt
        assert visited.all()

    def test_search_recall(self, built):
        x, q, idx, _ = built
        d, i = idx.search(q, k=10, l_search=64)
        _, gt = brute_force_topk(q, x, 10)
        r = recall(np.asarray(i), np.asarray(gt))
        assert r >= 0.95, f"NSG recall@10 {r}"
        # exact distances returned
        i0 = np.asarray(i)[0, 0]
        true_d = ((q[0] - x[i0]) ** 2).sum()
        np.testing.assert_allclose(np.asarray(d)[0, 0], true_d, rtol=1e-3)

    def test_search_from_enterpoint(self, built):
        x, q, idx, _ = built
        entries = jnp.zeros((len(q),), jnp.int32)
        d, i = idx.search_from_enterpoint(q, entries, k=10, l_search=64)
        _, gt = brute_force_topk(q, x, 10)
        assert recall(np.asarray(i), np.asarray(gt)) >= 0.9

    def test_accel_records_parity(self, built):
        """build_accel (int8 record traversal + exact rerank) must match
        the f32 adjacency beam within a point of recall, and return exact
        distances."""
        x, q, idx, _ = built
        _, gt = brute_force_topk(q, x, 10)
        d_f32, i_f32 = idx.search(q, k=10, l_search=64)
        idx.build_accel()
        assert idx.records is not None
        d_rec, i_rec = idx.search(q, k=10, l_search=64)
        r_f32 = recall(np.asarray(i_f32), np.asarray(gt))
        r_rec = recall(np.asarray(i_rec), np.asarray(gt))
        assert r_rec >= r_f32 - 0.02, (r_rec, r_f32)
        i0 = np.asarray(i_rec)[0, 0]
        true_d = ((q[0] - x[i0]) ** 2).sum()
        np.testing.assert_allclose(np.asarray(d_rec)[0, 0], true_d,
                                   rtol=1e-3)
        # enterpoint variant rides the same records path
        entries = jnp.zeros((len(q),), jnp.int32)
        _, i_ep = idx.search_from_enterpoint(q, entries, k=10, l_search=64)
        assert recall(np.asarray(i_ep), np.asarray(gt)) >= 0.9
        idx.records = None

    def test_save_load_roundtrip(self, built, tmp_path):
        x, q, idx, _ = built
        p = str(tmp_path / "test.npz")
        idx.save(p)
        idx2 = NSGIndex.load(p, x)
        d1, i1 = idx.search(q[:8], k=5, l_search=32)
        d2, i2 = idx2.search(q[:8], k=5, l_search=32)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_reference_format_roundtrip(self, built, tmp_path):
        x, q, idx, _ = built
        p = str(tmp_path / "test.nsg")
        idx.save_reference_format(p)
        idx2 = NSGIndex.load_reference_format(p, x)
        assert idx2.ep == idx.ep
        d1, i1 = idx.search(q[:8], k=5, l_search=32)
        d2, i2 = idx2.search(q[:8], k=5, l_search=32)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
