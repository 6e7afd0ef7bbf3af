"""In-traversal filtering + replace-churn recall regression.

Covers the two round-1 gaps VERDICT.md flagged:
  * a highly selective filter (1% pass rate) must still return k passing
    results — the reference keeps exploring until ef *passing* candidates
    exist (searchBaseLayerST, hnswalg.h:397-425), which post-hoc masking
    cannot guarantee;
  * recall must not degrade under delete/replace churn — the
    ``test_recall_degradation`` regression
    (hnswlib/tests/python/bindings_test_replace.py:155), which exercises
    repairConnectionsForUpdate (hnswalg.h:1074-1139).
"""

import numpy as np
import pytest

from hnsw_nsg_tpu.api import Index
from hnsw_nsg_tpu.models.hnsw import HNSWIndex
from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.utils.params import HNSWConfig

import jax.numpy as jnp


class TestSelectiveFilter:
    @pytest.mark.slow
    def test_one_percent_filter_returns_k_passing(self, rng):
        n, d, k = 4000, 32, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = HNSWIndex(d, n, HNSWConfig(M=12, ef_construction=80), "l2")
        idx.add_items(x)
        # only 1% of nodes pass
        mask = np.zeros(idx.cap, bool)
        allowed = rng.choice(n, size=n // 100, replace=False)
        mask[allowed] = True
        q = rng.standard_normal((8, d)).astype(np.float32)
        labels, dists = idx.knn_query(q, k=k, ef=60, filter_ids=mask)
        # every returned slot is a real, passing node
        assert (labels >= 0).all(), f"PAD rows under selective filter:\n{labels}"
        assert np.isin(labels.ravel(), allowed).all()
        # and they are good: recall vs brute force restricted to allowed
        xa = x[allowed]
        _, gt_local = brute_force_topk(jnp.asarray(q), jnp.asarray(xa), k)
        gt = allowed[np.asarray(gt_local)]
        r = recall(labels, gt)
        assert r >= 0.8, r

    def test_filter_with_deletions_combined(self, rng):
        n, d = 2000, 16
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = HNSWIndex(d, n, HNSWConfig(M=12, ef_construction=60), "l2")
        idx.add_items(x)
        for lab in range(0, n, 3):
            idx.mark_deleted(lab)
        mask = np.zeros(idx.cap, bool)
        mask[: n // 2] = True
        labels, _ = idx.knn_query(x[5], k=5, ef=40, filter_ids=mask)
        labels = labels.ravel()
        assert (labels >= 0).all()
        assert (labels < n // 2).all()
        assert all(l % 3 != 0 for l in labels)


class TestReplaceChurn:
    @pytest.mark.slow
    def test_recall_degradation_under_churn(self, rng):
        """bindings_test_replace.py:155 analogue: delete half, replace with
        new vectors, repeat; recall on the final population must stay at
        the fresh-build level."""
        n, d, k = 800, 32, 10
        cfg = dict(M=12, ef_construction=100, ef=80)
        x = rng.standard_normal((n, d)).astype(np.float32)
        p = Index("l2", d)
        p.init_index(n, allow_replace_deleted=True, **{
            "M": cfg["M"], "ef_construction": cfg["ef_construction"]})
        p.set_ef(cfg["ef"])
        p.add_items(x, np.arange(n))

        cur = {int(i): x[i] for i in range(n)}
        next_label = n
        for round_ in range(2):
            dels = rng.choice(sorted(cur), size=n // 2, replace=False)
            for lab in dels:
                p.mark_deleted(int(lab))
                del cur[int(lab)]
            newv = rng.standard_normal((n // 2, d)).astype(np.float32)
            newl = np.arange(next_label, next_label + n // 2)
            next_label += n // 2
            p.add_items(newv, newl, replace_deleted=True)
            for lab, v in zip(newl, newv):
                cur[int(lab)] = v

        labs = np.array(sorted(cur))
        vecs = np.stack([cur[int(l)] for l in labs])
        q = vecs[rng.choice(len(labs), 64, replace=False)]
        _, gt_local = brute_force_topk(jnp.asarray(q), jnp.asarray(vecs), k)
        gt = labs[np.asarray(gt_local)]
        got, _ = p.knn_query(q, k=k)
        r_churn = recall(got, gt)

        # fresh index over the same final population
        p2 = Index("l2", d)
        p2.init_index(n, M=cfg["M"], ef_construction=cfg["ef_construction"])
        p2.set_ef(cfg["ef"])
        p2.add_items(vecs, labs)
        got2, _ = p2.knn_query(q, k=k)
        r_fresh = recall(got2, gt)
        assert r_churn >= r_fresh - 0.05, (r_churn, r_fresh)
        assert r_churn >= 0.85, r_churn
