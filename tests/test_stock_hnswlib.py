"""Interchange with a GENUINELY FOREIGN hnswlib index.

``tests/data/stock_hnswlib_m8.bin`` was produced by the reference's own
header-only C++ hnswlib (HierarchicalNSW::saveIndex, hnswalg.h:685-713):
2000x16 gaussian points, M=8 efC=60 seed=123, labels 5 and 17 markDelete'd,
plus the stock engine's own ef=80 top-10 answers for 20 queries
(regenerate with the oracle program documented in PROGRESS.md). Round-1
only round-tripped our writer against our reader; this closes VERDICT.md
gap #8 with a file our code never wrote.
"""

import os

import numpy as np
import pytest

from hnsw_nsg_tpu.models.hnsw import HNSWIndex
from hnsw_nsg_tpu.utils.hnswlib_format import (
    read_hnswlib_index,
    write_hnswlib_index,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
IDX = os.path.join(DATA, "stock_hnswlib_m8.bin")
N, DIM, M, NQ, K = 2000, 16, 8, 20, 10


@pytest.fixture(scope="module")
def stock():
    z = read_hnswlib_index(IDX)
    data = np.fromfile(
        os.path.join(DATA, "stock_hnswlib_data.bin"), np.float32
    ).reshape(N, DIM)
    queries = np.fromfile(
        os.path.join(DATA, "stock_hnswlib_queries.bin"), np.float32
    ).reshape(NQ, DIM)
    results = np.fromfile(
        os.path.join(DATA, "stock_hnswlib_results.bin"), np.int64
    ).reshape(NQ, K)
    return z, data, queries, results


class TestForeignFile:
    def test_header_and_payload(self, stock):
        z, data, _, _ = stock
        assert z["M"] == M and z["maxM0"] == 2 * M
        assert z["ef_construction"] == 60
        assert z["maxlevel"] == 4 and z["enterpoint"] == 1496
        assert z["data"].shape == (N, DIM)
        np.testing.assert_array_equal(z["data"], data)
        np.testing.assert_array_equal(z["labels"], np.arange(N))
        # the two markDelete'd labels and only those
        assert set(np.nonzero(z["deleted"])[0]) == {5, 17}
        # degree bounds of a stock graph
        assert ((z["adj0"] >= 0).sum(1) <= 2 * M).all()
        assert ((z["adj0"] >= -1) & (z["adj0"] < N)).all()
        assert len(z["adj_up"]) == 4

    def test_search_parity_with_stock_engine(self, stock):
        _, data, queries, results = stock
        idx = HNSWIndex.load_hnswlib_format(IDX)
        labels, dists = idx.knn_query(queries, k=K, ef=80)
        overlap = np.mean([
            len(set(a) & set(b)) / K for a, b in zip(labels, results)
        ])
        assert overlap >= 0.95, overlap
        # deleted labels never surface
        assert not np.isin(labels, [5, 17]).any()
        # distances are exact L2^2 against the raw fixture data
        d0 = ((queries[0] - data[labels[0]]) ** 2).sum(-1)
        np.testing.assert_allclose(dists[0], d0, rtol=1e-5, atol=1e-5)

    def test_rewrite_semantic_roundtrip(self, stock, tmp_path):
        """read(write(read(f))) == read(f) — the writer reproduces every
        field the reference's loadIndex consumes."""
        z, _, _, _ = stock
        out = str(tmp_path / "rt.bin")
        write_hnswlib_index(
            out, z["data"], z["labels"], z["levels"], z["adj0"],
            z["adj_up"], z["deleted"], m=z["M"],
            ef_construction=z["ef_construction"],
            enterpoint=z["enterpoint"], maxlevel=z["maxlevel"],
            mult=z["mult"],
        )
        z2 = read_hnswlib_index(out)
        for key in ("data", "labels", "levels", "adj0", "deleted"):
            np.testing.assert_array_equal(z2[key], z[key], err_msg=key)
        assert len(z2["adj_up"]) == len(z["adj_up"])
        for a, b in zip(z2["adj_up"], z["adj_up"]):
            np.testing.assert_array_equal(a, b)
        for key in ("M", "maxM0", "ef_construction", "enterpoint",
                    "maxlevel"):
            assert z2[key] == z[key], key
