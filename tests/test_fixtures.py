"""Committed-binary-fixture regression tests.

The reference commits deterministic binary fixtures and asserts recall on
them (hnswlib/tests/cpp/updates_test.cpp:87-102 + tests/cpp/data/). Same
idea: fixed fvecs/gt files in tests/data/ pin recall floors across code
changes — a drop means a behavioral regression, not test noise.
"""

import os

import numpy as np
import pytest

from hnsw_nsg_tpu.ops import knn_graph_exact, recall
from hnsw_nsg_tpu.models.hnsw import HNSWIndex
from hnsw_nsg_tpu.models.nsg import build_nsg
from hnsw_nsg_tpu.utils import io
from hnsw_nsg_tpu.utils.params import HNSWConfig, NSGBuildConfig

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def fixture():
    x = io.read_fvecs(os.path.join(DATA, "fixture_base.fvecs"))
    q = io.read_fvecs(os.path.join(DATA, "fixture_query.fvecs"))
    gt = io.read_gt(os.path.join(DATA, "fixture_gt.ivecs"))
    return x, q, gt


def test_fixture_files_intact(fixture):
    x, q, gt = fixture
    assert x.shape == (2000, 16) and q.shape == (50, 16)
    assert gt.shape == (50, 10)
    # pinned literal checksums of the committed data (regenerate with
    # x.sum() / q.sum() / gt sums if the fixtures are ever rebuilt)
    np.testing.assert_allclose(float(x.sum()), 390.66021728515625, rtol=1e-6)
    np.testing.assert_allclose(float(q.sum()), 34.895118713378906, rtol=1e-6)
    assert int(gt[0, 0]) == 649
    assert int(gt.sum()) == 494543


def test_hnsw_recall_floor(fixture):
    x, q, gt = fixture
    idx = HNSWIndex(16, 2000, HNSWConfig(M=12, ef_construction=80,
                                         random_seed=7))
    idx.add_items(x, batch_size=1000)
    labels, _ = idx.knn_query(q, k=10, ef=80)
    r = recall(labels, gt)
    assert r >= 0.97, f"HNSW fixture recall regressed: {r}"


@pytest.mark.slow
def test_nsg_recall_floor(fixture):
    x, q, gt = fixture
    knn = knn_graph_exact(x, 20, query_block=2000)
    idx = build_nsg(x, knn, NSGBuildConfig(L=24, R=14, C=100), seed=7)
    _, ids = idx.search(q, k=10, l_search=80)
    r = recall(np.asarray(ids), gt)
    assert r >= 0.97, f"NSG fixture recall regressed: {r}"
