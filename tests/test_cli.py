"""End-to-end CLI pipeline: build-clusters -> build-nsg -> search-clusters,
converters, recall calc — the reference's executable workflow."""

import json
import os

import numpy as np
import pytest

from hnsw_nsg_tpu.cli import main
from hnsw_nsg_tpu.utils import io


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliwork")
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 12)).astype(np.float32) * 4
    x = (centers[rng.integers(0, 8, 1200)]
         + rng.standard_normal((1200, 12))).astype(np.float32)
    q = (centers[rng.integers(0, 8, 16)]
         + rng.standard_normal((16, 12))).astype(np.float32)
    io.write_fvecs(str(d / "base.fvecs"), x)
    io.write_fvecs(str(d / "query.fvecs"), q)
    full = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10].astype(np.int32)
    io.write_gt(str(d / "gt.ivecs"), gt)
    return d


def test_full_cluster_pipeline(workdir, capsys):
    prefix = str(workdir / "artifacts")
    main(["build-clusters", str(workdir / "base.fvecs"),
          "4", "2", "12", "20", "5", "6", "8", prefix,
          "--kmeans-iters", "8"])
    assert os.path.exists(os.path.join(prefix, "centroids.fvecs"))
    assert os.path.exists(os.path.join(prefix, "mapping", "mapping_0"))
    main(["build-nsg", prefix, "16", "10", "60"])
    assert os.path.exists(os.path.join(prefix, "nsg_graph", "nsg_0.nsg"))
    capsys.readouterr()
    main(["search-clusters", prefix, str(workdir / "query.fvecs"),
          "--gt", str(workdir / "gt.ivecs"), "--k", "10",
          "--nprobe", "3", "--local", "nsg"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["recall"] > 0.8, out


@pytest.mark.slow
def test_search_clusters_ablation_axes(workdir, capsys):
    """router x local x rank_by CLI flags (the experiment_feature ablation
    drivers: cluster_hnsw_hnsw_search.cpp, sort_by_min_dist.cpp)."""
    prefix = str(workdir / "artifacts")  # built by the pipeline test
    if not os.path.exists(os.path.join(prefix, "centroids.fvecs")):
        pytest.skip("pipeline test must run first")
    for extra in (
        ["--local", "hnsw"],
        ["--router", "hnsw", "--local", "flat"],
        ["--rank-by", "min_dist", "--local", "flat"],
    ):
        capsys.readouterr()
        main(["search-clusters", prefix, str(workdir / "query.fvecs"),
              "--gt", str(workdir / "gt.ivecs"), "--k", "10",
              "--nprobe", "3"] + extra)
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["recall"] > 0.7, (extra, out)


def test_hnsw_cli(workdir, capsys, tmp_path):
    out_idx = str(tmp_path / "h.npz")
    main(["build-hnsw", str(workdir / "base.fvecs"), out_idx,
          "--M", "12", "--efc", "60", "--batch", "600"])
    capsys.readouterr()
    main(["search-hnsw", out_idx, str(workdir / "query.fvecs"),
          "--gt", str(workdir / "gt.ivecs"), "--k", "10",
          "--efs", "20,80"])
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [l.split("\t") for l in lines[1:]]
    assert float(rows[-1][1]) > 0.9  # recall at ef=80


def test_converters(workdir, tmp_path, capsys):
    src = str(workdir / "base.fvecs")
    binp = str(tmp_path / "a.bin")
    main(["convert", src, binp])
    x = io.read_bin(binp)
    np.testing.assert_allclose(x, io.read_fvecs(src), rtol=1e-6)
    tsvp = str(tmp_path / "a.tsv")
    main(["convert", binp, tsvp])
    back = io.read_tsv(tsvp)
    np.testing.assert_allclose(back, x, atol=1e-4)
    i8 = str(tmp_path / "b.bin")
    main(["convert", src, i8, "--int8"])
    v = io.read_bin(i8, np.int8)
    assert v.dtype == np.int8 and v.shape == x.shape


def test_calculate_recall(workdir, tmp_path, capsys):
    gt = io.read_gt(str(workdir / "gt.ivecs"))
    io.write_ivecs(str(tmp_path / "res.ivecs"), gt[:, :10].astype(np.int32))
    capsys.readouterr()
    main(["calculate-recall", str(tmp_path / "res.ivecs"),
          str(workdir / "gt.ivecs"), "--k", "10"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["recall"] == 1.0


@pytest.mark.slow
def test_hybrid_cli(workdir, capsys, tmp_path):
    """build-hybrid / search-hybrid e2e (test_hnsw_nsg_search.cpp:369-395
    argv flow: build with M/efC + NSG L/R/C, then a search_L recall sweep)."""
    prefix = str(tmp_path / "hyb")
    main(["build-hybrid", str(workdir / "base.fvecs"), prefix,
          "--M", "8", "--efc", "40", "--L", "20", "--R", "12", "--C", "60"])
    assert os.path.exists(prefix + "_hnsw.npz")
    assert os.path.exists(prefix + "_nsg.npz")
    capsys.readouterr()
    result = str(tmp_path / "hyb_sweep.json")
    main(["search-hybrid", prefix, str(workdir / "query.fvecs"),
          "--gt", str(workdir / "gt.ivecs"), "--k", "10",
          "--search-ls", "20,60", "--result", result])
    out = capsys.readouterr().out
    assert "search_L" in out
    rows = json.load(open(result))
    assert rows[-1]["recall"] >= 0.85, rows


def test_build_knn_cli(workdir, tmp_path, capsys):
    """build-knn (efanna test_nndescent.cpp argv analogue): both the
    cluster-join and exact methods write a readable .graph whose edges
    overlap the exact graph."""
    out_ivf = str(tmp_path / "knn_ivf.graph")
    out_exact = str(tmp_path / "knn_exact.graph")
    main(["build-knn", str(workdir / "base.fvecs"), out_exact, "10",
          "--method", "exact"])
    main(["build-knn", str(workdir / "base.fvecs"), out_ivf, "10",
          "--method", "ivf", "--n-clusters", "6", "--probes", "4"])
    capsys.readouterr()
    g_ex = io.read_knn_graph(out_exact)
    g_iv = io.read_knn_graph(out_ivf)
    assert g_ex.shape == g_iv.shape == (1200, 10)
    ov = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(g_iv, g_ex)])
    assert ov >= 0.85, ov


def test_build_resumability(workdir, capsys):
    """Re-running build-clusters / build-nsg skips existing per-cluster
    artifacts (the reference drivers' exists_test pattern,
    sift_1m.cpp:308-341) — a crashed build resumes where it stopped."""
    prefix = str(workdir / "artifacts_resume")
    argv = ["build-clusters", str(workdir / "base.fvecs"),
            "4", "2", "12", "20", "5", "6", "8", prefix,
            "--kmeans-iters", "8"]
    main(argv)
    capsys.readouterr()
    # delete ONE cluster's graph: only that one is rebuilt
    os.remove(os.path.join(prefix, "nndescent", "nndescent_1.graph"))
    main(argv)
    out = capsys.readouterr().out
    assert out.count("exists, skipped") == 3
    assert os.path.exists(
        os.path.join(prefix, "nndescent", "nndescent_1.graph"))
    main(["build-nsg", prefix, "16", "10", "60"])
    capsys.readouterr()
    main(["build-nsg", prefix, "16", "10", "60"])
    out = capsys.readouterr().out
    assert out.count("exists, skipped") == 4
