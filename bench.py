"""Headline benchmark: QPS at recall@10 >= 0.95 on SIFT1M-scale data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (north star, BASELINE.md): build an INDEX over N 128-d vectors
(SIFT-like synthetic: clustered Gaussian, deterministic seed), compute exact
ground truth on-device, sweep the engine's routing knob until
recall@10 >= 0.95, and report sustained query throughput at that operating
point on one TPU chip, together with index memory accounting against the
reference's rule (hnswlib/ALGO_PARAMS.md:17-18: ~M*8-10 B/element + vector
bytes).

vs_baseline divides by 5000 QPS — a representative single-core hnswlib
figure at recall@10 ~= 0.95 on SIFT1M (the reference publishes no number of
its own, SURVEY.md §6; 3-6k QPS is the commonly reproduced range for M=16
ef~=100 on one modern core). The driver-defined target is vs_baseline >= 10.

Engines (BENCH_ENGINE):
  cnns_flat  (default) — the CNNS cluster pipeline with exact per-cluster
             scans; the reference's own core design, and the TPU-fastest
             *index* (routing GEMM + dense probed-slab scans on the MXU).
  cnns_nsg   — CNNS with per-cluster NSG graphs.
  hnsw       — HierarchicalNSW with the packed int8 record layout +
             fused merge/select traversal kernel (models/records.py,
             ops/merge_select.py). Sequential-hop traversal amortizes
             worse than the CNNS dense scans on the MXU, so the headline
             stays with cnns_flat, but this engine is a first-class
             measured configuration (BENCH_ENGINE=hnsw).
  brute      — BruteforceSearch at MXU speed-of-light (secondary line; it
             has no index structure, so it is not the headline).

Env knobs: BENCH_N (default 1_000_000), BENCH_Q (8192), BENCH_CLUSTERS,
BENCH_ENGINE, BENCH_CONFIG (sift1m | gist1m | glove | deep10m |
sift10m_u8 | uniform1m), BENCH_SLAB (bf16 | f32 | int8; cnns only — int8 is the
default for uint8 configs and requires 0..255-valued data), BENCH_VERBOSE=1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hnsw_nsg_tpu.utils.cache import enable_persistent_cache

_CACHE_DIR = enable_persistent_cache()
# Self-documenting compile state (VERDICT r4 item 10: BENCH_r04's
# build_s=137 vs a warm-cache 46 s went unexplained): count persisted
# compile-cache entries up front so the JSON can say cold vs warm.
_CACHE_ENTRIES_BEFORE = len(os.listdir(_CACHE_DIR))

import numpy as np  # noqa: E402

BASELINE_QPS = 5000.0
K = 10
TARGET_RECALL = 0.95
# Salt for the /tmp data/GT caches: bump whenever make_data (or anything
# feeding it) changes, so stale cached datasets are never silently reused.
DATA_VERSION = 2

# dataset-shaped synthetic configs (real sets are not in the image;
# dims/metric/N match BASELINE.md's named benchmarks)
CONFIGS = {
    "sift1m": dict(n=1_000_000, d=128, metric="l2"),
    # gist1m defaults to SQ8 int8 slabs: at d=960 the scan is slab-
    # bandwidth-bound and a bf16/f32 pack does not fit HBM next to the
    # resident dataset (round-2 session 3)
    "gist1m": dict(n=1_000_000, d=960, metric="l2", slab="int8"),
    "glove": dict(n=1_183_514, d=100, metric="ip"),
    "deep10m": dict(n=10_000_000, d=96, metric="l2"),
    # sift_1b.cpp:243-344 uint8 configuration at the single-chip HBM
    # scale: uint8 vectors stored as int8 slabs (exact integer MXU math)
    "sift10m_u8": dict(n=10_000_000, d=128, metric="l2", uint8=True),
    # double the sift_1b.cpp 10M subset: the memory-pressure (cnns_spill)
    # shape — its int8 index exceeds the stated HBM budget by >2x
    "sift20m_u8": dict(n=20_000_000, d=128, metric="l2", uint8=True),
    # adversarial no-structure config: one isotropic Gaussian blob, the
    # worst case for IVF routing (every cluster boundary is artificial and
    # true neighbors straddle them) — bounds the clustered-synthetic
    # headline from below
    "uniform1m": dict(n=1_000_000, d=128, metric="l2", uniform=True),
}


def log(msg):
    if os.environ.get("BENCH_VERBOSE"):
        print(msg, file=sys.stderr, flush=True)


def make_data(n, d, q, metric, seed=0, uint8=False, uniform=False):
    """Clustered synthetic. Center scale 1.0 gives inter/intra distance
    ratio ~2 (mildly separated mixture) — round 1 used 2.0, which makes
    clusters near-disjoint: that flatters IVF-style routing and starves
    graph traversal of cross-cluster paths, neither of which real
    SIFT/GIST/GloVe data exhibits (VERDICT.md round-1 weakness #4).

    uniform=True drops the mixture entirely (center scale 0): a single
    isotropic Gaussian with zero cluster structure — the IVF worst case."""
    rng = np.random.default_rng(seed)
    n_centers = max(n // 2500, 8)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    if uniform:
        centers *= 0.0
    assign = rng.integers(0, n_centers, n)
    # generate f32 directly and in row blocks: the f64 default costs 2x
    # the RNG work plus an n*d*8 B intermediate (77 GB at deep10m scale)
    x = np.empty((n, d), np.float32)
    for s in range(0, n, 1_000_000):
        e = min(s + 1_000_000, n)
        x[s:e] = centers[assign[s:e]]
        x[s:e] += rng.standard_normal((e - s, d), dtype=np.float32)
    qa = rng.integers(0, n_centers, q)
    queries = centers[qa] + rng.standard_normal(
        (q, d), dtype=np.float32
    )
    if metric == "ip":
        # GloVe-style: normalized vectors, inner-product ranking
        x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
        queries /= np.linalg.norm(queries, axis=1, keepdims=True) + 1e-9
    if uint8:
        # SIFT-style uint8 counts: shift/scale the mixture into 0..255
        # and round (queries too — sift_1b queries are bvecs)
        x = np.clip(x * 36 + 128, 0, 255).round()
        queries = np.clip(queries * 36 + 128, 0, 255).round()
    return x.astype(np.float32), queries.astype(np.float32)


def hnsw_memory_rule(n, d, m=16, elem_bytes=4):
    """Reference index-memory rule: M*8-10 B/elem + vector bytes
    (hnswlib/ALGO_PARAMS.md:17-18). Returns the 10B/link upper figure.
    elem_bytes: stored bytes per dimension — 4 for f32 spaces, 1 for the
    uint8 L2SpaceI configuration (sift_1b.cpp stores bvecs at 1 B/dim)."""
    return n * (m * 10 + d * elem_bytes)


def main():
    import jax
    import jax.numpy as jnp
    from hnsw_nsg_tpu.ops import (
        brute_force_topk, brute_force_topk_approx, recall, squared_norms,
    )

    cfg_name = os.environ.get("BENCH_CONFIG", "sift1m")
    if cfg_name not in CONFIGS:
        raise SystemExit(f"unknown BENCH_CONFIG {cfg_name!r}")
    cfg = CONFIGS[cfg_name]
    n = int(os.environ.get("BENCH_N", cfg["n"]))
    d = cfg["d"]
    metric = cfg["metric"]
    nq = int(os.environ.get("BENCH_Q", 8192))
    engine = os.environ.get("BENCH_ENGINE", "cnns_flat")
    if engine not in ("cnns_flat", "cnns_nsg", "cnns_spill", "hnsw",
                      "hybrid", "brute"):
        raise SystemExit(f"unknown BENCH_ENGINE {engine!r}")
    n_clusters = int(os.environ.get("BENCH_CLUSTERS", max(n // 1024, 8)))

    t0 = time.time()
    data_cache = f"/tmp/bench_data_v{DATA_VERSION}_{cfg_name}_{n}_{nq}.npz"
    if os.path.exists(data_cache):
        z = np.load(data_cache)
        x, queries = z["x"], z["q"]
        log(f"data (cached, {data_cache}, {time.time() - t0:.1f}s)")
    else:
        x, queries = make_data(
            n, d, nq, metric, uint8=cfg.get("uint8", False),
            uniform=cfg.get("uniform", False),
        )
        log(f"data: {n}x{d} {metric}, {nq} queries "
            f"({time.time() - t0:.1f}s)")
        try:  # deterministic (seeded); caching only saves regen time
            np.savez(data_cache, x=x, q=queries)
        except OSError:
            pass

    t0 = time.time()
    gt_cache = f"/tmp/bench_gt_v{DATA_VERSION}_{cfg_name}_{n}_{nq}_{K}.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
        xd = qd = None
        log(f"ground truth (cached, {gt_cache})")
    elif n > 10_000_000:
        # chunked GT: a single resident f32 copy + brute_force_topk's
        # internal pad would exceed HBM past ~10M x 128; stream the
        # database in 5M-row chunks and merge the per-chunk top-k on host
        xd = qd = None
        qdev = jnp.asarray(queries)
        parts_d, parts_i = [], []
        step = 5_000_000
        for s in range(0, n, step):
            cd, ci = brute_force_topk(
                qdev, jnp.asarray(x[s : s + step]), K, metric=metric
            )
            parts_d.append(np.asarray(cd))
            parts_i.append(np.asarray(ci) + s)
            log(f"ground truth chunk {s + step}/{n} "
                f"({time.time() - t0:.1f}s)")
        alld = np.concatenate(parts_d, axis=1)
        alli = np.concatenate(parts_i, axis=1)
        order = np.argsort(alld, axis=1, kind="stable")[:, :K]
        gt = np.take_along_axis(alli, order, axis=1)
        np.save(gt_cache, gt)
        log(f"ground truth ({time.time() - t0:.1f}s)")
    else:
        xd = jnp.asarray(x)
        qd = jnp.asarray(queries)
        _, gt = brute_force_topk(qd, xd, K, metric=metric)
        gt = np.asarray(gt)
        np.save(gt_cache, gt)
        log(f"ground truth ({time.time() - t0:.1f}s)")

    elem_bytes = 1 if cfg.get("uint8") else 4
    raw_bytes = n * d * elem_bytes
    ref_rule = hnsw_memory_rule(n, d, elem_bytes=elem_bytes)
    best = None
    index_bytes = 0

    # Queries ride to the device ONCE, before the timing loop; results
    # (the ids) are fetched EVERY rep. The attached chip is reached via a
    # network tunnel whose host->device path measures ~6-9 MB/s: shipping
    # the 4 MB query batch per rep would time the tunnel (~600 ms/rep),
    # not the index. A serving deployment feeds queries over local PCIe
    # at GB/s; transferring the batch once mirrors the reference's own
    # drivers, which load queries into RAM before the timed loop
    # (sift_1m.cpp test_vs_recall). The per-rep ids fetch (~320 KB) stays
    # inside the timing: compute must actually finish and the answer must
    # actually arrive.
    queries_dev = jnp.asarray(queries)
    queries_dev.block_until_ready()

    if engine == "brute":
        del xd
        qd = queries_dev
        t0 = time.time()
        xb = jnp.asarray(x)
        norms = squared_norms(xb)
        build_s = time.time() - t0
        index_bytes = norms.size * 4
        for rt in (0.95, 0.99, 0.9995):
            dd, ii = brute_force_topk_approx(
                qd, xb, K, x_norms=norms, recall_target=rt
            )
            r = recall(np.asarray(ii), gt)
            ts = []
            for _ in range(5):
                t0 = time.time()
                dd, ii = brute_force_topk_approx(
                    qd, xb, K, x_norms=norms, recall_target=rt
                )
                np.asarray(ii)  # fetch EVERY rep: the tunnel defers
                # execution until a buffer is consumed, so only fetched
                # calls actually run (and serving returns results anyway)
                ts.append(time.time() - t0)
            qps = nq / sorted(ts)[len(ts) // 2]
            log(f"brute rt={rt}: recall@10={r:.4f} qps={qps:.0f}")
            best = (f"bf16+approx_top_k(rt={rt})", r, qps)
            if r >= TARGET_RECALL + 0.02:
                break

    elif engine == "hnsw":
        from hnsw_nsg_tpu.models.hnsw import HNSWIndex
        from hnsw_nsg_tpu.utils.params import HNSWConfig

        del xd
        t0 = time.time()
        idx = HNSWIndex(d, n, HNSWConfig(M=16, ef_construction=100), metric)
        t_ins = time.time()
        idx.add_items(x, batch_size=4096)
        ins_s = time.time() - t_ins
        idx.build_accel()
        build_s = time.time() - t0
        log(f"hnsw build+records: {build_s:.0f}s "
            f"(insert {ins_s:.0f}s = {n / ins_s:.0f} pts/s)")
        if os.environ.get("BENCH_SAVE_INDEX"):
            idx.save(os.environ["BENCH_SAVE_INDEX"])
            log(f"index saved to {os.environ['BENCH_SAVE_INDEX']}")
        index_bytes = (
            idx.adj0.size * 4
            + sum(a.size * 4 for a in idx.adj_up)
            + idx._records.nbytes()
            + idx.data.size * idx.data.dtype.itemsize
        )
        for ef in (32, 64, 128, 256):
            labels, _ = idx.knn_query(queries_dev, k=K, ef=ef)
            r = recall(labels, gt)
            ts = []
            for _ in range(3):
                t0 = time.time()
                labels, _ = idx.knn_query(queries_dev, k=K, ef=ef)
                ts.append(time.time() - t0)
            qps = nq / sorted(ts)[len(ts) // 2]
            log(f"hnsw ef={ef}: recall@10={r:.4f} qps={qps:.0f}")
            best = (f"ef={ef}", r, qps)
            if r >= TARGET_RECALL:
                break

    elif engine == "hybrid":
        # HNSW_NSG hybrid (hnsw_nsg/include/index_hnsw_nsg.h) at the
        # reference driver's configuration: M=16 efC=40, NSG R=20
        # (hnsw_nsg/tests/test_hnsw_nsg_search.cpp:331-347)
        from hnsw_nsg_tpu.models.hybrid import HybridHNSWNSG
        from hnsw_nsg_tpu.utils.params import HNSWConfig, NSGBuildConfig

        del xd
        t0 = time.time()
        idx = HybridHNSWNSG(
            d, n, HNSWConfig(M=16, ef_construction=40),
            NSGBuildConfig(L=40, R=20, C=500), metric,
        )
        idx.add_points(x, batch_size=4096)
        t1 = time.time()
        log(f"hybrid hnsw insert: {t1 - t0:.0f}s")
        idx.build_nsg_layer()
        idx.build_accel()
        build_s = time.time() - t0
        log(f"hybrid build total: {build_s:.0f}s "
            f"(nsg layer {time.time() - t1:.0f}s)")
        h = idx.hnsw
        index_bytes = (
            sum(a.size * 4 for a in h.adj_up)
            + idx.nsg.adj.size * 4
            + idx.nsg.records.nbytes()
            + h.data.size * h.data.dtype.itemsize
        )
        for L in (64, 96, 128, 192, 256):
            labels, _ = idx.search_knn(queries_dev, k=K, l_search=L)
            r = recall(labels, gt)
            ts = []
            for _ in range(3):
                t0 = time.time()
                labels, _ = idx.search_knn(queries_dev, k=K, l_search=L)
                ts.append(time.time() - t0)
            qps = nq / sorted(ts)[len(ts) // 2]
            log(f"hybrid L={L}: recall@10={r:.4f} qps={qps:.0f}")
            best = (f"L={L}", r, qps)
            if r >= TARGET_RECALL:
                break

    elif engine == "cnns_spill":
        # The reference's memory-pressure experiment
        # (CNNS/script/test_with_cgroup.sh + the pipeline driver's
        # load->search->merge, cluster_hnsw_nsg_search_pipeline.cpp:364-416):
        # the memory limit is set BELOW the index working set, forcing
        # cluster loads during the query. TPU analogue: slabs live in host
        # RAM, HBM holds only the router + one slab group at a time
        # (models/spill.py). BENCH_HBM_BUDGET_GB states the budget.
        import dataclasses
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.models.spill import SpillCNNSIndex
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        del xd
        budget = float(os.environ.get("BENCH_HBM_BUDGET_GB", "1.5"))
        t0 = time.time()
        slab = os.environ.get(
            "BENCH_SLAB", "int8" if cfg.get("uint8") else "bf16"
        )
        idx = build_cnns(
            x,
            CNNSConfig(n_clusters=n_clusters, m=4, kmeans_iters=12,
                       replicate=True),
            metric=metric,
            local_index="flat",
            slab_dtype=jnp.int8 if slab == "int8" else None,
        )
        if slab == "bf16":
            idx = dataclasses.replace(
                idx, data_c=idx.data_c.astype(jnp.bfloat16))
        build_s = time.time() - t0
        log(f"build (cnns_flat for spill, {n_clusters} clusters, "
            f"maxc={idx.maxc}): {build_s:.1f}s")
        index_bytes = (
            idx.data_c.size * idx.data_c.dtype.itemsize
            + idx.reps.size * 4 + idx.ids_c.size * 4
            + (idx.cnorms_c.size * 4 if idx.cnorms_c is not None else 0)
        )
        sp = SpillCNNSIndex(idx, int(budget * 1e9))
        # evict the resident slab copies: only the router may stay in HBM
        for arr in (idx.data_c, idx.ids_c, idx.cnorms_c):
            if arr is not None:
                arr.delete()
        del idx
        log(f"spill: index {index_bytes / 1e9:.2f} GB, HBM budget "
            f"{budget:.2f} GB, group_size={sp.group_size} slabs "
            f"({sp.group_size * sp.slab_bytes / 1e9:.2f} GB/group)")
        for nprobe in (2, 4, 8):
            sp.stats = type(sp.stats)()
            t0 = time.time()
            dd, ii = sp.search(queries_dev, k=K, nprobe=nprobe)
            ii = np.asarray(ii)
            dt = time.time() - t0
            r = recall(ii, gt)
            qps = nq / dt
            st = sp.stats
            # the tunnel moves host->device at ~6-9 MB/s (PROGRESS.md
            # tunnel physics); a serving deployment's PCIe moves the same
            # groups at >= 10 GB/s, so also report the projected QPS with
            # transfers at PCIe speed (device scan time measured here)
            xfer_s = st.bytes_transferred / 7e6
            pcie_s = max(dt - xfer_s, 0.0) + st.bytes_transferred / 10e9
            log(f"spill nprobe={nprobe}: recall@10={r:.4f} qps={qps:.1f} "
                f"rounds={st.transfer_rounds} "
                f"moved={st.bytes_transferred / 1e9:.2f}GB "
                f"peak_group={st.peak_group_bytes / 1e9:.2f}GB "
                f"projected_pcie_qps={nq / pcie_s:.0f}")
            best = (
                f"nprobe={nprobe} budget={budget}GB "
                f"rounds={st.transfer_rounds} "
                f"moved_gb={st.bytes_transferred / 1e9:.2f}", r, qps,
            )
            if r >= TARGET_RECALL:
                break

    else:
        import dataclasses
        from hnsw_nsg_tpu.models.cnns import build_cnns
        from hnsw_nsg_tpu.utils.params import CNNSConfig

        del xd
        t0 = time.time()
        local = "nsg" if engine == "cnns_nsg" else "flat"
        slab = os.environ.get("BENCH_SLAB", cfg.get(
            "slab", "int8" if cfg.get("uint8") else "bf16"
        ))
        build_dtype = jnp.int8 if slab == "int8" else None
        if engine == "cnns_flat" and slab == "bf16":
            # pack bf16 directly on device: a post-build f32->bf16 cast
            # would materialize the f32 slab tensor first, which OOMs HBM
            # at large d (8.5 GB at the GIST shape, on top of the 3.8 GB
            # resident dataset)
            build_dtype = jnp.bfloat16
        # boundary replication into the dead pad slots: recall-per-probe
        # rises at zero extra scan cost/memory (flat local only)
        replicate = local == "flat" and os.environ.get(
            "BENCH_REPLICATE", "1"
        ) != "0"
        idx = build_cnns(
            x,
            CNNSConfig(n_clusters=n_clusters, m=4, kmeans_iters=12,
                       replicate=replicate),
            metric=metric,
            local_index=local,
            slab_dtype=build_dtype,
        )
        build_s = time.time() - t0
        log(f"build ({engine}, {n_clusters} clusters, maxc={idx.maxc}): "
            f"{build_s:.1f}s")
        index_bytes = (
            idx.data_c.size * idx.data_c.dtype.itemsize
            + idx.reps.size * 4 + idx.ids_c.size * 4
            + (idx.cnorms_c.size * 4 if idx.cnorms_c is not None else 0)
            + (idx.flat_adj.size * 4 if idx.flat_adj is not None else 0)
        )
        for nprobe in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128):
            if nprobe > idx.n_clusters:
                break
            dd, ii = idx.search(queries_dev, k=K, nprobe=nprobe)
            r = recall(np.asarray(ii), gt)
            # median-of-reps: the shared tunnel's load spikes hit
            # individual reps with 2-3x outliers; the median rep is the
            # steady-state a dedicated chip sustains (every rep still
            # fetches its result, so every rep really executed)
            ts = []
            reps = 10
            for _ in range(reps):
                t0 = time.time()
                dd, ii = idx.search(queries_dev, k=K, nprobe=nprobe)
                np.asarray(ii)  # fetch every rep (deferred execution)
                ts.append(time.time() - t0)
            ts.sort()
            qps = nq / ts[len(ts) // 2]
            log(f"nprobe={nprobe}: recall@10={r:.4f} qps={qps:.0f} "
                f"(rep ms min/med/max {ts[0] * 1e3:.0f}/"
                f"{ts[len(ts) // 2] * 1e3:.0f}/{ts[-1] * 1e3:.0f})")
            best = (f"nprobe={nprobe}", r, qps)
            if r >= TARGET_RECALL:
                if os.environ.get("BENCH_BREAKDOWN"):
                    # component attribution (VERDICT r3 item 6): route-only
                    # vs full fused search, each fetched, 10 reps
                    rts = []
                    for _ in range(10):
                        t0 = time.time()
                        v = idx._route(queries_dev, nprobe)
                        np.asarray(v)
                        rts.append(time.time() - t0)
                    rts.sort()
                    log(f"breakdown nprobe={nprobe}: route-only ms "
                        f"min/med/max {rts[0] * 1e3:.0f}/"
                        f"{rts[len(rts) // 2] * 1e3:.0f}/{rts[-1] * 1e3:.0f}"
                        f"; full-search ms min/med/max {ts[0] * 1e3:.0f}/"
                        f"{ts[len(ts) // 2] * 1e3:.0f}/{ts[-1] * 1e3:.0f}")
                break

    setting, r, qps = best
    # compile-cache attribution: new persisted entries mean this run paid
    # compile time inside build_s/search sweeps (cold); zero new entries
    # means every program came from the warm cache
    new_entries = len(os.listdir(_CACHE_DIR)) - _CACHE_ENTRIES_BEFORE
    cache_state = (
        f"warm_cache({_CACHE_ENTRIES_BEFORE} entries)" if new_entries <= 0
        else f"cold_compiles({new_entries} new of "
             f"{_CACHE_ENTRIES_BEFORE + new_entries})"
    )
    log(f"compile cache: {cache_state}")
    log(f"index bytes: {index_bytes / 1e9:.2f} GB "
        f"(raw vectors {raw_bytes / 1e9:.2f} GB, "
        f"reference HNSW rule {ref_rule / 1e9:.2f} GB)")
    data_kind = "uniform-synthetic" if cfg.get("uniform") else (
        "clustered-synthetic")
    if r >= TARGET_RECALL:
        head = f"QPS at recall@10>={TARGET_RECALL} (measured {r:.3f})"
    else:
        # the sweep never reached the target: refuse to dress the last
        # operating point up as the headline — say so explicitly
        head = (f"TARGET recall@10>={TARGET_RECALL} NOT REACHED "
                f"(best {r:.3f}), QPS at that sub-target point")
    print(json.dumps({
        "metric": (
            f"{head}, "
            f"{cfg_name} N={n} d={d} {metric} {data_kind}, "
            f"engine={engine} {setting}, build_s={build_s:.0f} "
            f"[{cache_state}], "
            f"index_gb={index_bytes / 1e9:.2f} "
            f"(ref_hnsw_rule_gb={ref_rule / 1e9:.2f}), 1 TPU chip"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
