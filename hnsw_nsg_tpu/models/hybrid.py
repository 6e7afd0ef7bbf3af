"""Hybrid HNSW-upper / NSG-base index.

Reference: ``HNSW_NSG<dist_t>`` (hnsw_nsg/include/index_hnsw_nsg.h:12-161) —
one point set, two structures: an hnswlib ``HierarchicalNSW`` whose upper
layers provide greedy routing, and an ``IndexNSG`` over the base layer.
``searchKnn`` (:107-151) replicates the HNSW greedy descent from maxlevel
down to 1, takes the landing node's label as the NSG entry point, and calls
``SearchFromEnterpoint`` (hnsw_nsg/src/index_nsg.cpp:703-783).

Here the two structures share the data/norm arrays: HNSWIndex supplies the
upper-level adjacency (its own level-0 links are simply unused after
``build_nsg``), NSGIndex supplies the base layer. Insert-then-Build_NSG
ordering matches the reference driver (hnsw_nsg/tests/
test_hnsw_nsg_search.cpp:331-347: parallel addPoint then Build_NSG).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.distance import as_f32_queries
from ..utils.params import HNSWConfig, NSGBuildConfig, NNDescentConfig
from .hnsw import HNSWIndex
from .nsg import NSGIndex, build_nsg
from .rptree import knn_graph_rp
from ..ops.bruteforce import knn_graph_exact


class HybridHNSWNSG:
    """HNSW levels >= 1 for routing; NSG at the base layer."""

    def __init__(
        self,
        dim: int,
        max_elements: int,
        hnsw_cfg: HNSWConfig = HNSWConfig(),
        nsg_cfg: NSGBuildConfig = NSGBuildConfig(L=40, R=20, C=500),
        metric: str = "l2",
    ):
        self.hnsw = HNSWIndex(dim, max_elements, hnsw_cfg, metric)
        self.nsg_cfg = nsg_cfg
        self.metric = metric
        self.nsg: NSGIndex | None = None

    @property
    def n(self) -> int:
        return self.hnsw.n

    def add_points(self, vecs, labels=None, batch_size: int = 4096):
        """addPoint inserts into HNSW only (index_hnsw_nsg.h:79-82)."""
        self.hnsw.add_items(vecs, labels, batch_size=batch_size)
        self.nsg = None  # base layer stale until rebuilt

    def build_nsg_layer(self, knn_adj=None, seed: int = 0):
        """Build_NSG (index_hnsw_nsg.h:72-74): NSG over all points."""
        n = self.hnsw.n
        data = self.hnsw.data[:n]
        if knn_adj is None:
            k = min(self.nsg_cfg.L + 10, n - 1)
            if n <= 8192:
                knn_adj = knn_graph_exact(data, k, query_block=4096)
            elif n <= 200_000:
                knn_adj = knn_graph_rp(
                    np.asarray(data), k, metric=self.metric, seed=seed,
                    refine=NNDescentConfig(K=k, L=k + 20, iters=2, S=8, R=8),
                )
            else:
                # large-N: the cluster-join builder (models/knn_ivf.py) —
                # contiguous slab GEMMs instead of the gather-bound
                # tree/refine path
                from .knn_ivf import knn_graph_ivf

                knn_adj = knn_graph_ivf(
                    np.asarray(data), k, metric=self.metric, seed=seed,
                )
        self.nsg = build_nsg(
            data, knn_adj, self.nsg_cfg, metric=self.metric, seed=seed
        )

    def build_accel(self) -> None:
        """Pack the NSG base layer into the int8 record layout
        (models/records.py): one row gather per frontier expansion. The
        HNSW side needs no packing — routed entry selection is already a
        single GEMM."""
        if self.nsg is None:
            raise RuntimeError("call build_nsg_layer() before build_accel")
        self.nsg.build_accel()

    def search_knn(
        self, queries, k: int = 10, ef: int = 100, l_search: int | None = None,
        expand: int = 1, entry: str = "routed",
    ):
        """searchKnn (index_hnsw_nsg.h:107-151): HNSW upper levels pick
        the entry label -> NSG SearchFromEnterpoint with ef-sized K.

        entry: "routed" (one GEMM over level>=1 nodes — see
        HNSWIndex._entry_points) or "descend" (the reference's per-level
        greedy walk). Returns (labels [Q, k] int64, dists [Q, k] exact)."""
        if self.nsg is None:
            raise RuntimeError("call build_nsg_layer() before searching")
        q = as_f32_queries(queries)
        h = self.hnsw
        if entry == "descend":
            cur = h._descend_entry(q)
        else:
            cur = h._entry_points(q)
        d, ids = self.nsg.search_from_enterpoint(
            q, cur, k=k, l_search=max(l_search or ef, k), expand=expand,
        )
        ids_np = np.asarray(ids)
        labels = np.where(
            ids_np >= 0, h.labels[np.clip(ids_np, 0, None)], -1
        )
        return labels, np.asarray(d)

    # -- persistence (two sub-indices, like _hnsw.bin/_nsg.bin,
    # index_hnsw_nsg.h:153-159) --------------------------------------------

    def save(self, prefix: str) -> None:
        self.hnsw.save(prefix + "_hnsw.npz")
        if self.nsg is not None:
            self.nsg.save(prefix + "_nsg.npz")

    @classmethod
    def load(cls, prefix: str, nsg_cfg=NSGBuildConfig()) -> "HybridHNSWNSG":
        hnsw = HNSWIndex.load(prefix + "_hnsw.npz")
        obj = cls.__new__(cls)
        obj.hnsw = hnsw
        obj.nsg_cfg = nsg_cfg
        obj.metric = hnsw.metric
        try:
            obj.nsg = NSGIndex.load(
                prefix + "_nsg.npz", hnsw.data[: hnsw.n]
            )
        except FileNotFoundError:
            obj.nsg = None
        return obj
