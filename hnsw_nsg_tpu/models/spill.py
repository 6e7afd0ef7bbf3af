"""Host-spill CNNS search under an HBM byte budget.

The reference tests memory pressure by running its lazy-loading pipeline
driver inside a cgroup-v2 memory limit (CNNS/script/test_with_cgroup.sh:
1-58) — cluster files are mmap'd on demand during the query
(cluster_hnsw_nsg_search_pipeline.cpp:364-416: load task -> search task ->
mutex merge), so the working set is the probed clusters, not the dataset.

The TPU analogue: HBM is the constrained tier and host RAM is the backing
store. ``SpillCNNSIndex`` wraps a built :class:`CNNSIndex`, keeps the big
cluster slabs in host memory, and keeps only the routing state (reps,
ids, norms — a few % of the slab bytes) resident. Each query batch:

  1. route on device (the resident representative GEMM);
  2. host-side, collect the probed cluster ids and pack them into groups
     whose slab bytes fit ``hbm_budget_bytes``;
  3. per group: transfer the group's slabs once, scan with the same exact
     per-cluster kernel as the resident index, and merge into the running
     global top-k (the pipeline driver's load->search->merge, with the
     retset merge replacing the mutex).

Searches are exact per probed cluster, so results match the resident
index's for the same visit list; the budget only changes how many
transfer rounds happen. ``stats`` records per-batch transfer rounds,
bytes moved, and the peak device working set for budget assertions —
the cgroup harness's memory.current polling, in-process.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import PAD_DIST, PAD_ID, as_f32_queries
from ..ops.topk import topk_smallest
from .cnns import CNNSIndex, _flat_probe_search, dedup_topk


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(d0, i0, d1, i1, k):
    return topk_smallest(
        jnp.concatenate([d0, d1], axis=1),
        jnp.concatenate([i0, i1], axis=1),
        k,
    )


@dataclasses.dataclass
class SpillStats:
    transfer_rounds: int = 0
    bytes_transferred: int = 0
    peak_group_bytes: int = 0

    def note(self, nbytes: int) -> None:
        self.transfer_rounds += 1
        self.bytes_transferred += nbytes
        self.peak_group_bytes = max(self.peak_group_bytes, nbytes)


class SpillCNNSIndex:
    """CNNS search with host-resident slabs under an HBM budget."""

    def __init__(self, idx: CNNSIndex, hbm_budget_bytes: int,
                 group_pad: int = 8):
        self.metric = idx.metric
        self.qshift = idx.qshift
        self.qscale = idx.qscale
        self.replicated = idx.replicated
        self.reps = idx.reps                       # device (router)
        self.n_real = idx.n_real or idx.reps.shape[0]
        self._route = idx._route
        # slabs spill to host; ids/norms stay with their slabs
        self.data_np = np.asarray(idx.data_c)
        self.ids_np = np.asarray(idx.ids_c)
        self.cnorms_np = (
            np.asarray(idx.cnorms_c) if idx.cnorms_c is not None else None
        )
        self.slab_bytes = (
            self.data_np[0].nbytes + self.ids_np[0].nbytes
            + (self.cnorms_np[0].nbytes if self.cnorms_np is not None else 0)
        )
        self.group_pad = group_pad
        self.group_size = max(
            group_pad, int(hbm_budget_bytes // max(self.slab_bytes, 1))
            // group_pad * group_pad,
        )
        if self.group_size * self.slab_bytes > hbm_budget_bytes and (
            self.slab_bytes * group_pad > hbm_budget_bytes
        ):
            raise ValueError(
                f"hbm_budget_bytes={hbm_budget_bytes} below one "
                f"{group_pad}-slab group ({group_pad * self.slab_bytes} B)"
            )
        self.stats = SpillStats()

    def search(self, queries, k: int = 100, nprobe: int = 4,
               rank_by: str = "hits"):
        q = as_f32_queries(queries)
        if self.qscale != 1.0 or np.any(self.qshift):
            # slabs are stored shifted/scaled; match the domain
            # (CNNSIndex._search_impl's transform)
            q = (q - jnp.asarray(self.qshift, jnp.float32)) / jnp.float32(
                self.qscale
            )
        nprobe = min(nprobe, self.n_real)
        visit = np.asarray(self._route(q, nprobe, rank_by))   # [Q, V]
        nq = q.shape[0]

        # replicated boundary points can surface from two probed slabs:
        # carry 2k candidates through every round's merge and dedup at
        # the end, exactly like the resident CNNSIndex.search
        kk = 2 * k if self.replicated else k
        probed = np.unique(visit[visit >= 0])
        best_d = jnp.full((nq, kk), PAD_DIST, jnp.float32)
        best_i = jnp.full((nq, kk), PAD_ID, jnp.int32)
        gs = self.group_size
        for g0 in range(0, len(probed), gs):
            grp = probed[g0 : g0 + gs]
            # remap this group's clusters to compact slots; visits outside
            # the group become PAD for this round
            lut = np.full(self.data_np.shape[0] + 1, PAD_ID, np.int32)
            lut[grp] = np.arange(len(grp), dtype=np.int32)
            vis_g = lut[np.where(visit >= 0, visit, self.data_np.shape[0])]
            rows = -(-len(grp) // self.group_pad) * self.group_pad
            pad = rows - len(grp)
            data_g = self.data_np[grp]
            ids_g = self.ids_np[grp]
            if pad:
                data_g = np.concatenate(
                    [data_g, np.zeros((pad,) + data_g.shape[1:],
                                      data_g.dtype)]
                )
                ids_g = np.concatenate(
                    [ids_g, np.full((pad, ids_g.shape[1]), PAD_ID,
                                    np.int32)]
                )
            data_d = jnp.asarray(data_g)
            ids_d = jnp.asarray(ids_g)
            if self.cnorms_np is not None:
                nrm_g = self.cnorms_np[grp]
                if pad:
                    nrm_g = np.concatenate(
                        [nrm_g, np.zeros((pad, nrm_g.shape[1]), np.float32)]
                    )
                nrm_d = jnp.asarray(nrm_g)
            else:
                nrm_d = jnp.zeros(ids_d.shape, jnp.float32)
            self.stats.note(
                data_d.nbytes + ids_d.nbytes + nrm_d.nbytes
            )
            gd, gi = _flat_probe_search(
                q, jnp.asarray(vis_g), data_d, ids_d, nrm_d, kk,
                self.metric, q_round=self.qscale == 1.0,
            )
            best_d, best_i = _merge_topk(best_d, best_i, gd, gi, kk)
        if self.replicated:
            best_d, best_i = dedup_topk(best_d, best_i, k)
        if self.qscale != 1.0:
            # rescale filled slots only: unfilled PAD_DIST sentinels
            # (3.4e37) would overflow to inf at qscale >= ~2 and break
            # callers that recognize the sentinel
            best_d = jnp.where(
                best_i >= 0,
                best_d * jnp.float32(self.qscale) ** 2,
                best_d,
            )
        return best_d, best_i
