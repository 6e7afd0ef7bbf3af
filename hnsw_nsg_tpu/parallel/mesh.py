"""Multi-chip sharding: per-shard sub-index search + ICI top-k merge.

The reference has no distributed code (SURVEY.md §2.9: OpenMP threads and
mutexes only). Its cluster-sharded search — independent per-cluster
sub-indexes, selectively searched, results merged under a mutex
(CNNS/tests/cluster_hnsw_nsg_search_pipeline.cpp:194-212 merge_topk_queue)
— is exactly the shape that lifts onto a TPU mesh:

  * dataset rows shard across a 1-D ``Mesh`` axis ("shard");
  * every device runs the SAME lockstep search over its local rows / local
    graph (SPMD under ``shard_map``);
  * the global top-k merge is one ``lax.all_gather`` of [Q, k] (dist, id)
    pairs over ICI — k*(4+4) bytes per shard per query — followed by a
    replicated ``lax.top_k``; the reference's mutex-guarded k-th-best bound
    becomes data parallelism for free.

Graph construction shards the same way: a device builds the kNN rows of its
own points against the all-gathered dataset (one GEMM per tile), giving a
bulk-synchronous distributed build step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.distance import PAD_DIST, PAD_ID, squared_norms
from ..ops.bruteforce import brute_force_topk
from ..ops.topk import topk_smallest
from ..models.beam import beam_search

AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (AXIS,))


def _merge_allgather(local_d, local_i, k):
    """All-gather each shard's [Q, k] top-k and merge (replicated)."""
    dg = jax.lax.all_gather(local_d, AXIS, axis=0)  # [S, Q, k]
    ig = jax.lax.all_gather(local_i, AXIS, axis=0)
    s, qn, kk = dg.shape
    dd = jnp.transpose(dg, (1, 0, 2)).reshape(qn, s * kk)
    ii = jnp.transpose(ig, (1, 0, 2)).reshape(qn, s * kk)
    return topk_smallest(dd, ii, k)


@dataclasses.dataclass
class ShardedFlatIndex:
    """Row-sharded exact search: the distributed BruteforceSearch and the
    recall oracle for sharded configs."""

    mesh: Mesh
    data: jax.Array     # [N, d] sharded on rows
    n: int

    @classmethod
    def build(cls, mesh: Mesh, data) -> "ShardedFlatIndex":
        data = jnp.asarray(data)
        n = data.shape[0]
        s = mesh.shape[AXIS]
        n_pad = -(-n // s) * s
        if n_pad != n:
            data = jnp.concatenate(
                [data, jnp.zeros((n_pad - n, data.shape[1]), data.dtype)]
            )
        data = jax.device_put(
            data, jax.sharding.NamedSharding(mesh, P(AXIS, None))
        )
        return cls(mesh=mesh, data=data, n=n)

    def search(self, queries, k: int):
        q = jnp.asarray(queries)
        n_valid = self.n
        shard_rows = self.data.shape[0] // self.mesh.shape[AXIS]

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, None), P(AXIS, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def run(qq, xs):
            my = jax.lax.axis_index(AXIS)
            offset = my * shard_rows
            row_ids = offset + jax.lax.broadcasted_iota(
                jnp.int32, (1, shard_rows), 1
            )
            from ..ops.distance import pairwise_dists
            d = pairwise_dists(qq, xs, "l2", exact=True)
            d = jnp.where(row_ids < n_valid, d, PAD_DIST)
            ids = jnp.where(row_ids < n_valid, row_ids, PAD_ID)
            ld, li = topk_smallest(
                d, jnp.broadcast_to(ids, d.shape), min(k, shard_rows)
            )
            return _merge_allgather(ld, li, k)

        return run(q, self.data)


@dataclasses.dataclass
class ShardedGraphIndex:
    """Row-range sharding of a graph index: each device owns a contiguous
    row range with an independent sub-graph (cluster sharding per SURVEY.md
    §2.9), searched in lockstep and merged over ICI."""

    mesh: Mesh
    data: jax.Array      # [S*rows, d] sharded
    norms: jax.Array     # [S*rows] sharded
    adj: jax.Array       # [S*rows, R] sharded, LOCAL ids (0..rows-1)
    eps: jax.Array       # [S] entry point (local id) per shard
    n: int

    @classmethod
    def build_from_shards(cls, mesh, datas, adjs, eps):
        """datas/adjs: per-shard lists with equal shapes (local ids)."""
        data = jnp.concatenate([jnp.asarray(x) for x in datas])
        adj = jnp.concatenate([jnp.asarray(a, jnp.int32) for a in adjs])
        ns = jax.sharding.NamedSharding(mesh, P(AXIS, None))
        data = jax.device_put(data, ns)
        adj = jax.device_put(adj, ns)
        norms = jax.device_put(
            squared_norms(data),
            jax.sharding.NamedSharding(mesh, P(AXIS)),
        )
        return cls(
            mesh=mesh, data=data, norms=norms, adj=adj,
            eps=jnp.asarray(eps, jnp.int32), n=data.shape[0],
        )

    def search(self, queries, k: int, l_search: int = 64,
               max_hops: int = 256, expand: int = 1):
        q = jnp.asarray(queries)
        rows = self.data.shape[0] // self.mesh.shape[AXIS]

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, None), P(AXIS, None), P(AXIS),
                      P(AXIS, None), P(AXIS)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def run(qq, xs, ns, adj, ep):
            my = jax.lax.axis_index(AXIS)
            init = jnp.concatenate(
                [jnp.broadcast_to(ep[0], (qq.shape[0], 1)),
                 jnp.take(adj, ep[0], axis=0)[None].repeat(qq.shape[0], 0)],
                axis=1,
            )
            res = beam_search(
                qq, xs, ns, adj, init, width=l_search,
                max_hops=max_hops, expand=expand,
            )
            ld = res.dists[:, :k] + squared_norms(qq)[:, None]
            li = jnp.where(
                res.ids[:, :k] >= 0,
                res.ids[:, :k] + my * rows,
                PAD_ID,
            )
            return _merge_allgather(ld, li, k)

        return run(q, self.data, self.norms, self.adj, self.eps)


def sharded_knn_build_step(mesh, data_sharded, k: int):
    """One distributed kNN-graph build step: every device computes the
    exact kNN rows of ITS points against the all-gathered dataset (the
    collective-heavy 'training step' of index construction)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None),),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    def run(xs):
        my = jax.lax.axis_index(AXIS)
        rows = xs.shape[0]
        full = jax.lax.all_gather(xs, AXIS, axis=0, tiled=True)  # [N, d]
        d, ids = brute_force_topk(
            xs, full, k + 1, tile=max(full.shape[0], 8)
        )
        self_col = my * rows + jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1), 0
        )
        not_self = ids != self_col
        order = jnp.argsort(~not_self, axis=1, stable=True)
        ids = jnp.take_along_axis(ids, order, axis=1)[:, :k]
        keep = jnp.take_along_axis(not_self, order, axis=1)[:, :k]
        return jnp.where(keep, ids, PAD_ID)

    return run(data_sharded)
