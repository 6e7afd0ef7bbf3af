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

from ..ops.distance import PAD_DIST, PAD_ID, as_f32_queries, squared_norms
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
    """Row-sharded graph index with ROUTED probing: each device owns an
    independent sub-graph (cluster sharding per SURVEY.md §2.9), a
    replicated representative table routes every query to its ``nprobe``
    most promising shards, and each shard beams ONLY the queries routed to
    it (compacted into a fixed-slot block), merging over ICI.

    This is the CNNS routing treatment applied to graph shards: the
    reference ranks clusters by representative hits and searches them
    selectively (cluster_hnsw_nsg_search.cpp:141-173); here the rank is
    min representative distance (its sort_by_min_dist ablation variant)
    and "selectively" is a per-shard query compaction — a shard's work is
    ~nprobe/S of the batch instead of the whole batch on every shard.

    Unequal shards are padded to the max row count (pad rows carry PAD
    adjacency and are unreachable: entries come from representative ids,
    which are always real rows).
    """

    mesh: Mesh
    data: jax.Array      # [S*rows_pad, d] sharded
    norms: jax.Array     # [S*rows_pad] sharded
    adj: jax.Array       # [S*rows_pad, R] sharded, LOCAL ids
    rep_ids: jax.Array   # [S, R_reps] local node ids, sharded on S
    reps: jax.Array      # [S, R_reps, d] representative rows, REPLICATED
    n: int               # total real rows
    n_shard: tuple       # real rows per shard

    @classmethod
    def build_from_shards(cls, mesh, datas, adjs, eps=None,
                          n_reps: int = 32, seed: int = 0):
        """datas/adjs: per-shard lists (local ids; shapes may differ by
        shard — rows pad to the max). ``eps`` (optional per-shard entry
        ids) join the representative set; the rest are a deterministic
        row sample."""
        s = mesh.shape[AXIS]
        assert len(datas) == s, (len(datas), s)
        rng = np.random.default_rng(seed)
        rows_pad = max(x.shape[0] for x in datas)
        deg = max(a.shape[1] for a in adjs)
        d = datas[0].shape[1]
        data = np.zeros((s * rows_pad, d), np.float32)
        adj = np.full((s * rows_pad, deg), PAD_ID, np.int32)
        rep_ids = np.zeros((s, n_reps), np.int32)
        reps = np.zeros((s, n_reps, d), np.float32)
        n = 0
        n_shard = []
        for m in range(s):
            x = np.asarray(datas[m], np.float32)
            a = np.asarray(adjs[m], np.int32)
            ns_m = x.shape[0]
            n_shard.append(ns_m)
            n += ns_m
            data[m * rows_pad : m * rows_pad + ns_m] = x
            adj[m * rows_pad : m * rows_pad + ns_m, : a.shape[1]] = a
            sample = rng.choice(ns_m, min(n_reps, ns_m), replace=False)
            if eps is not None:
                sample[0] = int(eps[m])
            rep_ids[m] = np.resize(sample, n_reps)
            reps[m] = x[rep_ids[m]]
        shard2 = jax.sharding.NamedSharding(mesh, P(AXIS, None))
        return cls(
            mesh=mesh,
            data=jax.device_put(jnp.asarray(data), shard2),
            norms=jax.device_put(
                squared_norms(jnp.asarray(data)),
                jax.sharding.NamedSharding(mesh, P(AXIS)),
            ),
            adj=jax.device_put(jnp.asarray(adj), shard2),
            rep_ids=jax.device_put(jnp.asarray(rep_ids), shard2),
            reps=jnp.asarray(reps),
            n=n,
            n_shard=tuple(n_shard),
        )

    def search(self, queries, k: int, l_search: int = 64,
               max_hops: int = 256, expand: int = 1,
               nprobe: int = 1, q_slots: int | None = None,
               init_width: int = 4):
        """Returns (dists [Q, k], global ids [Q, k], evals [S]).

        nprobe: shards probed per query (min-rep-distance rank).
        q_slots: per-shard compacted query capacity (default: 2x the
        balanced share, power-of-two). Overflow beyond it is dropped in
        routing-rank order — the early-stop analogue.
        """
        q = jnp.asarray(queries)
        qn = q.shape[0]
        s = self.mesh.shape[AXIS]
        nprobe = min(nprobe, s)
        rows_pad = self.data.shape[0] // s
        if q_slots is None:
            fair = -(-qn * nprobe // s)
            q_slots = min(qn, _next_pow2_int(2 * fair))
        init_width = min(init_width, self.reps.shape[1])

        # replicated routing: min distance to any shard representative
        qf = q.astype(jnp.float32)
        rep_flat = self.reps.reshape(s * self.reps.shape[1], -1)
        from ..ops.distance import pairwise_dists
        rd = pairwise_dists(qf, rep_flat, "l2", exact=False)
        rd = rd.reshape(qn, s, -1).min(axis=2)            # [Q, S]
        _, visit = jax.lax.top_k(-rd, nprobe)             # [Q, nprobe]

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, None), P(None, None), P(AXIS, None),
                      P(AXIS), P(AXIS, None), P(AXIS, None)),
            out_specs=(P(None, None), P(None, None), P(AXIS)),
            check_vma=False,
        )
        def run(qq, vis, xs, ns, adj, rep_ids_l):
            my = jax.lax.axis_index(AXIS)
            owned = jnp.any(vis == my, axis=1)            # [Q]
            # compact owned queries into q_slots rows (query order)
            score = jnp.where(
                owned,
                qn - jax.lax.broadcasted_iota(jnp.int32, (qn,), 0),
                -1,
            )
            _, sel = jax.lax.top_k(score, q_slots)        # [q_slots]
            live = jnp.take(owned, sel)
            qq_c = jnp.take(qq, sel, axis=0)
            # per-shard entry selection: the init_width nearest
            # representatives of THIS shard (one small GEMM)
            rep_rows = jnp.take(xs, rep_ids_l[0], axis=0)  # [R_reps, d]
            dr = pairwise_dists(
                qq_c.astype(jnp.float32), rep_rows, "l2", exact=False
            )
            _, near = jax.lax.top_k(-dr, init_width)
            init = jnp.take(rep_ids_l[0], near)            # [q_slots, I]
            init = jnp.where(live[:, None], init, PAD_ID)
            res = beam_search(
                qq_c, xs, ns, adj, init, width=l_search,
                max_hops=max_hops, expand=expand,
            )
            ld_c = res.dists[:, :k] + squared_norms(qq_c)[:, None]
            li_c = jnp.where(
                (res.ids[:, :k] >= 0) & live[:, None],
                res.ids[:, :k] + my * rows_pad,
                PAD_ID,
            )
            ld_c = jnp.where(li_c >= 0, ld_c, PAD_DIST)
            # scatter compacted rows back to their query slots
            dst = jnp.where(live, sel, qn)
            ld = jnp.full((qn, k), PAD_DIST, jnp.float32).at[dst].set(
                ld_c, mode="drop"
            )
            li = jnp.full((qn, k), PAD_ID, jnp.int32).at[dst].set(
                li_c, mode="drop"
            )
            evals = jnp.sum(jnp.where(live, res.evals, 0))
            gd, gi = _merge_allgather(ld, li, k)
            return gd, gi, evals[None]

        return run(q, visit, self.data, self.norms, self.adj, self.rep_ids)


def _next_pow2_int(x: int) -> int:
    return 1 << max(0, (int(x) - 1)).bit_length()


@dataclasses.dataclass
class ShardedCNNSIndex:
    """Cluster-sharded CNNS with ROUTED probing: the production mesh
    layout (SURVEY.md §2.9 "exactly the shape to lift").

    Clusters are dealt round-robin across the mesh axis (cluster c lives on
    shard ``c % S``; trailing empty clusters pad C to a multiple of S, which
    also absorbs unequal cluster sizes). Routing runs replicated — the
    representative table is tiny — and each shard then scans ONLY the
    probed clusters it owns: a query's nprobe probes hit a given shard
    ~Binomial(nprobe, 1/S) times, so each shard compacts its owned probes
    into ``slots = ceil(nprobe/S)+1`` scan slots (overflow beyond that is
    dropped — rare and recall-neutral, like the reference's early-stop
    skipping low-ranked clusters, cluster_hnsw_nsg_search.cpp:237-251).
    Per-shard work is therefore ~nprobe/S of the single-device scan instead
    of nprobe on every shard; the global merge is one [Q, k] all-gather +
    top-k over ICI. search() also returns per-shard distance-eval counts so
    selectivity is observable (metric_distance_computations analogue).
    """

    mesh: Mesh
    reps: jax.Array      # [C_pad, m+1, d] replicated
    data_c: jax.Array    # [C_pad, maxc, d] sharded on clusters
    ids_c: jax.Array     # [C_pad, maxc] global ids, sharded
    cnorms_c: jax.Array  # [C_pad, maxc] sharded
    n_clusters: int      # real cluster count (pre-padding)
    metric: str = "l2"
    replicated: bool = False  # slabs carry replicas -> dedup merge

    @classmethod
    def build(cls, mesh: Mesh, idx) -> "ShardedCNNSIndex":
        """Redistribute a built CNNSIndex (models/cnns.py) over the mesh."""
        s = mesh.shape[AXIS]
        c = idx.n_clusters
        c_pad = -(-c // s) * s
        reps = np.asarray(idx.reps, np.float32)
        data_c = np.asarray(idx.data_c, np.float32)
        ids_c = np.asarray(idx.ids_c)
        if c_pad != c:
            pad = c_pad - c
            reps = np.concatenate(
                [reps, np.full((pad,) + reps.shape[1:], 1e30, np.float32)]
            )
            data_c = np.concatenate(
                [data_c, np.zeros((pad,) + data_c.shape[1:], np.float32)]
            )
            ids_c = np.concatenate(
                [ids_c, np.full((pad,) + ids_c.shape[1:], PAD_ID,
                                ids_c.dtype)]
            )
        # shard-major order: cluster c sits at row (c % s) * (c_pad//s) +
        # c // s, so P(AXIS) gives shard m the clusters with c % s == m
        perm = np.argsort(
            (np.arange(c_pad) % s) * c_pad + np.arange(c_pad) // s,
            kind="stable",
        )
        ns_c = jax.sharding.NamedSharding(mesh, P(AXIS, None, None))
        data_cs = jax.device_put(jnp.asarray(data_c[perm]), ns_c)
        cnorms = jax.device_put(
            squared_norms(jnp.asarray(data_c[perm])),
            jax.sharding.NamedSharding(mesh, P(AXIS, None)),
        )
        return cls(
            mesh=mesh,
            reps=jnp.asarray(reps),
            data_c=data_cs,
            ids_c=jax.device_put(
                jnp.asarray(ids_c[perm]),
                jax.sharding.NamedSharding(mesh, P(AXIS, None)),
            ),
            cnorms_c=cnorms,
            # the REAL cluster count: idx.n_clusters is already padded to
            # a multiple of 64 with 1e15 sentinel reps (build_cnns), and
            # this build pads further to a multiple of S. Routing must
            # index-mask ALL sentinel rows (they win ip routing by value)
            n_clusters=int(getattr(idx, "n_real", None) or idx.n_clusters),
            metric=idx.metric,
            replicated=bool(getattr(idx, "replicated", False)),
        )

    def search(self, queries, k: int, nprobe: int = 4,
               slots: int | None = None):
        """Returns (dists [Q, k], global ids [Q, k], evals [S])."""
        from ..models.cnns import _route_clusters, dedup_topk

        q = as_f32_queries(queries)
        s = self.mesh.shape[AXIS]
        slots = slots or min(nprobe, -(-nprobe // s) + 1)
        nprobe = min(nprobe, self.n_clusters)
        # n_valid masks the +1e30 sentinel rep rows by INDEX: for the ip
        # metric a huge-magnitude rep has a huge |inner product| and would
        # win routing by value, silently burning probe slots
        # (models/cnns.py _route_clusters docstring)
        visit = _route_clusters(q, self.reps, nprobe, self.metric,
                                n_valid=self.n_clusters)
        visit = jnp.where(visit < self.n_clusters, visit, PAD_ID)
        metric = self.metric
        # spilled slabs can surface a replicated id from two probed
        # clusters (possibly on one shard): carry 2k through the local
        # merge and the all-gather, dedup to k after
        kk = 2 * k if self.replicated else k
        rows_per = self.data_c.shape[0] // s

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, None), P(None, None), P(AXIS, None, None),
                      P(AXIS, None), P(AXIS, None)),
            out_specs=(P(None, None), P(None, None), P(AXIS)),
            check_vma=False,
        )
        def run(qq, vis, slabs, idsl, nrm):
            my = jax.lax.axis_index(AXIS)
            owned = (vis >= 0) & (jax.lax.rem(vis, s) == my)
            local = jnp.where(owned, vis // s, PAD_ID)
            # compact owned probes to the front slots (routing-rank order)
            np_w = vis.shape[1]
            rank = jax.lax.broadcasted_iota(jnp.int32, vis.shape, 1)
            key = jnp.where(owned, np_w - rank, -1)
            _, ord_ = jax.lax.top_k(key, slots)
            sel = jnp.take_along_axis(local, ord_, axis=1)
            sel = jnp.where(
                jnp.take_along_axis(key, ord_, axis=1) >= 0, sel, PAD_ID
            )
            qf = qq.astype(jnp.float32)
            qn = (squared_norms(qf) if metric == "l2"
                  else jnp.zeros((qf.shape[0],)))
            qc = qf.astype(slabs.dtype)

            def slot_fn(carry, cid):
                best_d, best_i, evals = carry
                ok = cid >= 0
                safe = jnp.where(ok, cid, 0)
                xc = jnp.take(slabs, safe, axis=0)
                ic = jnp.take(idsl, safe, axis=0)
                dots = jnp.einsum(
                    "qd,qmd->qm", qc, xc,
                    preferred_element_type=jnp.float32,
                )
                if metric in ("ip", "cosine"):
                    d = 1.0 - dots
                else:
                    d = jnp.take(nrm, safe, axis=0) - 2.0 * dots + qn[:, None]
                valid = (ic >= 0) & ok[:, None]
                d = jnp.where(valid, d, PAD_DIST)
                ic = jnp.where(valid, ic, PAD_ID)
                evals = evals + jnp.sum(valid)
                cd = jnp.concatenate([best_d, d], axis=1)
                ci = jnp.concatenate([best_i, ic], axis=1)
                bd, bi = topk_smallest(cd, ci, kk)
                return (bd, bi, evals), None

            init = (
                jnp.full((qf.shape[0], kk), PAD_DIST, jnp.float32),
                jnp.full((qf.shape[0], kk), PAD_ID, jnp.int32),
                jnp.zeros((), jnp.int32),
            )
            (ld, li, evals), _ = jax.lax.scan(slot_fn, init, sel.T)
            gd, gi = _merge_allgather(ld, li, kk)
            return gd, gi, evals[None]

        gd, gi, evals = run(
            q, visit, self.data_c, self.ids_c, self.cnorms_c
        )
        if self.replicated:
            gd, gi = dedup_topk(gd, gi, k)
        return gd, gi, evals


DCN_AXIS = "dcn"


def make_multislice_mesh(n_slices: int, devices=None) -> Mesh:
    """2-D mesh (dcn, shard): the outer axis models the slow inter-slice
    DCN links, the inner axis a slice's ICI ring."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % n_slices:
        raise ValueError(f"{n} devices do not split into {n_slices} slices")
    return Mesh(
        np.array(devices).reshape(n_slices, n // n_slices),
        (DCN_AXIS, AXIS),
    )


@dataclasses.dataclass
class MultiSliceCNNSIndex:
    """Multi-slice serving layout: index replicated per slice, queries
    data-parallel across slices.

    DCN bandwidth is orders of magnitude below ICI (scaling-book model),
    so the hot path must not merge candidate sets across slices. The
    production layout is therefore: each slice holds a full copy of the
    cluster-sharded index (clusters shard over the slice's ICI axis,
    replicated over the DCN axis), and the query BATCH shards over the
    DCN axis — every query is answered entirely within one slice (routed
    probing + one ICI all-gather top-k merge, as ShardedCNNSIndex), and
    the outputs come back query-sharded. Zero inter-slice collectives per
    query; DCN carries only the initial weight broadcast, exactly like
    data-parallel serving of a model replica per slice.
    """

    mesh: Mesh            # (dcn, shard)
    reps: jax.Array       # replicated
    data_c: jax.Array     # P(None over dcn, AXIS over clusters)
    ids_c: jax.Array
    cnorms_c: jax.Array
    n_clusters: int
    metric: str = "l2"
    replicated: bool = False

    @classmethod
    def build(cls, mesh: Mesh, idx) -> "MultiSliceCNNSIndex":
        s = mesh.shape[AXIS]
        c = idx.n_clusters
        c_pad = -(-c // s) * s
        reps = np.asarray(idx.reps, np.float32)
        data_c = np.asarray(idx.data_c, np.float32)
        ids_c = np.asarray(idx.ids_c)
        if c_pad != c:
            pad = c_pad - c
            reps = np.concatenate(
                [reps, np.full((pad,) + reps.shape[1:], 1e30, np.float32)]
            )
            data_c = np.concatenate(
                [data_c, np.zeros((pad,) + data_c.shape[1:], np.float32)]
            )
            ids_c = np.concatenate(
                [ids_c, np.full((pad,) + ids_c.shape[1:], PAD_ID,
                                ids_c.dtype)]
            )
        perm = np.argsort(
            (np.arange(c_pad) % s) * c_pad + np.arange(c_pad) // s,
            kind="stable",
        )
        # P(AXIS, ...) on a (dcn, shard) mesh = shard clusters over ICI,
        # replicate over DCN — the per-slice index copy
        ns_c = jax.sharding.NamedSharding(mesh, P(AXIS, None, None))
        data_cs = jax.device_put(jnp.asarray(data_c[perm]), ns_c)
        return cls(
            mesh=mesh,
            reps=jax.device_put(
                jnp.asarray(reps),
                jax.sharding.NamedSharding(mesh, P()),
            ),
            data_c=data_cs,
            ids_c=jax.device_put(
                jnp.asarray(ids_c[perm]),
                jax.sharding.NamedSharding(mesh, P(AXIS, None)),
            ),
            cnorms_c=jax.device_put(
                squared_norms(jnp.asarray(data_c[perm])),
                jax.sharding.NamedSharding(mesh, P(AXIS, None)),
            ),
            # real (pre-padding) count — see ShardedCNNSIndex.build
            n_clusters=int(getattr(idx, "n_real", None) or idx.n_clusters),
            metric=idx.metric,
            replicated=bool(getattr(idx, "replicated", False)),
        )

    def search(self, queries, k: int, nprobe: int = 4,
               slots: int | None = None):
        """Returns (dists [Q, k], ids [Q, k], evals [n_slices, S]).
        Queries are processed slice-data-parallel: rows shard over DCN."""
        from ..models.cnns import _route_clusters, dedup_topk

        q = as_f32_queries(queries)
        n_sl = self.mesh.shape[DCN_AXIS]
        s = self.mesh.shape[AXIS]
        if q.shape[0] % n_sl:
            raise ValueError(
                f"query batch {q.shape[0]} not divisible by {n_sl} slices"
            )
        slots = slots or min(nprobe, -(-nprobe // s) + 1)
        nprobe = min(nprobe, self.n_clusters)
        metric = self.metric
        n_clusters = self.n_clusters
        kk = 2 * k if self.replicated else k  # dedup room for replicas
        q = jax.device_put(
            q, jax.sharding.NamedSharding(self.mesh, P(DCN_AXIS, None))
        )

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(DCN_AXIS, None), P(None, None, None),
                      P(AXIS, None, None), P(AXIS, None), P(AXIS, None)),
            out_specs=(P(DCN_AXIS, None), P(DCN_AXIS, None),
                       P(DCN_AXIS, AXIS)),
            check_vma=False,
        )
        def run(qq, reps, slabs, idsl, nrm):
            # routing is replicated WITHIN the slice (tiny rep table);
            # each slice routes only its own query rows
            # n_valid: index-mask the sentinel rep pad rows (by value a
            # huge-magnitude rep WINS ip routing — see ShardedCNNSIndex)
            vis = _route_clusters(qq, reps, nprobe, metric,
                                  n_valid=n_clusters)
            vis = jnp.where(vis < n_clusters, vis, PAD_ID)
            my = jax.lax.axis_index(AXIS)
            owned = (vis >= 0) & (jax.lax.rem(vis, s) == my)
            local = jnp.where(owned, vis // s, PAD_ID)
            np_w = vis.shape[1]
            rank = jax.lax.broadcasted_iota(jnp.int32, vis.shape, 1)
            key = jnp.where(owned, np_w - rank, -1)
            _, ord_ = jax.lax.top_k(key, slots)
            sel = jnp.take_along_axis(local, ord_, axis=1)
            sel = jnp.where(
                jnp.take_along_axis(key, ord_, axis=1) >= 0, sel, PAD_ID
            )
            qf = qq.astype(jnp.float32)
            qn = (squared_norms(qf) if metric == "l2"
                  else jnp.zeros((qf.shape[0],)))
            qc = qf.astype(slabs.dtype)

            def slot_fn(carry, cid):
                best_d, best_i, evals = carry
                ok = cid >= 0
                safe = jnp.where(ok, cid, 0)
                xc = jnp.take(slabs, safe, axis=0)
                ic = jnp.take(idsl, safe, axis=0)
                dots = jnp.einsum(
                    "qd,qmd->qm", qc, xc,
                    preferred_element_type=jnp.float32,
                )
                if metric in ("ip", "cosine"):
                    d = 1.0 - dots
                else:
                    d = (jnp.take(nrm, safe, axis=0) - 2.0 * dots
                         + qn[:, None])
                valid = (ic >= 0) & ok[:, None]
                d = jnp.where(valid, d, PAD_DIST)
                ic = jnp.where(valid, ic, PAD_ID)
                evals = evals + jnp.sum(valid)
                bd, bi = topk_smallest(
                    jnp.concatenate([best_d, d], axis=1),
                    jnp.concatenate([best_i, ic], axis=1), kk,
                )
                return (bd, bi, evals), None

            init = (
                jnp.full((qf.shape[0], kk), PAD_DIST, jnp.float32),
                jnp.full((qf.shape[0], kk), PAD_ID, jnp.int32),
                jnp.zeros((), jnp.int32),
            )
            (ld, li, evals), _ = jax.lax.scan(slot_fn, init, sel.T)
            gd, gi = _merge_allgather(ld, li, kk)  # ICI only
            return gd, gi, evals[None, None]

        gd, gi, evals = run(
            q, self.reps, self.data_c, self.ids_c, self.cnorms_c
        )
        if self.replicated:
            gd, gi = dedup_topk(gd, gi, k)
        return gd, gi, evals


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
