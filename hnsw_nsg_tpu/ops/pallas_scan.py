"""Fused Pallas kernel for the CNNS grouped cluster scan.

The grouped probe scan (models/cnns.py:_grouped_probe_search) is the
framework's hot query path: for every cluster, a [cap, d] query block is
scored against the cluster's [maxc, d] slab and reduced to per-query
top-k. Under XLA this materializes the [cap, maxc] f32 distance matrix to
HBM between the einsum and the top_k (measured ~100-180 ms per 8k-query
batch at the SIFT1M shape — 30-60x above the memory/FLOP roofline).

This kernel fuses the whole per-cluster pipeline in VMEM:

  * grid = (C,): one cluster per step; Pallas double-buffers the slab
    block HBM->VMEM fetch against compute automatically;
  * dots = [cap, d] x [maxc, d]^T on the MXU (d is the contraction, both
    operands d-last — one MXU pass per 128x128 tile at d=128);
  * dist = bias - scale * dots, where ``bias`` folds the FastL2 norm AND
    the padding mask (+inf on invalid slots): l2 -> bias=||x||^2 scale=2
    (exact = + ||q||^2, added by the caller), ip/cosine -> bias=1 scale=1;
  * exact top-k by k unrolled min/argmin extraction passes over the VMEM
    dist tile (k<=16; each pass is one VPU reduce + one masked update —
    no sort, no HBM round-trip).

Outputs [C, cap, k] (vals, local slot ids). Rows of ``qv`` that carry no
live query are scored against garbage zeros and filtered by the caller's
routing-back mask, exactly like the XLA path.

Reference semantics being accelerated: the per-cluster exact scans of
cluster_hnsw_nsg_search.cpp:210-235 (exact re-distance per probed
cluster), batched cluster-major.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dots(q, s):
    """q [a, d] x s [b, d]^T -> f32 [a, b] on the MXU.

    int8 x int8 (uint8 spaces): exact s32 integer math at 2x bf16 rate.
    Mixed (quantized int8 slabs, bf16 queries): the slab tile upcasts in
    row chunks — casting a whole [maxc, 960] tile at once blew the 16 MB
    scoped-vmem stack (measured 20 MB at the GIST shape)."""
    if q.dtype == jnp.int8 and s.dtype == jnp.int8:
        return jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    if q.dtype == s.dtype:
        # f32 slabs must dot at HIGHEST: the TPU MXU otherwise truncates
        # f32 operands to bf16 (~0.4% error) — "exact" f32 configs would
        # silently return approximate distances (round-4 verify finding).
        # bf16/int8 production slabs take their native rate.
        prec = (jax.lax.Precision.HIGHEST
                if q.dtype == jnp.float32 else None)
        return jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    ch = max(128, ((2 << 20) // (s.shape[1] * 2)) // 128 * 128)
    if ch >= s.shape[0]:
        return jax.lax.dot_general(
            q, s.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    parts = []
    for i0 in range(0, s.shape[0], ch):
        sl = s[i0 : min(i0 + ch, s.shape[0])]
        parts.append(jax.lax.dot_general(
            q, sl.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    return jnp.concatenate(parts, axis=1)


def _scan_kernel(qv_ref, slab_ref, bias_ref, vals_ref, idx_ref,
                 *, k: int, scale: float):
    q = qv_ref[0]                      # [cap, d]
    s = slab_ref[0]                    # [maxc, d]
    dots = _dots(q, s)                 # [cap, maxc]
    dist = bias_ref[0] - jnp.float32(scale) * dots   # bias [1, maxc]
    cap, maxc = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (cap, maxc), 1)
    for j in range(k):                 # unrolled exact extraction
        m = jnp.min(dist, axis=1)
        am = jnp.argmin(dist, axis=1).astype(jnp.int32)
        vals_ref[0, :, j] = m
        idx_ref[0, :, j] = am
        if j + 1 < k:
            dist = jnp.where(col == am[:, None], jnp.float32(jnp.inf), dist)


def _join_kernel(qv_ref, slab_ref, bias_ref, vals_ref, idx_ref,
                 gd_ref, gi_ref, vals_s, idx_s, *, k: int, scale: float,
                 group: int):
    """_scan_kernel variant for the join depth (k~50).

    Two key deviations from the unrolled exact extraction:

    * The [rc, mm] distance tile is first reduced to per-GROUP
      (min, argmin) over ``group`` consecutive slots — extraction then
      runs over the [rc, mm/group] reduced tile. This is approx_min_k's
      bucket semantics (each group contributes at most one result);
      expected loss is the top-k collision count ~= k^2/(2*(mm/group)),
      <2% of edges at the build shapes — the join feeds an *approximate*
      kNN graph, where that loss is far below the probe-miss loss.
      Extraction cost drops by ~group (it dominated the exact kernel:
      k sequential VPU passes over the full tile).
    * Extraction is a ``fori_loop`` doing read-modify-write through VMEM
      scratch tiles — unrolling kept ~k live [rc, mm] temporaries
      (Mosaic does not reuse stack slots across unrolled iterations;
      measured ~40 MB scoped at k=52). Per-j results land in [k, rc]
      scratches via sublane-dynamic stores (lane-dim dynamic stores are
      unsupported) and transpose once into the outputs."""
    q = qv_ref[0]                      # [rc, d]
    s = slab_ref[0]                    # [mm, d]
    dots = _dots(q, s)
    dist = bias_ref[0] - jnp.float32(scale) * dots
    rc, mm = dist.shape
    g = mm // group
    if group == 1:
        gd_ref[...] = dist
    else:
        # bucket c = slots {c, c+g, ..., c+(group-1)g} (comb partition —
        # any partition satisfies the approx bucket semantics, and this
        # one makes bucket member e the CONTIGUOUS slice [e*g, (e+1)*g):
        # the reduce is group-1 running-min compares over [rc, g] lane
        # slices, no reshape (Mosaic cannot split the lane dim)
        gd = dist[:, :g]
        gi = jnp.zeros((rc, g), jnp.int32)
        for e in range(1, group):
            sl = dist[:, e * g : (e + 1) * g]
            upd = sl < gd
            gd = jnp.where(upd, sl, gd)
            gi = jnp.where(upd, e, gi)
        gd_ref[...] = gd
        gi_ref[...] = gi
    col = jax.lax.broadcasted_iota(jnp.int32, (rc, g), 1)

    def body(j, carry):
        gd = gd_ref[...]
        m = jnp.min(gd, axis=1)
        am = jnp.argmin(gd, axis=1).astype(jnp.int32)
        hit = col == am[:, None]
        if group == 1:
            idx = am
        else:
            rel = jnp.sum(jnp.where(hit, gi_ref[...], 0), axis=1)
            idx = rel * g + am
        vals_s[pl.ds(j, 1), :] = m[None, :]
        idx_s[pl.ds(j, 1), :] = idx[None, :]
        gd_ref[...] = jnp.where(hit, jnp.float32(jnp.inf), gd)
        return carry

    jax.lax.fori_loop(0, k, body, 0)
    vals_ref[0] = vals_s[...][:k].T
    idx_ref[0] = idx_s[...][:k].T


@functools.partial(
    jax.jit, static_argnames=("k", "scale", "row_chunk", "interpret")
)
def cluster_join_topk(
    qv: jax.Array,      # [C, maxc, d] per-cluster member rows
    stacks: jax.Array,  # [C, mm, d] stacked candidate slabs
    bias: jax.Array,    # [C, mm] f32 (+inf on pads)
    k: int,
    scale: float,
    row_chunk: int = 128,
    interpret: bool = False,
):
    """Row-chunked cluster join for kNN-graph construction
    (models/knn_ivf.py): every member row of cluster c is scored against
    c's stacked candidate slabs and reduced to top-k.

    Grid is (C, maxc/row_chunk) with the row axis INNERMOST and the
    stack's index_map constant along it: Mosaic elides the re-fetch of
    an unchanged block between consecutive grid steps, so each cluster's
    stack crosses HBM->VMEM once (~mm*d*2 B) instead of once per row
    chunk — at the 1M build shape that is ~4 GB of traffic instead of
    ~70 GB."""
    c, maxc, d = qv.shape
    mm = stacks.shape[1]
    # group width for the two-stage extraction: cap the expected
    # collision loss at ~2% of the k edges (loss_frac ~= k / (2*(mm/g)))
    group = 1
    while group < 8 and mm // (group * 2) >= 25 * k and mm % (group * 2) == 0:
        group *= 2
    # transient VMEM temporaries outside the extraction loop are ~3
    # [row_chunk, mm] f32 tiles (dots, dist, group reduce) — budget
    # 16 B/elem against the 16 MB scoped stack
    while row_chunk > 8 and row_chunk * mm * 16 > 12 << 20:
        row_chunk //= 2
    while maxc % row_chunk:
        row_chunk //= 2
    nrc = maxc // row_chunk
    kern = functools.partial(_join_kernel, k=k, scale=scale, group=group)
    vals, idx = pl.pallas_call(
        kern,
        grid=(c, nrc),
        in_specs=[
            pl.BlockSpec((1, row_chunk, d), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mm, d), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mm), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, row_chunk, k), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_chunk, k), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, maxc, k), jnp.float32),
            jax.ShapeDtypeStruct((c, maxc, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((row_chunk, mm // group), jnp.float32),
            pltpu.VMEM((row_chunk, mm // group), jnp.int32),
            pltpu.VMEM((-(-k // 8) * 8, row_chunk), jnp.float32),
            pltpu.VMEM((-(-k // 8) * 8, row_chunk), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * c * maxc * mm * d,
            bytes_accessed=(
                stacks.size * stacks.dtype.itemsize
                + qv.size * qv.dtype.itemsize
                + c * mm * 4 + 2 * c * maxc * k * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv, stacks, bias[:, None, :])
    return vals, idx


def _scan_kernel_gq(qidx_ref, qc_ref, slab_ref, bias_ref, vals_ref,
                    idx_ref, *, k: int, scale: float):
    """Variant that gathers the cluster's query block ON the MXU.

    The XLA path materializes qv[C, cap, d] with a data-dependent row
    gather (jnp.take) — C*cap scattered ~256 B rows round-tripped
    through HBM, measured at ~100 ms at the SIFT1M bench shape,
    dominating the whole scan. Here the gather is a
    one-hot matmul instead: onehot[cap, qn] @ qc[qn, d] on the MXU
    (2*cap*qn*d flops ~ 0.27 GF/cluster — ~2 ms total at C=1024), with
    qc VMEM-resident across the whole grid. PAD slots (qidx < 0) match
    no query -> all-zero rows, filtered by the caller's routing mask."""
    qidx = qidx_ref[0, 0]              # [cap] int32
    qc = qc_ref[...]                   # [qn, d]
    cap = qidx.shape[0]
    qn = qc.shape[0]
    sel = (qidx[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (cap, qn), 1))
    if qc.dtype == jnp.int8:
        q = jax.lax.dot_general(
            sel.astype(jnp.int8), qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)             # exact: one-hot row sums
    else:
        q = jax.lax.dot_general(
            sel.astype(qc.dtype), qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # f32 queries must gather losslessly: DEFAULT would truncate
            # them to bf16 on the MXU (one-hot rows are exact at any
            # precision, the QUERY values are what gets rounded)
            precision=(jax.lax.Precision.HIGHEST
                       if qc.dtype == jnp.float32 else None),
        ).astype(qc.dtype)             # [cap, d]
    s = slab_ref[0]                    # [maxc, d]
    dots = _dots(q, s)
    dist = bias_ref[0] - jnp.float32(scale) * dots
    cap, maxc = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (cap, maxc), 1)
    for j in range(k):
        m = jnp.min(dist, axis=1)
        am = jnp.argmin(dist, axis=1).astype(jnp.int32)
        vals_ref[0, :, j] = m
        idx_ref[0, :, j] = am
        if j + 1 < k:
            dist = jnp.where(col == am[:, None], jnp.float32(jnp.inf), dist)


@functools.partial(
    jax.jit, static_argnames=("k", "scale", "interpret")
)
def grouped_cluster_topk_gq(
    qc: jax.Array,      # [qn, d] all queries (slab dtype)
    qidx: jax.Array,    # [C, cap] int32 query ids per cluster slot (-1 pad)
    slabs: jax.Array,   # [C, maxc, d]
    bias: jax.Array,    # [C, maxc] f32: l2 norms / ip 1.0, +inf on pads
    k: int,
    scale: float,
    interpret: bool = False,
):
    """grouped_cluster_topk with the query block gathered in-kernel via
    one-hot MXU matmul (see _scan_kernel_gq). Returns (vals [C, cap, k]
    f32 ascending, idx [C, cap, k] int32 local slot ids); slots with
    qidx < 0 carry garbage rows the caller must mask."""
    c, cap = qidx.shape
    qn, d = qc.shape
    maxc = slabs.shape[1]
    kern = functools.partial(_scan_kernel_gq, k=k, scale=scale)
    vals, idx = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[
            # [C, 1, cap]: Mosaic requires a block's last two dims to be
            # (8, 128)-divisible or equal to the array's — (1, cap)
            # matches the array's trailing dims exactly
            pl.BlockSpec((1, 1, cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole-array block, constant index_map: fetched once and
            # VMEM-resident across the grid (qn*d*2 B ~ 2 MB at the
            # bench shape)
            pl.BlockSpec((qn, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, maxc, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, maxc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cap, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, cap, k), jnp.float32),
            jax.ShapeDtypeStruct((c, cap, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * cap * d * (maxc + qn),
            bytes_accessed=(
                slabs.size * slabs.dtype.itemsize
                + qc.size * qc.dtype.itemsize
                + c * maxc * 4 + 2 * c * cap * k * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qidx[:, None, :], qc, slabs, bias[:, None, :])
    return vals, idx


def _scan_kernel_gq_dblk(qidx_ref, qc_ref, slab_ref, bias_ref, vals_ref,
                         idx_ref, acc_ref, *, k: int, scale: float,
                         nd: int):
    """_scan_kernel_gq with the contraction dimension d blocked over the
    inner grid axis.

    At d >= ~512 the whole-query-set VMEM residency of the plain gq
    kernel overflows the 16 MB scoped stack (8192 x 960 bf16 = 15.7 MB at
    the GIST shape), which previously forced the pre-gathered-query
    fallback — C*cap scattered jnp.take row gathers materialized through
    HBM, ~190 ms/batch at GIST, the dominant cost of the whole scan
    (PROGRESS.md round-3). Here the query set rides in [qn, dblk] chunks
    (grid = (C, nd), d innermost): partial dots accumulate in a VMEM
    scratch across the d steps and the top-k extraction fires on the last
    one. The one-hot gather runs per chunk; its total MXU work is the
    same 2*cap*qn*d as unblocked. qc chunk traffic is qn*dblk*itemsize
    per grid step (~4 MB at GIST dblk=256) — HBM-bandwidth work instead
    of descriptor-latency work, which is the whole trade."""
    j = pl.program_id(1)
    qidx = qidx_ref[0, 0]              # [cap] int32
    qc = qc_ref[...]                   # [qn, dblk]
    cap = qidx.shape[0]
    qn = qc.shape[0]
    sel = (qidx[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (cap, qn), 1))
    if qc.dtype == jnp.int8:
        q = jax.lax.dot_general(
            sel.astype(jnp.int8), qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)
    else:
        q = jax.lax.dot_general(
            sel.astype(qc.dtype), qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if qc.dtype == jnp.float32 else None),
        ).astype(qc.dtype)             # [cap, dblk]
    s = slab_ref[0]                    # [maxc, dblk]
    dots = _dots(q, s)                 # [cap, maxc] f32

    @pl.when(j == 0)
    def _():
        acc_ref[...] = dots

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + dots

    @pl.when(j == nd - 1)
    def _():
        dist = bias_ref[0] - jnp.float32(scale) * acc_ref[...]
        cap_, maxc = dist.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (cap_, maxc), 1)
        for jj in range(k):
            m = jnp.min(dist, axis=1)
            am = jnp.argmin(dist, axis=1).astype(jnp.int32)
            vals_ref[0, :, jj] = m
            idx_ref[0, :, jj] = am
            if jj + 1 < k:
                dist = jnp.where(
                    col == am[:, None], jnp.float32(jnp.inf), dist
                )


@functools.partial(
    jax.jit, static_argnames=("k", "scale", "dblk", "interpret")
)
def grouped_cluster_topk_gq_dblk(
    qc: jax.Array,      # [qn, d] all queries (slab or query dtype)
    qidx: jax.Array,    # [C, cap] int32 query ids per cluster slot (-1 pad)
    slabs: jax.Array,   # [C, maxc, d]
    bias: jax.Array,    # [C, maxc] f32: l2 norms / ip 1.0, +inf on pads
    k: int,
    scale: float,
    dblk: int = 256,
    interpret: bool = False,
):
    """grouped_cluster_topk_gq for large d: the contraction dimension is
    grid-blocked so the VMEM working set stays bounded regardless of d
    (see _scan_kernel_gq_dblk). d is zero-padded up to a multiple of
    ``dblk`` (zeros contribute nothing to the dots)."""
    c, cap = qidx.shape
    qn, d = qc.shape
    maxc = slabs.shape[1]
    nd = -(-d // dblk)
    dpad = nd * dblk
    if dpad != d:
        qc = jnp.pad(qc, ((0, 0), (0, dpad - d)))
        slabs = jnp.pad(slabs, ((0, 0), (0, 0), (0, dpad - d)))
    kern = functools.partial(
        _scan_kernel_gq_dblk, k=k, scale=scale, nd=nd
    )
    vals, idx = pl.pallas_call(
        kern,
        grid=(c, nd),
        in_specs=[
            pl.BlockSpec((1, 1, cap), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, dblk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, maxc, dblk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, maxc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cap, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, cap, k), jnp.float32),
            jax.ShapeDtypeStruct((c, cap, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((cap, maxc), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * c * cap * dpad * (maxc + qn),
            bytes_accessed=(
                slabs.size * slabs.dtype.itemsize
                + c * qn * dblk * qc.dtype.itemsize
                + c * maxc * 4 + 2 * c * cap * k * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qidx[:, None, :], qc, slabs, bias[:, None, :])
    return vals, idx


@functools.partial(
    jax.jit, static_argnames=("k", "scale", "interpret")
)
def grouped_cluster_topk(
    qv: jax.Array,      # [C, cap, d] (slab dtype)
    slabs: jax.Array,   # [C, maxc, d]
    bias: jax.Array,    # [C, maxc] f32: l2 norms / ip 1.0, +inf on pads
    k: int,
    scale: float,
    interpret: bool = False,
):
    """Per-(cluster, query-slot) exact top-k. Returns (vals [C, cap, k]
    f32 ascending, idx [C, cap, k] int32 local slot ids)."""
    c, cap, d = qv.shape
    maxc = slabs.shape[1]
    kern = functools.partial(_scan_kernel, k=k, scale=scale)
    # Mosaic requires a block's last two dims to be (8, 128)-divisible or
    # equal to the array's: bias rides as [C, 1, maxc] so its (1, maxc)
    # block matches the array's trailing dims exactly
    vals, idx = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, cap, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, maxc, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, maxc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cap, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, cap, k), jnp.float32),
            jax.ShapeDtypeStruct((c, cap, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * cap * maxc * d,
            bytes_accessed=(
                slabs.size * slabs.dtype.itemsize
                + qv.size * qv.dtype.itemsize
                + c * maxc * 4 + 2 * c * cap * k * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv, slabs, bias[:, None, :])
    return vals, idx
