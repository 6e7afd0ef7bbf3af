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


def _scan_kernel(qv_ref, slab_ref, bias_ref, vals_ref, idx_ref,
                 *, k: int, scale: float):
    q = qv_ref[0]                      # [cap, d]
    s = slab_ref[0]                    # [maxc, d]
    if q.dtype == jnp.int8:
        # integer path (uint8 spaces stored shift-by-128): s8 x s8 -> s32
        # on the MXU is exact and runs at 2x the bf16 rate
        dots = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # [cap, maxc]
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


def _join_kernel(qv_ref, slab_ref, bias_ref, vals_ref, idx_ref, dist_ref,
                 *, k: int, scale: float):
    """_scan_kernel variant with the distance tile in an explicit VMEM
    scratch: the join runs at k~50 (kNN-graph construction), and an
    unrolled SSA extraction loop at that depth keeps tens of [rc, mm]
    temporaries live at once — Mosaic's 16 MB scoped-vmem stack OOMs at
    the 1M build shape. Read-modify-write through the scratch ref bounds
    liveness to ~3 tiles regardless of k."""
    q = qv_ref[0]                      # [rc, d]
    s = slab_ref[0]                    # [mm, d]
    if q.dtype == jnp.int8:
        dots = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dist_ref[...] = bias_ref[0] - jnp.float32(scale) * dots
    rc, mm = dist_ref.shape
    for j in range(k):
        d = dist_ref[...]
        m = jnp.min(d, axis=1)
        am = jnp.argmin(d, axis=1).astype(jnp.int32)
        vals_ref[0, :, j] = m
        idx_ref[0, :, j] = am
        if j + 1 < k:
            col = jax.lax.broadcasted_iota(jnp.int32, (rc, mm), 1)
            dist_ref[...] = jnp.where(
                col == am[:, None], jnp.float32(jnp.inf), d
            )


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
    # the kernel's live VMEM temporaries (scratch dist f32, col iota i32,
    # one masking temp) are all [row_chunk, mm]; Mosaic's scoped stack
    # budget is 16 MB — shrink the row chunk until ~3 such tiles fit
    while row_chunk > 8 and row_chunk * mm * 12 > 12 << 20:
        row_chunk //= 2
    while maxc % row_chunk:
        row_chunk //= 2
    nrc = maxc // row_chunk
    kern = functools.partial(_join_kernel, k=k, scale=scale)
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
        scratch_shapes=[pltpu.VMEM((row_chunk, mm), jnp.float32)],
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
    gather (jnp.take) — C*cap scattered ~256 B rows, which on this part
    costs ~0.75 us/row (PROGRESS.md gather physics): ~100 ms at the
    SIFT1M bench shape, dominating the whole scan. Here the gather is a
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
        ).astype(qc.dtype)             # [cap, d]
    s = slab_ref[0]                    # [maxc, d]
    if q.dtype == jnp.int8:
        dots = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dots = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
