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
