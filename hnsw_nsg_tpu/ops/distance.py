"""Batched distance kernels — the TPU replacement for the reference's SIMD code.

The reference implements scalar/SSE/AVX/AVX512 distance functions dispatched at
runtime (hnswlib/hnswlib/space_l2.h:7-323, space_ip.h:7-400,
CNNS/efanna_graph/include/efanna2e/distance.h:23-230). On TPU all of that
collapses into two shapes of computation:

  * ``pairwise``  — query block [Q, d] x database block [N, d] -> [Q, N]:
    one GEMM on the MXU. Used by the brute-force oracle, the k-means assign
    step, and the CNNS centroid router.
  * ``gathered``  — query block [Q, d] x per-query gathered neighbors
    [Q, K, d] -> [Q, K]: a batched contraction, used by every graph-search
    hop (frontier expansion).

Metric conventions follow the reference:
  * ``l2``     — squared L2 (hnswlib ``L2Sqr``, space_l2.h:7-20).
  * ``ip``     — ``1 - <a, b>`` (hnswlib ``InnerProductDistance``,
    space_ip.h:17-19). Raw inner-product ordering is identical.
  * ``cosine`` — ``ip`` over pre-normalized vectors; normalization happens at
    the API layer exactly like the reference bindings
    (hnswlib/python_bindings/bindings.cpp:241-249).

The FastL2 trick (``d = ||x||^2 - 2<q, x>``, per-node norm cached — the
reference's ``DistanceFastL2``, CNNS/efanna_graph/include/efanna2e/distance.h)
is what the graph engines use internally for L2: per fixed query it is a
monotone (constant-shift) transform of true squared L2, so all top-k /
comparison logic is unaffected, and it turns each hop into a pure GEMM plus a
norm gather. ``PAD_DIST`` marks invalid/padded slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Large-but-finite sentinel for padded / invalid distances. Finite so that
# arithmetic stays NaN-free; anything real is strictly smaller. Kept as a
# host-side numpy scalar: a module-level device array would be embedded as
# a compile-time constant in every jit trace (forcing device fetches at
# trace time).
import numpy as _np

PAD_DIST = _np.float32(3.4e37)
# Sentinel id for padded adjacency slots / empty retset slots.
PAD_ID = -1

VALID_METRICS = ("l2", "ip", "cosine")

# Matmul precision for distance contractions. On TPU the MXU truncates f32
# operands to bf16 by default; HIGHEST requests full f32 (via multi-pass
# bf16), matching the reference's exact float kernels. Engines that can
# tolerate bf16 distance error (graph traversal is rank-robust) may flip
# this to "default" for ~3x MXU throughput.
_PRECISION = jax.lax.Precision.HIGHEST


def set_default_precision(p) -> None:
    """Set module-wide matmul precision ("highest" | "default" | Precision)."""
    global _PRECISION
    if isinstance(p, str):
        p = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[p]
    _PRECISION = p


def as_f32_queries(queries) -> jax.Array:
    """Canonicalize a query batch to a device f32 [Q, d] array WITHOUT a
    device->host->device roundtrip when it is already device-resident.

    ``jnp.asarray(np.asarray(q, np.float32))`` — the naive spelling — pulls
    a committed device array back through the host (~600 ms each way for a
    4 MB batch over the tunneled chip) on every search call. Serving keeps
    query batches on-device; so does bench.py."""
    if isinstance(queries, jax.Array):
        q = queries
        if q.dtype != jnp.float32:
            q = q.astype(jnp.float32)
    else:
        q = jnp.asarray(_np.asarray(queries, _np.float32))
    if q.ndim == 1:
        q = q[None]
    return q


def squared_norms(x: jax.Array) -> jax.Array:
    """Per-row squared L2 norm, computed in f32. x: [..., d] -> [...]."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


def normalize(x: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Row-normalize vectors (cosine support, ref bindings.cpp:241-249)."""
    n = jnp.sqrt(jnp.maximum(squared_norms(x), eps))
    return (x.astype(jnp.float32) / n[..., None]).astype(x.dtype)


def _dot_qx(q: jax.Array, x: jax.Array) -> jax.Array:
    """[Q, d] x [N, d] -> [Q, N] on the MXU, f32 accumulation."""
    return jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )


def pairwise_dists(
    q: jax.Array,
    x: jax.Array,
    metric: str = "l2",
    x_norms: jax.Array | None = None,
    exact: bool = True,
) -> jax.Array:
    """All-pairs distances, [Q, d] x [N, d] -> [Q, N].

    With ``exact=False`` and metric="l2" the per-query constant ``||q||^2`` is
    dropped (FastL2): ordering per query is unchanged, one broadcast saved.
    """
    if metric not in VALID_METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    dots = _dot_qx(q, x)
    if metric in ("ip", "cosine"):
        return 1.0 - dots
    if x_norms is None:
        x_norms = squared_norms(x)
    d = x_norms[None, :] - 2.0 * dots
    if exact:
        d = d + squared_norms(q)[:, None]
    return d


def gathered_dists(
    q: jax.Array,
    x: jax.Array,
    ids: jax.Array,
    metric: str = "l2",
    x_norms: jax.Array | None = None,
    exact: bool = False,
) -> jax.Array:
    """Per-query gathered-neighbor distances.

    q: [Q, d]; x: [N, d]; ids: [Q, K] int32 with PAD_ID for padding.
    Returns [Q, K] f32; padded slots get PAD_DIST.

    This is the frontier-expansion hot op: the TPU analogue of the reference's
    per-edge scalar distfunc calls in searchBaseLayerST
    (hnswlib/hnswlib/hnswalg.h:309-440) and NSG Search
    (CNNS/src/nsg/index_nsg.cpp:506-568).
    """
    if metric not in VALID_METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    valid = ids >= 0
    safe_ids = jnp.where(valid, ids, 0)
    vecs = jnp.take(x, safe_ids, axis=0)  # [Q, K, d]
    dots = jnp.einsum(
        "qd,qkd->qk", q.astype(jnp.float32), vecs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
    if metric in ("ip", "cosine"):
        d = 1.0 - dots
    else:
        if x_norms is None:
            nrm = squared_norms(vecs)
        else:
            nrm = jnp.take(x_norms, safe_ids, axis=0)
        d = nrm - 2.0 * dots
        if exact:
            d = d + squared_norms(q)[:, None]
    return jnp.where(valid, d, PAD_DIST)


def exact_from_fast(fast_d: jax.Array, q: jax.Array, metric: str) -> jax.Array:
    """Recover exact metric values from FastL2 internal distances."""
    if metric == "l2":
        return fast_d + squared_norms(q)[..., None]
    return fast_d


@functools.partial(jax.jit, static_argnames=("metric",))
def point_dists(a: jax.Array, b: jax.Array, metric: str = "l2") -> jax.Array:
    """Elementwise row-to-row distance, [B, d] x [B, d] -> [B]. Exact."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    if metric in ("ip", "cosine"):
        return 1.0 - jnp.sum(af * bf, axis=-1)
    diff = af - bf
    return jnp.sum(diff * diff, axis=-1)
