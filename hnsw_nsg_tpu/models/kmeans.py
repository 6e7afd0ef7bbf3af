"""Lloyd's k-means on TPU — the faiss IVF replacement.

The reference partitions with faiss ``IndexIVFFlat`` train+add
(CNNS/tests/cluster_IVF_nndescent.cpp:117-128) and assigns points with
``quantizer->assign`` (:131-138). On TPU both steps are one GEMM each:
assignment = argmin of a [N, k] pairwise-distance block; update =
scatter-add of points into centroid sums. Empty clusters are re-seeded from
the points currently farthest from their centroid (the same spirit as
faiss's split-biggest-cluster repair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import pairwise_dists, squared_norms


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign(data, centroids, c_norms, chunk: int = 65536):
    """argmin_k ||x - c_k||^2 for every point, chunked over N.

    The assignment GEMM runs in bf16 (6x the f32/HIGHEST MXU rate; argmin
    over cluster distances is insensitive to bf16 rounding at partition
    granularity — faiss likewise trains IVF in reduced precision). Centroid
    norms stay f32; centroid *updates* in _step stay full f32."""
    n = data.shape[0]
    nb = -(-n // chunk)
    cb = centroids.astype(jnp.bfloat16)

    def block_of(x):
        d = pairwise_dists(
            x.astype(jnp.bfloat16), cb, "l2", c_norms, exact=False
        )
        return jnp.argmin(d, axis=1).astype(jnp.int32), jnp.min(d, axis=1)

    def block(i):
        return block_of(
            jax.lax.dynamic_slice_in_dim(data, i * chunk, chunk, axis=0)
        )

    if nb == 1 and n == chunk:
        return block(0)
    parts = [block(i) for i in range(n // chunk)]
    rem = n % chunk
    if rem:
        parts.append(block_of(data[n - rem:]))
    return (
        jnp.concatenate([p[0] for p in parts]),
        jnp.concatenate([p[1] for p in parts]),
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def _step(data, centroids, chunk: int):
    """One full Lloyd's iteration on device, fixed shapes: assign ->
    scatter-add update -> re-seed empty clusters from the k worst-assigned
    points (cluster i takes the i-th farthest point)."""
    k, d = centroids.shape
    c_norms = squared_norms(centroids)
    assign, dmin = _assign(data, centroids, c_norms, chunk=chunk)
    sums = jnp.zeros((k, d), jnp.float32).at[assign].add(
        data.astype(jnp.float32)
    )
    counts = jnp.zeros((k,), jnp.float32).at[assign].add(1.0)
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    _, far = jax.lax.top_k(dmin, k)
    reseed = jnp.take(data, far, axis=0).astype(jnp.float32)
    empty = counts == 0
    new_c = jnp.where(empty[:, None], reseed, new_c)
    return new_c, jnp.mean(dmin), jnp.sum(empty)


def kmeans(
    data,
    k: int,
    iters: int = 20,
    seed: int = 0,
    chunk: int = 65536,
    verbose: bool = False,
):
    """Returns (centroids [k, d] f32, assignments [N] i32)."""
    data = jnp.asarray(data)
    n, d = data.shape
    k = min(k, n)
    chunk = min(chunk, n)
    rng = np.random.default_rng(seed)
    # seed sampling gathers ON DEVICE — np.asarray(data) would fetch the
    # whole dataset through the host (~100 s for 512 MB over the tunnel)
    centroids = jnp.take(
        data, jnp.asarray(rng.choice(n, k, replace=False)), axis=0
    ).astype(jnp.float32)

    for it in range(iters):
        centroids, mean_d, n_empty = _step(data, centroids, chunk)
        if verbose:
            print(
                f"kmeans iter {it + 1}/{iters}: mean dist "
                f"{float(mean_d):.4f} empty={int(n_empty)}"
            )

    c_norms = squared_norms(centroids)
    assign, _ = _assign(data, centroids, c_norms, chunk=chunk)
    return centroids, assign
