"""uint8 vector space at big-data scale (reference: the sift_1b.cpp
uint8/bigann flow, hnswlib/tests/cpp/sift_1b.cpp:243-344, and the
L2SpaceI integer space, hnswlib/hnswlib/space_l2.h:294-323).

TPU-native form: uint8 vectors are stored shift-by-128 as int8 slabs in
the CNNS layout; distances run as exact s8 x s8 -> s32 integer math on
the MXU (2x the bf16 rate, 4x less HBM than f32 slabs). L2 distances are
shift-invariant, so results are bit-exact against uint8 math.
"""

import numpy as np
import jax.numpy as jnp

from hnsw_nsg_tpu.models.cnns import build_cnns
from hnsw_nsg_tpu.ops import brute_force_topk, recall
from hnsw_nsg_tpu.utils.params import CNNSConfig

rng = np.random.default_rng(11)
centers = rng.integers(40, 215, (30, 64))
x = np.clip(
    centers[rng.integers(0, 30, 50_000)]
    + rng.normal(0, 18, (50_000, 64)), 0, 255,
).round().astype(np.uint8)
q = np.clip(
    centers[rng.integers(0, 30, 100)]
    + rng.normal(0, 18, (100, 64)), 0, 255,
).round().astype(np.uint8)

# build with int8 slabs: pass the uint8 data as float (0..255-valued)
idx = build_cnns(
    x.astype(np.float32),
    CNNSConfig(n_clusters=48, m=4, kmeans_iters=10),
    slab_dtype=jnp.int8,
)
assert idx.data_c.dtype == jnp.int8 and idx.qshift == 128.0

dists, ids = idx.search(q.astype(np.float32), k=10, nprobe=6)
_, gt = brute_force_topk(
    jnp.asarray(q, jnp.float32), jnp.asarray(x, jnp.float32), 10
)
r = recall(np.asarray(ids), np.asarray(gt))
print(f"uint8/int8 recall@10 = {r:.4f}")
assert r > 0.9

# distances are exact integer L2^2 (no bf16 rounding)
d0 = float(np.asarray(dists)[0, 0])
ref = float(((q[0].astype(np.int64) - x[int(ids[0, 0])].astype(np.int64))
             ** 2).sum())
assert abs(d0 - ref) < 1e-3, (d0, ref)
print("integer distances exact; index bytes/vector =",
      idx.data_c.shape[1] * idx.data_c.shape[2] // idx.maxc)
