"""Fused merge+select kernel: bit-exact parity with the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnsw_nsg_tpu.ops.distance import PAD_DIST, PAD_ID
from hnsw_nsg_tpu.ops.merge_select import (
    fused_merge_select, merge_select_reference)
from hnsw_nsg_tpu.ops.topk import init_retset


def _random_state(rng, q, l, c, n_ids=500, fill=0.7):
    """A mid-search retset (sorted, partially expanded, some PADs) plus a
    candidate block with duplicates (vs retset and internal) and PADs."""
    ni = rng.integers(4, int(l * fill) + 4)
    ids = rng.choice(n_ids, size=(q, ni), replace=True).astype(np.int32)
    d = rng.random((q, ni)).astype(np.float32)
    r_d, r_i, r_e = init_retset(jnp.asarray(d), jnp.asarray(ids), l)
    # mark a random prefix-ish subset expanded (PAD slots already True)
    e_extra = rng.random((q, l)) < 0.5
    r_e = r_e | jnp.asarray(e_extra)
    c_i = rng.choice(n_ids, size=(q, c), replace=True).astype(np.int32)
    c_i[rng.random((q, c)) < 0.15] = PAD_ID
    c_d = rng.random((q, c)).astype(np.float32)
    # force some exact ties to exercise the stability tiebreak
    c_d[:, : c // 4] = np.float32(0.5)
    return (r_d, r_i, r_e, jnp.asarray(c_d), jnp.asarray(c_i))


@pytest.mark.parametrize("l,c,expand", [
    (128, 30, 1), (128, 120, 4), (64, 30, 2), (128, 8, 1), (256, 60, 8),
])
def test_kernel_matches_reference(l, c, expand):
    rng = np.random.default_rng(l * 1000 + c + expand)
    state = _random_state(rng, 16, l, c)
    ref = merge_select_reference(*state, expand)
    out = fused_merge_select(*state, expand, block=8, interpret=True)
    for name, a, b in zip(
        ("dists", "ids", "expanded", "sel_ids", "sel_valid"), out, ref
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_all_pad_candidates_noop():
    rng = np.random.default_rng(0)
    r_d, r_i, r_e, _, _ = _random_state(rng, 8, 64, 16)
    c_d = jnp.full((8, 16), PAD_DIST, jnp.float32)
    c_i = jnp.full((8, 16), PAD_ID, jnp.int32)
    ref = merge_select_reference(r_d, r_i, r_e, c_d, c_i, 1)
    out = fused_merge_select(r_d, r_i, r_e, c_d, c_i, 1,
                             block=8, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converged_query_selects_nothing():
    rng = np.random.default_rng(1)
    r_d, r_i, r_e, c_d, c_i = _random_state(rng, 8, 64, 16)
    r_e = jnp.ones_like(r_e)  # fully expanded
    c_d = jnp.full_like(c_d, PAD_DIST)
    c_i = jnp.full_like(c_i, PAD_ID)
    _, _, _, sel_ids, sel_valid = fused_merge_select(
        r_d, r_i, r_e, c_d, c_i, 4, block=8, interpret=True)
    assert not np.asarray(sel_valid).any()
    assert (np.asarray(sel_ids) == PAD_ID).all()


def test_query_padding_roundtrip():
    # q not a multiple of block exercises the pad/slice path
    rng = np.random.default_rng(2)
    state = _random_state(rng, 11, 64, 16)
    ref = merge_select_reference(*state, 2)
    out = fused_merge_select(*state, 2, block=8, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
