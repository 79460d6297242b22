"""Pallas GL kernel (interpret mode) vs the jnp reference stage."""

import numpy as np
import jax.numpy as jnp
import pytest

from svtyper_tpu.gt.engine import INT_FIELDS
from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
from svtyper_tpu.ops.pallas_gl import BLOCK_N, genotype_batch_pallas


def _random_counts(n, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.gamma(2.0, 10.0, size=(n, 5))
    counts[rng.random(n) < 0.1] = 0.0  # some zero-evidence rows
    counts[:, 3] -= rng.random(n) * 2  # ref_span can dip negative
    is_dup = rng.random(n) < 0.3
    force_null = rng.random(n) < 0.05
    return counts, is_dup, force_null


def test_pallas_matches_jnp_reference():
    n = BLOCK_N * 2
    counts, is_dup, force_null = _random_counts(n)
    ref = genotype_batch(
        jnp.asarray(counts, dtype=jnp.float32),
        jnp.asarray(is_dup),
        jnp.asarray(force_null),
        jnp.asarray(log_choose_table(1 << 12, use_f64=False)),
    )
    ints, flts = genotype_batch_pallas(
        jnp.asarray(counts.T, dtype=jnp.float32),
        jnp.asarray(is_dup),
        jnp.asarray(force_null),
        interpret=True,
    )
    ints = np.asarray(ints)
    flts = np.asarray(flts)
    np.testing.assert_array_equal(ints[0], np.asarray(ref["null"]).astype(np.int32))
    np.testing.assert_array_equal(ints[1], np.asarray(ref["gt_idx"]))
    for row, key in [(3, "qr"), (4, "qa"), (5, "dp"), (6, "ro"), (7, "ao"),
                     (8, "rs"), (9, "as_"), (10, "asc"), (11, "rp"), (12, "ap")]:
        np.testing.assert_array_equal(ints[row], np.asarray(ref[key]), err_msg=key)
    # GQ is exact: both paths build GT/GQ from the shared lc-free
    # scores (ops.gl.LOG_P_TABLE constants), so the lgamma-vs-table
    # difference in lc cannot leak into the integer fields
    np.testing.assert_array_equal(ints[2], np.asarray(ref["gq"]))
    gl_ref = np.asarray(ref["gl"])
    np.testing.assert_allclose(flts[:3].T, gl_ref, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(flts[3], np.asarray(ref["sq"]), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(flts[4], np.asarray(ref["ab"]), rtol=1e-5, atol=1e-6)


def test_int_field_layout_matches_engine():
    assert INT_FIELDS == (
        "null", "gt_idx", "gq", "qr", "qa", "dp", "ro", "ao",
        "rs", "as_", "asc", "rp", "ap", "ab_valid",
    )
