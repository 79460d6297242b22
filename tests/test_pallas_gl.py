"""Pallas GL kernel (interpret mode) vs the jnp reference stage."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from svtyper_tpu.gt.engine import INT_FIELDS
from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
from svtyper_tpu.ops.pallas_gl import BLOCK_N, genotype_batch_pallas
from svtyper_tpu.utils.formatting import fmt_g2


def _random_counts(n, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.gamma(2.0, 10.0, size=(n, 5))
    counts[rng.random(n) < 0.1] = 0.0  # some zero-evidence rows
    counts[:, 3] -= rng.random(n) * 2  # ref_span can dip negative
    is_dup = rng.random(n) < 0.3
    force_null = rng.random(n) < 0.05
    return counts, is_dup, force_null


def _adversarial_counts(n, seed=42):
    """Half the rows are small-integer counts, so AB lands on exact
    small rationals (1/16, 3/40, ...) that sit ON or NEAR `%.2g`
    rounding boundaries — the cases where a last-ulp summation-order
    difference between the two lowerings would flip a printed digit."""
    rng = np.random.default_rng(seed)
    counts = rng.gamma(2.0, 10.0, size=(n, 5))
    m = n // 2
    counts[:m] = rng.integers(0, 40, size=(m, 5)).astype(np.float64)
    counts[rng.random(n) < 0.1] = 0.0
    is_dup = rng.random(n) < 0.3
    force_null = rng.random(n) < 0.05
    return counts, is_dup, force_null


def _away_from_boundary(v, step, eps):
    r = math.fmod(abs(v), step)
    return abs(r - step / 2.0) > eps


def assert_format_parity(ref, ints, flts, n):
    """Formatted-field agreement between the XLA dict and the Pallas
    packed matrices, at the output contract's precision (SPEC.md §6).

    AB (`%.2g`) must agree on EVERY non-null row: after the r4 denom
    fix both paths accumulate ((rs+rp)+alt_split)+ap in f32, so AB is
    bit-identical by construction. GL (`%.0f`) and SQ (`%.2f`) use a
    Stirling-lgamma lc / Mosaic transcendentals in the kernel vs the
    table / XLA ops in the reference, so rows whose value sits within
    eps of a printf rounding boundary fall back to a numeric assert.
    """
    null_ref = np.asarray(ref["null"]).astype(bool)
    gl_ref = np.asarray(ref["gl"])
    sq_ref = np.asarray(ref["sq"])
    ab_ref = np.asarray(ref["ab"])
    abv = np.asarray(ref["ab_valid"])
    checked_gl = checked_sq = checked_ab = 0
    for i in range(n):
        if null_ref[i]:
            continue
        if abv[i]:
            assert ints[13, i] == 1
            assert fmt_g2(float(flts[4, i])) == fmt_g2(float(ab_ref[i])), (
                i, float(flts[4, i]), float(ab_ref[i])
            )
            checked_ab += 1
        for g in range(3):
            a, b = float(flts[g, i]), float(gl_ref[i, g])
            if _away_from_boundary(b, 1.0, 5e-3):
                assert "%.0f" % a == "%.0f" % b, (i, g, a, b)
                checked_gl += 1
            else:
                assert abs(a - b) < 0.5, (i, g, a, b)
        a, b = float(flts[3, i]), float(sq_ref[i])
        eps = min(2e-3, max(2e-4, 1e-6 * abs(b)))
        if _away_from_boundary(b, 0.01, eps):
            assert "%.2f" % a == "%.2f" % b, (i, a, b)
            checked_sq += 1
        else:
            assert abs(a - b) < 0.01, (i, a, b)
    assert checked_gl > 100 and checked_sq > 100 and checked_ab > 100


def test_formatted_parity_interpret():
    """Formatted (%.0f/%.2f/%.2g) agreement on the adversarial grid,
    kernel in interpret mode (the compiled twin runs in
    tests/test_pallas_tpu.py on hardware)."""
    n = BLOCK_N * 2
    counts, is_dup, force_null = _adversarial_counts(n)
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
    assert_format_parity(ref, np.asarray(ints), np.asarray(flts), n)


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
