"""On-hardware Pallas GL validation (VERDICT r1 item 5): compiled (not
interpreted) kernel vs the XLA f32 path on a real TPU backend.

Skipped on the CPU test backend; run with ``SVT_HW=1 python -m pytest
tests/test_pallas_tpu.py`` (tests/conftest.py leaves the platform alone
when SVT_HW=1). ``scripts/pallas_vs_jnp.py`` is the timing companion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU backend (SVT_HW=1)",
)

INT_KEYS = [
    "null", "gt_idx", "gq", "qr", "qa", "dp", "ro", "ao",
    "rs", "as_", "asc", "rp", "ap",
]


def test_compiled_kernel_matches_xla_f32():
    from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
    from svtyper_tpu.ops.pallas_gl import genotype_batch_pallas

    n = 4096
    rng = np.random.default_rng(7)
    counts = rng.gamma(2.0, 10.0, size=(n, 5)).astype(np.float32)
    counts[rng.random(n) < 0.1] = 0.0
    counts[:, 3] -= (rng.random(n) * 2).astype(np.float32)
    is_dup = rng.random(n) < 0.3
    force_null = rng.random(n) < 0.05
    lcf = jnp.asarray(log_choose_table(1 << 17, use_f64=False))

    ref = jax.jit(lambda c, d, f: genotype_batch(c, d, f, lcf))(
        jnp.asarray(counts), jnp.asarray(is_dup), jnp.asarray(force_null)
    )
    ints, flts = jax.jit(genotype_batch_pallas)(
        jnp.asarray(counts.T), jnp.asarray(is_dup), jnp.asarray(force_null)
    )
    ints = np.asarray(ints)
    flts = np.asarray(flts)
    # integer fields (GT/GQ included) must be bit-exact: both lowerings
    # build them from the shared lc-free scores (ops.gl.LOG_P_TABLE)
    for row, key in enumerate(INT_KEYS):
        np.testing.assert_array_equal(
            ints[row], np.asarray(ref[key]).astype(np.int32), err_msg=key
        )
    np.testing.assert_allclose(
        flts[:3].T, np.asarray(ref["gl"]), rtol=2e-5, atol=2e-4
    )
    np.testing.assert_allclose(
        flts[3], np.asarray(ref["sq"]), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        flts[4], np.asarray(ref["ab"]), rtol=1e-5, atol=1e-6
    )
