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
    # GL/SQ tolerances are set by the Mosaic transcendentals (log/exp
    # polynomial approximations differ from XLA's): observed drift up to
    # ~8e-3 absolute on this libtpu — far below the %.0f/%.2f output
    # precision, which test_compiled_kernel_formatted_parity asserts
    # directly at format precision
    np.testing.assert_allclose(
        flts[:3].T, np.asarray(ref["gl"]), rtol=1e-4, atol=2e-2
    )
    np.testing.assert_allclose(
        flts[3], np.asarray(ref["sq"]), rtol=1e-4, atol=2e-2
    )
    np.testing.assert_allclose(
        flts[4], np.asarray(ref["ab"]), rtol=1e-5, atol=1e-6
    )


def test_compiled_pallas_inside_shard_map_on_tpu(tmp_path):
    """The flagship production composition — COMPILED `pl.pallas_call`
    inside `shard_map` on a real TPU mesh — must trace, compile and
    produce byte-identical FORMAT fields to the plain-jit path
    (VERDICT r3 item 1). A 1-device Mesh on the single available chip
    exercises the engine's sharded program (`TpuEngine(force_shard=
    True)`), the exact code path a multi-chip deployment runs."""
    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.gt import TpuEngine
    from svtyper_tpu.simulate import (
        Event, SimConfig, events_to_vcf, simulate_events,
    )
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.utils.formatting import fmt_f2, fmt_g2, fmt_gl
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines
    import io

    refs = [("chr1", 4_000_000)]
    events = [
        Event(["DEL", "DUP", "INV"][i % 3], "chr1",
              200_000 + i * 250_000, 200_000 + i * 250_000 + 900 + 71 * i,
              ["0/1", "1/1", "0/0"][i % 3], var_id="fs%d" % i)
        for i in range(14)
    ]
    bam_path = str(tmp_path / "fs.bam")
    simulate_events(bam_path, refs, events, SimConfig(depth=30), seed=5,
                    extra_background=1000)
    sample = Sample.from_bam(BamFile(bam_path), num_samp=50_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(events_to_vcf(events, refs)))
    vcf.add_header(header)
    bps = [resolve_breakpoint(Variant(line, vcf)) for line in body]

    tpu0 = [jax.devices("tpu")[0]]
    plain = TpuEngine([sample], devices=tpu0, chunk_size=16)
    shard = TpuEngine([sample], devices=tpu0, chunk_size=16,
                      force_shard=True)
    assert shard.sharded and not plain.sharded
    res_p = plain.genotype_all(bps)
    res_s = shard.genotype_all(bps)

    def fmt(res):
        if res.null:
            return ("./.", str(res.qr), str(res.qa))
        return (res.gt_string, str(res.gq), fmt_f2(res.sq),
                fmt_gl(res.gl), str(res.qr), str(res.qa),
                fmt_g2(res.ab) if res.ab is not None else ".")

    assert len(res_p) == len(res_s) == len(bps)
    called = 0
    for rp, rs in zip(res_p, res_s):
        assert fmt(rp[0]) == fmt(rs[0])
        called += not rp[0].null
    assert called >= 10  # deep simulated events produce real calls


def test_compiled_kernel_formatted_parity():
    """Formatted (%.0f GL / %.2f SQ / %.2g AB) agreement between the
    COMPILED kernel and the XLA f32 path over the adversarial grid
    (integer-count rows put AB on exact %.2g rounding boundaries) —
    VERDICT r3 item 6."""
    from test_pallas_gl import _adversarial_counts, assert_format_parity

    from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
    from svtyper_tpu.ops.pallas_gl import BLOCK_N, genotype_batch_pallas

    n = BLOCK_N * 4
    counts, is_dup, force_null = _adversarial_counts(n)
    lcf = jnp.asarray(log_choose_table(1 << 17, use_f64=False))
    ref = jax.jit(lambda c, d, f: genotype_batch(c, d, f, lcf))(
        jnp.asarray(counts, dtype=jnp.float32),
        jnp.asarray(is_dup),
        jnp.asarray(force_null),
    )
    ints, flts = jax.jit(genotype_batch_pallas)(
        jnp.asarray(counts.T, dtype=jnp.float32),
        jnp.asarray(is_dup),
        jnp.asarray(force_null),
    )
    assert_format_parity(ref, np.asarray(ints), np.asarray(flts), n)
