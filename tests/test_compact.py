"""Compact wire format: compact_chunk + classify_compact must produce
counts identical to the full-column device path (device.py::classify),
which remains the semantic reference (SPEC.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from svtyper_tpu.evidence.device import SPLIT_SLOP, classify, classify_compact
from svtyper_tpu.evidence.extract import (
    _SPLIT_SLOP,
    COMPACT_KEYS,
    compact_chunk,
    pack_chunk,
    prepare_chunk,
)
from svtyper_tpu.parallel.synth import make_synthetic_chunk


def test_slop_constants_agree():
    assert _SPLIT_SLOP == SPLIT_SLOP


def _counts_full(chunk, dens):
    return np.asarray(
        classify(
            {k: jnp.asarray(np.asarray(v)) for k, v in chunk.reads.items()},
            {k: jnp.asarray(np.asarray(v)) for k, v in chunk.pairs.items()},
            {k: jnp.asarray(np.asarray(v)) for k, v in chunk.variants.items()},
            jnp.asarray(dens, dtype=jnp.float64),
            chunk.n_var,
            20,
            dtype=jnp.float64,
        )
    )


def _counts_compact(chunk, dens):
    c = compact_chunk(chunk, min_aligned=20)
    assert set(c) == set(COMPACT_KEYS)
    return np.asarray(
        classify_compact(
            *(jnp.asarray(c[k]) for k in COMPACT_KEYS),
            jnp.asarray(dens, dtype=jnp.float64),
            chunk.n_var,
            dtype=jnp.float64,
        )
    )


def test_compact_matches_full_synthetic():
    chunk, dens = make_synthetic_chunk(n_var=8, frags_per_var=6)
    full = _counts_full(chunk, dens)
    compact = _counts_compact(chunk, dens)
    np.testing.assert_array_equal(compact, full)
    assert full.any()  # non-trivial evidence


def test_compact_matches_full_real_chunk(tmp_path):
    """Real simulated BAM through prepare_chunk: every SV type, padding
    rows, SA splits, soft clips."""
    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    refs = [("chr1", 6_000_000)]
    events = [
        Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
        Event("DUP", "chr1", 2_000_000, 2_002_000, "0/1"),
        Event("INV", "chr1", 3_000_000, 3_002_000, "1/1"),
        Event("DEL", "chr1", 4_000_000, 4_000_900, "0/0"),
    ]
    bam = str(tmp_path / "sim.bam")
    simulate_events(bam, refs, events, SimConfig(depth=30), seed=5,
                    extra_background=1000)
    sample = Sample.from_bam(BamFile(bam), num_samp=50_000)
    vcf = Vcf()
    header, body = read_vcf_lines(
        iter(events_to_vcf(events, refs).splitlines())
    )
    vcf.add_header(header)
    bps = [resolve_breakpoint(Variant(l, vcf)) for l in body]
    bps = bps + [None] * (16 - len(bps))  # force padding slots
    chunk = prepare_chunk(sample, bps)
    dens = sample.dens_matrix()
    full = _counts_full(chunk, dens)
    compact = _counts_compact(chunk, dens)
    np.testing.assert_array_equal(compact, full)
    assert full[:4].any()


def test_native_compact_matches_numpy(tmp_path):
    """The C++ in-decode predicate pass (bamcore chunk_worker compact
    mode) must produce the SAME wire bytes as prepare_chunk +
    compact_chunk, including the max_reads / max_ci_dist gates and BND
    cross-chromosome rows."""
    import copy

    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.evidence.extract import prepare_compact_chunk
    from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    refs = [("chr1", 6_000_000), ("chr2", 1_000_000)]
    events = [
        Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
        Event("DUP", "chr1", 2_000_000, 2_002_000, "0/1"),
        Event("INV", "chr1", 3_000_000, 3_002_000, "1/1"),
        Event("BND", "chr1", 4_000_000, 500_000, "0/1", chrom2="chr2"),
        Event("DEL", "chr1", 5_000_000, 5_000_900, "0/0"),
    ]
    bam = str(tmp_path / "natc.bam")
    simulate_events(bam, refs, events, SimConfig(depth=30), seed=6,
                    extra_background=1000)
    sample = Sample.from_bam(BamFile(bam), num_samp=50_000)
    vcf = Vcf()
    header, body = read_vcf_lines(
        iter(events_to_vcf(events, refs).splitlines())
    )
    vcf.add_header(header)
    bps = [resolve_breakpoint(Variant(l, vcf)) for l in body]
    wide = copy.copy(bps[0])
    wide.ci_a = (-90, 90)
    cases = [
        (bps + [None] * (16 - len(bps)), {}, True),
        ([wide] + bps[1:] + [None] * (16 - len(bps)),
         {"max_reads": 450, "max_ci_dist": 50}, False),
    ]
    for padded, kw, want_rows in cases:
        res = prepare_compact_chunk(sample, padded, **kw)
        if res is None:
            pytest.skip("native core unavailable")
        nat, n_var, n_ev, n_pair = res
        ref = compact_chunk(prepare_chunk(sample, padded, **kw))
        for k in COMPACT_KEYS:
            np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)
        if want_rows:
            assert n_ev > 0 and n_pair > 0


def test_compact_rejects_oversized_chunk():
    chunk, dens = make_synthetic_chunk(n_var=4, frags_per_var=2)
    chunk.n_var = 70_000
    with pytest.raises(ValueError):
        compact_chunk(chunk)
