"""TPU engine vs float64 oracle: numeric + formatted parity.

Runs on the 8-virtual-device CPU backend with x64 enabled
(tests/conftest.py), where the engine's dtype is float64 — results must
match the oracle to output-format precision (SPEC.md preamble).
"""

import io

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.breakpoints import resolve_breakpoint
from svtyper_tpu.gt import TpuEngine
from svtyper_tpu.oracle import OracleEngine
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
from svtyper_tpu.stats import Sample
from svtyper_tpu.utils.formatting import fmt_f2, fmt_g2, fmt_gl
from svtyper_tpu.vcfio.model import Variant, Vcf
from svtyper_tpu.vcfio.reader import read_vcf_lines

REFS = [("chr1", 10_000_000), ("chr2", 5_000_000)]

EVENTS = [
    Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
    Event("DEL", "chr1", 1_200_000, 1_202_500, "1/1"),
    Event("DEL", "chr1", 1_400_000, 1_402_000, "0/0"),
    Event("DUP", "chr1", 2_000_000, 2_004_000, "0/1"),
    Event("DUP", "chr1", 2_200_000, 2_203_000, "1/1"),
    Event("INV", "chr1", 3_000_000, 3_003_000, "0/1"),
    Event("INV", "chr1", 3_200_000, 3_202_000, "1/1"),
    Event("DEL", "chr1", 4_000_000, 4_000_180, "0/1", var_id="smalldel"),
    Event("BND", "chr1", 5_000_000, 1_000_000, "0/1", chrom2="chr2"),
    Event("DEL", "chr1", 6_000_000, 6_002_000, "0/1", var_id="lowdepth"),
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    bam_path = str(d / "sim.bam")
    simulate_events(
        bam_path, REFS, EVENTS, SimConfig(depth=40), seed=11,
        extra_background=3000,
    )
    sample = Sample.from_bam(BamFile(bam_path), num_samp=100_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(events_to_vcf(EVENTS, REFS)))
    vcf.add_header(header)
    variants = [Variant(line, vcf) for line in body]
    bps = [resolve_breakpoint(v) for v in variants]
    # a variant with no coverage at all (empty fetch)
    no_cov = Variant(
        "chr2\t4000000\tnocov\tN\t<DEL>\t.\t.\tSVTYPE=DEL;END=4002000", vcf
    )
    variants.append(no_cov)
    bps.append(resolve_breakpoint(no_cov))
    return sample, variants, bps


def _fmt_row(res):
    """The FORMAT-field strings that reach the VCF (SPEC.md §6)."""
    if res.null:
        return ("./.",)
    return (
        res.gt_string,
        str(res.gq),
        fmt_f2(res.sq),
        fmt_gl(res.gl),
        str(res.qr),
        str(res.qa),
        fmt_g2(res.ab) if res.ab is not None else ".",
    )


def test_engine_matches_oracle(setup):
    sample, variants, bps = setup
    oracle = OracleEngine([sample])
    engine = TpuEngine([sample])
    eng_results = engine.genotype_all(bps)
    for var, bp, eng_row in zip(variants, bps, eng_results):
        orc = oracle.genotype_variant(bp)[0]
        eng = eng_row[0]
        assert eng.null == orc.null, var.var_id
        assert _fmt_row(eng) == _fmt_row(orc), (
            "%s: engine %s vs oracle %s (counts e=%s o=%s)"
            % (var.var_id, _fmt_row(eng), _fmt_row(orc), eng.counts, orc.counts)
        )
        if not orc.null:
            assert eng.counts == pytest.approx(orc.counts, abs=1e-9)
            assert (eng.qr, eng.qa) == (orc.qr, orc.qa)
            assert eng.gl == pytest.approx(orc.gl, abs=1e-9)


def test_engine_max_reads_and_ci(setup):
    sample, variants, bps = setup
    engine = TpuEngine([sample], max_reads=5)
    res = engine.genotype_chunk(bps[:1])[0][0]
    assert res.null
    engine2 = TpuEngine([sample], max_ci_dist=0.5)
    import copy

    bp = copy.copy(bps[0])
    bp.ci_a = (-8, 8)
    res2 = engine2.genotype_chunk([bp])[0][0]
    assert res2.null


def test_engine_handles_none_breakpoint(setup):
    sample, variants, bps = setup
    engine = TpuEngine([sample])
    rows = engine.genotype_chunk([None, bps[0]])
    assert rows[0][0].null
    assert not rows[1][0].null


def test_oracle_handles_none_breakpoint(setup):
    # symmetric with the TPU engine (VERDICT r2 item 6): None →
    # one null row per sample, not an AttributeError
    sample, variants, bps = setup
    oracle = OracleEngine([sample])
    rows = oracle.genotype_variant(None)
    assert len(rows) == 1 and rows[0].null


def test_chunking_consistency(setup):
    sample, variants, bps = setup
    e1 = TpuEngine([sample], chunk_size=3)
    e2 = TpuEngine([sample], chunk_size=1024)
    r1 = e1.genotype_all(bps)
    r2 = e2.genotype_all(bps)
    for a, b in zip(r1, r2):
        assert _fmt_row(a[0]) == _fmt_row(b[0])


def test_genotype_stream_early_abort(setup):
    """Abandoning the stream mid-flight must shut the pipeline down
    cleanly (no hung prep/collect threads) and leave the engine usable."""
    sample, variants, bps = setup
    engine = TpuEngine([sample], chunk_size=4)
    # the virtual mesh rounds chunk_size up to a device multiple
    stream = engine.genotype_stream(iter(bps * 6))
    first = next(stream)
    assert len(first) == engine.chunk_size
    stream.close()
    res = engine.genotype_chunk(bps[:4])
    assert len(res) == 4
    # a fresh stream over the same engine still works end to end
    total = sum(len(c) for c in engine.genotype_stream(iter(bps)))
    assert total == len(bps)
