"""Oracle end-to-end: simulated truth genotypes must be recovered."""

import io

import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.breakpoints import resolve_breakpoint
from svtyper_tpu.oracle import OracleEngine
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
from svtyper_tpu.stats import Sample
from svtyper_tpu.vcfio.model import Variant, Vcf
from svtyper_tpu.vcfio.reader import read_vcf_lines

REFS = [("chr1", 10_000_000), ("chr2", 5_000_000)]

EVENTS = [
    Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
    Event("DEL", "chr1", 1_200_000, 1_202_500, "1/1"),
    Event("DEL", "chr1", 1_400_000, 1_402_000, "0/0"),
    Event("DUP", "chr1", 2_000_000, 2_004_000, "0/1"),
    Event("INV", "chr1", 3_000_000, 3_003_000, "0/1"),
    Event("DEL", "chr1", 4_000_000, 4_000_180, "0/1", var_id="smalldel"),
    Event("BND", "chr1", 5_000_000, 1_000_000, "0/1", chrom2="chr2"),
]


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    d = tmp_path_factory.mktemp("oracle")
    bam_path = str(d / "sim.bam")
    cfg = SimConfig(depth=40)
    simulate_events(bam_path, REFS, EVENTS, cfg, seed=7, extra_background=4000)
    bam = BamFile(bam_path)
    sample = Sample.from_bam(bam, num_samp=100_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(events_to_vcf(EVENTS, REFS)))
    vcf.add_header(header)
    variants = [Variant(line, vcf) for line in body]
    return sample, variants


def test_truth_recovery(sim):
    sample, variants = sim
    engine = OracleEngine([sample])
    truth = {ev.var_id: ev.gt for ev in EVENTS}
    for var in variants:
        bp = resolve_breakpoint(var)
        assert bp is not None, var.var_id
        res = engine.genotype_variant(bp)[0]
        assert not res.null, "null GT for %s (counts=%s)" % (var.var_id, res.counts)
        assert res.gt_string == truth[var.var_id], (
            "%s: called %s expected %s (counts=%s QR=%d QA=%d)"
            % (var.var_id, res.gt_string, truth[var.var_id],
               res.counts, res.qr, res.qa)
        )


def test_evidence_counters_positive_for_het_del(sim):
    sample, variants = sim
    engine = OracleEngine([sample])
    var = next(v for v in variants if v.var_id == "del_1000000")
    res = engine.genotype_variant(resolve_breakpoint(var))[0]
    ref_seq, alt_seq, alt_clip, ref_span, alt_span = res.counts
    assert ref_seq > 0, "reads sequencing through breakpoints"
    assert alt_seq > 0, "SA split reads at junction"
    assert ref_span > 0, "concordant straddlers"
    assert alt_span > 0, "discordant pairs across the deletion"


def test_max_reads_null(sim):
    sample, variants = sim
    engine = OracleEngine([sample], max_reads=5)
    var = variants[0]
    res = engine.genotype_variant(resolve_breakpoint(var))[0]
    assert res.null


def test_max_ci_dist_null(sim):
    sample, variants = sim
    engine = OracleEngine([sample], max_ci_dist=0.5)
    var = variants[0]
    bp = resolve_breakpoint(var)
    bp.ci_a = (-5, 5)
    res = engine.genotype_variant(bp)[0]
    assert res.null


def test_unsupported_svtype_passthrough(sim):
    sample, variants = sim
    vcf = variants[0].vcf
    line = "chr1\t100\tins1\tN\t<INS>\t.\t.\tSVTYPE=INS;END=100"
    var = Variant(line, vcf)
    assert resolve_breakpoint(var) is None
