"""BND fidelity (SURVEY.md §3.2, SPEC.md §8.8): mate-aware breakpoint
resolution, SECONDARY handling, shared-anchor genotyping, CI sourcing.

Reference reconstruction under test: a breakend pair is genotyped ONCE
per event, at the primary (non-SECONDARY) record's breakpoints, with
each record's own CIPOS supplying the confidence interval for its side
of the junction. [MUST-VERIFY against real svtyper — empty mount]
"""

import pytest

from svtyper_tpu.breakpoints import BndRegistry
from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
from svtyper_tpu.vcfio.model import Variant, Vcf

REFS = [("chr1", 3_000_000), ("chr2", 2_000_000)]
EVENTS = [
    # DEL-type junction (used as an intra-chromosomal breakend pair)
    Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
    # inter-chromosomal breakend chr1:2,000,000 -> chr2:1,000,000
    Event("BND", "chr1", 2_000_000, 1_000_000, "0/1", chrom2="chr2"),
]


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("bnd")
    bam = str(d / "sim.bam")
    simulate_events(bam, REFS, EVENTS, SimConfig(depth=36), seed=11,
                    extra_background=2000)
    header = "".join(
        l for l in events_to_vcf(EVENTS, REFS).splitlines(True)
        if l.startswith("#")
    )
    return d, bam, header


def _rec(chrom, pos, vid, alt, info):
    return "%s\t%d\t%s\tN\t%s\t.\t.\t%s\tGT\t./." % (chrom, pos, vid, alt, info)


def _write(path, header, recs):
    with open(path, "w") as fh:
        fh.write(header + "\n".join(recs) + "\n")


def _body(path):
    return [l.rstrip("\n").split("\t") for l in open(path)
            if not l.startswith("#")]


def _run(argv):
    assert classic_main(argv) == 0


# ---------------------------------------------------------------- unit


def _registry_for(recs):
    reg = BndRegistry()
    reg.scan(recs)
    return reg


def _toy_vcf():
    vcf = Vcf()
    vcf.add_header([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
    ])
    return vcf


def test_registry_anchor_and_mate_ci():
    """Secondary-first input: both records resolve to ONE breakpoint
    anchored at the primary, with ci_b = the secondary's CIPOS."""
    sec = _rec("chr1", 5001, "b2", "]chr1:1001]N",
               "SVTYPE=BND;MATEID=b1;SECONDARY;CIPOS=-25,25")
    pri = _rec("chr1", 1001, "b1", "N[chr1:5001[",
               "SVTYPE=BND;MATEID=b2;CIPOS=-3,3;CIEND=-9,9")
    reg = _registry_for([sec, pri])
    vcf = _toy_vcf()
    bp_sec = reg.resolve(Variant(sec, vcf))
    bp_pri = reg.resolve(Variant(pri, vcf))
    assert bp_sec is bp_pri  # one event, one breakpoint
    assert bp_pri.chrom_a == "chr1" and bp_pri.pos_a == 1000
    assert bp_pri.pos_b == 5000
    assert bp_pri.ci_a == (-3, 3)
    # the mate record's CIPOS supplies the B-side CI (NOT the anchor's
    # CIEND)
    assert bp_pri.ci_b == (-25, 25)
    assert bp_pri.o1_rev is False and bp_pri.o2_rev is True


def test_registry_tie_breaks_by_input_order():
    a = _rec("chr1", 1001, "x1", "N[chr1:5001[",
             "SVTYPE=BND;MATEID=x2;CIPOS=-1,1")
    b = _rec("chr1", 5001, "x2", "]chr1:1001]N",
             "SVTYPE=BND;MATEID=x1;CIPOS=-2,2")
    reg = _registry_for([a, b])
    vcf = _toy_vcf()
    bp = reg.resolve(Variant(b, vcf))
    assert bp.pos_a == 1000 and bp.ci_a == (-1, 1) and bp.ci_b == (-2, 2)


def test_registry_missing_mate_falls_back():
    lone = _rec("chr1", 1001, "solo", "N[chr1:5001[",
                "SVTYPE=BND;MATEID=ghost;CIPOS=-4,4;CIEND=-7,7")
    reg = _registry_for([lone])
    bp = reg.resolve(Variant(lone, _toy_vcf()))
    assert bp.ci_a == (-4, 4)
    assert bp.ci_b == (-7, 7)  # standalone: own CIEND


def test_registry_non_bnd_passthrough():
    rec = ("chr1\t100\td1\tN\t<DEL>\t.\t.\t"
           "SVTYPE=DEL;END=500;CIPOS=-2,2;CIEND=-3,3\tGT\t./.")
    reg = _registry_for([rec])
    bp = reg.resolve(Variant(rec, _toy_vcf()))
    assert bp.svtype == "DEL" and bp.ci_b == (-3, 3)


# ----------------------------------------------------------- end-to-end


INTRA_A = ("chr1", 1_000_000, "N[chr1:1003001[")
INTRA_B = ("chr1", 1_003_001, "]chr1:1000000]N")


def test_secondary_first_matches_primary_first(paths):
    """The same event genotypes identically regardless of which record
    (primary or SECONDARY) appears first in the file."""
    d, bam, header = paths
    pri = _rec(*INTRA_A[:2], "p", INTRA_A[2],
               "SVTYPE=BND;MATEID=s;CIPOS=0,0")
    sec = _rec(*INTRA_B[:2], "s", INTRA_B[2],
               "SVTYPE=BND;MATEID=p;SECONDARY;CIPOS=0,0")
    v1, v2 = str(d / "pf.vcf"), str(d / "sf.vcf")
    _write(v1, header, [pri, sec])
    _write(v2, header, [sec, pri])
    o1, o2 = str(d / "pf.out.vcf"), str(d / "sf.out.vcf")
    _run(["-i", v1, "-B", bam, "-o", o1, "-n", "50000"])
    _run(["-i", v2, "-B", bam, "-o", o2, "-n", "50000"])
    b1, b2 = _body(o1), _body(o2)
    fmt1 = {row[2]: row[9] for row in b1}
    fmt2 = {row[2]: row[9] for row in b2}
    assert fmt1 == fmt2
    assert fmt1["p"] == fmt1["s"]  # mates share the event's genotype
    assert fmt1["p"].split(":")[0] == "0/1"


def test_mate_cipos_sources_b_side_ci(paths):
    """A pair whose mate carries CIPOS=-50,50 must genotype exactly like
    a standalone record with CIEND=-50,50 (mate CIPOS -> B-side CI)."""
    d, bam, header = paths
    pri = _rec(*INTRA_A[:2], "p", INTRA_A[2],
               "SVTYPE=BND;MATEID=s;CIPOS=0,0;CIEND=0,0")
    sec = _rec(*INTRA_B[:2], "s", INTRA_B[2],
               "SVTYPE=BND;MATEID=p;SECONDARY;CIPOS=-50,50")
    lone = _rec(*INTRA_A[:2], "p", INTRA_A[2],
                "SVTYPE=BND;CIPOS=0,0;CIEND=-50,50")
    vp, vl = str(d / "ci_pair.vcf"), str(d / "ci_lone.vcf")
    _write(vp, header, [pri, sec])
    _write(vl, header, [lone])
    op, ol = str(d / "ci_pair.out.vcf"), str(d / "ci_lone.out.vcf")
    _run(["-i", vp, "-B", bam, "-o", op, "-n", "50000"])
    _run(["-i", vl, "-B", bam, "-o", ol, "-n", "50000"])
    pair_fmt = {row[2]: row[9] for row in _body(op)}
    lone_fmt = _body(ol)[0][9]
    assert pair_fmt["p"] == lone_fmt
    assert pair_fmt["s"] == lone_fmt


def test_interchrom_pair_shares_genotype(paths):
    d, bam, header = paths
    a = _rec("chr1", 2_000_000, "t1", "N[chr2:1000001[",
             "SVTYPE=BND;MATEID=t2;CIPOS=0,0")
    b = _rec("chr2", 1_000_001, "t2", "]chr1:2000000]N",
             "SVTYPE=BND;MATEID=t1;SECONDARY;CIPOS=0,0")
    v = str(d / "inter.vcf")
    _write(v, header, [a, b])
    out = str(d / "inter.out.vcf")
    _run(["-i", v, "-B", bam, "-o", out, "-n", "50000"])
    body = _body(out)
    assert len(body) == 2
    assert body[0][9] == body[1][9]
    assert body[0][9].split(":")[0] == "0/1"


def test_cross_chunk_pairing_matches_single_chunk(paths):
    """batch_size=1 puts the mates in different device chunks; output
    must equal the one-chunk run byte-for-byte."""
    d, bam, header = paths
    pri = _rec(*INTRA_A[:2], "p", INTRA_A[2],
               "SVTYPE=BND;MATEID=s;CIPOS=0,0")
    sec = _rec(*INTRA_B[:2], "s", INTRA_B[2],
               "SVTYPE=BND;MATEID=p;SECONDARY;CIPOS=0,0")
    v = str(d / "xchunk.vcf")
    _write(v, header, [pri, sec])
    o1, o2 = str(d / "xc1.out.vcf"), str(d / "xc2.out.vcf")
    _run(["-i", v, "-B", bam, "-o", o1, "-n", "50000"])
    _run(["-i", v, "-B", bam, "-o", o2, "-n", "50000", "--batch_size", "1"])
    assert open(o1).read() == open(o2).read()
