"""Edge-case parity: flagged-read exclusion, complex CIGARs at
breakpoints, wide CIs, mapq extremes, multi-library samples."""

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.columns import (
    FDUP,
    FMREVERSE,
    FPAIRED,
    FQCFAIL,
    FREVERSE,
    FSECONDARY,
    FSUPPLEMENTARY,
)
from svtyper_tpu.bamio.writer import BamWriter, make_header_text
from svtyper_tpu.breakpoints import Breakpoint
from svtyper_tpu.gt import TpuEngine
from svtyper_tpu.oracle import OracleEngine
from svtyper_tpu.stats import Sample

M, I, D, N, S = 0, 1, 2, 3, 4
REFS = [("chr1", 200_000)]
BP_A, BP_B = 50_000, 60_000  # 0-based breakpoints


def _bp():
    return Breakpoint("DEL", "chr1", BP_A, (0, 0), "chr1", BP_B, (0, 0),
                      False, True, BP_B - BP_A)


def _write(path, records):
    hdr = make_header_text(
        REFS, read_groups=[{"ID": "rg0", "SM": "S", "LB": "L"}]
    )
    w = BamWriter(path, REFS, hdr)
    for r in sorted(records, key=lambda r: r[2]):
        qname, flag, pos, cigar, mapq, mate_pos, tlen, tags = r
        t = {"RG": ("Z", "rg0")}
        t.update(tags or {})
        qlen = sum(l for op, l in cigar if op in (M, I, S))
        w.write(qname, flag, 0, pos, mapq, cigar,
                mate_tid=0 if mate_pos >= 0 else -1, mate_pos=mate_pos,
                tlen=tlen, seq="A" * qlen, tags=t)
    w.close()
    return path


def _pair(qname, pos1, pos2, cigar1=None, cigar2=None, mapq=60, flags1=0,
          flags2=0):
    c1 = cigar1 or [(M, 150)]
    c2 = cigar2 or [(M, 150)]
    span = pos2 + 150 - pos1
    return [
        (qname, FPAIRED | FMREVERSE | flags1, pos1, c1, mapq, pos2, span, None),
        (qname, FPAIRED | FREVERSE | flags2, pos2, c2, mapq, pos1, -span, None),
    ]


def _counts(tmp_path, records, name="t.bam", bp=None, **engine_kw):
    path = _write(str(tmp_path / name), records)
    sample = Sample.from_bam(BamFile(path), num_samp=100_000)
    bp = bp or _bp()
    orc = OracleEngine([sample], **engine_kw).genotype_variant(bp)[0]
    eng = TpuEngine([sample], **engine_kw).genotype_chunk([bp])[0][0]
    assert not orc.null, "fixture produced no evidence (vacuous test)"
    assert eng.null == orc.null
    assert eng.counts == pytest.approx(orc.counts, abs=1e-9)
    assert (eng.qr, eng.qa) == (orc.qr, orc.qa)
    return orc


def _background(n=40):
    """Concordant pairs covering both breakpoints (library mass)."""
    out = []
    for i in range(n):
        p = 45_000 + i * 500
        out += _pair("bg%d" % i, p, p + 200)
    return out


def test_flagged_reads_excluded(tmp_path):
    base = _background() + _pair("thru", BP_A - 75, BP_A - 60)
    r0 = _counts(tmp_path, base, "a.bam")
    # duplicates/secondary/supplementary/qcfail through the breakpoint
    # must contribute nothing
    noisy = list(base)
    for i, fl in enumerate((FDUP, FSECONDARY, FSUPPLEMENTARY, FQCFAIL)):
        noisy += _pair("noise%d" % i, BP_A - 75, BP_A + 30,
                       flags1=fl, flags2=fl)
    r1 = _counts(tmp_path, noisy, "b.bam")
    assert r1.counts == pytest.approx(r0.counts, abs=1e-9)


def test_deletion_cigar_breaks_ref_seq_coverage(tmp_path):
    base = _background()
    # read whose 10bp deletion spans the breakpoint: M-blocks do not
    # cover [A-19, A+21) fully → NOT ref_seq evidence
    rec_d = ("del_read", FPAIRED | FMREVERSE, BP_A - 75,
             [(M, 70), (D, 10), (M, 80)], 60, BP_A + 300, 525, None)
    mate = ("del_read", FPAIRED | FREVERSE, BP_A + 300, [(M, 150)], 60,
            BP_A - 75, -525, None)
    with_d = base + [rec_d, mate]
    r_with = _counts(tmp_path, with_d, "d.bam")
    # same read fully aligned → IS ref_seq evidence
    rec_m = ("del_read", FPAIRED | FMREVERSE, BP_A - 75, [(M, 150)], 60,
             BP_A + 300, 525, None)
    with_m = base + [rec_m, mate]
    r_without = _counts(tmp_path, with_m, "m.bam")
    assert r_without.counts[0] == pytest.approx(r_with.counts[0] + (1 - 1e-6),
                                                abs=1e-6)


def test_mapq_zero_contributes_nothing(tmp_path):
    base = _background()
    r0 = _counts(tmp_path, base, "q0.bam")
    noisy = base + _pair("mq0", BP_A - 75, BP_A - 60, mapq=0)
    r1 = _counts(tmp_path, noisy, "q1.bam")
    assert r1.counts == pytest.approx(r0.counts, abs=1e-9)


def test_wide_ci_parity(tmp_path):
    base = _background()
    bp = _bp()
    bp.ci_a = (-40, 40)
    bp.ci_b = (-40, 40)
    _counts(tmp_path, base, "ci.bam", bp=bp)  # parity assertion inside


def test_multi_library_sample(tmp_path):
    """Two RGs mapping to two LBs with different insert distributions;
    rare library below prevalence threshold is filtered."""
    hdr = make_header_text(
        REFS,
        read_groups=[
            {"ID": "rgA", "SM": "S", "LB": "libA"},
            {"ID": "rgB", "SM": "S", "LB": "libB"},
            {"ID": "rgR", "SM": "S", "LB": "libRare"},
        ],
    )
    path = str(tmp_path / "multi.bam")
    w = BamWriter(path, REFS, hdr)
    recs = []
    rng = np.random.default_rng(0)
    for i in range(1100):  # prevalence of the rare lib: 1/2201 < 1e-3
        p = 40_000 + i * 80
        rg = "rgA" if i % 2 == 0 else "rgB"
        ins = 300 if rg == "rgA" else 500
        recs.append(("m%d" % i, FPAIRED | FMREVERSE, p, rg, p + ins - 150,
                     ins))
        recs.append(("m%d" % i, FPAIRED | FREVERSE, p + ins - 150, rg, p,
                     -ins))
    # one rare-library pair (prevalence 1/801 < 1e-3)
    recs.append(("rare", FPAIRED | FMREVERSE, BP_A - 75, "rgR", BP_A + 100,
                 325))
    for q, fl, pos, rg, mpos, tl in sorted(recs, key=lambda r: r[2]):
        w.write(q, fl, 0, pos, 60, [(M, 150)], mate_tid=0, mate_pos=mpos,
                tlen=tl, seq="A" * 150, tags={"RG": ("Z", rg)})
    w.close()
    sample = Sample.from_bam(BamFile(path), num_samp=100_000)
    assert set(sample.lib_dict) == {"libA", "libB", "libRare"}
    assert abs(sample.lib_dict["libA"].mean - 300) < 1
    assert abs(sample.lib_dict["libB"].mean - 500) < 1
    assert "libRare" not in sample.active_libs
    # fetch flank uses the widest library
    assert sample.get_fetch_flank(3.0) >= 500
    # engine/oracle agree with per-library densities in play
    bp = _bp()
    orc = OracleEngine([sample]).genotype_variant(bp)[0]
    eng = TpuEngine([sample]).genotype_chunk([bp])[0][0]
    assert eng.null == orc.null
    if not orc.null:
        assert eng.counts == pytest.approx(orc.counts, abs=1e-9)
