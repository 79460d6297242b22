"""The C++ chunk-layout fast path (bamcore svt_fetch_chunk) vs the numpy
layout it replaces, plus the qname-collision mate-identity guard.

The numpy path in evidence/extract.py stays as the semantic reference;
the fast path must reproduce its padded device tensors bit-for-bit,
including multi-window dedup, max_reads capping and pair ordering.
"""

import io

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.writer import BamWriter, make_header_text
from svtyper_tpu.breakpoints import resolve_breakpoint
from svtyper_tpu.evidence.extract import prepare_chunk
from svtyper_tpu.oracle import OracleEngine
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
from svtyper_tpu.stats import Sample
from svtyper_tpu.vcfio.model import Variant, Vcf
from svtyper_tpu.vcfio.reader import read_vcf_lines

REFS = [("chr1", 10_000_000), ("chr2", 5_000_000)]

EVENTS = [
    Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
    Event("DEL", "chr1", 1_200_000, 1_200_400, "1/1"),  # overlapping windows
    Event("DUP", "chr1", 2_000_000, 2_004_000, "0/1"),
    Event("INV", "chr1", 3_000_000, 3_003_000, "0/1"),
    Event("BND", "chr1", 5_000_000, 1_000_000, "0/1", chrom2="chr2"),
    Event("DEL", "chr1", 6_000_000, 6_002_000, "0/0"),
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("fetchchunk")
    bam_path = str(d / "sim.bam")
    simulate_events(
        bam_path, REFS, EVENTS, SimConfig(depth=35), seed=5,
        extra_background=2000,
    )
    sample = Sample.from_bam(BamFile(bam_path), num_samp=100_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(events_to_vcf(EVENTS, REFS)))
    vcf.add_header(header)
    bps = [resolve_breakpoint(Variant(line, vcf)) for line in body]
    bps.append(None)  # unsupported slot
    return sample, bps


def _assert_same(a, b):
    for tbl in ("reads", "pairs", "variants"):
        da, db = getattr(a, tbl), getattr(b, tbl)
        assert set(da) == set(db)
        for k in da:
            assert np.array_equal(da[k], db[k]), (tbl, k)
    assert a.n_var == b.n_var


@pytest.mark.parametrize("max_reads", [None, 60])
def test_native_chunk_matches_numpy(setup, monkeypatch, max_reads):
    sample, bps = setup
    if sample.bam._get_native() is None:
        pytest.skip("native core unavailable")
    monkeypatch.delenv("SVT_NO_FETCHCHUNK", raising=False)
    fast = prepare_chunk(sample, bps, max_reads=max_reads)
    monkeypatch.setenv("SVT_NO_FETCHCHUNK", "1")
    ref = prepare_chunk(sample, bps, max_reads=max_reads)
    _assert_same(fast, ref)
    if max_reads is None:
        assert int(np.count_nonzero(fast.reads["var"] < fast.n_var)) > 0
        assert int(np.count_nonzero(fast.pairs["var"] < fast.n_var)) > 0
    else:
        # the cap must actually have fired somewhere on this fixture
        assert fast.variants["force_null"].any()


def test_native_chunk_pad_buckets(setup, monkeypatch):
    """High-water padding requests must be honored identically."""
    sample, bps = setup
    if sample.bam._get_native() is None:
        pytest.skip("native core unavailable")
    monkeypatch.delenv("SVT_NO_FETCHCHUNK", raising=False)
    fast = prepare_chunk(sample, bps, pad_reads=4096, pad_pairs=8192)
    assert len(fast.reads["var"]) == 4096
    assert len(fast.pairs["var"]) == 8192
    monkeypatch.setenv("SVT_NO_FETCHCHUNK", "1")
    ref = prepare_chunk(sample, bps, pad_reads=4096, pad_pairs=8192)
    _assert_same(fast, ref)


def _collision_bam(path):
    """Two distinct fragments sharing one qname ("collision" — identical
    qname bytes hash identically), arranged so a naive (var, hash)
    grouping would see exactly two mates and fabricate a pair. The mate
    coordinates expose the mismatch: each read's MRNM/MPOS points far
    outside the window."""
    refs = [("chr1", 1_000_000)]
    hdr = make_header_text(refs, read_groups=[{"ID": "rg1", "SM": "s1",
                                               "LB": "l1"}])
    w = BamWriter(path, refs, hdr)
    recs = []
    # honest background pairs around the breakpoints so libraries exist
    for i in range(300):
        p = 90_000 + i * 40
        recs.append(("bg%d" % i, 0x1 | 0x40 | 0x20, p, p + 350, 500))
        recs.append(("bg%d" % i, 0x1 | 0x80 | 0x10, p + 350, p, -500))
    # fragment 1: read near breakpoint A, mate far away (outside windows)
    recs.append(("dupname", 0x1 | 0x40, 99_900, 800_000, 0))
    # fragment 2 (same qname): read near breakpoint B, mate far away
    recs.append(("dupname", 0x1 | 0x80 | 0x10, 101_950, 850_000, 0))
    for qname, flag, pos, mpos, tlen in sorted(recs, key=lambda r: r[2]):
        w.write(qname, flag, 0, pos, 60, [(0, 150)],
                mate_tid=0, mate_pos=mpos, tlen=tlen,
                tags={"RG": ("Z", "rg1")})
    w.close()


def test_qname_collision_forms_no_pair(tmp_path, monkeypatch):
    bam_path = str(tmp_path / "coll.bam")
    _collision_bam(bam_path)
    sample = Sample.from_bam(BamFile(bam_path), num_samp=10_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100001\tv1\tN\t<DEL>\t.\t.\tSVTYPE=DEL;END=102001\n"
    ))
    vcf.add_header(header)
    bp = resolve_breakpoint(Variant(next(iter(body)), vcf))

    # both layout paths must refuse the colliding "pair"
    for env in (None, "1"):
        if env is None:
            monkeypatch.delenv("SVT_NO_FETCHCHUNK", raising=False)
        else:
            monkeypatch.setenv("SVT_NO_FETCHCHUNK", env)
        chunk = prepare_chunk(sample, [bp])
        pv = chunk.pairs["var"]
        apos = chunk.pairs["a_pos"]
        # no pair row may join 99_900 with 101_950 (the colliding reads)
        bad = (pv == 0) & (apos == 99_900)
        assert not bad.any(), "collision fabricated a pair (env=%r)" % env

    # oracle agrees: counts unaffected by the colliding singletons
    oracle = OracleEngine([sample])
    res = oracle.genotype_variant(bp)[0]
    assert res.counts is not None


def test_fine_range_prep_edges(tmp_path):
    """_prep_ranges_fine edge cases: regions past every read (trailing
    UINT64_MAX fine slots), read-free gaps (cross-tid/era leakage ends
    at the coordinate break), unknown chromosomes, and equivalence with
    the BAI-query path (SVT_NO_FINERANGE=1) on all of them."""
    import os

    refs = [("c1", 9_000_000), ("c2", 2_000_000)]
    events = [
        Event("DEL", "c1", 500_000, 502_000, "0/1", var_id="a"),
        # read-free gap between 600k and 8M on c1
        Event("DEL", "c1", 4_000_000, 4_002_000, "0/1", var_id="gap"),
        Event("DEL", "c1", 8_000_000, 8_002_000, "1/1", var_id="b"),
        # c2 has background reads only -> homozygous-ref evidence
        Event("DEL", "c2", 1_000_000, 1_001_500, "0/0", var_id="c"),
        # beyond the last read of c2
        Event("DEL", "c2", 1_900_000, 1_950_000, "0/1", var_id="tail"),
    ]
    bam_path = str(tmp_path / "edge.bam")
    # simulate only the first/third/fourth events' reads; 'gap' and
    # 'tail' windows must come back empty
    sim_events = [events[0], events[2], events[3]]
    simulate_events(bam_path, refs, sim_events, SimConfig(depth=18),
                    seed=5, extra_background=200)
    sample = Sample.from_bam(BamFile(bam_path), num_samp=50_000)
    vcf = Vcf()
    header, body = read_vcf_lines(io.StringIO(events_to_vcf(events, refs)))
    vcf.add_header(header)
    bps = [resolve_breakpoint(Variant(line, vcf)) for line in body]
    # unknown chromosome row
    import copy

    ghost = copy.copy(bps[0])
    ghost.chrom_a = ghost.chrom_b = "chrMISSING"
    bps.append(ghost)

    from svtyper_tpu.evidence.extract import prepare_compact_chunk

    res_fine = prepare_compact_chunk(sample, bps, min_aligned=20,
                                     max_reads=None, max_ci_dist=1e10)
    os.environ["SVT_NO_FINERANGE"] = "1"
    try:
        res_bai = prepare_compact_chunk(sample, bps, min_aligned=20,
                                        max_reads=None, max_ci_dist=1e10)
    finally:
        os.environ.pop("SVT_NO_FINERANGE")
    assert res_fine is not None and res_bai is not None
    a, b = res_fine[0], res_bai[0]
    assert res_fine[1:] == res_bai[1:]
    for k in a:
        assert np.array_equal(a[k], b[k]), k
    # the empty-window variants produced zero evidence rows
    n_var = res_fine[1]
    cr_var = a["cr_u16"][0]
    cp_var = a["cp_u16"][0]
    for vi in (1, 4, 5):  # gap, tail, ghost
        assert not np.any(cr_var == vi), vi
        assert not np.any(cp_var == vi), vi
