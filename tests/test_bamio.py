"""BAM/BAI round-trip tests: writer → reader → columnar batches."""

import os

import numpy as np
import pytest

from svtyper_tpu.bamio.bai import BaiIndex, reg2bin, reg2bins
from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.cigar import (
    CigarFeatures,
    cigar_string,
    parse_cigar_string,
)
from svtyper_tpu.bamio.columns import (
    FPAIRED,
    FMREVERSE,
    FREVERSE,
    FUNMAP,
    ReadBatch,
)
from svtyper_tpu.bamio.writer import BamWriter, make_header_text

M, I, D, N, S, H = 0, 1, 2, 3, 4, 5


# ---------------------------------------------------------------- cigar
def test_cigar_parse_roundtrip():
    ops = parse_cigar_string("5S90M2D8M5S")
    assert ops == [(S, 5), (M, 90), (D, 2), (M, 8), (S, 5)]
    assert cigar_string(ops) == "5S90M2D8M5S"


def test_cigar_features_blocks_and_clips():
    f = CigarFeatures(100, parse_cigar_string("5S10M3I10M2D10M4S"))
    assert f.left_soft == 5 and f.right_soft == 4
    assert f.ref_aln_len == 30
    # I merges blocks, D splits them
    assert f.blocks == [(100, 120), (122, 132)]
    assert f.ref_end == 132
    assert f.query_len == 5 + 10 + 3 + 10 + 10 + 4


def test_lead_clip_query_strandaware():
    f = CigarFeatures(0, parse_cigar_string("10H5S50M3S"))
    assert f.lead_clip_query(False) == 15  # H+S on the left
    assert f.lead_clip_query(True) == 3


# ---------------------------------------------------------------- binning
def test_reg2bin_contains_reg2bins():
    for beg, end in [(0, 1), (100, 200), (16383, 16385), (0, 2**28)]:
        assert reg2bin(beg, end) in reg2bins(beg, end)


# ---------------------------------------------------------------- writer/reader
@pytest.fixture
def small_bam(tmp_path):
    path = os.path.join(str(tmp_path), "small.bam")
    refs = [("chr1", 1_000_000), ("chr2", 500_000)]
    hdr = make_header_text(
        refs,
        read_groups=[{"ID": "rg1", "SM": "S1", "LB": "libA"}],
    )
    w = BamWriter(path, refs, hdr)
    # a proper FR pair on chr1
    w.write(
        "frag1", FPAIRED | FMREVERSE, 0, 1000, 60, [(M, 100)],
        mate_tid=0, mate_pos=1250, tlen=350, seq="A" * 100,
        tags={"RG": ("Z", "rg1")},
    )
    # unmapped read (placed at its mate's coordinate)
    w.write("frag4", FUNMAP, 0, 1000, 0, [], seq="A" * 100)
    w.write(
        "frag1", FPAIRED | FREVERSE, 0, 1250, 60, [(M, 100)],
        mate_tid=0, mate_pos=1000, tlen=-350, seq="A" * 100,
        tags={"RG": ("Z", "rg1")},
    )
    # a split read with SA tag on chr1 → chr2
    w.write(
        "frag2", 0, 0, 2000, 50, [(M, 60), (S, 40)],
        seq="A" * 100,
        tags={"RG": ("Z", "rg1"), "SA": ("Z", "chr2,3001,+,60S40M,55,0;")},
    )
    # a far-away read
    w.write("frag3", 0, 0, 500_000, 60, [(M, 100)], seq="A" * 100,
            tags={"RG": ("Z", "rg1")})
    w.close()
    return path


def test_header_parse(small_bam):
    bam = BamFile(small_bam)
    assert bam.header.ref_names == ["chr1", "chr2"]
    assert bam.header.ref_lengths["chr2"] == 500_000
    assert bam.header.sample_name == "S1"
    assert bam.header.read_groups[0]["LB"] == "libA"


def test_fetch_region(small_bam):
    bam = BamFile(small_bam)
    b = bam.fetch("chr1", 900, 1400)
    assert b.n == 2  # frag1 pair; unmapped read skipped
    assert sorted(b.pos.tolist()) == [1000, 1250]
    assert b.qname_hash[0] == b.qname_hash[1]
    assert bool(b.is_reverse[0]) is False and bool(b.is_reverse[1]) is True
    assert b.ref_end.tolist() == [1100, 1350]
    assert b.lib_id.tolist() == [0, 0]


def test_fetch_overlap_semantics(small_bam):
    bam = BamFile(small_bam)
    # read at 1000-1100: window ending at 1000 excludes, at 1001 includes
    assert bam.fetch("chr1", 900, 1000).n == 0
    assert bam.fetch("chr1", 900, 1001).n == 1
    assert bam.fetch("chr1", 1099, 1100).n == 1
    assert bam.fetch("chr1", 1100, 1200).n == 0


def test_fetch_far_region_uses_index(small_bam):
    bam = BamFile(small_bam)
    b = bam.fetch("chr1", 499_000, 501_000)
    assert b.n == 1
    assert b.pos[0] == 500_000
    assert bam.fetch("chr2", 0, 500_000).n == 0


def test_sa_tag_decode(small_bam):
    bam = BamFile(small_bam)
    b = bam.fetch("chr1", 1990, 2100)
    assert b.n == 1
    assert bool(b.has_sa[0])
    assert b.sa_tid[0] == 1
    assert b.sa_pos[0] == 3000
    assert b.sa_end[0] == 3040
    assert bool(b.sa_is_reverse[0]) is False
    assert b.sa_mapq[0] == 55
    assert b.sa_lead_clip_q[0] == 60
    assert b.left_soft[0] == 0 and b.right_soft[0] == 40


def test_head_scan(small_bam):
    bam = BamFile(small_bam)
    b = bam.head(100)
    assert b.n == 5  # includes unmapped
    assert (b.flag & FUNMAP).any()
    b2 = bam.head(2)
    assert b2.n == 2


def test_idxstats(small_bam):
    bam = BamFile(small_bam)
    stats = dict((n, (m, u)) for n, _, m, u in bam.idxstats())
    assert stats["chr1"] == (4, 1)
    assert stats["chr2"] == (0, 0)
    mapped, unmapped = bam.mapped_unmapped()
    assert (mapped, unmapped) == (4, 1)


def test_bai_roundtrip(small_bam, tmp_path):
    src = BaiIndex.load(small_bam + ".bai")
    p2 = os.path.join(str(tmp_path), "copy.bai")
    src.save(p2)
    dup = BaiIndex.load(p2)
    assert dup.idxstats() == src.idxstats()
    assert dup.query(0, 900, 1400) == src.query(0, 900, 1400)


def test_raw_record_recovery(small_bam):
    bam = BamFile(small_bam)
    b = bam.fetch("chr1", 900, 1400)
    raws = bam.raw_records(b.voffset.tolist())
    assert len(raws) == 2
    assert b"frag1\x00" in raws[0]


def test_batch_take_and_concat(small_bam):
    bam = BamFile(small_bam)
    b = bam.fetch("chr1", 0, 1_000_000)
    assert b.n == 4
    sub = b.take(np.array([0, 2]))
    assert sub.n == 2
    assert sub.pos.tolist() == [b.pos[0], b.pos[2]]
    both = ReadBatch.concat([sub, sub])
    assert both.n == 4
    assert both.blk_off[-1] == sub.blk_off[-1] * 2


def test_many_reads_roundtrip(tmp_path):
    """Multi-block BAM with enough reads to span BGZF blocks."""
    path = os.path.join(str(tmp_path), "big.bam")
    refs = [("chr1", 10_000_000)]
    w = BamWriter(path, refs, make_header_text(refs))
    rng = np.random.default_rng(0)
    positions = np.sort(rng.integers(0, 9_000_000, size=5000))
    for i, p in enumerate(positions):
        w.write("r%d" % i, 0, 0, int(p), 60, [(M, 150)], seq="A" * 150)
    w.close()
    bam = BamFile(path)
    lo, hi = 4_000_000, 4_100_000
    b = bam.fetch("chr1", lo, hi)
    expect = int(((positions + 150 > lo) & (positions < hi)).sum())
    assert b.n == expect
    assert bam.mapped_unmapped() == (5000, 0)


def test_unsorted_write_raises(tmp_path):
    """The index builder must reject unsorted input: readers early-stop on
    coordinate order, so an unsorted index would silently drop reads."""
    path = os.path.join(str(tmp_path), "bad.bam")
    refs = [("chr1", 1_000_000)]
    w = BamWriter(path, refs, make_header_text(refs))
    w.write("a", 0, 0, 500, 60, [(M, 100)], seq="A" * 100)
    with pytest.raises(ValueError, match="coordinate order"):
        w.write("b", 0, 0, 100, 60, [(M, 100)], seq="A" * 100)


def test_query_many_matches_query(small_bam):
    bai = BaiIndex.load(small_bam + ".bai")
    rng = np.random.default_rng(7)
    tids, begs, ends = [], [], []
    for _ in range(200):
        tids.append(int(rng.integers(-1, len(bai.refs) + 1)))
        b = int(rng.integers(0, 60_000))
        begs.append(b)
        ends.append(b + int(rng.integers(1, 30_000)))
    row_off, cb, ce = bai.query_many(
        np.asarray(tids), np.asarray(begs), np.asarray(ends)
    )
    for i, (t, b, e) in enumerate(zip(tids, begs, ends)):
        want = bai.query(t, b, e)
        got = list(
            zip(cb[row_off[i]:row_off[i + 1]].tolist(),
                ce[row_off[i]:row_off[i + 1]].tolist())
        )
        assert got == want, (i, t, b, e)


def test_bai_builder_add_bulk_matches_scalar(tmp_path):
    """add_bulk (the -w bulk writer's path) must serialize an index
    byte-identical to per-record add() over the same records."""
    import numpy as np

    from svtyper_tpu.bamio.bai import BaiBuilder

    rng = np.random.default_rng(12)
    n = 4000
    tid = np.sort(rng.integers(0, 3, n))
    pos = np.concatenate([np.sort(rng.integers(0, 1 << 22, (tid == t).sum()))
                          for t in range(3)]).astype(np.int64)
    span = rng.integers(50, 40000, n)  # some spans cross 16K windows
    end = pos + span
    vo = np.cumsum(rng.integers(60, 300, n + 1)).astype(np.int64)
    vo_beg, vo_end = vo[:-1], vo[1:]
    mapped = rng.random(n) > 0.05

    a = BaiBuilder(3)
    for k in range(n):
        a.add(int(tid[k]), int(pos[k]), int(end[k]), int(vo_beg[k]),
              int(vo_end[k]), bool(mapped[k]))
    b = BaiBuilder(3)
    # split across several bulk calls to exercise cross-call merging
    for lo in (0, 1000, 1001, 2500):
        hi = {0: 1000, 1000: 1001, 1001: 2500, 2500: n}[lo]
        b.add_bulk(tid[lo:hi], pos[lo:hi], end[lo:hi], vo_beg[lo:hi],
                   vo_end[lo:hi], mapped[lo:hi])
    pa, pb = str(tmp_path / "a.bai"), str(tmp_path / "b.bai")
    a.finish().save(pa)
    b.finish().save(pb)
    assert open(pa, "rb").read() == open(pb, "rb").read()
