"""Adversarial format fixtures (VERDICT r3 item 5; SURVEY.md §4 item 2).

Hand-built records that real-world BAMs contain but the simulator never
produces — hard clips, N/P/X/= ops, empty CIGARs, >65535-op CIGARs in
the CG:B,I long form, every aux tag type, unmapped-mate edge cases —
fuzzed for native-vs-Python decoder equality, plus corrupt-stream error
paths and multi-slice CRAM containers.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.cigar import CigarFeatures
from svtyper_tpu.bamio.columns import FIELD_NAMES
from svtyper_tpu.bamio.native import get_lib
from svtyper_tpu.bamio.writer import BamWriter, make_header_text

REFS = [("chr1", 2_000_000), ("chr2", 1_000_000)]
HDR = make_header_text(REFS, read_groups=[{"ID": "rg1", "SM": "S1",
                                           "LB": "lib1"}])

# op codes: M I D N S H P = X
M, I, D, N, S, H, P, EQ, X = 0, 1, 2, 3, 4, 5, 6, 7, 8


def _write(path, records):
    """records: (qname, flag, tid, pos, mapq, cigar, mtid, mpos, tlen,
    seq, tags)."""
    w = BamWriter(str(path), REFS, HDR)
    for qname, flag, tid, pos, mapq, cigar, mtid, mpos, tlen, seq, tags \
            in records:
        w.write(qname, flag, tid, pos, mapq, cigar, mate_tid=mtid,
                mate_pos=mpos, tlen=tlen, seq=seq, tags=tags)
    w.close()
    return str(path)


def _assert_equal(a, b):
    assert a.n == b.n
    for name in FIELD_NAMES:
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    np.testing.assert_array_equal(a.blk_off, b.blk_off)
    np.testing.assert_array_equal(a.blk_start, b.blk_start)
    np.testing.assert_array_equal(a.blk_end, b.blk_end)


def _both(path, lo=0, hi=2_000_000, chrom="chr1"):
    nat = BamFile(path, use_native=True)
    py = BamFile(path, use_native=False)
    if get_lib() is not None:
        assert nat._get_native() is not None
    a = nat.fetch(chrom, lo, hi)
    b = py.fetch(chrom, lo, hi)
    _assert_equal(a, b)
    return a


def test_exotic_cigar_ops(tmp_path):
    """H/N/P/X/= ops, leading+trailing clip stacks, empty CIGAR."""
    seq60 = "ACGT" * 15
    recs = [
        # hard clip both ends around soft clips (clip stacking)
        ("hc1", 0x1 | 0x40 | 0x8, 0, 1000, 50,
         [(H, 5), (S, 10), (M, 40), (S, 10), (H, 7)], -1, -1, 0,
         seq60, {"RG": ("Z", "rg1")}),
        # N (spliced) + D + I mix → multiple blocks
        ("np1", 0x1 | 0x40 | 0x8, 0, 2000, 50,
         [(M, 10), (N, 500), (M, 10), (D, 20), (M, 10), (I, 20), (M, 10)],
         -1, -1, 0, seq60, {"RG": ("Z", "rg1")}),
        # P (padding) op between matches; = and X instead of M
        ("px1", 0x1 | 0x40 | 0x8, 0, 3000, 50,
         [(EQ, 20), (P, 3), (X, 10), (EQ, 30)], -1, -1, 0,
         seq60, {"RG": ("Z", "rg1")}),
        # empty CIGAR on a mapped record (placed, no alignment)
        ("mt0", 0x1 | 0x40 | 0x8, 0, 4000, 0, [], -1, -1, 0, "",
         {"RG": ("Z", "rg1")}),
        # hard-clip-only + single match at the 2^29-ish high position
        ("hi1", 0x1 | 0x40 | 0x8, 0, 1_999_900, 50,
         [(H, 30), (M, 60)], -1, -1, 0, seq60, {"RG": ("Z", "rg1")}),
    ]
    path = _write(tmp_path / "exotic.bam", recs)
    batch = _both(path)
    rows = {h: i for i, h in enumerate(batch.qname_hash.tolist())}

    def row(q):
        from svtyper_tpu.bamio.records import _fnv1a
        return rows[_fnv1a(q)]

    r = row(b"hc1")
    assert batch.pos[r] == 1000 and batch.ref_end[r] == 1040
    assert batch.left_soft[r] == 10 and batch.right_soft[r] == 10
    r = row(b"np1")
    assert batch.ref_end[r] == 2000 + 10 + 500 + 10 + 20 + 10 + 10
    lo, hi = batch.blk_off[r], batch.blk_off[r + 1]
    assert hi - lo == 3  # M | N | M,D,M? D merges? no: D splits blocks
    r = row(b"px1")
    assert batch.ref_aln_len[r] == 60  # = and X count as aligned
    r = row(b"mt0")
    assert batch.ref_end[r] == 4000  # empty CIGAR: zero span


def test_long_cigar_cg_tag(tmp_path):
    """>65535-op CIGAR stored as kSmN + CG:B,I (SAM spec §4.2.2): both
    decoders must walk the true ops, not the placeholder."""
    n_pairs = 40_000  # 80_001 ops > 0xFFFF
    cigar = [(S, 5)] + [(M, 1), (D, 1)] * n_pairs + [(M, 1), (S, 4)]
    feats = CigarFeatures(5_000, cigar)
    seq = "A" * feats.query_len
    recs = [
        ("ul1", 0x1 | 0x40 | 0x8, 0, 5_000, 60, cigar, -1, -1, 0, seq,
         {"RG": ("Z", "rg1")}),
        # normal neighbour so the fetch window holds both
        ("nb1", 0x1 | 0x40 | 0x8, 0, 5_100, 60, [(M, 60)], -1, -1, 0,
         "A" * 60, {"RG": ("Z", "rg1")}),
    ]
    path = _write(tmp_path / "longcig.bam", recs)
    batch = _both(path, 0, 2_000_000)
    from svtyper_tpu.bamio.records import _fnv1a
    r = int(np.flatnonzero(batch.qname_hash == np.uint64(_fnv1a(b"ul1")))[0])
    assert batch.ref_end[r] == feats.ref_end
    assert batch.ref_aln_len[r] == n_pairs + 1  # the M ops only
    assert batch.left_soft[r] == 5 and batch.right_soft[r] == 4
    assert batch.query_len[r] == feats.query_len
    # windowed fetch that needs the true (not placeholder) geometry
    win = BamFile(path).fetch("chr1", feats.ref_end - 10, feats.ref_end + 10)
    assert np.uint64(_fnv1a(b"ul1")) in win.qname_hash


def test_every_aux_type_before_rg_sa(tmp_path):
    """RG/SA must be found behind every other aux type (the scanners
    must skip A c C s S i I f Z H and all B subtypes correctly)."""
    tags = {
        "XA": ("A", "m"), "Xc": ("c", -5), "XC": ("C", 250),
        "Xs": ("s", -30000), "XS": ("S", 60000), "Xi": ("i", -123456),
        "XI": ("I", 3_000_000_000), "Xf": ("f", 1.5),
        "XZ": ("Z", "hello world"), "XH": ("H", "DEADBEEF"),
        "B1": ("B", ("c", [-1, 2, -3])), "B2": ("B", ("C", [255, 0])),
        "B3": ("B", ("s", [-300, 300])), "B4": ("B", ("S", [65000])),
        "B5": ("B", ("i", [-70000, 70000])),
        "B6": ("B", ("I", [4_000_000_000])),
        "B7": ("B", ("f", [0.25, -0.5])),
        # RG and SA LAST: reaching them exercises every skip above
        "RG": ("Z", "rg1"),
        "SA": ("Z", "chr2,501,-,10S50M,42,3;"),
    }
    recs = [("aux1", 0x1 | 0x40 | 0x8, 0, 1000, 50, [(M, 60)], -1, -1, 0,
             "ACGT" * 15, tags)]
    path = _write(tmp_path / "aux.bam", recs)
    batch = _both(path)
    assert batch.n == 1
    assert batch.lib_id[0] == 0  # RG found
    assert batch.has_sa[0]
    assert batch.sa_tid[0] == 1 and batch.sa_pos[0] == 500
    assert batch.sa_end[0] == 550 and batch.sa_is_reverse[0]
    assert batch.sa_mapq[0] == 42


def test_unmapped_mate_edges(tmp_path):
    recs = [
        # mate unmapped (0x8), MRNM/MPOS point at self per convention
        ("um1", 0x1 | 0x8 | 0x40, 0, 1000, 50, [(M, 60)], 0, 1000, 0,
         "ACGT" * 15, {"RG": ("Z", "rg1")}),
        # placed-unmapped read (0x4 with coordinates) — excluded from
        # fetch results on both paths
        ("um2", 0x1 | 0x4 | 0x80, 0, 1000, 0, [], 0, 1000, 0, "ACGT",
         {"RG": ("Z", "rg1")}),
        # mate on another chromosome
        ("um3", 0x1 | 0x40, 0, 1200, 50, [(M, 60)], 1, 500, 0,
         "ACGT" * 15, {"RG": ("Z", "rg1")}),
    ]
    path = _write(tmp_path / "um.bam", recs)
    batch = _both(path)
    from svtyper_tpu.bamio.records import _fnv1a
    hashes = set(batch.qname_hash.tolist())
    assert _fnv1a(b"um2") not in hashes  # unmapped excluded
    assert _fnv1a(b"um1") in hashes and _fnv1a(b"um3") in hashes


def test_fuzz_native_vs_python(tmp_path):
    """Randomized records over every op/tag feature: the two decoders
    must agree bit-for-bit on every column."""
    rng = np.random.default_rng(77)
    ops_pool = [M, I, D, N, S, EQ, X]
    recs = []
    pos = 500
    for i in range(400):
        n_ops = int(rng.integers(1, 12))
        cigar = []
        if rng.random() < 0.3:
            cigar.append((H if rng.random() < 0.5 else S,
                          int(rng.integers(1, 20))))
        for _ in range(n_ops):
            cigar.append((int(rng.choice(ops_pool)),
                          int(rng.integers(1, 50))))
        if rng.random() < 0.3:
            cigar.append((S if rng.random() < 0.5 else H,
                          int(rng.integers(1, 20))))
        # CIGAR sanity: clips only at ends is already guaranteed; make
        # sure at least one query-consuming op exists
        if not any(op in (M, I, S, EQ, X) for op, _ in cigar):
            cigar.append((M, 10))
        feats = CigarFeatures(pos, cigar)
        seq = "".join(rng.choice(list("ACGT"), feats.query_len or 1))
        tags = {"RG": ("Z", "rg1")}
        if rng.random() < 0.3:
            tags["SA"] = ("Z", "chr1,%d,%s,5S55M,%d,0;" % (
                int(rng.integers(1, 1_000_000)),
                "+-"[int(rng.integers(0, 2))], int(rng.integers(0, 61))))
        if rng.random() < 0.4:
            tags["Xb"] = ("B", ("I", [int(x) for x in
                                      rng.integers(0, 2**31, 3)]))
        if rng.random() < 0.4:
            tags["Xz"] = ("Z", "x" * int(rng.integers(0, 40)))
        flag = 0x1 | (0x10 if rng.random() < 0.5 else 0) | 0x40 | 0x8
        recs.append(("q%04d" % i, flag, 0, pos, int(rng.integers(0, 61)),
                     cigar, -1, -1, 0, seq, tags))
        pos += int(rng.integers(0, 400))
    path = _write(tmp_path / "fuzz.bam", recs)
    batch = _both(path)
    assert batch.n == 400
    # spot-check windowed fetches agree too (index + decode interplay)
    nat = BamFile(path, use_native=True)
    py = BamFile(path, use_native=False)
    for _ in range(10):
        lo = int(rng.integers(0, pos))
        hi = lo + int(rng.integers(100, 30_000))
        _assert_equal(nat.fetch("chr1", lo, hi), py.fetch("chr1", lo, hi))


# ---- corrupt streams -------------------------------------------------

def _corrupt(path, out, mutate):
    data = bytearray(open(path, "rb").read())
    mutate(data)
    with open(out, "wb") as fh:
        fh.write(data)
    return str(out)


def test_truncated_bgzf(tmp_path):
    recs = [("t1", 0x1 | 0x40 | 0x8, 0, 1000, 50, [(M, 60)], -1, -1, 0,
             "ACGT" * 15, {"RG": ("Z", "rg1")})]
    path = _write(tmp_path / "ok.bam", recs)
    bad = _corrupt(path, tmp_path / "trunc.bam",
                   lambda d: d.__delitem__(slice(len(d) // 2, None)))
    with pytest.raises((ValueError, struct.error, zlib.error, OSError)):
        b = BamFile(bad, use_native=False)
        b.fetch("chr1", 0, 2_000_000)
    if get_lib() is not None:
        with pytest.raises((ValueError, struct.error, zlib.error, OSError)):
            b = BamFile(bad, use_native=True)
            b.fetch("chr1", 0, 2_000_000)


def test_corrupt_block_crc_or_payload(tmp_path):
    recs = [("c1", 0x1 | 0x40 | 0x8, 0, 1000, 50, [(M, 60)], -1, -1, 0,
             "ACGT" * 15, {"RG": ("Z", "rg1")})]
    path = _write(tmp_path / "ok2.bam", recs)

    def flip(d):
        # flip bytes inside the deflate payload of the LAST data block
        # (past the header block); corrupts the stream mid-file
        d[len(d) - 60] ^= 0xFF
        d[len(d) - 61] ^= 0xFF

    bad = _corrupt(path, tmp_path / "crc.bam", flip)
    for use_native in (False, True) if get_lib() is not None else (False,):
        with pytest.raises((ValueError, zlib.error, OSError, struct.error)):
            b = BamFile(bad, use_native=use_native)
            batch = b.fetch("chr1", 0, 2_000_000)
            # decoding may defer: force column materialization
            assert batch.n >= 0


# ---- multi-slice CRAM ------------------------------------------------

def test_multislice_cram_container(tmp_path):
    """A container holding several slices (one shared compression
    header, landmark per slice) must decode identically to the
    equivalent BAM — exercises the reader's multi-slice loop with
    slices written by our own writer."""
    from svtyper_tpu.bamio.cram import CramFile
    from svtyper_tpu.bamio.cram_writer import CramWriter

    rng = np.random.default_rng(5)
    recs = []
    pos = 1_000
    for i in range(100):
        cigar = [(S, 3), (M, 50), (D, int(rng.integers(1, 5))), (M, 7)]
        feats = CigarFeatures(pos, cigar)
        seq = "".join(rng.choice(list("ACGT"), feats.query_len))
        flag = 0x1 | 0x40 | 0x8 | (0x10 if i % 2 else 0)
        recs.append(("m%03d" % i, flag, 0, pos, 30 + (i % 30), cigar,
                     -1, -1, 0, seq, {"RG": ("Z", "rg1")}))
        pos += int(rng.integers(10, 500))
    bam = _write(tmp_path / "ms.bam", recs)

    cram_path = str(tmp_path / "ms.cram")
    cw = CramWriter(cram_path, REFS, HDR, records_per_slice=16,
                    slices_per_container=4)
    for qname, flag, tid, p, mapq, cigar, mtid, mpos, tlen, seq, tags \
            in recs:
        cw.write(qname, flag, tid, p, mapq, cigar, mate_tid=mtid,
                 mate_pos=mpos, tlen=tlen, seq=seq, tags=tags)
    cw.close()

    cf = CramFile(cram_path)
    bf = BamFile(bam)
    a = cf.fetch("chr1", 0, 2_000_000)
    b = bf.fetch("chr1", 0, 2_000_000)
    assert a.n == b.n == 100
    for name in ("tid", "pos", "ref_end", "flag", "mapq", "qname_hash",
                 "left_soft", "right_soft", "ref_aln_len", "lib_id"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    # region fetch through the per-slice .crai rows
    mid = recs[50][3]
    a2 = cf.fetch("chr1", mid - 5, mid + 5)
    b2 = bf.fetch("chr1", mid - 5, mid + 5)
    assert a2.n == b2.n > 0
    np.testing.assert_array_equal(a2.qname_hash, b2.qname_hash)


def test_cram_bzip2_lzma_block_codecs(tmp_path, monkeypatch):
    """The CRAM read path advertises bzip2 and lzma block codecs
    (cram.py::uncompress_block) but our writer never emits them — write
    a file whose data blocks alternate bzip2/lzma (method bytes 2/3,
    same framing) and require decode identical to the BAM twin."""
    import bz2
    import lzma

    import svtyper_tpu.bamio.cram_writer as cw_mod
    from svtyper_tpu.bamio.cram import (
        CramFile, M_BZIP2, M_GZIP, M_LZMA, write_itf8,
    )
    from svtyper_tpu.bamio.cram_writer import CramWriter

    counter = {"i": 0}

    def bzlz_write_block(out, method, ctype, content_id, raw):
        if method == M_GZIP:  # transcode every would-be-gzip block
            counter["i"] += 1
            if counter["i"] % 2:
                method, data = M_BZIP2, bz2.compress(raw)
            else:
                method, data = M_LZMA, lzma.compress(raw)
        elif method == 4:  # rANS stays (core entropy path)
            from svtyper_tpu.bamio import rans

            data = rans.compress(raw, order=0)
        else:
            data = raw
        blk = bytearray()
        blk.append(method)
        blk.append(ctype)
        write_itf8(blk, content_id)
        write_itf8(blk, len(data))
        write_itf8(blk, len(raw))
        blk.extend(data)
        blk.extend(struct.pack("<I", zlib.crc32(bytes(blk)) & 0xFFFFFFFF))
        out.extend(blk)

    rng = np.random.default_rng(11)
    recs = []
    pos = 2_000
    for i in range(60):
        cigar = [(S, 2), (M, 40 + int(rng.integers(0, 20)))]
        feats = CigarFeatures(pos, cigar)
        seq = "".join(rng.choice(list("ACGT"), feats.query_len))
        recs.append(("bz%03d" % i, 0x1 | 0x40 | 0x8, 0, pos, 40, cigar,
                     -1, -1, 0, seq, {"RG": ("Z", "rg1")}))
        pos += int(rng.integers(20, 400))
    bam = _write(tmp_path / "bz.bam", recs)

    monkeypatch.setattr(cw_mod, "write_block", bzlz_write_block)
    cram_path = str(tmp_path / "bz.cram")
    w = CramWriter(cram_path, REFS, HDR)
    for qname, flag, tid, p, mapq, cigar, mtid, mpos, tlen, seq, tags \
            in recs:
        w.write(qname, flag, tid, p, mapq, cigar, mate_tid=mtid,
                mate_pos=mpos, tlen=tlen, seq=seq, tags=tags)
    w.close()
    assert counter["i"] > 0  # the transcoder really engaged

    a = CramFile(cram_path).fetch("chr1", 0, 2_000_000)
    b = BamFile(bam).fetch("chr1", 0, 2_000_000)
    assert a.n == b.n == 60
    for name in ("tid", "pos", "ref_end", "flag", "mapq", "qname_hash"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )


def test_bitflip_fuzz_sweep_bam(tmp_path):
    """Bit-flip fuzz over a whole BAM (VERDICT r4 item 8): for dozens
    of seeded random byte positions, flipping that byte must yield
    either a successful decode (the byte was slack/quality data) or a
    CONTROLLED error — never a crash. The native decoder runs in the
    same sweep (a segfault would abort the test process; `make asan`
    re-runs this file for the memory-error variant)."""
    rng = np.random.default_rng(23)
    recs = []
    pos = 1_500
    for i in range(50):
        cigar = [(M, 60), (S, 4)]
        feats = CigarFeatures(pos, cigar)
        seq = "".join(rng.choice(list("ACGT"), feats.query_len))
        recs.append(("f%03d" % i, 0x1 | 0x40 | 0x8, 0, pos, 30, cigar,
                     -1, -1, 0, seq, {"RG": ("Z", "rg1"),
                                      "SA": ("Z", "chr2,5,+,10M,3,0;")}))
        pos += int(rng.integers(30, 200))
    path = _write(tmp_path / "fz.bam", recs)
    data = bytearray(open(path, "rb").read())
    allowed = (ValueError, struct.error, zlib.error, OSError, EOFError,
               IndexError)
    n_err = n_ok = 0
    for trial in range(64):
        flip = bytearray(data)
        k = int(rng.integers(0, len(flip)))
        flip[k] ^= 1 << int(rng.integers(0, 8))
        bad = tmp_path / ("flip_%d.bam" % trial)
        bad.write_bytes(bytes(flip))
        # reuse the pristine index: byte flips may corrupt voffsets too
        import shutil

        shutil.copy(path + ".bai", str(bad) + ".bai")
        for use_native in (
            (False, True) if get_lib() is not None else (False,)
        ):
            try:
                b = BamFile(str(bad), use_native=use_native)
                got = b.fetch("chr1", 0, 2_000_000)
                assert 0 <= got.n <= 200
                n_ok += 1
            except allowed:
                n_err += 1
        bad.unlink()
    # the sweep must have exercised both outcomes
    assert n_ok > 0 and n_err > 0, (n_ok, n_err)


def test_bitflip_fuzz_sweep_cram(tmp_path):
    """Bit-flip fuzz over a whole CRAM: the from-scratch reader's
    itf8/encoding/codec layers must yield decode-or-controlled-error
    for corrupt containers — never hang or crash. (CRC32s are not
    verified on read, so many flips decode to garbage 'successfully';
    that is acceptable, matching htslib's default read path.)"""
    from svtyper_tpu.bamio.cram import CramFile
    from svtyper_tpu.bamio.cram_writer import CramWriter

    rng = np.random.default_rng(31)
    recs = []
    pos = 1_500
    for i in range(40):
        cigar = [(M, 50), (S, 3)]
        feats = CigarFeatures(pos, cigar)
        seq = "".join(rng.choice(list("ACGT"), feats.query_len))
        recs.append(("cf%03d" % i, 0x1 | 0x40 | 0x8, 0, pos, 30, cigar,
                     -1, -1, 0, seq, {"RG": ("Z", "rg1")}))
        pos += int(rng.integers(30, 200))
    path = str(tmp_path / "fz.cram")
    w = CramWriter(path, REFS, HDR)
    for qname, flag, tid, p, mapq, cigar, mtid, mpos, tlen, seq, tags \
            in recs:
        w.write(qname, flag, tid, p, mapq, cigar, mate_tid=mtid,
                mate_pos=mpos, tlen=tlen, seq=seq, tags=tags)
    w.close()
    data = bytearray(open(path, "rb").read())
    import bz2
    import lzma

    allowed = (ValueError, struct.error, zlib.error, OSError, EOFError,
               IndexError, KeyError, MemoryError, OverflowError,
               lzma.LZMAError, AssertionError, RecursionError)
    n_err = n_ok = 0
    for trial in range(48):
        flip = bytearray(data)
        k = int(rng.integers(0, len(flip)))
        flip[k] ^= 1 << int(rng.integers(0, 8))
        bad = tmp_path / ("flip_%d.cram" % trial)
        bad.write_bytes(bytes(flip))
        import shutil

        if os.path.exists(path + ".crai"):
            shutil.copy(path + ".crai", str(bad) + ".crai")
        try:
            cf = CramFile(str(bad))
            got = cf.fetch("chr1", 0, 2_000_000)
            assert 0 <= got.n <= 200
            n_ok += 1
        except allowed:
            n_err += 1
        bad.unlink()
    assert n_ok > 0 and n_err > 0, (n_ok, n_err)
