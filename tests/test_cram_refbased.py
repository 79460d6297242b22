"""Reference-based CRAM: SEQ/QUAL round-trip through the substitution
matrix (closes the r4 `-w`-from-CRAM SEQ gap when -T is given).

BAM (full SEQ/QUAL) → bam_to_cram(ref_fasta=...) encodes M-run
mismatches as 'X' substitution features + stored QS → CramFile with
the same FASTA reconstructs every record's SEQ and QUAL byte-exactly
in raw_records (the -w path). Without the FASTA the records stay
seq-less, and legacy CF-0x8 files stay seq-less even WITH a FASTA
(their mismatches were never recorded).
"""

import struct

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.cigar import CigarFeatures
from svtyper_tpu.bamio.cram import CramFile
from svtyper_tpu.bamio.cram_writer import bam_to_cram
from svtyper_tpu.bamio.writer import BamWriter, make_header_text

M, I, D, N, S, H = 0, 1, 2, 3, 4, 5
_NIB = b"=ACMGRSVTWYHKDBN"


@pytest.fixture(scope="module")
def ref_and_reads(tmp_path_factory):
    d = tmp_path_factory.mktemp("cram_ref")
    rng = np.random.default_rng(17)
    genome = {
        "chr1": "".join(rng.choice(list("ACGT"), 60_000)),
        "chr2": "".join(rng.choice(list("ACGT"), 20_000)),
    }
    fasta = str(d / "ref.fa")
    with open(fasta, "w") as fh:
        for name, seq in genome.items():
            fh.write(">%s\n" % name)
            for i in range(0, len(seq), 70):
                fh.write(seq[i : i + 70] + "\n")
    refs = [(n, len(s)) for n, s in genome.items()]
    hdr = make_header_text(refs, read_groups=[{"ID": "rg1", "SM": "S1",
                                               "LB": "lib1"}])

    # reads: reference bases + injected mismatches, soft clips,
    # insertions, deletions — every feature class the reconstruction
    # must handle
    reads = []
    pos = 100
    for i in range(80):
        tid = i % 2
        chrom = refs[tid][0]
        style = i % 4
        if style == 0:
            cigar = [(M, 80)]
        elif style == 1:
            cigar = [(S, 5), (M, 60), (S, 4)]
        elif style == 2:
            cigar = [(M, 30), (I, 3), (M, 25)]
        else:
            cigar = [(M, 20), (D, 7), (M, 35)]
        feats = CigarFeatures(pos, cigar)
        # assemble the read: reference for M, random for S/I
        seq = []
        ref_cursor = pos
        for op, ln in cigar:
            if op == M:
                seq.append(genome[chrom][ref_cursor : ref_cursor + ln])
                ref_cursor += ln
            elif op in (D, N):
                ref_cursor += ln
            else:  # S/I: off-reference bases
                seq.append("".join(rng.choice(list("ACGT"), ln)))
        seq = "".join(seq)
        # inject 0-3 mismatches into M bases
        seq_l = list(seq)
        # read-positions covered by M ops
        m_positions = []
        rp = 0
        for op, ln in cigar:
            if op == M:
                m_positions.extend(range(rp, rp + ln))
            if op in (M, I, S):
                rp += ln
        for _ in range(int(rng.integers(0, 4))):
            k = int(rng.choice(m_positions))
            cur = seq_l[k]
            seq_l[k] = rng.choice([b for b in "ACGT" if b != cur])
        seq = "".join(seq_l)
        qual = bytes(int(q) for q in rng.integers(10, 40, len(seq)))
        reads.append(("r%03d" % i, 0x1 | 0x40 | 0x8, tid, pos, 40,
                      cigar, -1, -1, 0, seq, qual))
        if tid == 1:
            pos += 200
    # records must be coordinate sorted per writer contract: sort
    reads.sort(key=lambda r: (r[2], r[3]))
    bam = str(d / "rb.bam")
    w = BamWriter(bam, refs, hdr)
    for qname, flag, tid, p, mapq, cigar, mtid, mpos, tlen, seq, qual \
            in reads:
        w.write(qname, flag, tid, p, mapq, cigar, mate_tid=mtid,
                mate_pos=mpos, tlen=tlen, seq=seq, qual=qual,
                tags={"RG": ("Z", "rg1")})
    w.close()
    cram = str(d / "rb.cram")
    bam_to_cram(bam, cram, ref_fasta=fasta)
    return d, fasta, bam, cram, reads


def _decode_bam_body(body: bytes):
    (tid, pos, l_rn, mapq, _bin, n_cig, flag, l_seq, mtid, mpos,
     tlen) = struct.unpack_from("<iiBBHHHIiii", body, 0)
    off = 32 + l_rn + 4 * n_cig
    qname = body[32 : 32 + l_rn - 1].decode()
    nib = body[off : off + (l_seq + 1) // 2]
    seq = "".join(
        chr(_NIB[(nib[i >> 1] >> (4 if i % 2 == 0 else 0)) & 0xF])
        for i in range(l_seq)
    )
    off += (l_seq + 1) // 2
    qual = body[off : off + l_seq]
    return qname, flag, tid, pos, l_seq, seq, qual


def test_seq_qual_roundtrip_with_fasta(ref_and_reads):
    d, fasta, bam, cram, reads = ref_and_reads
    cf = CramFile(cram, ref_fasta=fasta)
    # geometry columns still match the BAM twin
    a = cf.fetch("chr1", 0, 60_000)
    b = BamFile(bam).fetch("chr1", 0, 60_000)
    assert a.n == b.n > 0
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.qname_hash, b.qname_hash)
    # raw_records reconstructs every SEQ and QUAL byte-exactly
    want = {r[0]: (r[9], r[10]) for r in reads}
    n_checked = 0
    for tid, chrom in ((0, "chr1"), (1, "chr2")):
        batch = cf.fetch(chrom, 0, 60_000)
        bodies = cf.raw_records(batch.voffset.tolist())
        for body in bodies:
            qname, _fl, _tid, _pos, l_seq, seq, qual = \
                _decode_bam_body(body)
            wseq, wqual = want[qname]
            assert l_seq == len(wseq)
            assert seq == wseq, qname
            assert qual == wqual, qname
            n_checked += 1
    assert n_checked == len(reads)


def test_seqless_without_fasta(ref_and_reads):
    """The same file WITHOUT -T stays seq-less (l_seq=0) — no FASTA,
    no reconstruction."""
    d, fasta, bam, cram, reads = ref_and_reads
    cf = CramFile(cram)
    batch = cf.fetch("chr1", 0, 60_000)
    bodies = cf.raw_records(batch.voffset.tolist()[:5])
    for body in bodies:
        _q, _fl, _tid, _pos, l_seq, _seq, _qual = _decode_bam_body(body)
        assert l_seq == 0


def test_legacy_nonref_cram_stays_seqless_with_fasta(
    ref_and_reads, tmp_path
):
    """A CRAM written WITHOUT the reference (CF 0x8 — mismatches never
    recorded) must not fabricate SEQ even when a FASTA is supplied."""
    d, fasta, bam, cram, reads = ref_and_reads
    legacy = str(tmp_path / "legacy.cram")
    bam_to_cram(bam, legacy)  # no ref_fasta
    cf = CramFile(legacy, ref_fasta=fasta)
    batch = cf.fetch("chr1", 0, 60_000)
    bodies = cf.raw_records(batch.voffset.tolist()[:5])
    for body in bodies:
        _q, _fl, _tid, _pos, l_seq, _seq, _qual = _decode_bam_body(body)
        assert l_seq == 0


def test_cli_w_from_cram_with_T_has_seq(tmp_path):
    """End to end: -B sample.cram -T ref.fa -w evidence.bam emits
    evidence records WITH SEQ/QUAL (the r4 documented divergence,
    closed when the FASTA is supplied)."""
    from svtyper_tpu.bamio.cram_writer import iter_bam_records
    from svtyper_tpu.cli.classic import main as classic_main
    from svtyper_tpu.simulate import (
        Event, SimConfig, events_to_vcf, simulate_events,
    )

    d = tmp_path
    refs = [("chr1", 600_000)]
    events = [Event("DEL", "chr1", 200_000, 202_500, "0/1", var_id="d1")]
    bam = str(d / "s.bam")
    simulate_events(bam, refs, events, SimConfig(depth=30), seed=8,
                    extra_background=500)
    # the simulator emits all-'A' reads, so an all-'A' reference is
    # exactly consistent (mismatch coverage lives in the unit test)
    fasta = str(d / "ref.fa")
    with open(fasta, "w") as fh:
        for name, ln in refs:
            fh.write(">%s\n" % name)
            for i in range(0, ln, 1000):
                fh.write("A" * min(1000, ln - i) + "\n")
    cram = str(d / "s.cram")
    bam_to_cram(bam, cram, ref_fasta=fasta)

    out = str(d / "out.vcf")
    ebam = str(d / "ev.bam")
    vcf = str(d / "in.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(events, refs))
    assert classic_main(["-i", vcf, "-B", cram, "-T", fasta, "-o", out,
                         "-n", "20000", "-w", ebam]) == 0
    n = 0
    for (qname, flag, tid, pos, mapq, cigar, mtid, mpos, tlen, seq,
         qual, raw_tags) in iter_bam_records(ebam):
        assert seq and set(seq) <= {"A"}, (qname, seq[:20])
        n += 1
    assert n > 0


def test_unmapped_reads_keep_literal_bases(tmp_path):
    """Reference-based files store unmapped reads' bases verbatim (BA
    series) — raw_records round-trips their SEQ/QUAL too (review
    finding, r5: they previously degraded to seq-less)."""
    from svtyper_tpu.bamio.cram_writer import CramWriter
    from svtyper_tpu.bamio.writer import make_header_text

    refs = [("chr1", 5_000)]
    fasta = str(tmp_path / "r.fa")
    with open(fasta, "w") as fh:
        fh.write(">chr1\n" + "ACGT" * 1250 + "\n")
    hdr = make_header_text(refs, read_groups=[{"ID": "rg1", "SM": "S1",
                                               "LB": "l1"}])
    cram = str(tmp_path / "u.cram")
    w = CramWriter(cram, refs, hdr, ref_fasta=fasta)
    # one mapped, one unmapped-with-coordinate (placed record)
    w.write("m1", 0x1 | 0x40, 0, 100, 40, [(M, 40)],
            seq="ACGT" * 10, qual=bytes(range(30, 70)),
            tags={"RG": ("Z", "rg1")})
    w.write("u1", 0x1 | 0x80 | 0x4, 0, 100, 0, [],
            seq="TTTTGGGGCCCC", qual=bytes(range(20, 32)),
            tags={"RG": ("Z", "rg1")})
    w.close()
    cf = CramFile(cram, ref_fasta=fasta)
    batch = cf.fetch("chr1", 0, 5_000)
    vos = batch.voffset.tolist()
    # fetch() excludes unmapped records (the evidence model never sees
    # them); address the unmapped mate by its (container, ordinal)
    # voffset directly — ordinal 1, same container as the mapped read
    container_off = int(vos[0]) >> 24
    vos.append((container_off << 24) | 1)
    bodies = cf.raw_records(vos)
    got = {}
    for body in bodies:
        qname, _fl, _tid, _pos, l_seq, seq, qual = _decode_bam_body(body)
        got[qname] = (seq, qual)
    assert got["m1"] == ("ACGT" * 10, bytes(range(30, 70)))
    assert got["u1"] == ("TTTTGGGGCCCC", bytes(range(20, 32)))


def test_missing_contig_degrades_with_warning(ref_and_reads, capsys):
    """A -T FASTA missing a header contig must not crash -w: that
    contig's records come back seq-less and a single warning names it
    (review finding, r5)."""
    d, fasta, bam, cram, reads = ref_and_reads
    partial = str(d / "partial.fa")
    with open(partial, "w") as out, open(fasta) as src:
        take = True
        for line in src:
            if line.startswith(">"):
                take = line.startswith(">chr1")
            if take:
                out.write(line)
    cf = CramFile(cram, ref_fasta=partial)
    # chr1 present: seq reconstructed
    b1 = cf.fetch("chr1", 0, 60_000)
    body = cf.raw_records(b1.voffset.tolist()[:1])[0]
    assert _decode_bam_body(body)[4] > 0
    # chr2 absent: seq-less, one warning
    import sys

    b2 = cf.fetch("chr2", 0, 60_000)
    bodies = cf.raw_records(b2.voffset.tolist()[:4])
    err = capsys.readouterr().err
    for body in bodies:
        assert _decode_bam_body(body)[4] == 0
    assert err.count("not in reference FASTA") == 1
    assert "chr2" in err


def test_mixed_bam_cram_w_falls_back_with_note(tmp_path, capsys):
    """-w over one BAM + one CRAM sample: the CRAM handle has no
    native evidence arena, so the run must roll back to the batched
    re-fetch for BOTH samples and say so (the arena note machinery,
    exercised on the mixed-support branch)."""
    from svtyper_tpu.cli.classic import main as classic_main
    from svtyper_tpu.simulate import (
        Event, SimConfig, events_to_vcf, simulate_events,
    )

    refs = [("chr1", 800_000)]
    events = [Event("DEL", "chr1", 200_000, 202_500, "0/1", var_id="d1")]
    bam_a = str(tmp_path / "a.bam")
    bam_b = str(tmp_path / "b.bam")
    simulate_events(bam_a, refs, events,
                    SimConfig(depth=25, sample_name="SA"), seed=3,
                    extra_background=400)
    simulate_events(bam_b, refs, events,
                    SimConfig(depth=25, sample_name="SB"), seed=4,
                    extra_background=400)
    cram_b = str(tmp_path / "b.cram")
    bam_to_cram(bam_b, cram_b)
    vcf = str(tmp_path / "in.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(events, refs, sample="SA"))
    out = str(tmp_path / "o.vcf")
    ebam = str(tmp_path / "ev.bam")
    assert classic_main(["-i", vcf, "-B", "%s,%s" % (bam_a, cram_b),
                         "-o", out, "-n", "20000", "-w", ebam]) == 0
    err = capsys.readouterr().err
    assert "-w using the batched re-fetch path" in err
    assert "without native evidence export" in err
    from svtyper_tpu.bamio.bam import BamFile

    eb = BamFile(ebam)
    assert eb.fetch("chr1", 195_000, 210_000).n > 0


def test_genome_backed_simulation_roundtrip(tmp_path):
    """simulate_events(fasta_out=...) emits TRUE read bases from a
    generated genome; a reference-based CRAM transcode of that BAM
    must round-trip every record's SEQ/QUAL byte-exactly through
    raw_records — tying the simulator, the FASTA reader, and the
    substitution-matrix path together end to end."""
    from svtyper_tpu.bamio.cram_writer import iter_bam_records
    from svtyper_tpu.simulate import Event, SimConfig, simulate_events

    refs = [("chr1", 900_000), ("chr2", 300_000)]
    events = [
        Event("DEL", "chr1", 200_000, 202_500, "0/1", var_id="d1"),
        Event("INV", "chr1", 500_000, 502_000, "0/1", var_id="i1"),
        Event("BND", "chr1", 700_000, 100_000, "0/1", chrom2="chr2",
              var_id="b1"),
    ]
    bam = str(tmp_path / "g.bam")
    fasta = str(tmp_path / "g.fa")
    simulate_events(bam, refs, events, SimConfig(depth=20), seed=12,
                    extra_background=300, fasta_out=fasta)
    # reads are no longer all-'A'
    seqs = [r[9] for r in iter_bam_records(bam)]
    assert any(set(sq) - {"A"} for sq in seqs if sq)
    cram = str(tmp_path / "g.cram")
    bam_to_cram(bam, cram, ref_fasta=fasta)
    cf = CramFile(cram, ref_fasta=fasta)
    # compare every mapped record's SEQ/QUAL via raw_records
    want = {}
    for (qname, flag, tid, pos, _m, _c, _mt, _mp, _tl, sq, ql, _t) \
            in iter_bam_records(bam):
        want[(qname, flag & 0xC0, tid, pos)] = sq
    n = 0
    for chrom, span in refs:
        batch = cf.fetch(chrom, 0, span)
        for body in cf.raw_records(batch.voffset.tolist()):
            qname, flag, tid, pos, l_seq, seq, _q = _decode_bam_body(body)
            key = (qname, flag & 0xC0, tid, pos)
            assert l_seq > 0
            assert seq == want[key], key
            n += 1
    assert n > 500


def test_fasta_crlf_and_fai_roundtrip(tmp_path):
    """CRLF-wrapped FASTA files index and fetch correctly (bpl counts
    bases, cpl counts bytes incl. \\r\\n), and a second open parses the
    cached .fai to identical results."""
    from svtyper_tpu.bamio.fasta import FastaFile

    p = str(tmp_path / "crlf.fa")
    with open(p, "wb") as fh:
        fh.write(b">c1 desc\r\nACGTACGTAC\r\nGTACGTACGT\r\nACG\r\n")
    f1 = FastaFile(p)
    assert f1.length("c1") == 23
    assert f1.fetch("c1", 0, 23) == b"ACGTACGTACGTACGTACGTACG"
    assert f1.fetch("c1", 8, 14) == b"ACGTAC"
    assert f1.fetch("c1", 21, 27) == b"CGNNNN"
    f2 = FastaFile(p)  # .fai cache path
    assert f2.fetch("c1", 8, 14) == b"ACGTAC"
