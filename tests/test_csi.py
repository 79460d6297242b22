"""CSI index: long-contig region queries (reference gets CSI free via
pysam→htslib for refs past 2^29-1 bp; bamio/csi.py is the from-scratch
equivalent sharing BAI's vectorized query machinery)."""

import os

import numpy as np
import pytest

from svtyper_tpu.bamio.bai import BaiBuilder
from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.csi import (
    CsiBuilder,
    CsiIndex,
    depth_for,
    max_bins,
    reg2bin_g,
)
from svtyper_tpu.bamio.writer import BamWriter, make_header_text

LONG = (1 << 29) + 40_000_000  # past the BAI limit


def test_reg2bin_g_matches_bai_scheme():
    from svtyper_tpu.bamio.bai import reg2bin

    rng = np.random.default_rng(0)
    for _ in range(500):
        beg = int(rng.integers(0, (1 << 29) - 200))
        end = beg + int(rng.integers(1, 200))
        assert reg2bin_g(beg, end, 14, 5) == reg2bin(beg, end)


def test_depth_for():
    assert depth_for((1 << 29) - 1) == 5
    assert depth_for(1 << 29) == 5
    assert depth_for((1 << 32)) == 6
    assert max_bins(5) == 37449


@pytest.fixture(scope="module")
def long_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("csi")
    path = str(d / "long.bam")
    refs = [("chrL", LONG), ("chrS", 100_000)]
    w = BamWriter(path, refs, make_header_text(refs))
    rng = np.random.default_rng(1)
    # clusters far beyond 2^29 plus low-coordinate reads
    loci = [1_000, 500_000, (1 << 29) - 500, (1 << 29) + 250,
            (1 << 29) + 20_000_000, LONG - 10_000]
    rows = []
    for lo in loci:
        for k in range(40):
            rows.append(("chrL", 0, lo + int(rng.integers(0, 2_000))))
    for k in range(30):
        rows.append(("chrS", 1, 10_000 + 97 * k))
    rows.sort(key=lambda r: (r[1], r[2]))
    for i, (chrom, tid, pos) in enumerate(rows):
        w.write("r%06d" % i, 0, tid, pos, 60, [(0, 150)],
                seq="A" * 150)
    w.close()
    assert os.path.exists(path + ".csi")
    assert not os.path.exists(path + ".bai")
    return path


def test_long_contig_windowed_fetch(long_bam):
    for use_native in (False, True):
        bf = BamFile(long_bam, use_native=use_native)
        full = bf.fetch("chrL", 0, LONG)
        assert full.n == 240
        for lo, hi in [
            (0, 2_000),
            ((1 << 29) - 1_000, (1 << 29) + 3_000),
            ((1 << 29) + 19_999_000, (1 << 29) + 20_003_000),
            (LONG - 12_000, LONG),
            (300_000_000, 310_000_000),  # empty gap
        ]:
            win = bf.fetch("chrL", lo, hi)
            exp = np.flatnonzero((full.pos < hi) & (full.ref_end > lo))
            assert win.n == len(exp), (use_native, lo, hi, win.n, len(exp))
            assert np.array_equal(
                np.sort(win.voffset), np.sort(full.voffset[exp])
            ), (use_native, lo, hi)
        small = bf.fetch("chrS", 9_000, 11_000)
        assert small.n == len(
            [k for k in range(30) if 10_000 + 97 * k < 11_000]
        )


def test_csi_save_load_roundtrip(long_bam, tmp_path):
    idx = CsiIndex.load(long_bam + ".csi")
    p = str(tmp_path / "copy.csi")
    idx.save(p)
    idx2 = CsiIndex.load(p)
    assert idx2.min_shift == idx.min_shift and idx2.depth == idx.depth
    for tid in range(len(idx.refs)):
        assert idx.refs[tid].bins == idx2.refs[tid].bins
        assert idx.refs[tid].loffsets == idx2.refs[tid].loffsets
        assert (idx.refs[tid].mapped, idx.refs[tid].unmapped) == (
            idx2.refs[tid].mapped, idx2.refs[tid].unmapped)
    q1 = idx.query(0, (1 << 29) - 1_000, (1 << 29) + 3_000)
    q2 = idx2.query(0, (1 << 29) - 1_000, (1 << 29) + 3_000)
    assert q1 == q2 and q1


def test_csi_query_matches_bai_on_short_contig(tmp_path):
    """Same records → BAI and depth-5 CSI give identical merged chunks."""
    bai_b = BaiBuilder(1)
    csi_b = CsiBuilder(1)
    rng = np.random.default_rng(7)
    vo = 1 << 20
    pos = np.sort(rng.integers(0, 400_000_000, size=2_000))
    for p in pos.tolist():
        for b in (bai_b, csi_b):
            b.add(0, p, p + 150, vo, vo + 300, True)
        vo += 300
    bai = bai_b.finish()
    csi = csi_b.finish()
    tids = np.zeros(64, dtype=np.int64)
    begs = np.sort(rng.integers(0, 399_000_000, size=64))
    ends = begs + 50_000
    ro1, cb1, ce1 = bai.query_many(tids, begs, ends)
    ro2, cb2, ce2 = csi.query_many(tids, begs, ends)
    # CSI per-bin loffsets are a looser lower bound than BAI's 16 KiB
    # linear index, so CSI may return extra/earlier chunks — but every
    # BAI chunk byte-range (which is sufficient) must stay covered
    for i in range(len(tids)):
        b1 = list(zip(cb1[ro1[i]:ro1[i + 1]].tolist(),
                      ce1[ro1[i]:ro1[i + 1]].tolist()))
        b2 = list(zip(cb2[ro2[i]:ro2[i + 1]].tolist(),
                      ce2[ro2[i]:ro2[i + 1]].tolist()))
        for s, t in b1:
            assert any(s2 <= s and t <= t2 for s2, t2 in b2), (i, s, t, b2)


def test_idxstats_via_csi(long_bam):
    bf = BamFile(long_bam, use_native=False)
    stats = dict(
        (name, (m, u)) for name, _l, m, u in bf.idxstats()
    )
    assert stats["chrL"] == (240, 0)
    assert stats["chrS"] == (30, 0)


def test_cli_genotypes_past_bai_limit(tmp_path):
    """End-to-end: events beyond 2^29 bp genotype correctly through the
    CLI with the writer-emitted CSI index (no .bai exists)."""
    import subprocess
    import sys

    from svtyper_tpu.simulate import (
        Event, SimConfig, events_to_vcf, simulate_events,
    )

    refs = [("chrL", LONG)]
    base = (1 << 29) + 1_000_000
    events = [
        Event("DEL", "chrL", base, base + 1_500, "0/1", var_id="L1"),
        Event("DUP", "chrL", base + 3_000_000, base + 3_004_000, "1/1",
              var_id="L2"),
        Event("INV", "chrL", base + 6_000_000, base + 6_002_000, "0/0",
              var_id="L3"),
    ]
    bam = str(tmp_path / "long.bam")
    simulate_events(bam, refs, events, SimConfig(depth=20), seed=11,
                    extra_background=300)
    assert os.path.exists(bam + ".csi") and not os.path.exists(bam + ".bai")
    vcf = str(tmp_path / "long.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(events, refs))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    outs = {}
    for engine in ("tpu", "oracle"):
        out = str(tmp_path / ("%s.out.vcf" % engine))
        r = subprocess.run(
            [sys.executable, "-m", "svtyper_tpu.cli.classic", "-i", vcf,
             "-B", bam, "-o", out, "-n", "100000", "--engine", engine],
            env=env, capture_output=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        with open(out, "rb") as fh:
            outs[engine] = fh.read()
    assert outs["tpu"] == outs["oracle"]
    gts = [
        l.split(b"\t")[9].split(b":")[0]
        for l in outs["tpu"].splitlines() if not l.startswith(b"#")
    ]
    assert gts == [b"0/1", b"1/1", b"0/0"], gts
