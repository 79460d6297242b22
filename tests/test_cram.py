"""CRAM compatibility surface (SURVEY.md §2.1: the reference gets CRAM
via pysam→htslib; bamio/cram.py is the from-scratch equivalent).

No external CRAM exists in this offline environment, so correctness is
established the same way as for the BAM stack: round-trip through this
package's own writer plus read-level parity against the (golden-tested)
BAM decoder on identical records.
"""

import io
import os

import numpy as np
import numpy.testing as npt
import pytest

from svtyper_tpu.bamio import rans
from svtyper_tpu.bamio.bam import BamFile, open_bam
from svtyper_tpu.bamio.columns import FIELD_NAMES
from svtyper_tpu.bamio.cram import (
    CramFile,
    read_itf8,
    read_ltf8,
    write_itf8,
    write_ltf8,
)
from svtyper_tpu.bamio.cram_writer import bam_to_cram
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 3_000_000), ("chr2", 1_000_000)]
EVENTS = [
    Event("DEL", "chr1", 500_000, 502_000, "0/1"),
    Event("DUP", "chr1", 1_000_000, 1_003_000, "1/1"),
    Event("INV", "chr1", 1_500_000, 1_502_000, "0/1"),
    Event("BND", "chr1", 2_000_000, 400_000, "0/1", chrom2="chr2"),
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("cram")
    bam = str(d / "t.bam")
    simulate_events(bam, REFS, EVENTS, SimConfig(depth=20), seed=4,
                    extra_background=400)
    cram = str(d / "t.cram")
    bam_to_cram(bam, cram)
    return bam, cram, str(d)


# ------------------------------------------------------------ primitives

def test_itf8_ltf8_roundtrip():
    vals = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21,
            2**28 - 1, 2**28, 2**31 - 1, -1, -2, -(2**31)]
    for v in vals:
        b = bytearray()
        write_itf8(b, v)
        got, off = read_itf8(bytes(b), 0)
        assert got == v and off == len(b), v
    for v in [0, 127, 128, 2**14, 2**31, 2**40, 2**56 - 1, 2**60]:
        b = bytearray()
        write_ltf8(b, v)
        got, off = read_ltf8(bytes(b), 0)
        assert got == v and off == len(b), v


def test_rans_roundtrip():
    rng = np.random.default_rng(0)
    cases = [
        b"", b"A", b"AAAA", b"ABAB" * 100,
        bytes(rng.integers(0, 256, 10000, dtype=np.uint8)),
        bytes(rng.integers(65, 70, 5003, dtype=np.uint8)),
        bytes(np.repeat(np.arange(256, dtype=np.uint8), 17)),
        b"\x00" * 1000,
    ]
    for order in (0, 1):
        for d in cases:
            assert rans.uncompress(rans.compress(d, order=order)) == d


# ------------------------------------------------------------ reader

def test_open_bam_dispatches_by_magic(pair):
    bam, cram, _ = pair
    assert isinstance(open_bam(cram), CramFile)
    assert isinstance(open_bam(bam), BamFile)


def test_header_parity(pair):
    bam, cram, _ = pair
    bf, cf = BamFile(bam), CramFile(cram)
    assert cf.header.refs == bf.header.refs
    assert cf.header.read_groups == bf.header.read_groups
    assert cf.rg_index == bf.rg_index


def test_fetch_column_parity(pair):
    bam, cram, _ = pair
    bf = BamFile(bam, use_native=False)
    cf = CramFile(cram)
    windows = [("chr1", 499_000, 503_000), ("chr1", 0, 3_000_000),
               ("chr2", 399_000, 401_000), ("chr1", 1_499_000, 1_502_500),
               ("chr1", 2_999_000, 3_000_000), ("chrX", 0, 100)]
    for chrom, lo, hi in windows:
        a, b = bf.fetch(chrom, lo, hi), cf.fetch(chrom, lo, hi)
        assert a.n == b.n, (chrom, lo, hi)
        oa = np.lexsort((a.qname_hash, a.pos))
        ob = np.lexsort((b.qname_hash, b.pos))
        a, b = a.take(oa), b.take(ob)
        for f in FIELD_NAMES:
            if f in ("voffset", "cov_a", "cov_b"):
                continue
            npt.assert_array_equal(
                getattr(a, f), getattr(b, f), err_msg="%s %s" % (chrom, f)
            )
        npt.assert_array_equal(a.blk_off, b.blk_off)
        npt.assert_array_equal(a.blk_start, b.blk_start)
        npt.assert_array_equal(a.blk_end, b.blk_end)


def test_fetch_without_crai_falls_back(pair, tmp_path, capfd):
    """No .crai: fetch still works via the header-scan fallback index
    (with a warning), matching the indexed fetch row-for-row."""
    import shutil

    bam, cram, _ = pair
    noidx = str(tmp_path / "noidx.cram")
    shutil.copy(cram, noidx)  # deliberately without the .crai
    cf_idx, cf_no = CramFile(cram), CramFile(noidx)
    for chrom, lo, hi in [("chr1", 499_000, 503_000),
                          ("chr2", 399_000, 401_000)]:
        a, b = cf_idx.fetch(chrom, lo, hi), cf_no.fetch(chrom, lo, hi)
        assert a.n == b.n
        npt.assert_array_equal(np.sort(a.pos), np.sort(b.pos))
    assert "building an in-memory index" in capfd.readouterr().err


def test_scan_and_counts(pair):
    bam, cram, _ = pair
    bf, cf = BamFile(bam, use_native=False), CramFile(cram)
    assert cf.mapped_unmapped() == bf.mapped_unmapped()
    batch, seen, cur = cf.scan(None, max_records=100)
    assert seen == batch.n >= 100
    rest, seen2, _ = cf.scan(cur, max_records=None)
    assert seen + seen2 == sum(cf.mapped_unmapped())


def test_sample_stats_parity(pair):
    from svtyper_tpu.stats import Sample

    bam, cram, _ = pair
    sb = Sample.from_bam(BamFile(bam, use_native=False), num_samp=100_000)
    sc = Sample.from_bam(CramFile(cram), num_samp=100_000)
    assert sb.name == sc.name
    assert set(sb.lib_dict) == set(sc.lib_dict)
    for name, lb in sb.lib_dict.items():
        lc = sc.lib_dict[name]
        assert lb.mean == lc.mean and lb.sd == lc.sd
        assert lb.read_length == lc.read_length
        npt.assert_array_equal(lb.dens, lc.dens)


# ------------------------------------------------------------ end to end

def test_cli_cram_output_matches_bam(pair, tmp_path):
    import subprocess
    import sys

    bam, cram, d = pair
    vcf = os.path.join(d, "ev.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(EVENTS, REFS))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    outs = {}
    for label, path in (("bam", bam), ("cram", cram)):
        out = str(tmp_path / ("%s.vcf" % label))
        r = subprocess.run(
            [sys.executable, "-m", "svtyper_tpu.cli.classic",
             "-i", vcf, "-B", path, "-o", out, "-n", "100000"],
            env=env, capture_output=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        with open(out, "rb") as fh:
            outs[label] = fh.read()
    assert outs["bam"] == outs["cram"]


def test_cli_cram_write_alignment(pair, tmp_path):
    """-w with CRAM input: evidence reads come back as a valid indexed
    BAM whose alignment geometry matches the BAM-input -w output
    (CRAM raw_records emits seq-less records — cram.py docstring)."""
    import subprocess
    import sys

    bam, cram, d = pair
    vcf = os.path.join(d, "ev.vcf")
    if not os.path.exists(vcf):
        with open(vcf, "w") as fh:
            fh.write(events_to_vcf(EVENTS, REFS))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    evid = {}
    for label, path in (("bam", bam), ("cram", cram)):
        out = str(tmp_path / ("%s.vcf" % label))
        w = str(tmp_path / ("%s.evidence.bam" % label))
        r = subprocess.run(
            [sys.executable, "-m", "svtyper_tpu.cli.classic",
             "-i", vcf, "-B", path, "-o", out, "-n", "100000", "-w", w],
            env=env, capture_output=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        eb = BamFile(w, use_native=False)
        batch = eb.head(10**9)
        assert batch.n > 0
        evid[label] = set(
            zip(batch.tid.tolist(), batch.pos.tolist(),
                batch.flag.tolist(), batch.ref_end.tolist(),
                batch.qname_hash.tolist())
        )
    assert evid["bam"] == evid["cram"]
