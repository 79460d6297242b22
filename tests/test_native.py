"""C++ decoder vs pure-Python decoder: byte-identical columns."""

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.bamio.columns import FIELD_NAMES
from svtyper_tpu.bamio.native import get_lib
from svtyper_tpu.simulate import Event, SimConfig, simulate_events

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native bamcore not built"
)

REFS = [("chr1", 6_000_000), ("chr2", 2_000_000)]


@pytest.fixture(scope="module")
def bam_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "sim.bam")
    events = [
        Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
        Event("DUP", "chr1", 2_000_000, 2_002_000, "1/1"),
        Event("INV", "chr1", 3_000_000, 3_002_500, "0/1"),
        Event("BND", "chr1", 4_000_000, 500_000, "0/1", chrom2="chr2"),
    ]
    simulate_events(path, REFS, events, SimConfig(depth=30), seed=13,
                    extra_background=2000)
    return path


def _assert_batches_equal(a, b):
    assert a.n == b.n
    for name in FIELD_NAMES:
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    np.testing.assert_array_equal(a.blk_off, b.blk_off)
    np.testing.assert_array_equal(a.blk_start, b.blk_start)
    np.testing.assert_array_equal(a.blk_end, b.blk_end)


def test_fetch_equivalence(bam_path):
    nat = BamFile(bam_path, use_native=True)
    py = BamFile(bam_path, use_native=False)
    assert nat._get_native() is not None
    for chrom, lo, hi in [
        ("chr1", 999_000, 1_001_000),
        ("chr1", 1_002_000, 1_004_000),
        ("chr1", 0, 6_000_000),
        ("chr2", 499_000, 501_000),
        ("chr1", 5_900_000, 6_000_000),
    ]:
        _assert_batches_equal(nat.fetch(chrom, lo, hi), py.fetch(chrom, lo, hi))


def test_head_equivalence(bam_path):
    nat = BamFile(bam_path, use_native=True)
    py = BamFile(bam_path, use_native=False)
    for n in (10, 1000, 10**6):
        _assert_batches_equal(nat.head(n), py.head(n))


def test_scan_resume_equivalence(bam_path):
    nat = BamFile(bam_path, use_native=True)
    py = BamFile(bam_path, use_native=False)
    vo_n = vo_p = None
    while True:
        bn, sn, vo_n = nat.scan(vo_n, max_records=500)
        bp, sp, vo_p = py.scan(vo_p, max_records=500)
        assert sn == sp
        _assert_batches_equal(bn, bp)
        assert (vo_n is None) == (vo_p is None)
        if vo_n is None or sn == 0:
            break
        assert vo_n == vo_p


def test_capacity_growth_path(bam_path):
    """Tiny cap_hint forces the -2 resume path repeatedly."""
    nat = BamFile(bam_path, use_native=True)
    native = nat._get_native()
    big = nat.fetch("chr1", 0, 6_000_000)
    small, _ = native.decode(
        nat.bai.query(0, 0, 6_000_000)[0][0],
        stop_voffset=nat.bai.query(0, 0, 6_000_000)[-1][1],
        region=(0, 0, 6_000_000),
        cap_hint=7,
    )
    _assert_batches_equal(big, small)


def test_sample_bootstrap_matches(bam_path):
    from svtyper_tpu.stats import Sample

    s_nat = Sample.from_bam(BamFile(bam_path, use_native=True), num_samp=50_000)
    s_py = Sample.from_bam(BamFile(bam_path, use_native=False), num_samp=50_000)
    assert s_nat.libraries[0].hist == s_py.libraries[0].hist
    assert s_nat.libraries[0].mean == s_py.libraries[0].mean


def test_threaded_fetch_many_equivalence(bam_path):
    """threads=2 must produce byte-identical batches to threads=1
    (handle shared across decode threads; per-stream inflate scratch)."""
    bam = BamFile(bam_path, use_native=True)
    nat = bam._get_native()
    regions = [("chr1", 995_000 + i * 12_000, 1_001_000 + i * 12_000)
               for i in range(40)]
    prepared = []
    for qi, (c, s, e) in enumerate(regions):
        tid = bam.header.name_to_tid[c]
        rng = bam.bai.query(tid, s, e)
        if rng:
            prepared.append((qi, tid, s, e, rng))
    rt = np.array([p[1] for p in prepared], np.int64)
    rs = np.array([p[2] for p in prepared], np.int64)
    re_ = np.array([p[3] for p in prepared], np.int64)
    cnt = np.array([len(p[4]) for p in prepared], np.int64)
    ro = np.zeros(len(prepared) + 1, np.int64)
    np.cumsum(cnt, out=ro[1:])
    flat = [r for p in prepared for r in p[4]]
    rb = np.array([c[0] for c in flat], np.uint64)
    rn = np.array([c[1] for c in flat], np.uint64)
    b1, q1 = nat.fetch_many(rt, rs, re_, ro, rb, rn, threads=1)
    for _ in range(3):
        b2, q2 = nat.fetch_many(rt, rs, re_, ro, rb, rn, threads=2)
        _assert_batches_equal(b1, b2)
        np.testing.assert_array_equal(q1, q2)


def test_abi_version_matches():
    """The loaded .so must carry the ABI version native.py expects
    (the load path refuses mismatches; this guards lockstep bumps)."""
    from svtyper_tpu.bamio.native import _ABI_EXPECTED

    lib = get_lib()
    assert int(lib.svt_abi_version()) == _ABI_EXPECTED


def test_inflate_roofline(bam_path):
    """svt_inflate_roofline re-inflates the whole file single-threaded:
    inflated bytes must match the decompressed stream the normal path
    sees, and the bandwidth must be finite and positive."""
    import os

    nat = BamFile(bam_path, use_native=True)._get_native()
    r = nat.inflate_roofline()
    assert r is not None
    assert r["inflated_bytes"] > 0
    assert 0 < r["compressed_bytes"] <= os.path.getsize(bam_path)
    assert r["bytes_per_s"] > 0
    # bounded re-run: max_blocks caps the scan
    r2 = nat.inflate_roofline(max_blocks=2)
    assert 0 < r2["inflated_bytes"] <= r["inflated_bytes"]


def test_scan_missing_nul_graceful():
    """Z/H aux tags missing their NUL terminator must not raise in the
    pure-Python tag scanners (advisor finding, r4: buf.index raised
    ValueError while the C++ twin tolerated it)."""
    from svtyper_tpu.bamio.records import _scan_cg, _scan_tags

    buf = b"RGZ" + b"lib1"  # Z tag, no NUL, runs to end of buffer
    assert _scan_cg(buf, 0, len(buf)) is None
    assert _scan_tags(buf, 0, len(buf)) == (None, None)
