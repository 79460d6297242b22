"""Vectorized CLI emission (cli/fast_emit) vs the per-variant object
path: byte-identical output on every branch — multi-sample with mixed
nulls, BND mate sharing, all-null variants, sum_quals, pre-existing
sample values (object fallback), and non-default FORMAT declaration
order (wholesale fallback).

``--debug`` forces the object path end to end, so (default run) ==
(--debug run) is a direct fast-vs-slow equivalence on the same input.
"""

import pytest

from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 8_000_000), ("chr2", 2_000_000)]
EVENTS = [
    Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
    Event("DUP", "chr1", 2_000_000, 2_003_000, "1/1"),
    Event("INV", "chr1", 3_000_000, 3_002_000, "0/1"),
    Event("BND", "chr1", 4_000_000, 500_000, "0/1", chrom2="chr2"),
    Event("DEL", "chr1", 5_000_000, 5_002_000, "0/0"),
]


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("fast_emit")
    bam_a = str(d / "a.bam")
    bam_b = str(d / "b.bam")
    vcf = str(d / "in.vcf")
    simulate_events(bam_a, REFS, EVENTS,
                    SimConfig(depth=34, sample_name="SAMPLE_A"),
                    seed=5, extra_background=1500)
    # SAMPLE_B lacks the BND entirely (different event set) so chunks
    # carry mixed null/non-null rows across samples
    simulate_events(bam_b, REFS, EVENTS[:3],
                    SimConfig(depth=34, sample_name="SAMPLE_B"),
                    seed=6, extra_background=1500)
    # the header's sample column must match the first engine sample or
    # eligible() refuses the fast path (sample_list != engine order)
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(EVENTS, REFS, sample="SAMPLE_A"))
    return d, bam_a, bam_b, vcf


def _run(argv):
    assert classic_main(argv) == 0


def _read(p):
    with open(p) as fh:
        return fh.read()


def test_fast_vs_object_path_byte_identical(paths, monkeypatch):
    d, bam_a, bam_b, vcf = paths
    fast = str(d / "fast.vcf")
    slow = str(d / "slow.vcf")
    # prove the fast formatter actually ran (a silent eligibility
    # failure would make this test vacuous)
    import svtyper_tpu.cli.fast_emit as fe

    calls = []
    orig = fe.format_chunk_lines
    monkeypatch.setattr(
        fe, "format_chunk_lines",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    args = ["-i", vcf, "-B", "%s,%s" % (bam_a, bam_b), "-n", "50000"]
    _run(args + ["-o", fast])
    assert calls, "fast path did not engage"
    _run(args + ["-o", slow, "--debug"])  # --debug forces object path
    assert _read(fast) == _read(slow)


def test_fast_bnd_mate_pair_shares_genotype(paths):
    """Mate-paired breakends route through the object branch inside the
    fast drive; both records must carry the shared genotype row and
    match the --debug (pure object) output byte for byte."""
    d, bam_a, _bam_b, vcf = paths
    vcf_b = str(d / "bnd_pair.vcf")
    header = "".join(l for l in _read(vcf).splitlines(keepends=True)
                     if l.startswith("#"))
    a = ("chr1\t1000000\tbnd_a\tN\tN[chr1:1003001[\t.\t.\t"
         "SVTYPE=BND;MATEID=bnd_b;EVENT=ev1;CIPOS=0,0;CIEND=0,0\tGT\t./.")
    b = ("chr1\t1003001\tbnd_b\tN\t]chr1:1000000]N\t.\t.\t"
         "SVTYPE=BND;MATEID=bnd_a;EVENT=ev1;CIPOS=0,0;CIEND=0,0\tGT\t./.")
    with open(vcf_b, "w") as fh:
        fh.write(header + a + "\n" + b + "\n")
    fast = str(d / "fast_bnd.vcf")
    slow = str(d / "slow_bnd.vcf")
    args = ["-i", vcf_b, "-B", bam_a, "-n", "50000"]
    _run(args + ["-o", fast])
    _run(args + ["-o", slow, "--debug"])
    assert _read(fast) == _read(slow)
    body = [l.split("\t") for l in _read(fast).splitlines()
            if not l.startswith("#")]
    assert len(body) == 2
    assert body[0][9] == body[1][9]
    assert body[0][9].split(":")[0] == "0/1"  # the DEL event at 1M is het


def test_fast_vs_object_sum_quals(paths):
    """-q with NUMERIC input QUALs and two samples: apply_variant adds
    sample SQs onto the input QUAL left to right; float addition is
    non-associative, so the fast path must use the identical order
    (review finding, r5 — pre-summing samples then adding the base
    can differ by an ulp at the '%.2f' boundary)."""
    d, bam_a, bam_b, vcf = paths
    vcf_q = str(d / "in_q.vcf")
    with open(vcf_q, "w") as fh:
        for i, ln in enumerate(_read(vcf).splitlines(keepends=True)):
            if not ln.startswith("#"):
                cols = ln.split("\t")
                cols[5] = "%.2f" % (123.4567 + 77.77 * i)
                ln = "\t".join(cols)
            fh.write(ln)
    fast = str(d / "fast_q.vcf")
    slow = str(d / "slow_q.vcf")
    args = ["-i", vcf_q, "-B", "%s,%s" % (bam_a, bam_b), "-n", "50000",
            "-q"]
    _run(args + ["-o", fast])
    _run(args + ["-o", slow, "--debug"])
    assert _read(fast) == _read(slow)
    # the QUALs really did aggregate on top of the input values
    body = [l for l in _read(fast).splitlines() if not l.startswith("#")]
    assert any(float(l.split("\t")[5]) > 200 for l in body)


def test_preexisting_sample_values_merge(paths):
    """A record carrying a real pre-existing value (LUMPY SU) must take
    the object path inside the fast drive and merge identically."""
    d, bam_a, _bam_b, vcf = paths
    vcf2 = str(d / "su.vcf")
    lines = _read(vcf).splitlines(keepends=True)
    out = []
    for ln in lines:
        if ln.startswith("#CHROM"):
            out.append('##FORMAT=<ID=SU,Number=1,Type=Integer,'
                       'Description="SU">\n')
        if not ln.startswith("#") and "\tGT\t" in ln:
            ln = ln.replace("\tGT\t./.", "\tGT:SU\t./.:7")
        out.append(ln)
    with open(vcf2, "w") as fh:
        fh.writelines(out)
    fast = str(d / "fast_su.vcf")
    slow = str(d / "slow_su.vcf")
    args = ["-i", vcf2, "-B", bam_a, "-n", "50000"]
    _run(args + ["-o", fast])
    _run(args + ["-o", slow, "--debug"])
    assert _read(fast) == _read(slow)
    body = [l for l in _read(fast).splitlines() if not l.startswith("#")]
    # SU survives the rewrite on genotyped records, at its ranked slot
    found = False
    for l in body:
        cols = l.split("\t")
        fields = cols[8].split(":")
        if "SU" in fields:
            assert cols[9].split(":")[fields.index("SU")] == "7"
            found = True
    assert found


def test_all_null_emits_gt_only(paths):
    """Variants wider than max_ci_dist force null in every sample: the
    record must emit FORMAT=GT with ./. — in both paths."""
    d, bam_a, _bam_b, vcf = paths
    vcf3 = str(d / "wide.vcf")
    lines = _read(vcf).splitlines(keepends=True)
    with open(vcf3, "w") as fh:
        for ln in lines:
            if not ln.startswith("#"):
                ln = ln.replace("CIPOS=0,0", "CIPOS=-9000,9000")
            fh.write(ln)
    fast = str(d / "fast_w.vcf")
    slow = str(d / "slow_w.vcf")
    args = ["-i", vcf3, "-B", bam_a, "-n", "50000", "--max_ci_dist", "10"]
    _run(args + ["-o", fast])
    _run(args + ["-o", slow, "--debug"])
    assert _read(fast) == _read(slow)
    body = [l for l in _read(fast).splitlines() if not l.startswith("#")]
    wide = [l for l in body if "CIPOS=-9000,9000" in l]
    assert wide
    for l in wide:
        cols = l.split("\t")
        assert cols[8] == "GT" and cols[9] == "./."


def test_nondefault_format_order_falls_back(paths):
    """An input header that pre-declares our FORMAT ids in a different
    order defeats the hardcoded fast FORMAT column — eligible() must
    route the whole run to the object path, keeping output identical
    to --debug (which is object-path by construction)."""
    d, bam_a, _bam_b, vcf = paths
    vcf4 = str(d / "reorder.vcf")
    lines = _read(vcf).splitlines(keepends=True)
    with open(vcf4, "w") as fh:
        for ln in lines:
            if ln.startswith("#CHROM"):
                # declare AB then GQ before ours: format_rank now
                # interleaves differently than FORMAT_DEFS order
                fh.write('##FORMAT=<ID=AB,Number=A,Type=Float,'
                         'Description="x">\n')
                fh.write('##FORMAT=<ID=GQ,Number=1,Type=Integer,'
                         'Description="x">\n')
            fh.write(ln)
    fast = str(d / "fast_r.vcf")
    slow = str(d / "slow_r.vcf")
    args = ["-i", vcf4, "-B", bam_a, "-n", "50000"]
    _run(args + ["-o", fast])
    _run(args + ["-o", slow, "--debug"])
    assert _read(fast) == _read(slow)
    body = [l for l in _read(fast).splitlines() if not l.startswith("#")]
    genotyped = [l for l in body if l.split("\t")[8] != "GT"]
    assert genotyped
    # AB and GQ really do rank earlier now
    assert genotyped[0].split("\t")[8].startswith("GT:AB:GQ")


def test_multisample_write_alignment(paths):
    """-w with two samples: the engine-export arena path must engage
    (both handles native), stream both samples' evidence rows, and the
    output BAM must contain reads from both (sample columns untouched
    — byte-identical VCF vs --debug)."""
    from svtyper_tpu.bamio.bam import BamFile

    d, bam_a, bam_b, vcf = paths
    out = str(d / "out_msw.vcf")
    slow = str(d / "slow_msw.vcf")
    wbam = str(d / "evidence_ms.bam")
    args = ["-i", vcf, "-B", "%s,%s" % (bam_a, bam_b), "-n", "50000"]
    _run(args + ["-o", out, "-w", wbam])
    _run(args + ["-o", slow, "--debug", "-w", str(d / "ev2.bam")])
    assert _read(out) == _read(slow)
    eb = BamFile(wbam)
    got = eb.fetch("chr1", 990_000, 1_010_000)
    assert got.n > 0


def test_odd_batch_size_rounds_to_device_multiple(paths, capsys):
    """A batch size that is not a device multiple gets rounded to the
    sharded engine's chunk size (announced), keeping plan chunks 1:1
    with engine chunks — the fast emission and -w arena paths stay
    engaged on multi-device runs, and output stays byte-identical."""
    d, bam_a, _bam_b, vcf = paths
    fast = str(d / "fast_odd.vcf")
    slow = str(d / "slow_odd.vcf")
    args = ["-i", vcf, "-B", bam_a, "-n", "50000", "--batch_size", "1001"]
    _run(args + ["-o", fast])
    err = capsys.readouterr().err
    _run(args + ["-o", slow, "--debug"])
    assert _read(fast) == _read(slow)
    import jax

    if len(jax.local_devices()) > 1:
        assert "rounded to" in err


def test_format_sample_fuzz_vs_object_path():
    """Property fuzz: random packed result matrices (nulls, extreme
    counts, negative ref_span, tiny/huge GL/SQ/AB values) must format
    identically through _format_sample and through the GenotypeResult →
    apply_result object path — the printf-parity surface hammered at
    the function level, beyond what fixtures produce."""
    import numpy as np

    from svtyper_tpu.cli.fast_emit import FIELD_ORDER, _format_sample
    from svtyper_tpu.gt.engine import _I, _NI, _to_result
    from svtyper_tpu.output import add_format_headers, apply_result
    from svtyper_tpu.vcfio.model import Variant, Vcf

    rng = np.random.default_rng(99)
    n = 512
    a = np.zeros((n, 24), dtype=np.float32)
    a[:, _I["null"]] = rng.integers(0, 2, n)
    a[:, _I["gt_idx"]] = rng.integers(0, 3, n)
    a[:, _I["gq"]] = rng.integers(0, 201, n)
    a[:, _I["qr"]] = rng.integers(0, 5000, n)
    a[:, _I["qa"]] = rng.integers(0, 5000, n)
    a[:, _I["ab_valid"]] = rng.integers(0, 2, n)
    # floats: gl0..2, sq, ab, c0..c4
    a[:, _NI + 0 : _NI + 3] = -rng.exponential(50, (n, 3))
    a[:, _NI + 3] = rng.exponential(100, n)
    a[:, _NI + 4] = rng.random(n)
    a[:, _NI + 5 : _NI + 10] = rng.exponential(40, (n, 5))
    # DEL re-partition can push ref_span negative (SPEC §4.3)
    a[:, _NI + 8] -= 5
    # extreme rows
    a[0, _NI:] = 0.0
    a[1, _NI + 3] = 1e-7
    a[2, _NI + 4] = 0.9999999
    a[3, _NI + 5 : _NI + 10] = 16_000_000.0  # near f32 int-exact limit

    vcf = Vcf()
    vcf.add_header(["##fileformat=VCFv4.2",
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"])
    add_format_headers(vcf)
    vcf.add_sample("S")
    nulls, strs, _q = _format_sample(a, n)
    for i in range(n):
        res = _to_result(a, i)
        v = Variant("chr1\t100\tx\tN\t<DEL>\t.\t.\tSVTYPE=DEL", vcf)
        apply_result(v, "S", res)
        want = v.genotype("S").get_gt_string(list(FIELD_ORDER))
        if nulls[i]:
            # the fast path substitutes the null placeholder at emit;
            # the object path leaves non-GT fields missing -> '.'
            assert want.startswith("./.")
        else:
            assert strs[i] == want, (i, strs[i], want)
