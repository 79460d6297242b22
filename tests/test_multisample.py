"""Multi-sample genotyping (classic svtyper's comma-separated -B) and
the sum_quals / weight flags."""

import pytest

from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 6_000_000)]
POS = [(1_000_000, 1_003_000), (2_000_000, 2_002_000), (3_000_000, 3_002_500)]
GTS_A = ["0/1", "1/1", "0/0"]
GTS_B = ["0/0", "0/1", "1/1"]


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("multi")
    bam_a = str(d / "a.bam")
    bam_b = str(d / "b.bam")
    vcf = str(d / "in.vcf")
    ev_a = [Event("DEL", "chr1", p, e, g, var_id="v%d" % i)
            for i, ((p, e), g) in enumerate(zip(POS, GTS_A))]
    ev_b = [Event("DEL", "chr1", p, e, g, var_id="v%d" % i)
            for i, ((p, e), g) in enumerate(zip(POS, GTS_B))]
    simulate_events(bam_a, REFS, ev_a, SimConfig(depth=34, sample_name="SAMPLE_A"),
                    seed=21, extra_background=1500)
    simulate_events(bam_b, REFS, ev_b, SimConfig(depth=34, sample_name="SAMPLE_B"),
                    seed=22, extra_background=1500)
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(ev_a, REFS, sample="SAMPLE_A"))
    return d, bam_a, bam_b, vcf


def _body(path):
    return [l.rstrip("\n").split("\t") for l in open(path)
            if not l.startswith("#")]


def test_two_samples_genotyped_independently(paths):
    d, bam_a, bam_b, vcf = paths
    out = str(d / "multi.vcf")
    assert classic_main(["-i", vcf, "-B", bam_a + "," + bam_b, "-o", out,
                         "-n", "40000"]) == 0
    header = [l for l in open(out) if l.startswith("#CHROM")][0]
    cols = header.rstrip("\n").split("\t")
    assert cols[9:] == ["SAMPLE_A", "SAMPLE_B"]
    for i, row in enumerate(_body(out)):
        gt_a = row[9].split(":")[0]
        gt_b = row[10].split(":")[0]
        assert gt_a == GTS_A[i], "sample A variant %d" % i
        assert gt_b == GTS_B[i], "sample B variant %d" % i


def test_qual_sums_over_nonref_samples(paths):
    d, bam_a, bam_b, vcf = paths
    out = str(d / "multi2.vcf")
    classic_main(["-i", vcf, "-B", bam_a + "," + bam_b, "-o", out, "-n", "40000"])
    for row in _body(out):
        qual = float(row[5])
        total_sq = 0.0
        for col in (9, 10):
            f = dict(zip(row[8].split(":"), row[col].split(":")))
            if f["GT"] in ("0/1", "1/1"):
                total_sq += float(f["SQ"])
        assert qual == pytest.approx(total_sq, abs=0.011)


def test_sum_quals_adds_to_input(paths):
    d, bam_a, bam_b, vcf = paths
    # give the input records a numeric QUAL
    vcf_q = str(d / "inq.vcf")
    with open(vcf_q, "w") as out_fh:
        for line in open(vcf):
            if line.startswith("#"):
                out_fh.write(line)
            else:
                c = line.split("\t")
                c[5] = "100"
                out_fh.write("\t".join(c))
    out0 = str(d / "q0.vcf")
    out1 = str(d / "q1.vcf")
    classic_main(["-i", vcf_q, "-B", bam_a, "-o", out0, "-n", "40000"])
    classic_main(["-i", vcf_q, "-B", bam_a, "-o", out1, "-n", "40000", "-q"])
    for r0, r1 in zip(_body(out0), _body(out1)):
        assert float(r1[5]) == pytest.approx(float(r0[5]) + 100.0, abs=0.011)


def test_weights_change_qr_qa(paths):
    d, bam_a, bam_b, vcf = paths
    out1 = str(d / "w1.vcf")
    out2 = str(d / "w2.vcf")
    classic_main(["-i", vcf, "-B", bam_a, "-o", out1, "-n", "40000"])
    classic_main(["-i", vcf, "-B", bam_a, "-o", out2, "-n", "40000",
                  "--split_weight", "2", "--disc_weight", "2"])
    r1 = _body(out1)[0]
    r2 = _body(out2)[0]
    f1 = dict(zip(r1[8].split(":"), r1[9].split(":")))
    f2 = dict(zip(r2[8].split(":"), r2[9].split(":")))
    assert int(f2["QR"]) >= 2 * int(f1["QR"]) - 2
    assert int(f2["QA"]) >= 2 * int(f1["QA"]) - 2
    assert (f1["RS"], f1["RP"]) == (f2["RS"], f2["RP"])  # raw counts unweighted


def test_parallel_sample_prep_byte_identical(paths, tmp_path):
    """Multi-sample prep fans out one task per sample
    (gt/engine.py::_prepare_multisample); output must be byte-identical
    to the serialized path regardless of worker count."""
    import os
    import subprocess
    import sys

    d, bam_a, bam_b, vcf = paths
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    outs = {}
    for workers in ("1", "2"):
        out = str(tmp_path / ("w%s.vcf" % workers))
        env = dict(env_base, SVT_PREP_WORKERS=workers)
        r = subprocess.run(
            [sys.executable, "-m", "svtyper_tpu.cli.classic", "-i", vcf,
             "-B", "%s,%s" % (bam_a, bam_b), "-o", out, "-n", "100000"],
            env=env, capture_output=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        with open(out, "rb") as fh:
            outs[workers] = fh.read()
    assert outs["1"] == outs["2"]
    assert b"SAMPLE_A" in outs["1"] and b"SAMPLE_B" in outs["1"]


def test_multisample_sharded_prep_overlaps_and_matches(paths):
    """2-sample × 8-virtual-device engine (VERDICT r3 item 7): the
    sharded prep must fan out across samples on the prep pool and the
    formatted results must be identical to the single-device engine."""
    import jax

    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.gt import TpuEngine
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.utils.formatting import fmt_f2, fmt_g2, fmt_gl
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    d, bam_a, bam_b, vcf_path = paths
    samples = [Sample.from_bam(BamFile(b), num_samp=40_000)
               for b in (bam_a, bam_b)]
    vcf = Vcf()
    with open(vcf_path) as fh:
        header, body = read_vcf_lines(fh)
        body = list(body)
    vcf.add_header(header)
    bps = [resolve_breakpoint(Variant(l, vcf)) for l in body]

    assert len(jax.devices()) == 8  # conftest's virtual CPU mesh
    multi = TpuEngine(samples, chunk_size=8)
    single = TpuEngine(samples, chunk_size=8, devices=jax.devices()[:1])
    assert multi.sharded and not single.sharded
    res_m = multi.genotype_all(bps)
    res_s = single.genotype_all(bps)
    # the sharded multi-sample prep must have used the pool
    assert multi._sample_pool is not None

    def fmt(r):
        if r.null:
            return ("./.", str(r.qr), str(r.qa))
        return (r.gt_string, str(r.gq), fmt_f2(r.sq), fmt_gl(r.gl),
                str(r.qr), str(r.qa),
                fmt_g2(r.ab) if r.ab is not None else ".")

    assert len(res_m) == len(res_s) == len(bps)
    for rm, rs in zip(res_m, res_s):
        assert [fmt(x) for x in rm] == [fmt(x) for x in rs]


def test_multisample_write_alignment_matches_gather(paths, tmp_path):
    """-w with two samples (engine-export path, per-sample sink calls):
    the evidence BAM must hold exactly the union of both samples'
    per-variant oracle gathers."""
    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.oracle.engine import gather_reads
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    d, bam_a, bam_b, vcf_path = paths
    out = str(tmp_path / "mw.vcf")
    wbam = str(tmp_path / "mw_ev.bam")
    assert classic_main(["-i", vcf_path, "-B", bam_a + "," + bam_b,
                         "-o", out, "-n", "40000", "-w", wbam]) == 0

    want = 0
    for b in (bam_a, bam_b):
        sample = Sample.from_bam(BamFile(b), num_samp=40_000)
        vcf = Vcf()
        with open(vcf_path) as fh:
            header, body = read_vcf_lines(fh)
            body = list(body)
        vcf.add_header(header)
        seen = set()
        for line in body:
            bp = resolve_breakpoint(Variant(line, vcf))
            if bp is None:
                continue
            batch, _ = gather_reads(sample, bp)
            seen.update(int(v) for v in batch.voffset)
        want += len(seen)
    got = BamFile(wbam).fetch("chr1", 0, REFS[0][1]).n
    assert got == want, (got, want)
