"""CLI end-to-end: tpu-engine output must be byte-identical to the
oracle-engine output, and the output contract (SPEC.md §6) must hold."""

import io
import json
import os

import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.cli.sso import main as sso_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 8_000_000)]
EVENTS = [
    Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1"),
    Event("DEL", "chr1", 1_500_000, 1_502_000, "1/1"),
    Event("DUP", "chr1", 2_000_000, 2_003_000, "0/1"),
    Event("INV", "chr1", 3_000_000, 3_002_000, "0/1"),
    Event("DEL", "chr1", 4_000_000, 4_002_000, "0/0"),
]


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    bam = str(d / "sim.bam")
    vcf = str(d / "in.vcf")
    simulate_events(bam, REFS, EVENTS, SimConfig(depth=36), seed=3,
                    extra_background=2000)
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(EVENTS, REFS))
    return d, bam, vcf


def _run(argv, entry=classic_main):
    rc = entry(argv)
    assert rc == 0


def test_tpu_vs_oracle_byte_identical(paths):
    d, bam, vcf = paths
    out_t = str(d / "out_tpu.vcf")
    out_o = str(d / "out_oracle.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out_t, "-n", "50000", "--engine", "tpu"])
    _run(["-i", vcf, "-B", bam, "-o", out_o, "-n", "50000", "--engine", "oracle"])
    with open(out_t) as f1, open(out_o) as f2:
        t, o = f1.read(), f2.read()
    assert t == o
    assert t.count("\n") > len(EVENTS)  # header + records


def test_output_contract(paths):
    d, bam, vcf = paths
    out = str(d / "out.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out, "-n", "50000"])
    body = [l for l in open(out) if not l.startswith("#")]
    header = [l for l in open(out) if l.startswith("#")]
    fmt_ids = [l.split("ID=")[1].split(",")[0] for l in header
               if l.startswith("##FORMAT")]
    assert fmt_ids == ["GT", "GQ", "SQ", "GL", "DP", "RO", "AO", "QR", "QA",
                       "RS", "AS", "ASC", "RP", "AP", "AB"]
    assert len(body) == len(EVENTS)
    gts = {}
    for line in body:
        cols = line.rstrip("\n").split("\t")
        assert cols[8].split(":")[0] == "GT"
        fields = dict(zip(cols[8].split(":"), cols[9].split(":")))
        gts[cols[2]] = fields["GT"]
        # genotyped records get %.2f QUAL
        assert "." not in cols[5] or "." == cols[5] or float(cols[5]) >= 0
        assert len(fields["GL"].split(",")) == 3
    truth = {ev.var_id: ev.gt for ev in EVENTS}
    for var_id, gt in gts.items():
        assert gt == truth[var_id], var_id


def test_lib_info_cache_roundtrip(paths):
    d, bam, vcf = paths
    lib = str(d / "lib.json")
    out1 = str(d / "c1.vcf")
    out2 = str(d / "c2.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out1, "-n", "50000", "-l", lib])
    assert os.path.exists(lib)
    with open(lib) as fh:
        obj = json.load(fh)
    assert "NA12878" in obj
    # second run loads the cache and must produce identical output
    _run(["-i", vcf, "-B", bam, "-o", out2, "-l", lib])
    assert open(out1).read() == open(out2).read()


def test_unsupported_svtype_passthrough(paths, capsys):
    d, bam, vcf = paths
    vcf2 = str(d / "with_ins.vcf")
    text = open(vcf).read()
    ins_line = "chr1\t500000\tins1\tN\t<INS>\t5\tPASS\tSVTYPE=INS;END=500000\tGT\t./."
    with open(vcf2, "w") as fh:
        fh.write(text + ins_line + "\n")
    out = str(d / "out_ins.vcf")
    _run(["-i", vcf2, "-B", bam, "-o", out, "-n", "50000"])
    body = [l.rstrip("\n") for l in open(out) if not l.startswith("#")]
    assert ins_line in body  # byte-exact passthrough


def test_write_alignment(paths):
    d, bam, vcf = paths
    out = str(d / "out_w.vcf")
    wbam = str(d / "evidence.bam")
    _run(["-i", vcf, "-B", bam, "-o", out, "-n", "50000", "-w", wbam])
    eb = BamFile(wbam)
    got = eb.fetch("chr1", 990_000, 1_010_000)
    assert got.n > 0
    assert eb.header.sample_name == "NA12878"


def test_write_alignment_matches_per_variant_gather(paths):
    """The chunk-batched -w collection (r4 fast path) must write
    EXACTLY the read set the per-variant oracle gather defines
    (SPEC.md §3): same windows, same flag/library filter, deduplicated.
    """
    import numpy as np

    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.oracle.engine import gather_reads
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    d, bam, vcf_path = paths
    wbam = str(d / "evidence_parity.bam")
    _run(["-i", vcf_path, "-B", bam, "-o", str(d / "out_wp.vcf"),
          "-n", "50000", "-w", wbam])

    sample = Sample.from_bam(BamFile(bam), num_samp=50_000)
    vcf = Vcf()
    with open(vcf_path) as fh:
        header, body = read_vcf_lines(fh)
        body = list(body)
    vcf.add_header(header)
    want_vo = set()
    for line in body:
        bp = resolve_breakpoint(Variant(line, vcf))
        if bp is None:
            continue
        batch, _ = gather_reads(sample, bp)
        want_vo.update(int(v) for v in batch.voffset)
    src = sample.bam.fetch("chr1", 0, REFS[0][1])
    sel = np.flatnonzero(np.isin(src.voffset.astype(np.int64),
                                 np.asarray(sorted(want_vo))))
    want = sorted(
        (int(src.tid[i]), int(src.pos[i]), int(src.ref_end[i]),
         int(src.flag[i]), int(src.qname_hash[i]))
        for i in sel
    )
    got_b = BamFile(wbam).fetch("chr1", 0, REFS[0][1])
    got = sorted(
        (int(got_b.tid[i]), int(got_b.pos[i]), int(got_b.ref_end[i]),
         int(got_b.flag[i]), int(got_b.qname_hash[i]))
        for i in range(got_b.n)
    )
    assert len(want) == len(want_vo)  # full-range fetch found them all
    assert got == want


def test_sso_single_sample(paths):
    d, bam, vcf = paths
    out = str(d / "out_sso.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out, "-n", "50000"], entry=sso_main)
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == len(EVENTS)
    # multiple BAMs rejected
    assert sso_main(["-i", vcf, "-B", bam + "," + bam, "-o", out]) == 2


def test_stdin_stdout(paths, monkeypatch, capsys):
    d, bam, vcf = paths
    monkeypatch.setattr("sys.stdin", io.StringIO(open(vcf).read()))
    _run(["-B", bam, "-n", "50000"])
    out = capsys.readouterr().out
    assert out.startswith("##fileformat")
    assert len([l for l in out.splitlines() if not l.startswith("#")]) == len(EVENTS)


def test_bnd_mate_pair_shares_genotype(paths):
    d, bam, vcf = paths
    vcf3 = str(d / "bnd_pair.vcf")
    header = "".join(l for l in open(vcf) if l.startswith("#"))
    a = ("chr1\t1000000\tbnd_a\tN\tN[chr1:1003001[\t.\t.\t"
         "SVTYPE=BND;MATEID=bnd_b;EVENT=ev1;CIPOS=0,0;CIEND=0,0\tGT\t./.")
    b = ("chr1\t1003001\tbnd_b\tN\t]chr1:1000000]N\t.\t.\t"
         "SVTYPE=BND;MATEID=bnd_a;EVENT=ev1;CIPOS=0,0;CIEND=0,0\tGT\t./.")
    with open(vcf3, "w") as fh:
        fh.write(header + a + "\n" + b + "\n")
    out = str(d / "out_bnd.vcf")
    _run(["-i", vcf3, "-B", bam, "-o", out, "-n", "50000"])
    body = [l.rstrip("\n").split("\t") for l in open(out)
            if not l.startswith("#")]
    assert len(body) == 2
    # mate record copies the pair's genotype row (SPEC.md §2)
    assert body[0][9] == body[1][9]
    assert body[0][9].split(":")[0] == "0/1"  # the DEL event at 1M is het


def test_write_alignment_wide_ci_and_bnd(tmp_path):
    """-w through the engine-export path must still include reads of
    wide-CI (force-null) variants — whose windows genotyping prep
    skips — and of both records of a BND pair (the second is
    genotype-skipped). Expected set = per-variant oracle gather over
    EVERY record's breakpoint."""
    import numpy as np

    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.oracle.engine import gather_reads
    from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    refs = [("chr1", 6_000_000), ("chr2", 2_000_000)]
    events = [
        Event("DEL", "chr1", 1_000_000, 1_003_000, "0/1", var_id="d1"),
        Event("BND", "chr1", 2_000_000, 700_000, "0/1", chrom2="chr2",
              var_id="b1"),
        Event("DEL", "chr1", 3_000_000, 3_002_000, "0/1", var_id="wide"),
        Event("DUP", "chr1", 4_000_000, 4_003_000, "1/1", var_id="d2"),
    ]
    bam = str(tmp_path / "w.bam")
    simulate_events(bam, refs, events, SimConfig(depth=25), seed=7,
                    extra_background=800)
    vcf_path = str(tmp_path / "w.vcf")
    body_lines = events_to_vcf(events, refs).splitlines(keepends=True)
    with open(vcf_path, "w") as fh:
        for ln in body_lines:
            if not ln.startswith("#") and "\twide\t" in ln:
                # widen this record's CI beyond --max_ci_dist → null GT
                ln = ln.replace("CIPOS=0,0;CIEND=0,0",
                                "CIPOS=-1500,1500;CIEND=-1500,1500")
            fh.write(ln)
    out = str(tmp_path / "o.vcf")
    wbam = str(tmp_path / "ev.bam")
    _run(["-i", vcf_path, "-B", bam, "-o", out, "-n", "30000",
          "--max_ci_dist", "1000", "-w", wbam])
    body = [l for l in open(out) if not l.startswith("#")]
    gts = {l.split("\t")[2]: l.rstrip("\n").split("\t")[9].split(":")[0]
           for l in body}
    assert gts["wide"] == "./."  # the CI gate actually fired

    sample = Sample.from_bam(BamFile(bam), num_samp=30_000)
    vcf = Vcf()
    with open(vcf_path) as fh:
        header, vbody = read_vcf_lines(fh)
        vbody = list(vbody)
    vcf.add_header(header)
    want = set()
    for line in vbody:
        bp = resolve_breakpoint(Variant(line, vcf))
        if bp is None:
            continue
        batch, _ = gather_reads(sample, bp)
        want.update(int(v) for v in batch.voffset)
    got_n = 0
    eb = BamFile(wbam)
    for chrom, ln in refs:
        got_n += eb.fetch(chrom, 0, ln).n
    assert got_n == len(want), (got_n, len(want))


def test_write_alignment_fallback_is_announced(paths, capsys):
    """-w silently re-fetching the evidence windows was VERDICT r4
    Weak #5: every fallback off the engine-export arena path must print
    a stderr note naming the reason; the arena path prints nothing."""
    d, bam, vcf = paths
    out = str(d / "out_wnote.vcf")
    wbam = str(d / "evidence_note.bam")
    # oracle engine: no decode arena -> re-fetch path + note
    _run(["-i", vcf, "-B", bam, "-o", out, "-n", "50000", "-w", wbam,
          "--engine", "oracle"])
    err = capsys.readouterr().err
    assert "-w using the batched re-fetch path" in err
    assert "oracle engine" in err
    # tpu single-device default: arena path, no note
    _run(["-i", vcf, "-B", bam, "-o", out, "-n", "50000", "-w", wbam])
    err = capsys.readouterr().err
    assert "-w using the batched re-fetch path" not in err


def test_library_entry_nonzero_stream_origin(paths, tmp_path):
    """sv_genotype must honor the stream's CURRENT position, not
    assume the VCF starts at byte 0 (review finding, r5): a caller may
    hand it a handle positioned past a prefix. The streaming re-read
    must restart at that position, not at 0."""
    import io

    from svtyper_tpu.cli.classic import sv_genotype

    d, bam, vcf = paths
    prefixed = str(d / "prefixed.vcf")
    prefix = "JUNK-PREFIX-NOT-VCF\n" * 3
    with open(prefixed, "w") as fh:
        fh.write(prefix)
        fh.write(open(vcf).read())
    out = io.StringIO()
    with open(prefixed) as fin:
        fin.seek(len(prefix))
        sv_genotype(bam, fin, out, num_samp=50000)
    want = io.StringIO()
    with open(vcf) as fin:
        sv_genotype(bam, fin, want, num_samp=50000)
    assert out.getvalue() == want.getvalue()
    assert "JUNK" not in out.getvalue()


def test_gzipped_vcf_input(paths, tmp_path):
    """-i accepting .vcf.gz (bgzip/gzip): output must be byte-identical
    to the plain-text run, through the streaming re-read path."""
    import gzip

    d, bam, vcf = paths
    gz = str(tmp_path / "in.vcf.gz")
    with open(vcf, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    out_gz = str(tmp_path / "out_gz.vcf")
    out_plain = str(tmp_path / "out_plain.vcf")
    _run(["-i", gz, "-B", bam, "-o", out_gz, "-n", "50000"])
    _run(["-i", vcf, "-B", bam, "-o", out_plain, "-n", "50000"])
    assert open(out_gz).read() == open(out_plain).read()
