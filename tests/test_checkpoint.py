"""Checkpoint safety + multi-host resume (VERDICT r3 item 2).

(a) The manifest guard must refuse to replay a ``--checkpoint_dir``
    against a different input VCF, BAM, or flag tuple — silent stale
    replay is a wrong-output failure mode (r3 Weak #1).
(b) Under ``SVT_DIST_*`` multihost mode, per-chunk RESULT-ROW spills
    must let a killed run resume at chunk granularity with the gathered
    row stream still synchronized (SURVEY.md §5 checkpoint row).

Fault injection: ``SVT_CRASH_AFTER_CHUNKS=N`` (cli/checkpoint.py).
"""

import os
import socket
import subprocess
import sys

import pytest

from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 7_000_000)]
EVENTS = [
    Event(["DEL", "DUP", "INV"][i % 3], "chr1",
          200_000 + i * 330_000, 200_000 + i * 330_000 + 1000 + 61 * i,
          ["0/1", "1/1", "0/0"][i % 3], var_id="ck%d" % i)
    for i in range(11)
]


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    bam = str(d / "ck.bam")
    vcf = str(d / "ck.vcf")
    simulate_events(bam, REFS, EVENTS, SimConfig(depth=25), seed=17,
                    extra_background=900)
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(EVENTS, REFS))
    return d, bam, vcf


def _run(argv):
    assert classic_main(argv) == 0


def test_manifest_refuses_different_input(paths, tmp_path):
    d, bam, vcf = paths
    ck = str(tmp_path / "ck_input")
    _run(["-i", vcf, "-B", bam, "-o", str(tmp_path / "a.vcf"),
          "-n", "20000", "--checkpoint_dir", ck, "--batch_size", "4"])
    # mutate one record's POS → different event, same record count
    lines = open(vcf).read().splitlines(keepends=True)
    mut = str(tmp_path / "mut.vcf")
    with open(mut, "w") as fh:
        for ln in lines:
            if not ln.startswith("#") and "\tck3\t" in ln:
                f = ln.split("\t")
                f[1] = str(int(f[1]) + 500)
                ln = "\t".join(f)
            fh.write(ln)
    with pytest.raises(ValueError, match="different run"):
        classic_main(["-i", mut, "-B", bam,
                      "-o", str(tmp_path / "b.vcf"), "-n", "20000",
                      "--checkpoint_dir", ck, "--batch_size", "4"])
    # stale part files must NOT have been replayed into the output
    assert not open(str(tmp_path / "b.vcf")).read()


def test_manifest_refuses_flag_change(paths, tmp_path):
    d, bam, vcf = paths
    ck = str(tmp_path / "ck_flags")
    _run(["-i", vcf, "-B", bam, "-o", str(tmp_path / "a.vcf"),
          "-n", "20000", "--checkpoint_dir", ck, "--batch_size", "4"])
    with pytest.raises(ValueError, match="min_aligned"):
        classic_main(["-i", vcf, "-B", bam,
                      "-o", str(tmp_path / "b.vcf"), "-n", "20000",
                      "--checkpoint_dir", ck, "--batch_size", "4",
                      "-m", "25"])
    # the manifest records the EFFECTIVE batch size (rounded to a
    # device multiple — r5), so the changed value must differ after
    # rounding on the 8-virtual-device test mesh: 4 → 8 but 16 → 16
    with pytest.raises(ValueError, match="batch_size"):
        classic_main(["-i", vcf, "-B", bam,
                      "-o", str(tmp_path / "c.vcf"), "-n", "20000",
                      "--checkpoint_dir", ck, "--batch_size", "16"])


def test_singlehost_crash_resume(paths, tmp_path):
    """Kill after one chunk; the rerun replays chunk 0 from its part
    file (mtime unchanged) and completes byte-identically."""
    d, bam, vcf = paths
    base = str(tmp_path / "base.vcf")
    _run(["-i", vcf, "-B", bam, "-o", base, "-n", "20000"])
    ck = str(tmp_path / "ck_crash")
    argv = ["-i", vcf, "-B", bam, "-o", str(tmp_path / "x.vcf"),
            "-n", "20000", "--checkpoint_dir", ck, "--batch_size", "4"]
    os.environ["SVT_CRASH_AFTER_CHUNKS"] = "1"
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            classic_main(argv)
    finally:
        del os.environ["SVT_CRASH_AFTER_CHUNKS"]
    part0 = os.path.join(ck, "part_000000.vcfpart")
    assert os.path.exists(part0)
    mtime0 = os.path.getmtime(part0)
    out = str(tmp_path / "resumed.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out, "-n", "20000",
          "--checkpoint_dir", ck, "--batch_size", "4"])
    assert open(out).read() == open(base).read()
    assert os.path.getmtime(part0) == mtime0  # replayed, not recomputed


# ---- multi-host ------------------------------------------------------

def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(bam, vcf, out, extra_env):
    env = dict(os.environ)
    for k in ("SVT_DIST_COORD", "SVT_DIST_NPROCS", "SVT_DIST_PROCID",
              "SVT_CRASH_AFTER_CHUNKS"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, "-m", "svtyper_tpu.cli.classic",
         "-i", vcf, "-B", bam, "-o", out, "-n", "20000",
         "--batch_size", "3", "--checkpoint_dir",
         extra_env["_CKDIR"]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def _run_pair(bam, vcf, outs, ck, crash_after=None):
    port = _free_port()
    procs = []
    for i in range(2):
        extra = {
            "SVT_DIST_COORD": "127.0.0.1:%d" % port,
            "SVT_DIST_NPROCS": "2",
            "SVT_DIST_PROCID": str(i),
            "_CKDIR": ck,
        }
        if crash_after is not None:
            extra["SVT_CRASH_AFTER_CHUNKS"] = str(crash_after)
        procs.append(_spawn(bam, vcf, outs[i], extra))
    rcs, errs = [], []
    for p in procs:
        _, err = p.communicate(timeout=300)
        rcs.append(p.returncode)
        errs.append(err.decode()[-2000:])
    return rcs, errs


def test_multihost_crash_resume(paths, tmp_path):
    """2-process run killed after 1 chunk per host resumes from the
    spilled row parts and produces output byte-identical to a
    single-process run (VERDICT r3 item 2b)."""
    d, bam, vcf = paths
    single = str(tmp_path / "single.vcf")
    _run(["-i", vcf, "-B", bam, "-o", single, "-n", "20000"])

    ck = str(tmp_path / "ck_mh")
    outs1 = [str(tmp_path / ("crash_%d.vcf" % i)) for i in range(2)]
    rcs, errs = _run_pair(bam, vcf, outs1, ck, crash_after=1)
    assert all(rc != 0 for rc in rcs), errs  # both injected crashes
    rows = sorted(p for p in os.listdir(ck) if p.startswith("rows_"))
    # each host spilled its first chunk (batch 3, slices of 6/5 → the
    # crash fires after chunk 0)
    assert any(p.startswith("rows_p000_") for p in rows), rows
    assert any(p.startswith("rows_p001_") for p in rows), rows
    mtimes = {p: os.path.getmtime(os.path.join(ck, p)) for p in rows}

    outs2 = [str(tmp_path / ("resume_%d.vcf" % i)) for i in range(2)]
    rcs, errs = _run_pair(bam, vcf, outs2, ck)
    assert rcs == [0, 0], errs
    assert open(outs2[0]).read() == open(single).read()
    assert os.path.getsize(outs2[1]) == 0  # host 1 writes nothing
    for p, m in mtimes.items():
        # spilled chunks were REPLAYED, not recomputed
        assert os.path.getmtime(os.path.join(ck, p)) == m, p


def test_multihost_partial_part_replay(paths, tmp_path):
    """Phase-2 (host-0 formatting) replay with SOME part files missing:
    the gathered-row cursor must advance past replayed chunks, or every
    later variant silently reads an earlier variant's row (r4 review
    finding)."""
    d, bam, vcf = paths
    single = str(tmp_path / "single.vcf")
    _run(["-i", vcf, "-B", bam, "-o", single, "-n", "20000"])

    ck = str(tmp_path / "ck_pp")
    outs1 = [str(tmp_path / ("full_%d.vcf" % i)) for i in range(2)]
    rcs, errs = _run_pair(bam, vcf, outs1, ck)
    assert rcs == [0, 0], errs
    assert open(outs1[0]).read() == open(single).read()
    parts = sorted(p for p in os.listdir(ck) if p.endswith(".vcfpart"))
    assert len(parts) >= 3, parts
    # delete a MIDDLE formatted part: chunk 0 replays (cursor must
    # skip), chunk 1 recomputes from gathered rows, rest replay
    os.unlink(os.path.join(ck, parts[1]))
    outs2 = [str(tmp_path / ("partial_%d.vcf" % i)) for i in range(2)]
    rcs, errs = _run_pair(bam, vcf, outs2, ck)
    assert rcs == [0, 0], errs
    assert open(outs2[0]).read() == open(single).read()


def test_resume_with_write_alignment_is_complete(paths, tmp_path):
    """A checkpoint-resumed run with -w must still write EVERY genotyped
    chunk's evidence reads — replayed chunks re-fetch theirs (r4 review
    finding: they were silently dropped)."""
    from svtyper_tpu.bamio.bam import BamFile

    d, bam, vcf = paths
    # reference row set: a clean full run with -w
    full_ev = str(tmp_path / "full_ev.bam")
    _run(["-i", vcf, "-B", bam, "-o", str(tmp_path / "f.vcf"),
          "-n", "20000", "-w", full_ev])

    ck = str(tmp_path / "ck_wres")
    os.environ["SVT_CRASH_AFTER_CHUNKS"] = "1"
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            classic_main(["-i", vcf, "-B", bam,
                          "-o", str(tmp_path / "x.vcf"), "-n", "20000",
                          "--checkpoint_dir", ck, "--batch_size", "4"])
    finally:
        del os.environ["SVT_CRASH_AFTER_CHUNKS"]
    res_ev = str(tmp_path / "res_ev.bam")
    _run(["-i", vcf, "-B", bam, "-o", str(tmp_path / "r.vcf"),
          "-n", "20000", "--checkpoint_dir", ck, "--batch_size", "4",
          "-w", res_ev])

    import numpy as np

    a = BamFile(full_ev).fetch("chr1", 0, REFS[0][1])
    b = BamFile(res_ev).fetch("chr1", 0, REFS[0][1])
    assert b.n == a.n
    np.testing.assert_array_equal(a.qname_hash, b.qname_hash)
