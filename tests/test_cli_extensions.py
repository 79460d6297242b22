"""Framework extensions: chunk checkpoint/resume, contiguous sharding,
and the quickstart data script."""

import os
import subprocess
import sys

import pytest

from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 8_000_000)]
EVENTS = [
    Event("DEL", "chr1", 1_000_000 + i * 800_000, 1_002_000 + i * 800_000,
          gt, var_id="e%d" % i)
    for i, gt in enumerate(["0/1", "1/1", "0/0", "0/1", "1/1", "0/1", "0/1"])
]


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliext")
    bam = str(d / "sim.bam")
    vcf = str(d / "in.vcf")
    simulate_events(bam, REFS, EVENTS, SimConfig(depth=30), seed=9,
                    extra_background=1500)
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(EVENTS, REFS))
    return d, bam, vcf


def _run(argv):
    assert classic_main(argv) == 0


def test_checkpoint_resume_identical(paths):
    d, bam, vcf = paths
    base = str(d / "base.vcf")
    _run(["-i", vcf, "-B", bam, "-o", base, "-n", "40000"])
    ck = str(d / "ck")
    out1 = str(d / "c1.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out1, "-n", "40000",
          "--checkpoint_dir", ck, "--batch_size", "3"])
    assert os.path.exists(os.path.join(ck, "manifest.json"))
    # batch sizes round up to a device multiple (r5): part count
    # follows the EFFECTIVE chunking on this test's virtual mesh
    import jax

    ndev = len(jax.local_devices())
    eff = -(-3 // ndev) * ndev
    n_parts = -(-len(EVENTS) // eff)
    parts = sorted(p for p in os.listdir(ck) if p.endswith(".vcfpart"))
    assert parts == ["part_%06d.vcfpart" % i for i in range(n_parts)]
    assert open(out1).read() == open(base).read()
    # delete one part: only that chunk is re-genotyped; output identical
    os.unlink(os.path.join(ck, parts[-1]))
    out2 = str(d / "c2.vcf")
    _run(["-i", vcf, "-B", bam, "-o", out2, "-n", "40000",
          "--checkpoint_dir", ck, "--batch_size", "3"])
    assert open(out2).read() == open(base).read()
    assert sorted(
        p for p in os.listdir(ck) if p.endswith(".vcfpart")
    ) == parts


def test_shards_concatenate_to_single_output(paths):
    d, bam, vcf = paths
    base = str(d / "sbase.vcf")
    _run(["-i", vcf, "-B", bam, "-o", base, "-n", "40000"])
    outs = []
    for i in range(3):
        o = str(d / ("shard%d.vcf" % i))
        _run(["-i", vcf, "-B", bam, "-o", o, "-n", "40000",
              "--num_shards", "3", "--shard_index", str(i)])
        outs.append(o)
    merged = "".join(open(o).read() for o in outs)
    assert merged == open(base).read()


def test_make_example_data_script(tmp_path):
    outdir = str(tmp_path / "data")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "scripts/make_example_data.py", outdir],
        check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, timeout=300, capture_output=True,
    )
    assert os.path.exists(os.path.join(outdir, "example.vcf"))
    assert os.path.exists(os.path.join(outdir, "example.sim.sorted.bam.bai"))
    out = str(tmp_path / "quick.vcf")
    _run(["-i", os.path.join(outdir, "example.vcf"),
          "-B", os.path.join(outdir, "example.sim.sorted.bam"),
          "-o", out, "-n", "60000"])
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == 12


def test_profile_flag_writes_trace(paths, tmp_path):
    """--profile must produce a jax.profiler trace directory."""
    d, bam, vcf = paths
    prof = str(tmp_path / "trace")
    _run(["-i", vcf, "-B", bam, "-o", str(tmp_path / "p.vcf"),
          "-n", "40000", "--profile", prof])
    assert os.path.isdir(prof)
    found = []
    for root, _dirs, files in os.walk(prof):
        found.extend(files)
    assert found, "profiler trace directory is empty"
