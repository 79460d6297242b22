"""Golden regression: the checked-in expected output must be reproduced
exactly (role of the reference's data/ regression test, SURVEY.md §4).

``data/example.expected.vcf`` was produced by the float64 oracle on the
checked-in dataset; both engines must reproduce it byte-for-byte. If an
algorithm change legitimately alters the output, re-generate via:
    python scripts/make_example_data.py data
    python -m svtyper_tpu.cli.classic -i data/example.vcf \
        -B data/example.sim.sorted.bam -o data/example.expected.vcf \
        -n 60000 --engine oracle
and account for the change in SPEC.md.
"""

import os

import pytest

from svtyper_tpu.cli.classic import main as classic_main

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")


@pytest.mark.parametrize("engine", ["tpu", "oracle"])
def test_example_regression(engine, tmp_path):
    out = str(tmp_path / ("out_%s.vcf" % engine))
    rc = classic_main([
        "-i", os.path.join(DATA, "example.vcf"),
        "-B", os.path.join(DATA, "example.sim.sorted.bam"),
        "-o", out, "-n", "60000", "--engine", engine,
    ])
    assert rc == 0
    expected = open(os.path.join(DATA, "example.expected.vcf")).read()
    got = open(out).read()
    assert got == expected, "engine %s diverged from the golden output" % engine


@pytest.mark.parametrize("engine", ["tpu", "oracle"])
def test_example_regression_gated(engine, tmp_path):
    """Null-path golden (VERDICT r2 item 5): --max_ci_dist nulls only
    the wide-CI record and --max_reads nulls only the coverage-spiked
    one; all other rows stay byte-identical to the default golden."""
    out = str(tmp_path / ("gated_%s.vcf" % engine))
    rc = classic_main([
        "-i", os.path.join(DATA, "example.vcf"),
        "-B", os.path.join(DATA, "example.sim.sorted.bam"),
        "-o", out, "-n", "60000", "--engine", engine,
        "--max_ci_dist", "50", "--max_reads", "2000",
    ])
    assert rc == 0
    expected = open(os.path.join(DATA, "example.expected.gated.vcf")).read()
    got = open(out).read()
    assert got == expected, (
        "engine %s diverged from the gated golden output" % engine
    )
    gated = {
        line.split("\t")[2]: line.split("\t")[9].split(":")[0]
        for line in got.splitlines() if not line.startswith("#")
    }
    assert gated["del_wide_ci"] == "./."
    assert gated["del_deep"] == "./."
    assert gated["del_1000000"] != "./."
