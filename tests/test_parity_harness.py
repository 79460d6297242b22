"""The reference-parity harness must be EXECUTABLE today, not on
parity day (VERDICT r4 item 6): ``--mock`` stands the float64 oracle
CLI in as the "reference" binary and drills the whole chain — fake
checkout construction, reference run, both engine runs, header diff,
record diff, -l JSON schema diff, exit codes."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mock_parity_drill(tmp_path):
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_reference_parity.sh"),
         "--mock", str(tmp_path)],
        capture_output=True, text=True, timeout=420,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    assert "MOCK MODE" in r.stdout
    assert "PARITY: all lanes passed" in r.stdout
    # every lane actually ran
    assert "bundled/tpu" in r.stdout and "PASS" in r.stdout
    assert "sim/tpu" in r.stdout
    assert "PASS lib-json" in r.stdout


def test_mock_parity_drill_detects_divergence(tmp_path):
    """The diff side must FAIL loudly when outputs differ — drill the
    failure path too by corrupting one record in the mock reference
    output... simplest honest check: parity_diff itself flags a
    mutated GT."""
    import shutil

    work = tmp_path / "w"
    work.mkdir()
    # produce one real output pair via the oracle CLI
    out_a = str(work / "a.vcf")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "svtyper_tpu.cli.classic",
         "-i", os.path.join(REPO, "data", "example.vcf"),
         "-B", os.path.join(REPO, "data", "example.sim.sorted.bam"),
         "-o", out_a, "--engine", "oracle"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    out_b = str(work / "b.vcf")
    text = open(out_a).read()
    assert "\t0/1:" in text or "\t1/1:" in text
    mutated = text.replace("\t0/1:", "\t1/1:", 1) if "\t0/1:" in text \
        else text.replace("\t1/1:", "\t0/1:", 1)
    with open(out_b, "w") as fh:
        fh.write(mutated)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_diff.py"),
         out_a, out_b, "mutated"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode != 0
    # parity_diff reports per-surface mismatch counts on failure
    assert "GT=1" in r.stdout
