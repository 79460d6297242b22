"""Engine-level Pallas gating (VERDICT r1 item 5): the full CLI output
under the Pallas GL kernel must be byte-identical to the fused-jnp f32
path. Runs the kernel in interpret mode on the CPU backend (subprocess,
x64 off — the engine only selects Pallas for float32 runs); the same
comparison runs compiled on real hardware via tests/test_pallas_tpu.py.
"""

import os
import subprocess
import sys

import pytest

from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 9_000_000)]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("pallas_engine")
    events = [
        Event(["DEL", "DEL", "DUP", "INV"][i % 4], "chr1",
              200_000 + i * 300_000, 200_000 + i * 300_000 + 900 + 71 * i,
              ["0/0", "0/1", "1/1"][i % 3], var_id="v%d" % i)
        for i in range(24)
    ]
    bam = str(d / "pe.bam")
    simulate_events(bam, REFS, events, SimConfig(depth=35), seed=33,
                    extra_background=1500)
    vcf = str(d / "pe.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(events, REFS))
    return bam, vcf, str(d)


def _run(bam, vcf, out, pallas_env):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "0"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["SVT_PALLAS"] = pallas_env
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "svtyper_tpu.cli.classic",
         "-i", vcf, "-B", bam, "-o", out, "-n", "20000"],
        env=env, capture_output=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]


def test_pallas_cli_output_byte_identical(fixture):
    bam, vcf, d = fixture
    out_jnp = os.path.join(d, "jnp.vcf")
    out_pal = os.path.join(d, "pallas.vcf")
    _run(bam, vcf, out_jnp, "0")
    _run(bam, vcf, out_pal, "interpret")
    with open(out_jnp, "rb") as a, open(out_pal, "rb") as b:
        ja, pa = a.read(), b.read()
    assert ja == pa, "Pallas f32 CLI output diverged from jnp f32 path"
