"""Multi-host end-to-end (SURVEY.md §4 item 3): N jax.distributed CPU
processes on localhost must produce output byte-identical to one
process. Exercises initialize_from_env → per-shard genotyping →
allgather_rows (DCN collective) → host-0 ordered write.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 6_000_000)]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("multihost")
    events = [
        Event(["DEL", "DUP", "INV"][i % 3], "chr1",
              200_000 + i * 250_000, 200_000 + i * 250_000 + 1200 + 83 * i,
              ["0/0", "0/1", "1/1"][i % 3], var_id="v%d" % i)
        for i in range(11)  # odd count: uneven shard slices
    ]
    bam = str(d / "mh.bam")
    simulate_events(bam, REFS, events, SimConfig(depth=25), seed=21,
                    extra_background=800)
    vcf = str(d / "mh.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(events, REFS))
    return bam, vcf, str(d)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cli(bam, vcf, out, extra_env=None, timeout=240, extra_args=()):
    env = dict(os.environ)
    env.pop("SVT_DIST_COORD", None)
    env.pop("SVT_DIST_NPROCS", None)
    env.pop("SVT_DIST_PROCID", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if extra_env:
        env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, "-m", "svtyper_tpu.cli.classic",
         "-i", vcf, "-B", bam, "-o", out, "-n", "20000", *extra_args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


@pytest.mark.parametrize("n_procs", [2, 4])
def test_multiprocess_byte_identical(fixture, n_procs, tmp_path):
    bam, vcf, _ = fixture
    single_out = str(tmp_path / "single.vcf")
    p = _run_cli(bam, vcf, single_out)
    _, err = p.communicate(timeout=300)
    assert p.returncode == 0, err.decode()[-2000:]

    port = _free_port()
    outs = [str(tmp_path / ("mh_%d.vcf" % i)) for i in range(n_procs)]
    procs = []
    for i in range(n_procs):
        procs.append(
            _run_cli(
                bam, vcf, outs[i],
                extra_env={
                    "SVT_DIST_COORD": "127.0.0.1:%d" % port,
                    "SVT_DIST_NPROCS": str(n_procs),
                    "SVT_DIST_PROCID": str(i),
                },
            )
        )
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=300)
        errs.append(err.decode()[-2000:])
    assert all(p.returncode == 0 for p in procs), errs

    with open(single_out, "rb") as fh:
        want = fh.read()
    with open(outs[0], "rb") as fh:
        got = fh.read()
    assert want, "single-process output empty"
    assert got == want
    # non-zero hosts write nothing
    for o in outs[1:]:
        assert os.path.getsize(o) == 0


def test_multiround_uneven_gather_byte_identical(fixture, tmp_path):
    """batch_size 5 over 11 variants and 2 hosts → slices [0,6)/[6,11)
    → 2 gather rounds on host 0 vs 1 on host 1: the shorter host must
    keep participating with empty arrays, host 0's phase-2 row reader
    must stitch rows across (host, round) file boundaries (emission
    chunk 1 = vars 5-9 straddles the host boundary), and the output
    must stay byte-identical to the single-process run."""
    bam, vcf, _ = fixture
    args = ("--batch_size", "5")
    single_out = str(tmp_path / "single5.vcf")
    p = _run_cli(bam, vcf, single_out, extra_args=args)
    _, err = p.communicate(timeout=300)
    assert p.returncode == 0, err.decode()[-2000:]

    port = _free_port()
    outs = [str(tmp_path / ("mr_%d.vcf" % i)) for i in range(2)]
    procs = [
        _run_cli(
            bam, vcf, outs[i], extra_args=args,
            extra_env={
                "SVT_DIST_COORD": "127.0.0.1:%d" % port,
                "SVT_DIST_NPROCS": "2",
                "SVT_DIST_PROCID": str(i),
            },
        )
        for i in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=300)
        errs.append(err.decode()[-2000:])
    assert all(p.returncode == 0 for p in procs), errs
    with open(single_out, "rb") as fh:
        want = fh.read()
    with open(outs[0], "rb") as fh:
        got = fh.read()
    assert want and got == want
    assert os.path.getsize(outs[1]) == 0
