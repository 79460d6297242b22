"""Sample/Library bootstrap + -l JSON round-trip (SPEC.md §7)."""

import json
import os

import numpy as np
import pytest

from svtyper_tpu.bamio.bam import BamFile
from svtyper_tpu.simulate import Event, SimConfig, simulate_events
from svtyper_tpu.stats import Library, Sample


@pytest.fixture(scope="module")
def sim_bam(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stats") / "sim.bam")
    refs = [("chr1", 3_000_000)]
    cfg = SimConfig(insert_mean=350, insert_sd=40, depth=30)
    simulate_events(
        path, refs,
        [Event("DEL", "chr1", 1_000_000, 1_005_000, "0/1")],
        cfg, seed=1, extra_background=3000,
    )
    return path


def test_from_bam_library_moments(sim_bam):
    bam = BamFile(sim_bam)
    s = Sample.from_bam(bam, num_samp=100_000)
    assert s.name == "NA12878"
    assert list(s.lib_dict) == ["lib1"]
    lib = s.lib_dict["lib1"]
    assert lib.read_length == 150
    assert lib.mean == pytest.approx(350, abs=15)
    assert lib.sd == pytest.approx(40, abs=15)
    assert lib.prevalence == 1.0
    assert s.active_libs == ["lib1"]
    assert s.mapped > 0 and s.unmapped == 0


def test_fetch_flank(sim_bam):
    s = Sample.from_bam(BamFile(sim_bam), num_samp=50_000)
    lib = s.libraries[0]
    assert s.get_fetch_flank(3.0) == int(lib.mean + 3 * lib.sd + 0.5)


def test_num_samp_cap(sim_bam):
    s = Sample.from_bam(BamFile(sim_bam), num_samp=500)
    assert sum(s.libraries[0].hist.values()) <= 500


def test_json_roundtrip(sim_bam, tmp_path):
    bam = BamFile(sim_bam)
    s = Sample.from_bam(bam, num_samp=50_000)
    path = os.path.join(str(tmp_path), "lib.json")
    Sample.save_lib_info([s], path)
    with open(path) as fh:
        obj = json.load(fh)
    # schema keys (SPEC.md §7)
    entry = obj["NA12878"]
    assert set(entry) == {"mapped", "unmapped", "libraryArray"}
    larr = entry["libraryArray"][0]
    assert set(larr) == {
        "library_name", "readgroups", "read_length", "mean", "sd",
        "prevalence", "histogram",
    }
    s2 = Sample.from_lib_info(bam, obj)
    assert s2.libraries[0].hist == s.libraries[0].hist
    assert s2.libraries[0].mean == s.libraries[0].mean
    assert s2.mapped == s.mapped


def test_histogram_tail_trimmed():
    inserts = np.concatenate(
        [np.full(1000, 300), np.array([300000, 500000])]
    )
    lib = Library.from_inserts("l", ["rg"], inserts, 150, 1.0)
    assert lib.max_insert == 300
    assert lib.mean == 300


def test_dens_matrix(sim_bam):
    s = Sample.from_bam(BamFile(sim_bam), num_samp=50_000)
    m = s.dens_matrix()
    assert m.shape[0] == 1
    assert m.sum() == pytest.approx(1.0)
    lib = s.libraries[0]
    assert m[0, int(round(lib.mean))] > 0
