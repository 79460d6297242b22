"""Hard-mode fixtures (VERDICT r4 Missing #3: synthesized goldens are
cleaner than real NA12878 data): geometric noise — spurious soft
clips, low-MAPQ ambiguity, chimeric SA tags, discordant background
pairs — stresses the evidence model the way real repeats and clipping
noise do. Two guarantees under noise:

1. the TPU engine stays byte-identical to the float64 oracle
   (robustness is a property of the ALGORITHM, not of one
   implementation), and
2. GT concordance vs simulated truth stays above a floor well under
   the clean-fixture 0.98+ but far above chance.
"""

import pytest

from svtyper_tpu.cli.classic import main as classic_main
from svtyper_tpu.simulate import Event, SimConfig, events_to_vcf, simulate_events

REFS = [("chr1", 9_000_000)]


@pytest.fixture(scope="module")
def noisy(tmp_path_factory):
    d = tmp_path_factory.mktemp("noise")
    import numpy as np

    rng = np.random.default_rng(55)
    gts = ["0/0", "0/1", "0/1", "1/1"]
    types = ["DEL", "DEL", "DUP", "INV"]
    events = []
    for i in range(40):
        pos = 150_000 + i * 200_000
        svlen = int(rng.integers(400, 5000))
        events.append(Event(types[i % 4], "chr1", pos, pos + svlen,
                            gts[int(rng.integers(0, 4))],
                            var_id="n%d" % i))
    bam = str(d / "noisy.bam")
    cfg = SimConfig(
        depth=30,
        noise_clip_rate=0.08,
        noise_lowmapq_rate=0.15,
        noise_chimera_rate=0.04,
        noise_discordant_rate=0.10,
    )
    simulate_events(bam, REFS, events, cfg, seed=55,
                    extra_background=3000)
    vcf = str(d / "in.vcf")
    with open(vcf, "w") as fh:
        fh.write(events_to_vcf(events, REFS))
    truth = {e.var_id: e.gt for e in events}
    return d, bam, vcf, truth


def test_tpu_oracle_identity_under_noise(noisy):
    d, bam, vcf, truth = noisy
    out_t = str(d / "t.vcf")
    out_o = str(d / "o.vcf")
    args = ["-i", vcf, "-B", bam, "-n", "50000"]
    assert classic_main(args + ["-o", out_t]) == 0
    assert classic_main(args + ["-o", out_o, "--engine", "oracle"]) == 0
    with open(out_t) as f1, open(out_o) as f2:
        assert f1.read() == f2.read()


def test_concordance_floor_under_noise(noisy):
    d, bam, vcf, truth = noisy
    out = str(d / "c.vcf")
    assert classic_main(["-i", vcf, "-B", bam, "-o", out,
                         "-n", "50000"]) == 0
    ok = n = 0
    for line in open(out):
        if line.startswith("#"):
            continue
        cols = line.rstrip("\n").split("\t")
        want = truth.get(cols[2])
        if want is None:
            continue
        n += 1
        got = cols[9].split(":")[0]
        ok += got == want
    assert n == 40
    # clean fixtures run 0.98+; noise costs a few calls but the
    # genotyper must stay far above chance — floor chosen under the
    # observed value with margin for rng drift across platforms
    assert ok / n >= 0.80, "concordance %d/%d under noise" % (ok, n)
