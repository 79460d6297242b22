"""TPU-side profiling: chunk-size sweep with prep/sync split.

Usage: timeout 500 python scripts/profile_tpu.py [chunks...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("SVT_BENCH_CACHE", "/tmp/svtyper_tpu_bench")
TAG = "v3_n1600_d30"


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.gt import TpuEngine
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    bam = os.path.join(CACHE, "bench_%s.bam" % TAG)
    vcf_path = os.path.join(CACHE, "bench_%s.vcf" % TAG)
    sample = Sample.from_bam(BamFile(bam), num_samp=200_000)
    vcf = Vcf()
    with open(vcf_path) as fh:
        header, body = read_vcf_lines(fh)
        vcf.add_header(header)
        variants = [Variant(line, vcf) for line in body]
    bps = [resolve_breakpoint(v) for v in variants]
    sys.stderr.write("%d variants on %s\n" % (len(bps), jax.devices()))

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    for cs in sizes:
        engine = TpuEngine([sample], chunk_size=cs)
        t0 = time.time()
        engine.genotype_chunk(bps[: min(cs, len(bps))])  # compile
        sys.stderr.write("chunk=%d compile+first: %.2fs\n"
                         % (cs, time.time() - t0))
        for rep in range(3):
            for k in engine.stats:
                engine.stats[k] = 0
            t0 = time.time()
            engine.genotype_all(bps)
            dt = time.time() - t0
            st = engine.stats
            sys.stderr.write(
                "chunk=%d rep%d: %.0f var/s (%.2fs; prep %.2fs sync %.2fs"
                " chunks %d)\n"
                % (cs, rep, len(bps) / dt, dt, st["prep_s"], st["sync_s"],
                   st["chunks"])
            )


if __name__ == "__main__":
    main()
