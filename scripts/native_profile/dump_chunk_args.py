"""Capture one chunk's svt_fetch_chunk arguments for the gprof replay
harness (BASELINE.md perf methodology; r3/r5 native profiling recipe).

Usage:
  JAX_PLATFORMS=cpu python scripts/native_profile/dump_chunk_args.py \
      <bam> <vcf> [outdir=/tmp/chunkbin]
  cd svtyper_tpu/bamio/_native && \
      g++ -O2 -pg -std=c++17 -DUSE_LIBDEFLATE \
      ../../../scripts/native_profile/replay_harness.cpp bamcore.cpp \
      -o /tmp/replay -lz -ldeflate -pthread
  /tmp/replay <bam> 30 1 && gprof -b /tmp/replay gmon.out | head -30

Findings recorded r5: warm chunk_worker runs ~40 us/variant
single-core; scanned:kept ratio is 8:1 but per-scanned-record cost is
~0.16 us (header+cigar walk needed to classify) — no single hot spot
remains; the path is at practical speed on this host.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from svtyper_tpu.bamio import native  # noqa: E402


def main():
    bam_path, vcf_path = sys.argv[1], sys.argv[2]
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/chunkbin"
    os.makedirs(outdir, exist_ok=True)

    from svtyper_tpu.bamio.bam import BamFile
    from svtyper_tpu.breakpoints import resolve_breakpoint
    from svtyper_tpu.gt import TpuEngine
    from svtyper_tpu.stats import Sample
    from svtyper_tpu.vcfio.model import Variant, Vcf
    from svtyper_tpu.vcfio.reader import read_vcf_lines

    bf = BamFile(bam_path)
    sample = Sample.from_bam(bf, num_samp=200_000)
    hdr = sample.bam.header
    refs = [r[0] for r in hdr.refs]
    rgs = [rg.get("ID", "") for rg in getattr(hdr, "read_groups", [])]

    dumped = {}
    orig = native.NativeBam.fetch_chunk

    def spy(self, rt, rs, re_, ro, rb, rn, vq, n_var, filt,
            max_reads=None, threads=1, vpred=None):
        if not dumped:
            arrs = dict(rt=rt, rs=rs, re_=re_, ro=ro, rb=rb, rn=rn, vq=vq,
                        n_var=np.int64(n_var),
                        min_aligned=np.int64(filt.min_aligned),
                        drop_flags=np.int64(filt.drop_flags))
            for f in ("rg_keep", "rg_to_lib", "cov_tid_a", "cov_pos_a",
                      "cov_tid_b", "cov_pos_b"):
                a = getattr(filt, f)
                if a is not None:
                    arrs[f] = a
            if vpred is not None:
                arrs["v_i32"], arrs["v_u8"] = vpred
            for k, v in arrs.items():
                np.ascontiguousarray(v).tofile(
                    os.path.join(outdir, "%s.bin" % k))
            with open("/tmp/chunk_names.txt", "w") as fh:
                fh.write("\n".join(refs) + "\n--\n" + "\n".join(rgs))
            dumped["x"] = True
        return orig(self, rt, rs, re_, ro, rb, rn, vq, n_var, filt,
                    max_reads, threads, vpred)

    native.NativeBam.fetch_chunk = spy
    vcf = Vcf()
    with open(vcf_path) as fh:
        h, b = read_vcf_lines(fh)
        vcf.add_header(h)
        body = [line for _, line in zip(range(1024), b)]
    bps = [resolve_breakpoint(Variant(line, vcf)) for line in body]
    TpuEngine([sample], chunk_size=1024).genotype_chunk(bps)
    print("dumped to", outdir)


if __name__ == "__main__":
    main()
