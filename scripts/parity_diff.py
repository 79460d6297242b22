"""Per-record parity diff for run_reference_parity.sh.

Compares GT exactly and GL/GQ/SQ at their printed rounding (SPEC.md §6
formats) between a reference svtyper output VCF and ours, reporting
pass/fail per SPEC.md §8 surface.

Usage: parity_diff.py reference.vcf ours.vcf label
"""

from __future__ import annotations

import sys


def load(path):
    recs = {}
    fmt_fields = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 10:
                continue
            key = (cols[0], cols[1], cols[2])
            fmt = cols[8].split(":")
            fmt_fields = fmt
            samples = [dict(zip(fmt, s.split(":"))) for s in cols[9:]]
            recs[key] = (cols[5], samples)
    return recs, fmt_fields


def main():
    ref_path, ours_path, label = sys.argv[1:4]
    ref, _ = load(ref_path)
    ours, _ = load(ours_path)
    n = 0
    fails = {"GT": 0, "GL": 0, "GQ": 0, "SQ": 0, "QUAL": 0, "missing": 0}
    for key, (rq, rsamps) in ref.items():
        n += 1
        got = ours.get(key)
        if got is None:
            fails["missing"] += 1
            continue
        oq, osamps = got
        if rq != oq:
            fails["QUAL"] += 1
        for rs, os_ in zip(rsamps, osamps):
            if rs.get("GT") != os_.get("GT"):
                fails["GT"] += 1
            for f in ("GL", "GQ", "SQ"):
                if rs.get(f) != os_.get(f):
                    fails[f] += 1
    ok = not any(fails.values())
    print(
        "%-16s %d records: %s"
        % (
            label,
            n,
            "PASS"
            if ok
            else " ".join("%s=%d" % kv for kv in fails.items() if kv[1]),
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
