#!/usr/bin/env bash
# Reference-parity harness (SURVEY.md §4 item 1; VERDICT task 8).
#
# Every parity claim in this repo is currently against the float64
# oracle reconstruction, because /root/reference is an empty mount and
# real svtyper was never on disk (SURVEY.md §0). The moment a real
# hall-lab/svtyper becomes available, this script turns SPEC.md §8's
# MUST-VERIFY checklist into pass/fail in one command:
#
#   scripts/run_reference_parity.sh /path/to/svtyper-checkout [workdir]
#
# It runs reference svtyper AND both of our engines on (a) the
# reference's own bundled data (data/example.vcf +
# data/NA12878.target_loci.sorted.bam) if present, and (b) this repo's
# synthesized regression fixture, then diffs GT and rounded GL/GQ/SQ
# per record.
set -u

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${1:-}"
WORK="${2:-$(mktemp -d)}"

# --mock: drill the ENTIRE chain today (VERDICT r4 item 6) with the
# float64 oracle CLI standing in as the "reference" binary — a fake
# checkout whose svtyper/classic.py shims into our oracle engine. The
# run/diff/exit-code machinery is then proven executable before parity
# day, instead of first being exercised the day the mount appears.
if [ "$REF" = "--mock" ]; then
    mkdir -p "$WORK/mockref/svtyper" "$WORK/mockref/data"
    touch "$WORK/mockref/svtyper/__init__.py"
    cat > "$WORK/mockref/svtyper/classic.py" <<PYEOF
import os, sys
sys.path.insert(0, "$REPO")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")
from svtyper_tpu.cli.classic import main as _main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return _main(argv + ["--engine", "oracle"])


if __name__ == "__main__":
    sys.exit(main())
PYEOF
    # give the mock checkout "bundled data" so lane (a) runs too
    cp "$REPO/data/example.vcf" "$WORK/mockref/data/example.vcf"
    cp "$REPO/data/example.sim.sorted.bam" \
       "$WORK/mockref/data/NA12878.target_loci.sorted.bam"
    cp "$REPO/data/example.sim.sorted.bam.bai" \
       "$WORK/mockref/data/NA12878.target_loci.sorted.bam.bai"
    REF="$WORK/mockref"
    echo "MOCK MODE: oracle CLI standing in as the reference binary"
fi

if [ -z "$REF" ]; then
    # default probe locations
    for cand in /root/reference /opt/svtyper /usr/local/src/svtyper; do
        if [ -e "$cand/svtyper/classic.py" ] || [ -e "$cand/setup.py" ]; then
            REF="$cand"
            break
        fi
    done
fi
if [ -z "$REF" ] || ! [ -e "$REF" ] || [ -z "$(find "$REF" -name classic.py 2>/dev/null | head -1)" ]; then
    echo "reference unavailable: no svtyper checkout found" >&2
    echo "usage: $0 /path/to/hall-lab-svtyper [workdir]" >&2
    echo "(re-run when /root/reference is populated — SPEC.md §8 stays" >&2
    echo " [RECON] until then)" >&2
    exit 0
fi

echo "reference: $REF"
echo "workdir:   $WORK"
mkdir -p "$WORK"

run_reference() {  # $1=vcf $2=bam $3=out [$4=lib_json]
    local lib_args=()
    [ -n "${4:-}" ] && lib_args=(-l "$4")
    # the named checkout wins over any pip-installed console script —
    # $REF is what the caller asked to compare against (and what mock
    # mode constructed)
    if PYTHONPATH="$REF" python -c "import svtyper.classic" 2>/dev/null; then
        PYTHONPATH="$REF" python -m svtyper.classic \
            -i "$1" -B "$2" -o "$3" "${lib_args[@]}"
    elif command -v svtyper >/dev/null 2>&1; then
        svtyper -i "$1" -B "$2" -o "$3" "${lib_args[@]}"
    else
        PYTHONPATH="$REF" python "$REF/svtyper/classic.py" \
            -i "$1" -B "$2" -o "$3" "${lib_args[@]}"
    fi
}

run_ours() {  # $1=vcf $2=bam $3=out $4=engine [$5=lib_json]
    local lib_args=()
    [ -n "${5:-}" ] && lib_args=(-l "$5")
    JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 PYTHONPATH="$REPO" \
        python -m svtyper_tpu.cli.classic \
        -i "$1" -B "$2" -o "$3" --engine "$4" "${lib_args[@]}"
}

compare() {  # $1=reference-out $2=ours-out $3=label
    python "$REPO/scripts/parity_diff.py" "$1" "$2" "$3"
}

compare_lib() {  # $1=reference -l json  $2=ours -l json
    # -l cache interop is its own parity surface (SURVEY.md §3.4): the
    # schemas must agree key-for-key so caches are interchangeable
    python - "$1" "$2" <<'PYEOF'
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))


def shape(obj):
    if isinstance(obj, dict):
        return {k: shape(v) for k, v in sorted(obj.items())}
    if isinstance(obj, list):
        return [shape(obj[0])] if obj else []
    return type(obj).__name__


sa, sb = shape(a), shape(b)
if sa == sb:
    print("PASS lib-json: schemas identical")
    sys.exit(0)
print("FAIL lib-json: schema mismatch")
print(" reference:", json.dumps(sa)[:400])
print(" ours:     ", json.dumps(sb)[:400])
sys.exit(1)
PYEOF
}

status=0

# (a) the reference's own bundled regression data
REF_VCF="$REF/data/example.vcf"
REF_BAM="$REF/data/NA12878.target_loci.sorted.bam"
if [ -f "$REF_VCF" ] && [ -f "$REF_BAM" ]; then
    echo "== reference bundled data =="
    run_reference "$REF_VCF" "$REF_BAM" "$WORK/ref_bundled.vcf" || status=1
    run_ours "$REF_VCF" "$REF_BAM" "$WORK/ours_tpu_bundled.vcf" tpu || status=1
    run_ours "$REF_VCF" "$REF_BAM" "$WORK/ours_oracle_bundled.vcf" oracle || status=1
    compare "$WORK/ref_bundled.vcf" "$WORK/ours_tpu_bundled.vcf" "bundled/tpu" || status=1
    compare "$WORK/ref_bundled.vcf" "$WORK/ours_oracle_bundled.vcf" "bundled/oracle" || status=1
else
    echo "note: reference data/ not found; skipping bundled-data lane"
fi

# (b) this repo's synthesized regression fixture
echo "== synthesized regression fixture =="
run_reference "$REPO/data/example.vcf" "$REPO/data/example.sim.sorted.bam" \
    "$WORK/ref_sim.vcf" || status=1
run_ours "$REPO/data/example.vcf" "$REPO/data/example.sim.sorted.bam" \
    "$WORK/ours_tpu_sim.vcf" tpu || status=1
compare "$WORK/ref_sim.vcf" "$WORK/ours_tpu_sim.vcf" "sim/tpu" || status=1

# (c) -l library-stats JSON schema interop (SURVEY.md §3.4)
echo "== -l lib-stats JSON schema =="
run_reference "$REPO/data/example.vcf" "$REPO/data/example.sim.sorted.bam" \
    "$WORK/ref_lib_out.vcf" "$WORK/ref_lib.json" || status=1
run_ours "$REPO/data/example.vcf" "$REPO/data/example.sim.sorted.bam" \
    "$WORK/ours_lib_out.vcf" tpu "$WORK/ours_lib.json" || status=1
compare_lib "$WORK/ref_lib.json" "$WORK/ours_lib.json" || status=1

echo
if [ "$status" = 0 ]; then
    echo "PARITY: all lanes passed — update SPEC.md §8 [RECON] tags to [VERIFIED]"
else
    echo "PARITY: mismatches found — see $WORK and SPEC.md §8"
fi
exit $status
