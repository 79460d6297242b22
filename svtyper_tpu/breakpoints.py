"""Breakpoint resolution from VCF records (SPEC.md §2, SURVEY.md §3.2).

Shared by the oracle, the vectorized evidence engine, and the CLIs.
Reconstruction of the per-variant preamble of ``classic.py::sv_genotype``.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

from svtyper_tpu.vcfio.model import Variant

SUPPORTED_SVTYPES = ("DEL", "DUP", "INV", "BND")

_BND_RE = re.compile(r"([\[\]])([^\[\]:]+):(\d+)([\[\]])")


class Breakpoint:
    """Resolved A/B breakpoint pair with orientations and CIs.

    Positions are 0-based (``pos0 = VCF POS - 1``). ``o1_rev/o2_rev``
    encode strand orientation at A/B ('-' when True).
    """

    __slots__ = (
        "svtype",
        "chrom_a",
        "pos_a",
        "ci_a",
        "chrom_b",
        "pos_b",
        "ci_b",
        "o1_rev",
        "o2_rev",
        "var_length",
    )

    def __init__(self, svtype, chrom_a, pos_a, ci_a, chrom_b, pos_b, ci_b,
                 o1_rev, o2_rev, var_length):
        self.svtype = svtype
        self.chrom_a = chrom_a
        self.pos_a = pos_a
        self.ci_a = ci_a
        self.chrom_b = chrom_b
        self.pos_b = pos_b
        self.ci_b = ci_b
        self.o1_rev = o1_rev
        self.o2_rev = o2_rev
        self.var_length = var_length

    @property
    def is_del(self) -> bool:
        return self.svtype == "DEL"

    @property
    def is_dup(self) -> bool:
        return self.svtype == "DUP"

    @property
    def is_inv(self) -> bool:
        return self.svtype == "INV"

    def ci_width(self) -> int:
        return max(abs(v) for v in (*self.ci_a, *self.ci_b))


def parse_ci(text: Optional[str]) -> Tuple[int, int]:
    if not text:
        return (0, 0)
    parts = text.split(",")
    return (int(parts[0]), int(parts[1]) if len(parts) > 1 else int(parts[0]))


def parse_bnd_alt(alt: str) -> Optional[Tuple[str, int, bool, bool]]:
    """ALT bracket notation → (chrom_b, pos_b0, o1_rev, o2_rev).

    ``t[p[``→(F,T)  ``t]p]``→(F,F)  ``]p]t``→(T,F)  ``[p[t``→(T,T)
    (SPEC.md §2).
    """
    m = _BND_RE.search(alt)
    if not m:
        return None
    chrom_b = m.group(2)
    pos_b = int(m.group(3)) - 1
    o1_rev = alt[0] in "[]"
    o2_rev = "[" in alt
    return chrom_b, pos_b, o1_rev, o2_rev


def fetch_windows(bp: Breakpoint, flank: int) -> list:
    """Disjoint fetch windows for both breakpoints (SPEC.md §3).

    A and B windows are merged when they overlap on the same chromosome
    so every read is decoded exactly once; the merged list preserves the
    A-then-B read order of the reference's two-fetch gather (overlap
    reads appear at their sorted position, which coincides — see
    evidence/extract.py). Used by both the oracle and the engine so
    their batches are row-identical.
    """
    wins = []
    for chrom, p0, ci in ((bp.chrom_a, bp.pos_a, bp.ci_a),
                          (bp.chrom_b, bp.pos_b, bp.ci_b)):
        wins.append((chrom, p0 + ci[0] - flank, p0 + ci[1] + flank + 1))
    (ca, la, ha), (cb, lb, hb) = wins
    if ca == cb and la <= hb and lb <= ha:
        return [(ca, min(la, lb), max(ha, hb))]
    if ca == cb and lb < la:
        # same chrom with B left of A (possible for BND): fetch in
        # coordinate order so the batch stays coordinate-sorted per
        # variant
        return [wins[1], wins[0]]
    return wins


def resolve_breakpoint(var: Variant) -> Optional[Breakpoint]:
    """None for unsupported SVTYPEs (record passes through un-genotyped)."""
    svtype = var.get_info("SVTYPE")
    if svtype not in SUPPORTED_SVTYPES:
        return None
    pos0 = var.pos - 1
    ci_a = parse_ci(var.get_info("CIPOS"))
    ci_b = parse_ci(var.get_info("CIEND")) if var.get_info("CIEND") else ci_a
    if svtype == "BND":
        parsed = parse_bnd_alt(var.alt)
        if parsed is None:
            return None
        chrom_b, pos_b, o1_rev, o2_rev = parsed
        if not var.get_info("CIEND"):
            ci_b = ci_a
        return Breakpoint(
            "BND", var.chrom, pos0, ci_a, chrom_b, pos_b, ci_b,
            o1_rev, o2_rev, None,
        )
    end_text = var.get_info("END")
    if end_text is None:
        return None
    end0 = int(end_text) - 1
    if svtype == "DEL":
        o1_rev, o2_rev = False, True
    elif svtype == "DUP":
        o1_rev, o2_rev = True, False
    else:  # INV: primary (+,+); the evidence layer also tries (-,-)
        o1_rev, o2_rev = False, False
    return Breakpoint(
        svtype, var.chrom, pos0, ci_a, var.chrom, end0, ci_b,
        o1_rev, o2_rev, end0 - pos0,
    )
