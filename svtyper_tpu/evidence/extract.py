"""Host-side chunk preparation: reads → flat padded device tensors.

The host's job ends at data layout: decode, filter, deduplicate, group
fragments, precompute ragged-only features (aligned-coverage tests), and
pad to bucketed static shapes so XLA compiles once per bucket. All float
math happens on device (SPEC.md §§3–5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from svtyper_tpu.bamio.columns import FMUNMAP, FPAIRED
from svtyper_tpu.bamio.native import FetchFilter
from svtyper_tpu.breakpoints import Breakpoint, fetch_windows
from svtyper_tpu.oracle.engine import Z_FLANK
from svtyper_tpu.stats.library import Sample

# device-tensor dtypes are minimized to cut the host→TPU transfer
# (latency-bound tunnel): mapq fits u8, read-length-bounded fields i16
READ_FIELDS = [
    ("var", np.int32),
    ("is_rev", np.bool_),
    ("tid", np.int32),
    ("pos", np.int32),
    ("end", np.int32),
    ("mapq", np.uint8),
    # only the >= min_aligned predicate reads this → clipped to i16 range
    ("ref_aln", np.int16),
    ("has_lsoft", np.bool_),
    ("has_rsoft", np.bool_),
    ("lead", np.int32),
    ("cov_a", np.bool_),
    ("cov_b", np.bool_),
    ("has_sa", np.bool_),
    ("sa_tid", np.int32),
    ("sa_pos", np.int32),
    ("sa_end", np.int32),
    ("sa_rev", np.bool_),
    ("sa_mapq", np.uint8),
    ("sa_lead", np.int32),
    ("lib", np.int16),
]

VAR_FIELDS = [
    ("tid_a", np.int32),
    ("pos_a", np.int32),
    ("cia0", np.int32),
    ("cia1", np.int32),
    ("tid_b", np.int32),
    ("pos_b", np.int32),
    ("cib0", np.int32),
    ("cib1", np.int32),
    ("o1", np.bool_),
    ("o2", np.bool_),
    ("is_del", np.bool_),
    ("is_dup", np.bool_),
    ("is_inv", np.bool_),
    ("vlen", np.int32),
    ("force_null", np.bool_),
]


class ChunkInputs:
    """Flat arrays for one (sample × variant-chunk) device invocation.

    ``reads``/``pairs``/``variants`` are dicts of equal-length numpy
    arrays. Padding rows carry ``var == n_var`` (a trash segment dropped
    after the segment-sum).
    """

    def __init__(
        self,
        reads: Dict[str, np.ndarray],
        pairs: Dict[str, np.ndarray],
        variants: Dict[str, np.ndarray],
        n_var: int,
    ) -> None:
        self.reads = reads
        self.pairs = pairs
        self.variants = variants
        self.n_var = n_var


def _bucket(n: int, floor: int = 256) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def prepare_chunk(
    sample: Sample,
    bps: List[Optional[Breakpoint]],
    min_aligned: int = 20,
    max_reads: Optional[int] = None,
    max_ci_dist: float = 1e10,
    z: float = Z_FLANK,
    pad_reads: Optional[int] = None,
    pad_pairs: Optional[int] = None,
) -> ChunkInputs:
    """Gather + lay out one chunk of breakpoints for one sample.

    ``bps`` entries may be None (unsupported records occupying a slot for
    output alignment); they become force_null variants with no reads.
    """
    n_var = len(bps)
    name_to_tid = sample.bam.header.name_to_tid
    flank = sample.get_fetch_flank(z)

    v: Dict[str, List] = {name: [] for name, _ in VAR_FIELDS}
    regions: List[Tuple[str, int, int]] = []
    reg_var: List[int] = []
    any_multi_window = False
    for vi, bp in enumerate(bps):
        if bp is None:
            for name, _ in VAR_FIELDS:
                v[name].append(0)
            v["force_null"][-1] = True
            continue
        force_null = bp.ci_width() > max_ci_dist
        if not force_null:
            wins = fetch_windows(bp, flank)
            for win in wins:
                regions.append(win)
                reg_var.append(vi)
            if len(wins) > 1:
                any_multi_window = True
        v["tid_a"].append(name_to_tid.get(bp.chrom_a, -1))
        v["pos_a"].append(bp.pos_a)
        v["cia0"].append(bp.ci_a[0])
        v["cia1"].append(bp.ci_a[1])
        v["tid_b"].append(name_to_tid.get(bp.chrom_b, -1))
        v["pos_b"].append(bp.pos_b)
        v["cib0"].append(bp.ci_b[0])
        v["cib1"].append(bp.ci_b[1])
        v["o1"].append(bp.o1_rev)
        v["o2"].append(bp.o2_rev)
        v["is_del"].append(bp.is_del)
        v["is_dup"].append(bp.is_dup)
        v["is_inv"].append(bp.is_inv)
        v["vlen"].append(bp.var_length or 0)
        v["force_null"].append(force_null)

    variants = {
        name: np.asarray(v[name], dtype=dt).reshape(n_var)
        for name, dt in VAR_FIELDS
    }

    # ---- one batched fetch for every window of the chunk, with flag/RG
    # filtering and the §4.1 coverage predicate computed inside the
    # decode loop (bamcore FetchFilter)
    reg_var_arr = np.asarray(reg_var, dtype=np.int64)
    rg_keep, rg_to_lib = sample.fetch_filter_tables()
    filt = FetchFilter(
        drop_flags=0x100 | 0x200 | 0x400 | 0x800,
        rg_keep=rg_keep,
        rg_to_lib=rg_to_lib,
        cov_tid_a=variants["tid_a"][reg_var_arr].astype(np.int64),
        cov_pos_a=variants["pos_a"][reg_var_arr].astype(np.int64),
        cov_tid_b=variants["tid_b"][reg_var_arr].astype(np.int64),
        cov_pos_b=variants["pos_b"][reg_var_arr].astype(np.int64),
        min_aligned=min_aligned,
        want_blocks=False,
    )
    # transient: rows are repacked into padded device buffers below, so
    # the batch may alias the decoder's reusable buffers (one copy saved)
    big, rid = sample.bam.fetch_many(regions, filt=filt, transient=True)
    var_of = (
        np.asarray(reg_var, dtype=np.int32)[rid]
        if big.n
        else np.zeros(0, dtype=np.int32)
    )
    # ---- row selection (dedup + read cap) as ONE index gather, applied
    # while filling the padded device buffers — no intermediate
    # ReadBatch.take() copies of all 25 columns
    sel = None  # None = keep every row
    if big.n:
        # dedup (var, voffset) keeping first occurrence in row order —
        # only reachable when a variant has two disjoint windows AND a
        # single alignment spans both (long D/N cigars); single-window
        # variants can't produce duplicates
        if any_multi_window:
            order = np.lexsort((np.arange(big.n), big.voffset, var_of))
            vo_s = big.voffset[order]
            va_s = var_of[order]
            dup = np.concatenate(
                ([False], (vo_s[1:] == vo_s[:-1]) & (va_s[1:] == va_s[:-1]))
            )
            if dup.any():
                sel = np.sort(order[~dup])
                var_of = var_of[sel]
        # per-variant read cap → null genotype (SPEC.md §3)
        if max_reads is not None and len(var_of):
            per_var = np.bincount(var_of, minlength=n_var)
            over = per_var > max_reads
            if over.any():
                variants["force_null"] = variants["force_null"] | over[:n_var]
                keep2 = ~over[var_of]
                var_of = var_of[keep2]
                sel = (
                    np.flatnonzero(keep2)
                    if sel is None
                    else sel[keep2]
                )
    n_rows = len(var_of)

    r_pad = max(pad_reads or 0, _bucket(max(n_rows, 1)))

    def rcol(src, dt, fill=0):
        padded = np.full(r_pad, fill, dtype=dt)
        padded[:n_rows] = src if sel is None else src[sel]
        return padded

    reads = {
        "var": _pad_arr(var_of, np.int32, r_pad, n_var),
        "is_rev": rcol(big.is_reverse, np.bool_),
        "tid": rcol(big.tid, np.int32),
        "pos": rcol(big.pos, np.int32),
        "end": rcol(big.ref_end, np.int32),
        "mapq": rcol(big.mapq, np.uint8),
        "ref_aln": rcol(np.minimum(big.ref_aln_len, 0x7FFF), np.int16),
        "has_lsoft": rcol(big.left_soft > 0, np.bool_),
        "has_rsoft": rcol(big.right_soft > 0, np.bool_),
        "lead": rcol(big.lead_clip_q, np.int32),
        "cov_a": rcol(big.cov_a, np.bool_),
        "cov_b": rcol(big.cov_b, np.bool_),
        "has_sa": rcol(big.has_sa, np.bool_),
        "sa_tid": rcol(big.sa_tid, np.int32),
        "sa_pos": rcol(big.sa_pos, np.int32),
        "sa_end": rcol(big.sa_end, np.int32),
        "sa_rev": rcol(big.sa_is_reverse, np.bool_),
        "sa_mapq": rcol(big.sa_mapq, np.uint8),
        "sa_lead": rcol(big.sa_lead_clip_q, np.int32),
        "lib": rcol(np.minimum(big.lib_id, 0x7FFF), np.int16),
    }

    # ---- fragment pair table (host: integer sort + boundaries) over the
    # SELECTED rows; p_a/p_b index the padded read table
    flag = big.flag if sel is None else big.flag[sel]
    qh = big.qname_hash if sel is None else big.qname_hash[sel]
    eligible = ((flag & FPAIRED) != 0) & ((flag & FMUNMAP) == 0)
    el = np.flatnonzero(eligible)
    if len(el):
        order = el[
            np.lexsort(
                (
                    np.arange(len(el)),  # stable within equal keys
                    reads["pos"][el],
                    reads["tid"][el],
                    qh[el],
                    var_of[el],
                )
            )
        ]
        key_var = var_of[order]
        key_q = qh[order]
        new = np.concatenate(
            ([True], (key_var[1:] != key_var[:-1]) | (key_q[1:] != key_q[:-1]))
        )
        gstart = np.flatnonzero(new)
        gcount = np.diff(np.concatenate((gstart, [len(order)])))
        two = gcount == 2
        p_a = order[gstart[two]]
        p_b = order[gstart[two] + 1]
        p_var = var_of[p_a]
    else:
        p_a = p_b = np.zeros(0, dtype=np.int64)
        p_var = np.zeros(0, dtype=np.int32)

    f_pad = max(pad_pairs or 0, _bucket(max(len(p_a), 1), floor=64))
    pairs = {
        "var": _pad_arr(p_var, np.int32, f_pad, n_var),
        "a": _pad_arr(p_a, np.int32, f_pad, r_pad - 1),
        "b": _pad_arr(p_b, np.int32, f_pad, r_pad - 1),
    }
    return ChunkInputs(reads, pairs, variants, n_var)


READ_FIELDS_D = {name: dt for name, dt in READ_FIELDS}


def _pad_arr(arr: np.ndarray, dt: type, size: int, fill: int) -> np.ndarray:
    padded = np.full(size, fill, dtype=dt)
    padded[: len(arr)] = arr
    return padded
