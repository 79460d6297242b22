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

READ_FIELDS = [
    ("var", np.int32),
    ("is_rev", np.bool_),
    ("tid", np.int32),
    ("pos", np.int32),
    ("end", np.int32),
    ("mapq", np.int32),
    ("ref_aln", np.int32),
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
    ("sa_mapq", np.int32),
    ("sa_lead", np.int32),
    ("lib", np.int32),
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
    big, rid = sample.bam.fetch_many(regions, filt=filt)
    var_of = (
        np.asarray(reg_var, dtype=np.int32)[rid]
        if big.n
        else np.zeros(0, dtype=np.int32)
    )
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
                keep_rows = np.sort(order[~dup])
                big = big.take(keep_rows)
                var_of = var_of[keep_rows]
        # per-variant read cap → null genotype (SPEC.md §3)
        if max_reads is not None and big.n:
            per_var = np.bincount(var_of, minlength=n_var)
            over = per_var > max_reads
            if over.any():
                variants["force_null"] = variants["force_null"] | over[:n_var]
                sel = np.flatnonzero(~over[var_of])
                big = big.take(sel)
                var_of = var_of[sel]

    reads = {
        "var": var_of,
        "is_rev": big.is_reverse,
        "tid": big.tid,
        "pos": big.pos,
        "end": big.ref_end,
        "mapq": big.mapq.astype(np.int32),
        "ref_aln": big.ref_aln_len,
        "has_lsoft": big.left_soft > 0,
        "has_rsoft": big.right_soft > 0,
        "lead": big.lead_clip_q,
        "cov_a": big.cov_a,
        "cov_b": big.cov_b,
        "has_sa": big.has_sa,
        "sa_tid": big.sa_tid,
        "sa_pos": big.sa_pos,
        "sa_end": big.sa_end,
        "sa_rev": big.sa_is_reverse,
        "sa_mapq": big.sa_mapq.astype(np.int32),
        "sa_lead": big.sa_lead_clip_q,
        "lib": big.lib_id,
    }

    # ---- fragment pair table (host: integer sort + boundaries)
    eligible = ((big.flag & FPAIRED) != 0) & ((big.flag & FMUNMAP) == 0)
    el = np.flatnonzero(eligible)
    if len(el):
        order = el[
            np.lexsort(
                (
                    np.arange(len(el)),  # stable within equal keys
                    big.pos[el],
                    big.tid[el],
                    big.qname_hash[el],
                    var_of[el],
                )
            )
        ]
        key_var = var_of[order]
        key_q = big.qname_hash[order]
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

    pairs = {
        "var": p_var.astype(np.int32),
        "a": p_a.astype(np.int32),
        "b": p_b.astype(np.int32),
    }

    # ---- pad to buckets; trash segment = n_var
    r_pad = max(pad_reads or 0, _bucket(max(big.n, 1)))
    f_pad = max(pad_pairs or 0, _bucket(max(len(p_a), 1), floor=64))
    reads = _pad(reads, READ_FIELDS_D, r_pad, {"var": n_var})
    pairs = _pad(
        pairs,
        {"var": np.int32, "a": np.int32, "b": np.int32},
        f_pad,
        {"var": n_var, "a": r_pad - 1, "b": r_pad - 1},
    )
    return ChunkInputs(reads, pairs, variants, n_var)


READ_FIELDS_D = {name: dt for name, dt in READ_FIELDS}


def _pad(
    d: Dict[str, np.ndarray],
    dtypes: Dict[str, type],
    size: int,
    fill: Dict[str, int],
) -> Dict[str, np.ndarray]:
    out = {}
    for k, arr in d.items():
        dt = dtypes[k]
        cur = np.asarray(arr, dtype=dt)
        if len(cur) > size:
            raise ValueError("pad size %d < data %d" % (size, len(cur)))
        pad_val = fill.get(k, 0)
        padded = np.full(size, pad_val, dtype=dt)
        padded[: len(cur)] = cur
        out[k] = padded
    return out
