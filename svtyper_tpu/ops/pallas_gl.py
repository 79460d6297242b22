"""Fused Pallas TPU kernel for the genotype-likelihood stage.

One VMEM pass computes everything ``ops.gl.genotype_batch`` produces:
QR/QA truncation, log10-binomial GLs (lgamma form), best/second
genotype, SQ/GQ, nulls, and the truncated FORMAT counts — emitted as
the same packed (ints, floats) matrices the engine transfers to host.

Layout: variants ride the lane axis (arrays are [C, N] with N padded to
a multiple of 128), so every op is an 8×128 VPU vector op. The jnp path
(ops.gl) remains the parity reference — this kernel is f32 and uses
lgamma instead of the f64 table, which matches to output-format
precision for realistic depths and is used for TPU throughput runs.

Kernel guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svtyper_tpu.ops.gl import LOG_P_TABLE, LOG_Q_TABLE

LN10 = math.log(10.0)
HALF_LN_2PI = 0.5 * math.log(2.0 * math.pi)
MAX_GQ = 200.0
LOG10_TINY = -323.6
BLOCK_N = 512


def _lgamma(x):
    """ln Γ(x) for x ≥ 1, elementwise — Mosaic has no lgamma primitive,
    so: shift x up by 8 (recurrence ln Γ(x) = ln Γ(x+8) − Σ ln(x+i)) and
    apply the Stirling series, accurate to ~1e-7 relative in f32."""
    shift = 0.0
    for i in range(8):
        shift = shift + jnp.log(x + i)
    z = x + 8.0
    zi = 1.0 / z
    zi2 = zi * zi
    series = zi * (1.0 / 12.0 + zi2 * (-1.0 / 360.0 + zi2 * (1.0 / 1260.0)))
    return (z - 0.5) * jnp.log(z) - z + HALF_LN_2PI + series - shift

# int output rows must match svtyper_tpu.gt.engine.INT_FIELDS
N_INT, N_FLT = 14, 10


def _kernel(counts_ref, isdup_ref, fnull_ref, ints_ref, flts_ref,
            *, split_weight, disc_weight):
    rs = counts_ref[0, :]
    as_ = counts_ref[1, :]
    ac = counts_ref[2, :]
    rp = counts_ref[3, :]
    ap = counts_ref[4, :]
    is_dup = isdup_ref[0, :] != 0
    force_null = fnull_ref[0, :] != 0

    alt_split = as_ + ac
    total = rs + as_ + ac + rp + ap
    qr = jnp.trunc(split_weight * rs) + jnp.trunc(disc_weight * rp)
    qa = jnp.trunc(split_weight * alt_split) + jnp.trunc(disc_weight * ap)
    n = qr + qa
    k = qa

    k2 = jnp.where(2.0 * k > n, n - k, k)
    lc_valid = (k2 > 0) & (k >= 0) & (n >= k)
    safe_n = jnp.maximum(n, 0.0)
    safe_k = jnp.clip(k, 0.0, safe_n)
    lc = jnp.where(
        lc_valid,
        (
            _lgamma(safe_n + 1.0)
            - _lgamma(safe_k + 1.0)
            - _lgamma(safe_n - safe_k + 1.0)
        )
        / LN10,
        0.0,
    )

    def score_for(g):
        # lc-free per-genotype score from the SAME f64-rounded constants
        # as ops.gl's float32 branch — the python-float scalars round to
        # the identical f32 values, so GT/GQ match the XLA lowering
        # bit-for-bit (lc is constant across genotypes and cancels)
        lp = jnp.where(
            is_dup, float(LOG_P_TABLE[1][g]), float(LOG_P_TABLE[0][g])
        )
        lq = jnp.where(
            is_dup, float(LOG_Q_TABLE[1][g]), float(LOG_Q_TABLE[0][g])
        )
        return k * lp + (n - k) * lq

    s0 = score_for(0)
    s1 = score_for(1)
    s2 = score_for(2)
    gl0 = lc + s0
    gl1 = lc + s1
    gl2 = lc + s2

    # best / second with ties → lowest index
    best01 = jnp.where(s1 > s0, 1, 0)
    sb01 = jnp.maximum(s0, s1)
    best = jnp.where(s2 > sb01, 2, best01)
    s_best = jnp.maximum(sb01, s2)
    # second best: max of the two non-best entries
    s_second = jnp.where(
        best == 0,
        jnp.maximum(s1, s2),
        jnp.where(best == 1, jnp.maximum(s0, s2), jnp.maximum(s0, s1)),
    )

    m = s_best
    ssum = (
        jnp.exp((s0 - m) * LN10)
        + jnp.exp((s1 - m) * LN10)
        + jnp.exp((s2 - m) * LN10)
    )
    log_gt_sum = m + jnp.log10(ssum)
    underflow = (m + lc) < LOG10_TINY

    sq = jnp.abs(-10.0 * (s0 - log_gt_sum))
    gq = jnp.trunc(jnp.minimum(-10.0 * (s_second - s_best), MAX_GQ))
    null = force_null | (total <= 0.0) | underflow
    # AB denominator in ops.gl's exact f32 summation order
    # (((rs+rp)+alt_split)+ap) — NOT `total`, whose accumulation order
    # (rs+as+ac+rp+ap) rounds differently in the last ulp and can flip a
    # %.2g digit vs the XLA lowering at a rounding boundary.
    denom = rs + rp + alt_split + ap
    ab_valid = denom > 0.0
    ab = jnp.where(ab_valid, (alt_split + ap) / jnp.where(ab_valid, denom, 1.0), 0.0)

    i32 = lambda x: x.astype(jnp.int32)  # noqa: E731
    ints_ref[0, :] = i32(null)
    ints_ref[1, :] = jnp.where(null, -1, best).astype(jnp.int32)
    ints_ref[2, :] = i32(gq)
    ints_ref[3, :] = i32(qr)
    ints_ref[4, :] = i32(qa)
    ints_ref[5, :] = i32(jnp.trunc(rs + rp + as_ + ac + ap))
    ints_ref[6, :] = i32(jnp.trunc(rs + rp))
    ints_ref[7, :] = i32(jnp.trunc(alt_split + ap))
    ints_ref[8, :] = i32(jnp.trunc(rs))
    ints_ref[9, :] = i32(jnp.trunc(as_))
    ints_ref[10, :] = i32(jnp.trunc(ac))
    ints_ref[11, :] = i32(jnp.trunc(rp))
    ints_ref[12, :] = i32(jnp.trunc(ap))
    ints_ref[13, :] = i32(ab_valid)
    flts_ref[0, :] = gl0
    flts_ref[1, :] = gl1
    flts_ref[2, :] = gl2
    flts_ref[3, :] = sq
    flts_ref[4, :] = ab
    flts_ref[5, :] = rs
    flts_ref[6, :] = as_
    flts_ref[7, :] = ac
    flts_ref[8, :] = rp
    flts_ref[9, :] = ap


def genotype_batch_pallas(
    counts_t: jnp.ndarray,  # [5, N] float32, N % BLOCK_N == 0
    is_dup: jnp.ndarray,  # [N] bool/int
    force_null: jnp.ndarray,  # [N] bool/int
    split_weight: float = 1.0,
    disc_weight: float = 1.0,
    interpret: bool = False,
):
    """→ (ints [14, N] int32, flts [10, N] float32), transposed layout."""
    n = counts_t.shape[1]
    assert n % BLOCK_N == 0, n
    grid = (n // BLOCK_N,)
    kern = functools.partial(
        _kernel, split_weight=split_weight, disc_weight=disc_weight
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_INT, BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FLT, BLOCK_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_INT, n), jnp.int32),
            jax.ShapeDtypeStruct((N_FLT, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        counts_t.astype(jnp.float32),
        is_dup.astype(jnp.int32).reshape(1, -1),
        force_null.astype(jnp.int32).reshape(1, -1),
    )
