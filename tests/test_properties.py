"""Property tests (SURVEY.md §4 item 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from svtyper_tpu.evidence.device import classify
from svtyper_tpu.models.bayes import bayes_gt, genotype_from_counts
from svtyper_tpu.ops.gl import genotype_batch, log_choose_table
from svtyper_tpu.parallel.synth import make_synthetic_chunk


def _run_classify(chunk, dens, perm=None, pair_perm=None):
    reads = {k: np.array(v) for k, v in chunk.reads.items()}
    pairs = {k: np.array(v) for k, v in chunk.pairs.items()}
    if perm is not None:
        reads = {k: v[perm] for k, v in reads.items()}
    if pair_perm is not None:
        # pairs are self-contained rows — permutable independently
        pairs = {k: v[pair_perm] for k, v in pairs.items()}
    return np.asarray(
        classify(
            {k: jnp.asarray(v) for k, v in reads.items()},
            {k: jnp.asarray(v) for k, v in pairs.items()},
            {k: jnp.asarray(v) for k, v in chunk.variants.items()},
            jnp.asarray(dens, dtype=jnp.float64),
            chunk.n_var,
            20,
            dtype=jnp.float64,
        )
    )


def test_counts_invariant_under_read_order():
    chunk, dens = make_synthetic_chunk(n_var=6, frags_per_var=5)
    base = _run_classify(chunk, dens)
    rng = np.random.default_rng(0)
    n = len(chunk.reads["var"])
    n_pair = len(chunk.pairs["var"])
    for seed in range(3):
        perm = rng.permutation(n)
        pair_perm = rng.permutation(n_pair)
        shuffled = _run_classify(chunk, dens, perm, pair_perm)
        np.testing.assert_allclose(shuffled, base, rtol=0, atol=1e-9)


def test_gl_argmax_stable_under_count_scaling():
    lcf = jnp.asarray(log_choose_table(1 << 12, use_f64=True))
    counts = np.array([[30.0, 10.0, 2.0, 20.0, 8.0]])
    base = genotype_batch(
        jnp.asarray(counts), jnp.zeros(1, bool), jnp.zeros(1, bool), lcf
    )
    for s in (2.0, 5.0, 10.0):
        out = genotype_batch(
            jnp.asarray(counts * s), jnp.zeros(1, bool), jnp.zeros(1, bool), lcf
        )
        assert int(out["gt_idx"][0]) == int(base["gt_idx"][0])


def test_scalar_vs_batch_gl_agreement():
    rng = np.random.default_rng(1)
    counts = rng.gamma(2.0, 8.0, size=(64, 5))
    is_dup = rng.random(64) < 0.5
    lcf = jnp.asarray(log_choose_table(1 << 12, use_f64=True))
    out = genotype_batch(
        jnp.asarray(counts), jnp.asarray(is_dup), jnp.zeros(64, bool), lcf
    )
    for i in range(64):
        r = genotype_from_counts(*counts[i], is_dup=bool(is_dup[i]))
        if r.null:
            assert bool(out["null"][i])
            continue
        assert int(out["gt_idx"][i]) == r.gt_idx, i
        np.testing.assert_allclose(np.asarray(out["gl"][i]), r.gl, atol=1e-9)
        assert int(out["gq"][i]) == r.gq
        np.testing.assert_allclose(float(out["sq"][i]), r.sq, atol=1e-9)


def test_bayes_gt_likelihood_normalization():
    # sum over k of 10**GL_g = 1 for each genotype column (binomial pmf)
    for is_dup in (False, True):
        for g in range(3):
            n = 40
            total = sum(
                10 ** bayes_gt(n - k, k, is_dup)[g] for k in range(n + 1)
            )
            assert total == pytest.approx(1.0, rel=1e-9)
