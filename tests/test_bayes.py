"""Scalar Bayesian model parity checks (SPEC.md §5)."""

import math

import pytest

from svtyper_tpu.models import (
    ALT_PROBS,
    ALT_PROBS_DUP,
    bayes_gt,
    genotype_from_counts,
    log_choose,
)


def test_log_choose_matches_lgamma():
    for n, k in [(0, 0), (1, 0), (10, 3), (100, 50), (500, 499), (2000, 37)]:
        expect = (
            math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
        ) / math.log(10)
        assert log_choose(n, k) == pytest.approx(expect, abs=1e-9)


def test_bayes_gt_hand_computed():
    # ref=10, alt=0, non-DUP: GL[0] = 10*log10(0.999)
    gl = bayes_gt(10, 0, False)
    assert gl[0] == pytest.approx(10 * math.log10(1 - 1e-3), abs=1e-12)
    assert gl[1] == pytest.approx(10 * math.log10(0.5), abs=1e-12)
    assert gl[2] == pytest.approx(10 * math.log10(0.1), abs=1e-12)
    # ref=5, alt=5: binomial coefficient enters all three equally
    gl = bayes_gt(5, 5, False)
    lc = log_choose(10, 5)
    assert gl[1] == pytest.approx(lc + 10 * math.log10(0.5), abs=1e-12)


def test_dup_priors_differ():
    gl = bayes_gt(10, 10, True)
    gln = bayes_gt(10, 10, False)
    assert gl != gln
    assert ALT_PROBS_DUP[2] == pytest.approx(1 / 3)
    assert ALT_PROBS[2] == 0.9


def test_genotype_calls():
    hom_ref = genotype_from_counts(30, 0, 0, 20, 0, is_dup=False)
    assert hom_ref.gt_string == "0/0" and not hom_ref.null
    het = genotype_from_counts(15, 8, 2, 10, 8, is_dup=False)
    assert het.gt_string == "0/1"
    hom_alt = genotype_from_counts(0.4, 20, 5, 0, 15, is_dup=False)
    assert hom_alt.gt_string == "1/1"


def test_null_on_zero_evidence():
    r = genotype_from_counts(0, 0, 0, 0, 0, is_dup=False)
    assert r.null and r.gt_string == "./."
    assert r.gl is None


def test_weights_truncate_before_gl():
    # split_weight scales ref_seq/alt before int truncation (SPEC.md §5)
    r = genotype_from_counts(3.9, 1.9, 0, 0, 0, False, split_weight=1.0)
    assert (r.qr, r.qa) == (3, 1)
    r2 = genotype_from_counts(3.9, 1.9, 0, 0, 0, False, split_weight=2.0)
    assert (r2.qr, r2.qa) == (7, 3)


def test_gq_capped_at_200():
    r = genotype_from_counts(500, 0, 0, 500, 0, is_dup=False)
    assert r.gq == 200


def test_sq_uses_homref_likelihood():
    r = genotype_from_counts(0, 30, 0, 0, 0, is_dup=False)
    gl = bayes_gt(0, 30, False)
    gt_sum_log = math.log10(sum(10**g for g in gl))
    assert r.sq == pytest.approx(abs(-10 * (gl[0] - gt_sum_log)), abs=1e-9)


def test_ab():
    r = genotype_from_counts(10, 5, 3, 2, 4, is_dup=False)
    assert r.ab == pytest.approx((5 + 3 + 4) / (10 + 5 + 3 + 2 + 4))
