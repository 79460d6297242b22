"""Statistics parity tests (svtyper_tpu/statistics.py, SPEC.md §7)."""

import math

import pytest

from svtyper_tpu.statistics import (
    mad,
    mean,
    median,
    stdev,
    upper_mad,
    variance,
    weighted_mean_std,
)
from svtyper_tpu.utils.formatting import (
    fmt_g2,
    fmt_gl,
    log10_sum_exp10,
    trunc_int,
)


def test_moments():
    xs = [1, 2, 3, 4]
    assert mean(xs) == 2.5
    assert variance(xs) == 1.25
    assert stdev(xs) == math.sqrt(1.25)


def test_median_odd_even():
    assert median([3, 1, 2]) == 2
    assert median([4, 1, 3, 2]) == 2.5


def test_mad():
    assert mad([1, 1, 2, 2, 4, 6, 9]) == 1


def test_upper_mad():
    # median = 2; upper values 2,2,4,6,9 → deviations 0,0,2,4,7 → median 2
    assert upper_mad([1, 1, 2, 2, 4, 6, 9]) == 2


def test_weighted_mean_std_matches_expanded():
    pairs = [(300, 5), (310, 3), (500, 2)]
    expanded = [300] * 5 + [310] * 3 + [500] * 2
    m, s = weighted_mean_std(pairs)
    assert m == pytest.approx(mean(expanded))
    assert s == pytest.approx(stdev(expanded))


def test_empty_raises():
    for fn in (mean, median):
        with pytest.raises(ValueError):
            fn([])
    with pytest.raises(ValueError):
        weighted_mean_std([])


def test_trunc_int_toward_zero():
    assert trunc_int(2.9) == 2
    assert trunc_int(-2.9) == -2  # ref_span can go negative (SPEC.md §4.3)
    assert trunc_int(0.0) == 0


def test_fmt_gl():
    assert fmt_gl([-0.5, -1.49, -200.0]) == "-0,-1,-200"


def test_fmt_g2():
    assert fmt_g2(0.333333) == "0.33"
    assert fmt_g2(1.0) == "1"
    assert fmt_g2(0.0001234) == "0.00012"


def test_log10_sum_exp10():
    vals = [-10.0, -1.0, -20.0]
    direct = math.log10(sum(10.0**v for v in vals))
    assert log10_sum_exp10(vals) == pytest.approx(direct, abs=1e-12)
    assert log10_sum_exp10([-1000.0, -1001.0]) == pytest.approx(
        -1000.0 + math.log10(1 + 0.1), abs=1e-12
    )
