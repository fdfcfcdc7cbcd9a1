"""Frontier regressions: the adversarial cases the round-3 sweep surfaced
(eval/frontier.py; full artifact bench_results/frontier_r03.csv)."""

import pytest

from phi_tpu.eval.frontier import (case_lowR, case_paralog, case_threshold,
                                   case_zerolen)


def test_gap_tol_scales_with_R():
    from phi_tpu.pipeline import gap_tol
    # integer R: objective values are integer-spaced, so any bound above
    # opt - 1 certifies optimality (0.01 float-noise margin)
    assert gap_tol(100.0) == 0.99
    assert gap_tol(1.0) == 0.99
    # fractional R < 1: smallest objective step is R itself
    assert gap_tol(0.5) == 0.25
    assert gap_tol(0.1) == pytest.approx(0.05)
    # fractional R >= 1: steps can be frac(R); keep the conservative 0.5
    assert gap_tol(2.5) == 0.5


@pytest.mark.parametrize("R", [0.1, 0.25, 0.5])
def test_lowR_seed2014_no_excess(R):
    """Pre-fix, these emitted one unnecessary switch (excess exactly R):
    the 0.5 tolerance certified a suboptimal path. The R-aware tolerance
    plus escalation must reach the brute-force optimum."""
    c = case_lowR(2014, R)
    assert c.certified
    assert c.excess == 0.0


def test_paralog_trap_certifies():
    c = case_paralog(1007, 32)
    assert c.certified and c.excess == 0.0


def test_zerolen_bracket_mode_certifies():
    c = case_zerolen(4001, 70)
    assert c.bracket_mode  # spans past MAX_LAYERS -> bracket fallback
    assert c.certified and c.excess == 0.0


def test_threshold_certifies():
    c = case_threshold(3011, 0.5)
    assert c.certified and c.excess == 0.0
