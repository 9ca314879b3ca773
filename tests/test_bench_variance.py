"""tools/bench_variance.py classification logic: the rule that decides
whether a round-over-round bench delta was machine noise or a real,
still-present elevation (no Spark needed)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from bench_variance import classify  # noqa: E402


def test_fresh_median_back_at_r5_level_is_noise():
    # r6 spiked 40% but the fresh median sits on r5 → the spike was noise
    assert classify(earlier=1.0, later=1.4, med=1.02, spread=0.1) == "noise"


def test_fresh_median_below_r5_is_noise():
    assert classify(earlier=1.0, later=1.2, med=0.8, spread=0.3) == "noise"


def test_elevation_reproduced_beyond_spread_is_persistent():
    # fresh median reproduces the r6 level and r5 is far outside the
    # spread window → something real changed and is still present
    assert classify(earlier=2.0, later=2.4, med=2.43, spread=0.2) == "persistent"


def test_r5_inside_spread_window_is_noise_even_if_median_higher():
    # the fresh samples straddle the r5 level → cannot claim regression
    assert classify(earlier=1.0, later=1.3, med=1.15, spread=0.5) == "noise"


def test_mild_elevation_under_20pct_without_r6_match_is_noise():
    assert classify(earlier=1.0, later=1.5, med=1.18, spread=0.05) == "noise"
