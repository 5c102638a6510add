"""Verdict logic of tools/parity_5k.py's seed-distribution comparison.

Guards the ADVICE-r2 fix: an underpowered test must NOT pass automatically;
'pass' needs a certified non-inferiority bound, 'no_detectable_bias' needs the
point estimate under torch's own seed noise.
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_5k import _metric_verdict


def _noisy(mean, rel_std, n, seed):
    rng = np.random.default_rng(seed)
    return list(mean * (1 + rel_std * rng.standard_normal(n)))


def test_clearly_better_passes():
    t = _noisy(1.0, 0.02, 12, 0)
    j = _noisy(0.90, 0.02, 12, 1)  # 10% better, tight
    v = _metric_verdict(t, j)
    assert v["verdict"] == "pass"
    assert v["adverse_bound_95"] < 0.01


def test_equal_distributions_is_no_bias_not_pass():
    # identical means, 5% noise, n=10: cannot certify 1%, must NOT claim pass
    t = _noisy(1.0, 0.05, 10, 2)
    j = _noisy(1.0, 0.05, 10, 3)
    v = _metric_verdict(t, j)
    assert v["verdict"] == "no_detectable_bias"
    assert v["adverse_bound_95"] > 0.01  # the honest reason it is not "pass"
    assert v["runs_per_side_for_1pct_certificate"] > 50


def test_adverse_bias_detected():
    t = _noisy(1.0, 0.03, 12, 4)
    j = _noisy(1.15, 0.03, 12, 5)  # 15% worse
    v = _metric_verdict(t, j)
    assert v["verdict"] == "bias_detected"


def test_higher_is_better_direction_flips():
    # jax perplexity 15% LOWER (worse) must be adverse when lower_is_better=False
    t = _noisy(20.0, 0.03, 12, 6)
    j = _noisy(17.0, 0.03, 12, 7)
    v = _metric_verdict(t, j, lower_is_better=False)
    assert v["verdict"] == "bias_detected"
    # and 15% HIGHER perplexity (better) passes
    v2 = _metric_verdict(t, _noisy(23.0, 0.03, 12, 8), lower_is_better=False)
    assert v2["verdict"] == "pass"


def test_underpowered_large_deviation_is_not_no_bias():
    # point estimate 8% off with huge noise: CI contains 0 but |dev| exceeds
    # torch's own seed noise -> must not be blessed as no_detectable_bias
    t = _noisy(1.0, 0.04, 4, 9)
    j = [x * 1.08 for x in _noisy(1.0, 0.25, 4, 10)]
    v = _metric_verdict(t, j)
    if v["ci95_rel_diff"][0] <= 0 <= v["ci95_rel_diff"][1]:
        assert v["verdict"] == "bias_detected" or abs(v["rel_diff_of_means"]) < v["torch_rel_std"]
