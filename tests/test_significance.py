"""Paired significance tests (eval/significance.py).

The reference papers report significance of metric deltas between systems
on shared topic sets; these tests validate the randomization test against
exact enumeration and known distributions, and the no-scipy t CDF against
reference values.
"""

import math

import numpy as np
import pytest

from sert_tpu.eval.significance import (compare_runs, paired_diffs,
                                        paired_t_test, randomization_test)


class TestRandomization:
    def test_null_is_uniformish(self):
        """Symmetric zero-mean diffs: p should be large."""
        rng = np.random.default_rng(0)
        d = rng.normal(0, 1, size=12)
        d = d - d.mean()  # force observed mean ~0
        assert randomization_test(d) > 0.9

    def test_strong_effect_small_p(self):
        d = np.full(15, 0.1) + np.random.default_rng(1).normal(0, 0.01, 15)
        p = randomization_test(d)
        assert p <= 2 ** -14  # all same sign: only the 2 extreme assignments

    def test_exact_enumeration_tiny(self):
        # n=3, diffs [1, 1, 1]: means over 8 sign patterns:
        # |1|, three |1/3|, three |-1/3|, |-1| -> >= 1 in abs: 2 of 8
        assert randomization_test(np.array([1.0, 1.0, 1.0])) == pytest.approx(2 / 8)

    def test_monte_carlo_matches_exact(self):
        rng = np.random.default_rng(2)
        d = rng.normal(0.3, 1.0, size=18)
        exact = randomization_test(d, exact_limit=20)
        mc = randomization_test(d, exact_limit=1, n_samples=200_000, seed=3)
        assert abs(exact - mc) < 0.02

    def test_empty_and_zero(self):
        assert randomization_test(np.array([])) == 1.0
        assert randomization_test(np.zeros(5)) == 1.0


class TestTTest:
    @pytest.mark.parametrize("n,t_val,want", [
        # reference two-sided p-values for Student t (df = n-1)
        (10, 2.262, 0.05), (10, 3.250, 0.01), (30, 2.045, 0.05),
    ])
    def test_matches_critical_values(self, n, t_val, want):
        # construct diffs with exactly the target t statistic
        rng = np.random.default_rng(4)
        d = rng.normal(0, 1, size=n)
        d = (d - d.mean()) / d.std(ddof=1)     # mean 0, sd 1
        d = d + t_val / math.sqrt(n)           # t = mean/(sd/sqrt(n)) = t_val
        assert paired_t_test(d) == pytest.approx(want, abs=2e-3)

    def test_degenerate(self):
        assert paired_t_test(np.array([0.5])) == 1.0
        assert paired_t_test(np.zeros(8)) == 1.0
        assert paired_t_test(np.full(8, 0.3)) == 0.0


class TestCompareRuns:
    def test_report_shape_and_pairing(self):
        a = {"q1": {"map": 0.9}, "q2": {"map": 0.8}, "q3": {"map": 0.7},
             "all": {"map": 0.8}}
        b = {"q1": {"map": 0.5}, "q2": {"map": 0.4}, "qX": {"map": 0.1},
             "all": {"map": 0.33}}
        rep = compare_runs(a, b, ["map"], n_samples=2000)
        assert rep["map"]["topics"] == 2          # q1, q2 shared; 'all' excluded
        assert rep["map"]["delta"] == pytest.approx(0.4)
        assert 0.0 < rep["map"]["p_randomization"] <= 1.0

    def test_paired_diffs_excludes_all(self):
        a = {"q1": {"m": 1.0}, "all": {"m": 1.0}}
        b = {"q1": {"m": 0.0}, "all": {"m": 0.0}}
        diffs, shared = paired_diffs(a, b, "m")
        assert shared == ["q1"] and diffs.tolist() == [1.0]


class TestCLI:
    def test_evaluate_compare(self, tmp_path, capsys):
        import json
        from sert_tpu.cli import main as cli_main
        qrels = tmp_path / "qrels"
        qrels.write_text("".join(f"q{i} 0 good 1\n" for i in range(8)))
        run_a = tmp_path / "a.trec"
        run_a.write_text("".join(
            f"q{i} Q0 good 1 2.0 a\nq{i} Q0 bad 2 1.0 a\n" for i in range(8)))
        run_b = tmp_path / "b.trec"
        run_b.write_text("".join(
            f"q{i} Q0 bad 1 2.0 b\nq{i} Q0 good 2 1.0 b\n" for i in range(8)))
        assert cli_main(["evaluate", "--run", str(run_a), "--qrels",
                         str(qrels), "--compare", str(run_b),
                         "--measures", "recip_rank"]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["recip_rank"]["topics"] == 8
        assert rep["recip_rank"]["delta"] == pytest.approx(0.5)
        # a beats b on every topic: exact p = 2/2^8
        assert rep["recip_rank"]["p_randomization"] == pytest.approx(2 / 256)
