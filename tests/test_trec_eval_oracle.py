"""Oracle cross-check vs real trec_eval — SKIPS offline.

This environment ships neither pytrec_eval nor a trec_eval binary
(SURVEY.md section 4.4), so the check cannot run here; the native metrics
are instead validated against hand-worked tables (tests/test_eval.py).
The moment either oracle is reachable this test activates automatically
and diffs tie-breaking / unjudged-document conventions on an adversarial
fixture (round-1 VERDICT, missing item 5). The same harness is runnable
standalone: ``python tools/trec_eval_crosscheck.py``.
"""

import importlib.util
import shutil

import pytest

_HAVE_ORACLE = (importlib.util.find_spec("pytrec_eval") is not None
                or shutil.which("trec_eval") is not None)


@pytest.mark.skipif(not _HAVE_ORACLE,
                    reason="no pytrec_eval / trec_eval oracle available "
                           "offline; run tools/trec_eval_crosscheck.py when "
                           "one is reachable")
def test_native_metrics_match_trec_eval():
    from tools.trec_eval_crosscheck import (adversarial_fixture, diff,
                                            eval_native, eval_pytrec)
    run, qrels = adversarial_fixture()
    native = eval_native(run, qrels)
    try:
        oracle = eval_pytrec(run, qrels)
    except ImportError:
        import shutil as _sh
        from tools.trec_eval_crosscheck import eval_binary
        oracle = eval_binary(run, qrels, _sh.which("trec_eval"))
    assert diff(native, oracle) == []


def test_fixture_is_adversarial():
    """The fixture itself must exercise the divergence-prone cases even
    when no oracle is present (guards against fixture rot)."""
    from tools.trec_eval_crosscheck import adversarial_fixture, eval_native
    run, qrels = adversarial_fixture()
    scores_q1 = [s for _, s in run["q1"]]
    assert len(scores_q1) != len(set(scores_q1))          # exact ties
    judged = set(qrels["q2"])
    assert any(d not in judged for d, _ in run["q2"])     # unjudged docs
    assert all(g == 0 for g in qrels["q3"].values())      # nothing relevant
    assert "q4" not in run                                # missing topic
    assert max(qrels["q1"].values()) > 1                  # graded rels
    res = eval_native(run, qrels)
    assert "q1" in res and 0 < res["q1"]["ndcg@100"] < 1
