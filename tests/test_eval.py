"""Metric tests vs hand-computed tables (SURVEY.md section 5, test item 1)."""

import math

import pytest

from sert_tpu.eval import metrics
from sert_tpu.eval import trec


RELS = {"a": 2, "b": 1, "c": 0, "d": 1}   # relevant: a(2), b(1), d(1)


class TestMetricsHandWorked:
    def test_ndcg_at_5(self):
        # ranking: c, a, b, d
        ranking = ["c", "a", "b", "d"]
        dcg = 2 / math.log2(3) + 1 / math.log2(4) + 1 / math.log2(5)
        idcg = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert metrics.ndcg_at_k(ranking, RELS, 5) == pytest.approx(dcg / idcg)

    def test_ndcg_cutoff(self):
        ranking = ["c", "a", "b", "d"]
        dcg = 2 / math.log2(3)  # only first 2 positions counted
        idcg = 2 / math.log2(2) + 1 / math.log2(3)
        assert metrics.ndcg_at_k(ranking, RELS, 2) == pytest.approx(dcg / idcg)

    def test_ndcg_perfect_is_one(self):
        assert metrics.ndcg_at_k(["a", "b", "d", "c"], RELS, 10) == pytest.approx(1.0)

    def test_ndcg_no_relevant(self):
        assert metrics.ndcg_at_k(["x"], {"x": 0}, 10) == 0.0

    def test_map(self):
        # ranking c,a,b,d: precisions at hits = 1/2, 2/3, 3/4; /3 relevant
        want = (1 / 2 + 2 / 3 + 3 / 4) / 3
        assert metrics.average_precision(["c", "a", "b", "d"], RELS) == pytest.approx(want)

    def test_mrr(self):
        assert metrics.reciprocal_rank(["c", "a"], RELS) == pytest.approx(0.5)
        assert metrics.reciprocal_rank(["c", "x"], RELS) == 0.0

    def test_p_and_recall(self):
        ranking = ["c", "a", "b", "d"]
        assert metrics.precision_at_k(ranking, RELS, 2) == pytest.approx(0.5)
        assert metrics.recall_at_k(ranking, RELS, 2) == pytest.approx(1 / 3)
        assert metrics.recall_at_k(ranking, RELS, 4) == pytest.approx(1.0)

    def test_tie_break_docno_desc(self):
        # equal scores -> docno descending, trec_eval convention
        ranked = metrics.rank_run_entries([("a", 1.0), ("b", 1.0), ("c", 2.0)])
        assert ranked == ["c", "b", "a"]

    def test_evaluate_run_macro_average(self):
        run = {"q1": [("a", 3.0), ("b", 2.0)], "q2": [("x", 1.0)]}
        qrels = {"q1": {"a": 1}, "q2": {"y": 1}}
        res = metrics.evaluate_run(run, qrels, measures=("map", "recip_rank"))
        assert res["q1"]["map"] == pytest.approx(1.0)
        assert res["q2"]["map"] == 0.0
        assert res["all"]["map"] == pytest.approx(0.5)

    def test_judged_only(self):
        # unjudged doc 'x' outranks the judged relevant 'a'
        run = {"q1": [("x", 9.0), ("a", 1.0)]}
        qrels = {"q1": {"a": 1, "b": 0}}
        full = metrics.evaluate_run(run, qrels, measures=("recip_rank",))
        judged = metrics.evaluate_run(run, qrels, measures=("recip_rank",),
                                      judged_only=True)
        assert full["q1"]["recip_rank"] == pytest.approx(0.5)
        assert judged["q1"]["recip_rank"] == pytest.approx(1.0)

    def test_missing_topic_counts_zero(self):
        res = metrics.evaluate_run({}, {"q1": {"a": 1}}, measures=("map",))
        assert res["q1"]["map"] == 0.0
        assert res["all"]["map"] == 0.0

    def test_unknown_measure(self):
        with pytest.raises(ValueError):
            metrics.evaluate_topic([], {}, measures=("bogus",))


class TestTrecIO:
    def test_run_roundtrip_and_format(self, tmp_path):
        run = {"q2": [("d1", 0.5), ("d2", 1.5)], "q1": [("d3", 9.0)]}
        p = str(tmp_path / "run.txt")
        trec.write_run(run, p, tag="test")
        lines = open(p).read().splitlines()
        assert lines[0].split() == ["q1", "Q0", "d3", "1", "9", "test"]
        assert lines[1].split()[2] == "d2"   # q2 sorted by score desc
        back = trec.read_run(p)
        assert back["q2"][0] == ("d2", 1.5)

    def test_run_roundtrip_preserves_sub_1e6_gaps(self, tmp_path):
        """Scores are written at repr precision: gaps below 1e-6
        (normalized fusions, large-E log-probs) must survive the file
        round trip instead of collapsing into docno-ordered ties."""
        a, b = 0.5, 0.5 + 1e-9
        run = {"q1": [("zzz", b), ("aaa", a)]}
        p = str(tmp_path / "run.txt")
        trec.write_run(run, p)
        back = trec.read_run(p)
        assert back["q1"][0] == ("zzz", b)
        assert back["q1"][1] == ("aaa", a)

    def test_qrels_roundtrip(self, tmp_path):
        qrels = {"q1": {"a": 2, "b": 0}, "q2": {"c": 1}}
        p = str(tmp_path / "qrels.txt")
        trec.write_qrels(qrels, p)
        assert trec.read_qrels(p) == qrels

    def test_topics_sgml(self, tmp_path):
        p = str(tmp_path / "topics.sgml")
        with open(p, "w") as fh:
            fh.write("""<top>\n<num> Number: EX-01\n<title> expert search topic\n<desc> ignored </desc>\n</top>\n<top><num>EX-02</num><title>another one</title></top>""")
        topics = trec.read_topics(p)
        assert topics == {"EX-01": "expert search topic",
                          "EX-02": "another one"}

    def test_topics_tsv(self, tmp_path):
        p = str(tmp_path / "topics.tsv")
        trec.write_topics({"t1": "hello world", "t2": "foo"}, p)
        assert trec.read_topics(p) == {"t1": "hello world", "t2": "foo"}
