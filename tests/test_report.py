"""Ranker comparison report (the papers' headline-table workflow)."""

import json
import os

import pytest

from sert_tpu.eval.report import format_markdown, ranker_report


def _mk_runs(n_topics=12):
    """model ranks the relevant entity first on every topic; lm only on
    half — a visible, significant delta."""
    model, lm = {}, {}
    for i in range(n_topics):
        qid = f"q{i}"
        rel, other = f"e{i}", f"x{i}"
        model[qid] = [(rel, 2.0), (other, 1.0)]
        lm[qid] = ([(rel, 2.0), (other, 1.0)] if i % 2 == 0
                   else [(other, 2.0), (rel, 1.0)])
    qrels = {f"q{i}": {f"e{i}": 1} for i in range(n_topics)}
    return {"model": model, "lm": lm}, qrels


class TestRankerReport:
    def test_deltas_and_significance(self):
        runs, qrels = _mk_runs()
        rep = ranker_report(runs, qrels, measures=("recip_rank",),
                            n_samples=5000)
        assert rep["baseline"] == "lm"
        assert "vs_baseline" not in rep["rankers"]["lm"]
        vs = rep["rankers"]["model"]["vs_baseline"]["recip_rank"]
        # model: MRR 1.0; lm: (1.0 + 0.5)/2 = 0.75
        assert rep["rankers"]["model"]["all"]["recip_rank"] == 1.0
        assert rep["rankers"]["lm"]["all"]["recip_rank"] == 0.75
        assert vs["delta"] == pytest.approx(0.25)
        assert vs["p_randomization"] < 0.05

    def test_markdown_marks_significance(self):
        runs, qrels = _mk_runs()
        rep = ranker_report(runs, qrels, measures=("recip_rank",),
                            n_samples=5000)
        md = format_markdown(rep, title="t")
        assert "### t" in md and "| lm (baseline) |" in md
        # the model row carries the dagger, the baseline row does not
        model_row = next(l for l in md.splitlines()
                         if l.startswith("| model"))
        assert "†" in model_row
        lm_row = next(l for l in md.splitlines() if l.startswith("| lm"))
        assert "†" not in lm_row

    def test_report_is_json_serializable(self):
        runs, qrels = _mk_runs()
        rep = ranker_report(runs, qrels, measures=("recip_rank", "map"),
                            n_samples=1000)
        json.dumps(rep)


class TestReportCLI:
    def test_lm_only_report(self, tmp_path):
        """report without --run-dir: lm-only table through the real CLI."""
        from sert_tpu import cli, pipeline, recipes
        from sert_tpu.eval.trec import write_qrels, write_topics
        recipe = recipes.RECIPES["w3c_expert_finding"]()
        col = recipes.tiny_spec().build()
        data = str(tmp_path / "data")
        pipeline.prepare_collection(col, data, recipe)
        topics_path = str(tmp_path / "topics.tsv")
        qrels_path = str(tmp_path / "qrels.trec")
        write_topics(col.topics, topics_path)
        write_qrels(col.qrels, qrels_path)
        out = str(tmp_path / "report.md")
        rc = cli.main(["report", "--recipe", recipe.name, "--data", data,
                       "--topics", topics_path, "--qrels", qrels_path,
                       "--out", out])
        assert rc == 0
        text = open(out).read()
        assert "| lm (baseline) |" in text
        assert "| model |" not in text   # nothing trained

        # out-of-range interpolation weight is a clean error, not a
        # silently negative-weighted table
        with pytest.raises(SystemExit, match="fuse-weight"):
            cli.main(["report", "--recipe", recipe.name, "--data", data,
                      "--topics", topics_path, "--qrels", qrels_path,
                      "--fuse-weight", "1.5"])
