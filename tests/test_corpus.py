"""Corpus parser + expert association tests (SURVEY 3.1 parsers row) and the
full TREC expert-finding CLI prepare path on fixture files."""

import gzip
import json
import os

import numpy as np
import pytest

from sert_tpu.data import corpus


W3C_SGML = """
<DOC>
<DOCNO> lists-001 </DOCNO>
<SUBJECT>schema question</SUBJECT>
From: Ada Lovelace <ada@w3.example.org>
The validator rejects the schema namespace binding.
</DOC>
<DOC>
<DOCNO>lists-002</DOCNO>
Grace Hopper wrote: compilers handle the grammar tables.
</DOC>
<DOC><DOCNO>lists-003</DOCNO>No candidate mentions here at all.</DOC>
"""


@pytest.fixture
def trec_file(tmp_path):
    p = tmp_path / "part1.sgml"
    p.write_text(W3C_SGML)
    return str(p)


@pytest.fixture
def candidates_file(tmp_path):
    p = tmp_path / "candidates.tsv"
    p.write_text("cand-ada\tAda Lovelace\tada@w3.example.org\n"
                 "cand-grace\tGrace Hopper\tgrace@w3.example.org\n")
    return str(p)


class TestTrecParsing:
    def test_iter_docs(self, trec_file):
        docs = dict(corpus.iter_trec_docs([trec_file]))
        assert set(docs) == {"lists-001", "lists-002", "lists-003"}
        assert "validator" in docs["lists-001"]
        assert "<SUBJECT>" not in docs["lists-001"]  # tags stripped

    def test_gzip(self, tmp_path):
        p = tmp_path / "part.sgml.gz"
        with gzip.open(p, "wt") as fh:
            fh.write(W3C_SGML)
        docs = dict(corpus.iter_trec_docs([str(p)]))
        assert len(docs) == 3

    def test_collection_files(self, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "a.sgml").write_text("")
        (tmp_path / "sub" / "b.trectext").write_text("")
        (tmp_path / "skip.bin").write_text("")
        files = corpus.trec_collection_files(str(tmp_path))
        assert [os.path.basename(f) for f in files] == ["a.sgml", "b.trectext"]


class TestExpertAssociations:
    def test_mention_matching(self, trec_file, candidates_file):
        docs = dict(corpus.iter_trec_docs([trec_file]))
        registry, mentions = corpus.load_candidates(candidates_file)
        assert len(registry) == 2
        assoc = corpus.build_expert_associations(docs.items(), mentions,
                                                 registry)
        assert assoc.entities_for("lists-001") == [registry.id("cand-ada")]
        assert assoc.entities_for("lists-002") == [registry.id("cand-grace")]
        assert assoc.entities_for("lists-003") == []

    def test_email_match_case_insensitive(self, candidates_file):
        registry, mentions = corpus.load_candidates(candidates_file)
        docs = [("d1", "reply to ADA@W3.EXAMPLE.ORG please")]
        assoc = corpus.build_expert_associations(docs, mentions, registry)
        assert assoc.entities_for("d1") == [registry.id("cand-ada")]


class TestAmazonParsing:
    def test_reviews_and_collection(self, tmp_path):
        p = tmp_path / "reviews.json"
        rows = [
            {"asin": "B001", "summary": "great strings",
             "reviewText": "bright tone for my guitar"},
            {"asin": "B002", "reviewText": "sturdy drum sticks"},
            {"asin": "B001", "reviewText": "lasted a year"},
            {"no_asin": True},
            "not json at all",
        ]
        with open(p, "w") as fh:
            for r in rows:
                fh.write((json.dumps(r) if isinstance(r, dict) else r) + "\n")
        docs, assoc, registry = corpus.build_product_collection([str(p)])
        assert len(registry) == 2
        assert len(docs) == 3
        counts = assoc.entity_instance_counts(2)
        assert counts[registry.id("B001")] == 2


class TestCliTrecPrepare:
    def test_end_to_end(self, tmp_path, trec_file, candidates_file):
        from sert_tpu.cli import main
        from sert_tpu.data.instances import InstanceDataset
        recipe = tmp_path / "r.json"
        from sert_tpu.recipes import tiny_recipe
        from sert_tpu.utils.config import save_config
        import dataclasses
        r = tiny_recipe("loglinear")
        r = dataclasses.replace(
            r, data=dataclasses.replace(r.data, window_size=3))
        save_config(r, str(recipe))
        out = str(tmp_path / "data")
        rc = main(["prepare", "--recipe", str(recipe), "--out", out,
                   "--trec-docs", trec_file, "--candidates", candidates_file])
        assert rc == 0
        ds = InstanceDataset(out)
        assert ds.meta["num_entities"] == 2
        assert ds.meta["num_instances"] > 0

    def test_missing_candidates_errors(self, tmp_path, trec_file):
        from sert_tpu.cli import main
        from sert_tpu.recipes import tiny_recipe
        from sert_tpu.utils.config import save_config
        recipe = tmp_path / "r.json"
        save_config(tiny_recipe("loglinear"), str(recipe))
        with pytest.raises(SystemExit, match="candidates"):
            main(["prepare", "--recipe", str(recipe),
                  "--out", str(tmp_path / "o"), "--trec-docs", trec_file])


class TestCliMisc:
    def test_list_names_all_recipes(self, capsys):
        from sert_tpu.cli import main
        from sert_tpu.recipes import RECIPES
        assert main(["list"]) == 0
        out = capsys.readouterr().out.split()
        assert set(out) == set(RECIPES)

    def test_e2e_rejects_scoring_only_recipe(self, tmp_path):
        from sert_tpu.cli import main
        with pytest.raises(SystemExit, match="scoring-only"):
            main(["e2e", "--recipe", "synthetic_10m_scoring",
                  "--workdir", str(tmp_path)])

    def test_unknown_recipe_exits(self):
        from sert_tpu.cli import main
        with pytest.raises(SystemExit, match="unknown recipe"):
            main(["train", "--recipe", "no_such", "--data", "x", "--out", "y"])

    def test_console_main_prints_clean_error(self, capsys):
        """The script entry point turns expected user errors (missing data
        dir here) into one stderr line + rc 2 instead of a traceback;
        library callers of main() still get the exception (above)."""
        from sert_tpu.cli import console_main
        rc = console_main(["query", "--recipe",
                           "recipes/w3c_expert_finding.json",
                           "--data", "/nonexistent-data-dir",
                           "--run-dir", "/nope", "--topics", "t",
                           "--out", "o"])
        assert rc == 2
        err = capsys.readouterr().err
        assert err.startswith("error: ") and "Traceback" not in err

    def test_console_main_swallows_broken_pipe(self, monkeypatch):
        """`sert-tpu list | head` must exit 0, not traceback."""
        from sert_tpu import cli

        def boom(argv=None):
            raise BrokenPipeError
        monkeypatch.setattr(cli, "main", boom)
        # console_main closes stdout (the pipe is dead); give it a stand-in
        # so pytest's capture file is not the thing being closed.
        import io
        import sys as _sys
        monkeypatch.setattr(_sys, "stdout", io.StringIO())
        assert cli.console_main(["list"]) == 0

    def test_version_flag(self, capsys):
        from sert_tpu import __version__
        from sert_tpu.cli import main
        with pytest.raises(SystemExit) as ei:
            main(["--version"])
        assert ei.value.code == 0
        assert __version__ in capsys.readouterr().out


class TestMentionBoundaries:
    def test_short_alias_no_substring_match(self):
        from sert_tpu.data.assoc import EntityRegistry
        reg = EntityRegistry(["c1"])
        assoc = corpus.build_expert_associations(
            [("d1", "the public library online"), ("d2", "Li spoke up"),
             ("d3", "emailed li@w3.org today")],
            {"c1": ["Li", "li@w3.org"]}, reg)
        assert assoc.entities_for("d1") == []
        assert assoc.entities_for("d2") == [0]
        assert assoc.entities_for("d3") == [0]

    def test_unicode_case_variant_no_crash(self):
        from sert_tpu.data.assoc import EntityRegistry
        reg = EntityRegistry(["c1"])
        assoc = corpus.build_expert_associations(
            [("d1", "Flight to İSTANBUL was late")],
            {"c1": ["istanbul"]}, reg)  # U+0130 folds differently: no match,
        assert assoc.entities_for("d1") == []  # and crucially no KeyError


