"""End-to-end rehearsal of the PRODUCT-SEARCH ingestion path through the
CLI (round-3 VERDICT weak #5).

Mirror of tests/test_cli_real_formats.py for the Amazon half of the
capability contract: a multi-file gzipped review-JSON tree (nested
category dirs, .json/.json.gz mix, corrupt lines, asin-less rows) driven
through prepare -> train -> query -> evaluate -> report with the LSE
sampled-softmax recipe — the CIKM 2016 configuration (SURVEY.md section
1, model family 2).
"""

import gzip
import json
import os

import pytest

from sert_tpu.cli import main as cli_main
from sert_tpu.utils.config import (DataConfig, ModelConfig, RecipeConfig,
                                   ScoreConfig, TrainConfig, save_config)

N_PRODUCTS = 12
SIG_WORDS = 3
REVIEWS_PER_PRODUCT = 8


def _product(i):
    return {
        "asin": f"B{i:09d}",
        "sig": [f"feature{i:02d}tok{j}" for j in range(SIG_WORDS)],
    }


PRODUCTS = [_product(i) for i in range(N_PRODUCTS)]


def _build_review_tree(root):
    """Two category subdirectories, four files (two gzipped), reviews
    spread round-robin; plus one corrupt line and one asin-less row per
    file (must be skipped silently)."""
    files = {
        os.path.join("musical_instruments", "reviews-000.json"): [],
        os.path.join("musical_instruments", "reviews-001.json.gz"): [],
        os.path.join("home_kitchen", "reviews-000.json.gz"): [],
        os.path.join("home_kitchen", "reviews-001.json"): [],
    }
    names = sorted(files)
    n = 0
    for p in PRODUCTS:
        for ri in range(REVIEWS_PER_PRODUCT):
            body = " ".join(p["sig"] * 10) + " works great five stars"
            row = {"asin": p["asin"],
                   "summary": f"review {ri} of {p['sig'][0]}",
                   "reviewText": body}
            files[names[n % len(names)]].append(json.dumps(row))
            n += 1
    for rel in names:
        files[rel].append("{corrupt json line")
        files[rel].append(json.dumps({"reviewText": "no asin here"}))
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        content = "\n".join(files[rel]) + "\n"
        if path.endswith(".gz"):
            with gzip.open(path, "wt") as fh:
                fh.write(content)
        else:
            with open(path, "w") as fh:
                fh.write(content)


def _write_topics_sgml(path):
    with open(path, "w") as fh:
        for ti, p in enumerate(PRODUCTS):
            fh.write(f"""<top>
<num> Number: P{ti:02d}
<title> Topic: {' '.join(p['sig'])}
<desc> Description:
Find the product with {p['sig'][0]}.
</top>
""")


def _write_qrels(path):
    with open(path, "w") as fh:
        for ti, p in enumerate(PRODUCTS):
            fh.write(f"P{ti:02d} 0 {p['asin']} 1\n")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("amazon_formats")
    corpus = root / "reviews"
    _build_review_tree(str(corpus))
    _write_topics_sgml(str(root / "topics.sgml"))
    _write_qrels(str(root / "qrels.trec"))
    recipe = RecipeConfig(
        name="amazon_mini",
        data=DataConfig(window_size=5, vocab_min_count=1,
                        vocab_max_size=4000),
        model=ModelConfig(model="lse", word_dim=16, entity_dim=16,
                          objective="sampled_softmax", num_negatives=8,
                          negative_distribution="unigram"),
        train=TrainConfig(batch_size=128, num_epochs=4, optimizer="adam",
                          learning_rate=5e-3, log_every_steps=50),
        score=ScoreConfig(top_k=12, similarity="cosine"),
    )
    save_config(recipe, str(root / "recipe.json"))
    # DIRECTORY argument: the tree expands to the 4 files recursively
    assert cli_main(["prepare", "--recipe", str(root / "recipe.json"),
                     "--out", str(root / "data"),
                     "--amazon-reviews", str(corpus)]) == 0
    assert cli_main(["train", "--recipe", str(root / "recipe.json"),
                     "--data", str(root / "data"),
                     "--out", str(root / "run")]) == 0
    return root


class TestAmazonPipeline:
    def test_prepare_meta(self, workdir):
        meta = json.load(open(os.path.join(str(workdir), "data",
                                           "instances.meta.json")))
        assert meta["num_entities"] == N_PRODUCTS
        # 4 corrupt + 4 asin-less rows dropped, all real reviews kept
        assert meta["num_instances"] > 0

    def test_query_evaluate(self, workdir, capsys):
        root = str(workdir)
        run_file = os.path.join(root, "run.trec")
        assert cli_main(["query", "--recipe",
                         os.path.join(root, "recipe.json"),
                         "--data", os.path.join(root, "data"),
                         "--run-dir", os.path.join(root, "run"),
                         "--topics", os.path.join(root, "topics.sgml"),
                         "--out", run_file]) == 0
        capsys.readouterr()
        assert cli_main(["evaluate", "--run", run_file,
                         "--qrels", os.path.join(root, "qrels.trec")]) == 0
        results = json.loads(capsys.readouterr().out)
        # planted signatures must be learnable through the sampled
        # objective end to end
        assert results["ndcg@100"] > 0.8, results
        assert results["recall@100"] == 1.0, results

    def test_report(self, workdir, capsys):
        """The papers' headline table over the product run: semantic vs
        lexical-LM vs fused rows, all metrics."""
        root = str(workdir)
        assert cli_main(["report", "--recipe",
                         os.path.join(root, "recipe.json"),
                         "--data", os.path.join(root, "data"),
                         "--run-dir", os.path.join(root, "run"),
                         "--topics", os.path.join(root, "topics.sgml"),
                         "--qrels", os.path.join(root, "qrels.trec")]) == 0
        out = capsys.readouterr().out
        assert "ndcg@100" in out
        for row in ("model", "lm", "interp", "rrf"):
            assert row in out, out

    def test_directory_without_reviews_rejected(self, tmp_path):
        os.makedirs(tmp_path / "empty_tree" / "sub")
        from sert_tpu.data.corpus import expand_review_paths
        with pytest.raises(ValueError, match="no review JSON"):
            expand_review_paths([str(tmp_path / "empty_tree")])

    def test_file_paths_still_pass_through(self, tmp_path):
        from sert_tpu.data.corpus import expand_review_paths
        f = tmp_path / "x.json"
        f.write_text("{}")
        assert expand_review_paths([str(f)]) == [str(f)]
