"""Serve-time entity fold-in (LSE): add entities without retraining.

models.lse.fold_in_entity projects an unseen entity's text into the
entity space with the trained f (the CIKM 2016 projection applies to any
window); EntitySearcher.add_entities merges the folded vectors into every
subsequent search. Covers: vector math vs a manual mean, retrieval of the
folded entity, similarity-scale consistency, the HTTP surface, and the
error contract (log-linear, duplicates, all-OOV text).
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from sert_tpu import pipeline, recipes
from sert_tpu.serving import EntitySearcher, make_http_server


@pytest.fixture(scope="module")
def lse_workdir(tmp_path_factory):
    import dataclasses
    root = tmp_path_factory.mktemp("foldin")
    recipe = recipes.tiny_recipe("lse")
    # cosine similarity, as the shipped LSE recipes use — the fold-in
    # calibration is exact there (unit-normalized on both sides)
    recipe = dataclasses.replace(recipe, score=dataclasses.replace(
        recipe.score, similarity="cosine"))
    col = recipes.tiny_spec(seed=7).build()
    data = str(root / "data")
    pipeline.prepare_collection(col, data, recipe)
    pipeline.train_from_dir(recipe, data, str(root / "run"), resume=False)
    return root, recipe, col


class TestFoldIn:
    def test_fold_in_vector_is_mean_window_rep(self, lse_workdir):
        root, recipe, col = lse_workdir
        from sert_tpu.data.instances import InstanceDataset
        from sert_tpu.models import lse as lse_model
        ds = InstanceDataset(str(root / "data"))
        resolved = pipeline.resolve_model_config(recipe, ds.meta)
        params, vocab, _ = pipeline.load_scorer(
            str(root / "run"), str(root / "data"), resolved)
        ids = vocab.encode(col.docs[sorted(col.docs)[0]].split()[:20])
        v = np.asarray(lse_model.fold_in_entity(params, ids, resolved.model,
                                                window_size=6))
        # manual: mean of window_rep over stride-1 windows of width 6
        w = 6
        wins = np.lib.stride_tricks.sliding_window_view(
            np.asarray(ids, np.int32), w)
        reps = np.asarray(lse_model.window_rep(
            params, wins, np.full(wins.shape[0], w, np.int32),
            resolved.model))
        np.testing.assert_allclose(v, reps.mean(axis=0), rtol=1e-5,
                                   atol=1e-6)
        with pytest.raises(ValueError, match="at least one"):
            lse_model.fold_in_entity(params, [], resolved.model)

    def test_folded_entity_is_retrieved(self, lse_workdir):
        root, recipe, col = lse_workdir
        s = EntitySearcher(recipe, str(root / "data"), str(root / "run"),
                           k=5)
        # New entity whose text is an EXISTING entity's documents — its
        # folded vector must score near that entity's own, so a signature
        # query retrieves the newcomer alongside the original.
        target = col.entities[3]
        text = " ".join(t for d, es in col.doc_entities.items()
                        for t in col.docs[d].split() if target in es)
        assert s.add_entities([("folded-new", text)]) == 1
        assert s.num_extra_entities == 1
        # query with the target's topic (tiny_spec topics cycle entities)
        tid = [t for t, q in col.topics.items()
               if target in col.qrels[t]][0]
        hits = s.search(col.topics[tid], k=10)
        names = [n for n, _ in hits]
        assert "folded-new" in names
        assert names.index("folded-new") <= names.index(target) + 2
        # calibration: the folded twin scores within the trained index's
        # range for this content, not the raw f-image ~1.0 that would
        # dominate every query
        scores = dict(hits)
        assert scores["folded-new"] <= scores[names[0]] + 1e-6
        assert abs(scores["folded-new"] - scores[target]) < 0.5

    def test_folded_entity_does_not_dominate_unrelated_topics(
            self, lse_workdir):
        """The calibration's point: for a topic UNRELATED to the folded
        text, the folded entity must rank below that topic's true entity
        (raw f-cosines of ~0.5 against anything would otherwise put every
        folded entity above every trained one)."""
        root, recipe, col = lse_workdir
        s = EntitySearcher(recipe, str(root / "data"), str(root / "run"),
                           k=10)
        target = col.entities[5]
        text = " ".join(t for d, es in col.doc_entities.items()
                        for t in col.docs[d].split() if target in es)
        s.add_entities([("folded-5", text)])
        other = col.entities[9]
        tid = [t for t in col.topics if other in col.qrels[t]][0]
        hits = s.search(col.topics[tid], k=10)
        names = [n for n, _ in hits]
        assert other in names
        assert ("folded-5" not in names
                or names.index("folded-5") > names.index(other))

    def test_search_many_merges_folded(self, lse_workdir):
        """Batched search merges folded entities with ONE rep dispatch for
        the whole batch (and OOV slots stay None)."""
        root, recipe, col = lse_workdir
        s = EntitySearcher(recipe, str(root / "data"), str(root / "run"),
                           k=10)
        target = col.entities[4]
        text = " ".join(t for d, es in col.doc_entities.items()
                        for t in col.docs[d].split() if target in es)
        s.add_entities([("folded-m", text)])
        tid = [t for t in col.topics if target in col.qrels[t]][0]
        out = s.search_many([col.topics[tid], "zzz-not-in-vocab"])
        assert out[1] is None
        assert "folded-m" in [n for n, _ in out[0]]

    def test_error_contract(self, lse_workdir):
        root, recipe, col = lse_workdir
        s = EntitySearcher(recipe, str(root / "data"), str(root / "run"))
        with pytest.raises(ValueError, match="already indexed"):
            s.add_entities([(col.entities[0], "some text")])
        with pytest.raises(ValueError, match="no in-vocab"):
            s.add_entities([("brand-new", "zzz-never-seen-term")])

    def test_loglinear_rejected(self, tmp_path):
        recipe = recipes.tiny_recipe("loglinear")
        col = recipes.tiny_spec(seed=8).build()
        data = str(tmp_path / "data")
        pipeline.prepare_collection(col, data, recipe)
        pipeline.train_from_dir(recipe, data, str(tmp_path / "run"),
                                resume=False)
        s = EntitySearcher(recipe, data, str(tmp_path / "run"))
        with pytest.raises(ValueError, match="LSE"):
            s.add_entities([("x", "whatever text")])

    def test_http_entities_endpoint(self, lse_workdir):
        root, recipe, col = lse_workdir
        s = EntitySearcher(recipe, str(root / "data"), str(root / "run"),
                           k=5)
        server = make_http_server(s, port=0)
        host, port = server.server_address[:2]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://{host}:{port}"
        try:
            doc = col.docs[sorted(col.docs)[0]]
            body = json.dumps({"entities": [
                {"name": "http-folded", "text": doc}]}).encode()
            req = urllib.request.Request(
                base + "/entities", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                res = json.loads(r.read())
            assert res["added"] == 1 and res["extra_entities"] == 1
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.loads(r.read())["extra_entities"] == 1
            # malformed, non-string fields, and duplicate all 400
            for payload in ({"entities": []},
                            {"entities": [{"name": "n2", "text": 123}]},
                            {"entities": [{"name": ["x"], "text": doc}]},
                            {"entities": [{"name": "http-folded",
                                           "text": doc}]}):
                req = urllib.request.Request(
                    base + "/entities", data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=30)
                assert ei.value.code == 400
        finally:
            server.shutdown()
            server.server_close()
