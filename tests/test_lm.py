"""Lexical entity language model + run fusion (the papers' baseline/ensemble).

Covers: LMStats builder vs a brute-force dict reduction, Dirichlet/JM
scoring vs hand-worked values, top-k chunking invariance, prepare-time
stats emission, fusion math (interp + rrf), and the CLI surface
(`query --ranker lm`, `fuse`).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sert_tpu.data.lm_stats import LM_STATS_NAME, LMStats, LMStatsBuilder
from sert_tpu.eval.fuse import fuse_runs
from sert_tpu.models.lm import EntityLM


def _build(docs, num_entities, vocab_size):
    b = LMStatsBuilder(vocab_size)
    for ents, toks in docs:
        b.add(ents, toks)
    return b.finalize(num_entities)


class TestLMStats:
    def test_builder_matches_brute_force(self):
        rng = np.random.default_rng(0)
        V, E = 50, 7
        docs = []
        for _ in range(40):
            ents = rng.choice(E, size=rng.integers(1, 3), replace=False)
            toks = rng.integers(0, V, size=rng.integers(0, 30))
            docs.append((ents.tolist(), toks.tolist()))
        stats = _build(docs, E, V)

        brute = np.zeros((E, V), np.int64)
        for ents, toks in docs:
            for e in ents:
                for t in toks:
                    brute[e, t] += 1
        dense = np.zeros((E, V), np.int64)
        for e in range(E):
            lo, hi = stats.indptr[e], stats.indptr[e + 1]
            dense[e, stats.terms[lo:hi]] = stats.counts[lo:hi]
        np.testing.assert_array_equal(dense, brute)
        np.testing.assert_array_equal(stats.entity_len, brute.sum(1))
        np.testing.assert_array_equal(stats.collection_counts, brute.sum(0))
        assert stats.total_tokens == brute.sum()

    def test_term_column_and_roundtrip(self, tmp_path):
        stats = _build([([0], [1, 1, 2]), ([1, 2], [2, 3])], 4, 5)
        path = str(tmp_path / "lm.npz")
        stats.save(path)
        loaded = LMStats.load(path)
        for t in range(5):
            e0, c0 = stats.term_column(t)
            e1, c1 = loaded.term_column(t)
            np.testing.assert_array_equal(e0, e1)
            np.testing.assert_array_equal(c0, c1)
        # term 2 appears in entity 0 (once) and entities 1, 2 (once each)
        ents, cnts = loaded.term_column(2)
        assert sorted(ents.tolist()) == [0, 1, 2]
        assert cnts.sum() == 3
        # entity 3 has no text at all
        assert loaded.entity_len[3] == 0

    def test_empty_corpus(self):
        stats = _build([], 3, 5)
        assert stats.total_tokens == 0
        assert stats.entity_len.tolist() == [0, 0, 0]


class TestEntityLM:
    def test_dirichlet_hand_worked(self):
        # Entity 0: tokens [0, 0, 1] (len 3); entity 1: [1, 2] (len 2).
        # Collection: counts [2, 2, 1], total 5.
        stats = _build([([0], [0, 0, 1]), ([1], [1, 2])], 2, 3)
        mu = 10.0
        lm = EntityLM(stats, smoothing="dirichlet", mu=mu)
        s = lm.score([[0, 1]])
        p_c0, p_c1 = 2 / 5, 2 / 5
        want_e0 = (np.log((2 + mu * p_c0) / (3 + mu))
                   + np.log((1 + mu * p_c1) / (3 + mu)))
        want_e1 = (np.log((0 + mu * p_c0) / (2 + mu))
                   + np.log((1 + mu * p_c1) / (2 + mu)))
        np.testing.assert_allclose(s[0], [want_e0, want_e1], rtol=1e-12)

    def test_jm_hand_worked(self):
        stats = _build([([0], [0, 0, 1]), ([1], [1, 2])], 2, 3)
        lam = 0.3
        lm = EntityLM(stats, smoothing="jm", lam=lam)
        s = lm.score([[2]])
        p_c = 1 / 5
        want_e0 = np.log(0.7 * 0 / 3 + lam * p_c)
        want_e1 = np.log(0.7 * 1 / 2 + lam * p_c)
        np.testing.assert_allclose(s[0], [want_e0, want_e1], rtol=1e-12)

    def test_repeated_query_terms_multiply(self):
        stats = _build([([0], [0, 1]), ([1], [1])], 2, 2)
        lm = EntityLM(stats, mu=5.0)
        np.testing.assert_allclose(lm.score([[0, 0]]),
                                   2 * lm.score([[0]]), rtol=1e-12)

    def test_topk_matches_full_scores_across_chunks(self):
        rng = np.random.default_rng(1)
        V, E = 30, 257   # deliberately not a multiple of the chunk size
        docs = [([int(rng.integers(E))], rng.integers(0, V, 20).tolist())
                for _ in range(300)]
        stats = _build(docs, E, V)
        lm = EntityLM(stats, mu=100.0)
        queries = [rng.integers(0, V, 3).tolist() for _ in range(4)]
        full = lm.score(queries)
        for chunk in (64, 100, 1 << 16):
            s, i = lm.topk(queries, k=10, chunk=chunk)
            for q in range(len(queries)):
                order = np.argsort(-full[q], kind="stable")[:10]
                np.testing.assert_allclose(np.sort(s[q]),
                                           np.sort(full[q][order]),
                                           rtol=1e-12)

    def test_empty_query_scores_constant(self):
        stats = _build([([0], [0, 1]), ([1], [1])], 2, 2)
        lm = EntityLM(stats)
        s = lm.score([[]])
        assert np.all(s == 0.0)

    def test_rank_topics_skips_collection_absent_terms(self):
        """A topic whose terms are in-vocab but appear in NO associated
        document (vocab covers ALL docs; lm stats only associated ones)
        scores a constant 0 everywhere — it must come back empty, not as
        k arbitrary entities."""
        stats = _build([([0], [0, 1]), ([1], [1])], 2, 3)  # term 2 unseen
        assert stats.collection_counts[2] == 0
        lm = EntityLM(stats)
        run = lm.rank_topics({"dead": [2], "live": [0]}, ["e0", "e1"], k=2)
        assert run["dead"] == []
        assert run["live"][0][0] == "e0"

    def test_rank_topics_skips_all_oov_topics(self):
        """An all-OOV topic (empty encoding) gets an EMPTY result list —
        matching score_topics — instead of k arbitrary zero-scored
        entities that would pollute the run and any fusion."""
        stats = _build([([0], [0, 1]), ([1], [1])], 2, 2)
        lm = EntityLM(stats)
        run = lm.rank_topics({"dead": [], "live": [0]},
                             ["e0", "e1"], k=2)
        assert run["dead"] == []
        assert len(run["live"]) == 2 and run["live"][0][0] == "e0"

    def test_invalid_params(self):
        stats = _build([([0], [0])], 1, 1)
        with pytest.raises(ValueError):
            EntityLM(stats, smoothing="nope")
        with pytest.raises(ValueError):
            EntityLM(stats, smoothing="dirichlet", mu=0)
        with pytest.raises(ValueError):
            EntityLM(stats, smoothing="jm", lam=1.0)


class TestFusion:
    RUN_A = {"q1": [("e1", 10.0), ("e2", 5.0), ("e3", 0.0)]}
    RUN_B = {"q1": [("e2", 1.0), ("e4", 0.5)]}

    def test_rrf_hand_worked(self):
        fused = fuse_runs([self.RUN_A, self.RUN_B], method="rrf", rrf_k=60)
        got = dict(fused["q1"])
        assert got["e1"] == pytest.approx(1 / 61)
        assert got["e2"] == pytest.approx(1 / 62 + 1 / 61)
        assert got["e4"] == pytest.approx(1 / 62)
        # e2 is ranked first: present near the top of both runs
        assert fused["q1"][0][0] == "e2"

    def test_interp_minmax_hand_worked(self):
        fused = fuse_runs([self.RUN_A, self.RUN_B], weights=[0.5, 0.5],
                          method="interp", norm="minmax")
        got = dict(fused["q1"])
        # A normalized: e1=1, e2=.5, e3=0; B normalized: e2=1, e4=0.
        # Missing docs take the other run's per-topic floor (0 here).
        assert got["e1"] == pytest.approx(0.5 * 1.0 + 0.5 * 0.0)
        assert got["e2"] == pytest.approx(0.5 * 0.5 + 0.5 * 1.0)
        assert got["e4"] == pytest.approx(0.0)

    def test_interp_weight_extremes_recover_inputs(self):
        fused = fuse_runs([self.RUN_A, self.RUN_B], weights=[1.0, 0.0])
        order = [d for d, _ in fused["q1"]]
        assert order[:3] == ["e1", "e2", "e3"]

    def test_interp_all_equal_scores_keep_retrieval_evidence(self):
        """A topic where one run's scores all tie must still count that
        run's retrieved-vs-unretrieved evidence: ties normalize to 1.0
        under minmax (floor 0.0), not to all-zeros indistinguishable from
        unretrieved documents."""
        a = {"q1": [("e1", 5.0), ("e2", 5.0)]}          # all-equal
        b = {"q1": [("e2", 2.0), ("e3", 1.0)]}
        fused = fuse_runs([a, b], weights=[0.5, 0.5], method="interp")
        got = dict(fused["q1"])
        assert got["e1"] == pytest.approx(0.5 * 1.0 + 0.5 * 0.0)
        assert got["e2"] == pytest.approx(0.5 * 1.0 + 0.5 * 1.0)
        # e1 (retrieved by a) strictly beats e3 (a's floor + b's min)
        assert got["e1"] > got["e3"]

    def test_topic_union_and_truncation(self):
        a = {"q1": [("e1", 1.0)]}
        b = {"q2": [("e2", 1.0), ("e3", 0.5)]}
        fused = fuse_runs([a, b], method="rrf", k=1)
        assert set(fused) == {"q1", "q2"}
        assert len(fused["q2"]) == 1

    def test_errors(self):
        with pytest.raises(ValueError):
            fuse_runs([])
        with pytest.raises(ValueError):
            fuse_runs([self.RUN_A], weights=[1.0, 2.0])
        with pytest.raises(ValueError):
            fuse_runs([self.RUN_A], method="nope")


class TestPrepareIntegration:
    def test_prepare_writes_stats_and_lm_ranks_planted_signal(self, tmp_path):
        from sert_tpu import pipeline, recipes
        from sert_tpu.data.prepare import encode_queries
        from sert_tpu.data.vocab import Vocabulary
        from sert_tpu.eval.metrics import evaluate_run

        recipe = recipes.RECIPES["w3c_expert_finding"]()
        spec = recipes.SYNTH_SPECS[recipe.name]
        col = spec.build()
        out = str(tmp_path / "data")
        pipeline.prepare_collection(col, out, recipe)
        stats_path = os.path.join(out, LM_STATS_NAME)
        assert os.path.exists(stats_path)

        stats = LMStats.load(stats_path)
        vocab = Vocabulary.load(os.path.join(out, "vocab.json"))
        assert stats.vocab_size == len(vocab)
        lm = EntityLM(stats, mu=2000.0)
        encoded = encode_queries(col.topics, vocab, recipe.data)
        run = lm.rank_topics(encoded, col.entities, k=100)
        res = evaluate_run(run, col.qrels, ("ndcg@100",))
        # The planted-signal collection is lexically easy by construction;
        # a sane LM must rank far above chance (and below-perfect is fine).
        assert res["all"]["ndcg@100"] > 0.5

    def test_cli_lm_query_and_fuse(self, tmp_path):
        from sert_tpu import cli, pipeline, recipes
        recipe = recipes.RECIPES["w3c_expert_finding"]()
        spec = recipes.SYNTH_SPECS[recipe.name]
        col = spec.build()
        data = str(tmp_path / "data")
        pipeline.prepare_collection(col, data, recipe)
        from sert_tpu.eval.trec import write_qrels, write_topics
        topics_path = str(tmp_path / "topics.tsv")
        qrels_path = str(tmp_path / "qrels.trec")
        write_topics(col.topics, topics_path)
        write_qrels(col.qrels, qrels_path)

        run_lm = str(tmp_path / "lm.run")
        rc = cli.main(["query", "--recipe", recipe.name, "--data", data,
                       "--topics", topics_path, "--out", run_lm,
                       "--ranker", "lm", "--mu", "500"])
        assert rc == 0 and os.path.getsize(run_lm) > 0

        fused = str(tmp_path / "fused.run")
        rc = cli.main(["fuse", "--runs", run_lm, run_lm, "--out", fused,
                       "--method", "rrf", "-k", "10"])
        assert rc == 0 and os.path.getsize(fused) > 0

        # --ranker model without --run-dir is a clean error
        with pytest.raises(SystemExit):
            cli.main(["query", "--recipe", recipe.name, "--data", data,
                      "--topics", topics_path, "--out", run_lm])

        # fusing a single run is a clean error, not a renormalized copy
        with pytest.raises(SystemExit, match="two or more"):
            cli.main(["fuse", "--runs", run_lm, "--out", fused])

    def test_build_lm_stats_off(self, tmp_path):
        import dataclasses
        from sert_tpu import pipeline, recipes
        recipe = recipes.RECIPES["w3c_expert_finding"]()
        recipe = dataclasses.replace(
            recipe, data=dataclasses.replace(recipe.data,
                                             build_lm_stats=False))
        col = recipes.SYNTH_SPECS["w3c_expert_finding"].build()
        out = str(tmp_path / "data")
        pipeline.prepare_collection(col, out, recipe)
        assert not os.path.exists(os.path.join(out, LM_STATS_NAME))
