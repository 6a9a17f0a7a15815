"""Discriminating-band quality tests on the HARD synthetic mode.

Round-1 VERDICT weakness 2: three of four recipe stand-ins saturated
NDCG@100 at 1.00, so quality regressions (sampled-softmax bias, top-k
boundary bugs) were invisible. The hard generator (data/synthetic.py,
hard=True) plants confusable signature groups, Zipf association skew and
graded qrels so a correctly trained model lands in a 0.7-0.95 band — and a
seeded negative-sampling bias bug drops it by >0.4 (proven below).

Calibration (CPU, seed 5, 48 entities): loglinear hard 0.947 / easy 1.00;
LSE unigram hard 0.887 healthy vs 0.245 with the seeded sampler bias.
Thresholds leave generous margins around those points.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sert_tpu.data.assoc import Associations, EntityRegistry
from sert_tpu.data.instances import InstanceDataset
from sert_tpu.data.prepare import ASSOC_NAME, ENTITIES_NAME, VOCAB_NAME, encode_queries
from sert_tpu.data.synthetic import make_synthetic
from sert_tpu.data.vocab import Vocabulary
from sert_tpu.eval.metrics import evaluate_run
from sert_tpu.pipeline import prepare_collection, resolve_model_config, run_end_to_end
from sert_tpu.recipes import tiny_recipe
from sert_tpu.scoring.run import score_topics
from sert_tpu.train.loop import train as train_loop

COL_KW = dict(num_entities=48, vocab_size=1000, docs_per_entity=8,
              doc_len=100, num_topics=24, signal=0.5, seed=5)


def _train_and_eval(col, rec, workdir, counts_hook=None):
    data_dir = os.path.join(workdir, "data")
    run_dir = os.path.join(workdir, "run")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(run_dir, exist_ok=True)
    prepare_collection(col, data_dir, rec)
    dataset = InstanceDataset(data_dir, seed=rec.train.seed)
    recipe = resolve_model_config(rec, dataset.meta)
    assoc = Associations.load(os.path.join(data_dir, ASSOC_NAME))
    counts = np.asarray(
        assoc.entity_instance_counts(recipe.model.num_entities), np.float64)
    if counts_hook is not None:
        counts = counts_hook(counts)
    state = train_loop(recipe, dataset, run_dir, entity_counts=counts)
    vocab = Vocabulary.load(os.path.join(data_dir, VOCAB_NAME))
    reg = EntityRegistry.load(os.path.join(data_dir, ENTITIES_NAME))
    encoded = encode_queries(col.topics, vocab, recipe.data)
    run = score_topics(state.params, recipe.model, encoded, reg.names,
                       recipe.score)
    return evaluate_run(run, col.qrels)["all"]


class TestHardGeneratorStructure:
    def test_groups_share_half_the_signature(self):
        col = make_synthetic(hard=True, group_size=4, **COL_KW)
        # every topic's qrels: one grade-2 truth + its grade-1 siblings
        for qr in col.qrels.values():
            grades = sorted(qr.values())
            assert grades.count(2) == 1
            assert set(grades) <= {1, 2} and len(qr) == 4

    def test_association_skew(self):
        col = make_synthetic(hard=True, **COL_KW)
        per_entity = {}
        for _, ents in col.doc_entities.items():
            per_entity[ents[0]] = per_entity.get(ents[0], 0) + 1
        counts = sorted(per_entity.values())
        assert counts[0] >= 1 and counts[-1] > 2 * counts[0]  # real skew

    def test_easy_path_unchanged(self):
        # hard=False must be byte-identical to the round-1 generator
        # (deterministic downstream artifacts, BASELINE continuity).
        a = make_synthetic(seed=5, num_entities=8, vocab_size=300,
                           docs_per_entity=3, doc_len=40, num_topics=4)
        b = make_synthetic(seed=5, num_entities=8, vocab_size=300,
                           docs_per_entity=3, doc_len=40, num_topics=4)
        assert a.docs == b.docs and a.topics == b.topics
        assert all(len(qr) == 1 for qr in a.qrels.values())


class TestDiscriminatingBand:
    def test_loglinear_hard_band(self, tmp_path):
        col = make_synthetic(hard=True, **COL_KW)
        res = _train_and_eval(col, tiny_recipe("loglinear"), str(tmp_path))
        # calibrated 0.947: high enough to prove learning, below saturation
        assert 0.80 < res["ndcg@100"] < 0.995, res

    def test_lse_hard_band(self, tmp_path):
        col = make_synthetic(hard=True, **COL_KW)
        rec = tiny_recipe("lse", negative_distribution="unigram")
        res = _train_and_eval(col, rec, str(tmp_path))
        assert 0.75 < res["ndcg@100"] < 0.99, res  # calibrated 0.887

    def test_easy_mode_saturates(self, tmp_path):
        # the easy generator remains the smoke-test floor
        col = make_synthetic(**COL_KW)
        res = run_end_to_end(col, tiny_recipe("loglinear"), str(tmp_path))
        assert res["all"]["ndcg@100"] > 0.98, res["all"]


class TestVocabGapBand:
    """The CIKM-paper result shape (round-2 VERDICT missing item 1): on
    the paraphrase-planted stand-in, the SEMANTIC model must beat the
    LEXICAL baseline — term matching is structurally capped there, while
    distributional learning is not. Full-scale calibration (E=900, TPU):
    lm 0.784, sampled-softmax LSE 0.856 (p=0.0002), nce-k10 0.420,
    lse_full 0.854 — the sampled objective within 0.002 of full."""

    def test_sampled_lse_beats_lm_on_vocab_gap(self, tmp_path):
        from sert_tpu.models.lm import load_lm
        col = make_synthetic(hard=True, vocab_gap=True, **COL_KW)
        rec = tiny_recipe("lse", objective="sampled_softmax",
                          num_negatives=64,
                          negative_distribution="unigram")
        model_res = _train_and_eval(col, rec, str(tmp_path))

        lm, vocab, reg = load_lm(os.path.join(str(tmp_path), "data"))
        encoded = encode_queries(col.topics, vocab, rec.data)
        lm_run = lm.rank_topics(encoded, reg.names, k=32)
        lm_res = evaluate_run(lm_run, col.qrels)["all"]

        assert model_res["ndcg@100"] > lm_res["ndcg@100"] + 0.02, (
            model_res["ndcg@100"], lm_res["ndcg@100"])
        assert model_res["ndcg@100"] > 0.7, model_res

    def test_nce_objective_unchanged_on_plain_hard(self, tmp_path):
        """The reference's binary-NCE objective stays available and sane
        (the sampled_softmax default is a recipe choice, not a removal)."""
        col = make_synthetic(hard=True, **COL_KW)
        rec = tiny_recipe("lse", objective="nce",
                          negative_distribution="unigram")
        res = _train_and_eval(col, rec, str(tmp_path))
        assert 0.75 < res["ndcg@100"] < 0.99, res


class TestSeededBugDetection:
    def test_negative_sampling_bias_drops_ndcg(self, tmp_path):
        """The bug class SURVEY section 8 calls hard part 1: a sampler that
        never draws half the entity axis as negatives. On the saturated
        easy stand-ins this was invisible; the hard band must catch it."""
        col = make_synthetic(hard=True, **COL_KW)
        rec = tiny_recipe("lse", negative_distribution="unigram")

        healthy = _train_and_eval(col, rec, str(tmp_path / "h"))

        def bias(counts):
            counts = counts.copy()
            counts[counts.shape[0] // 2:] = 0.0  # tail never sampled
            return counts

        buggy = _train_and_eval(col, rec, str(tmp_path / "b"),
                                counts_hook=bias)
        drop = healthy["ndcg@100"] - buggy["ndcg@100"]
        assert drop > 0.15, (healthy["ndcg@100"], buggy["ndcg@100"])
