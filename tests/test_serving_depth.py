"""Depth-1000 retrieval through the serving surface (round-3 VERDICT #5).

The staged k cap must honor a deep constructor k AND a deep recipe
``top_k`` — BASELINE.json's headline metric is recall@1k, so the serving
path has to return 1000 ranked entities when asked, not silently clamp
to 100. The E=1M depth-1000 quality run lives in benchmarks/stress_1m.py
(chip-scale); this is the fast-lane contract test at E > 1000.
"""

import dataclasses

import pytest

from sert_tpu import pipeline
from sert_tpu.data import Associations, EntityRegistry
from sert_tpu.data.prepare import prepare
from sert_tpu.data.synthetic import make_synthetic
from sert_tpu.serving import EntitySearcher
from sert_tpu.utils.config import (DataConfig, ModelConfig, RecipeConfig,
                                   ScoreConfig, TrainConfig)

E = 1200


@pytest.fixture(scope="module")
def deep_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("deepserve")
    col = make_synthetic(num_entities=E, vocab_size=600, docs_per_entity=1,
                         doc_len=24, num_topics=4, seed=3)
    reg = EntityRegistry(col.entities)
    assoc = Associations()
    for d, es in col.doc_entities.items():
        for e in es:
            assoc.add(d, reg.id(e))
    data = str(root / "data")
    dcfg = DataConfig(window_size=6, vocab_min_count=1)
    prepare(col.docs, assoc, reg, data, dcfg)
    recipe = RecipeConfig(
        name="deep", data=dcfg,
        model=ModelConfig(model="loglinear", vocab_size=0, num_entities=E,
                          word_dim=16),
        train=TrainConfig(batch_size=256, num_epochs=1, learning_rate=5e-3,
                          log_every_steps=0),
        score=ScoreConfig(top_k=100))
    run = str(root / "run")
    pipeline.train_from_dir(recipe, data, run, resume=False)
    return recipe, data, run, col


class TestDeepStaging:
    def test_constructor_k_stages_depth_1000(self, deep_run):
        recipe, data, run, col = deep_run
        s = EntitySearcher(recipe, data, run, k=1000)
        assert s.k_max == 1000
        text = col.topics[sorted(col.topics)[0]]
        hits = s.search(text)
        assert hits is not None and len(hits) == 1000
        scores = [h[1] for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert len({h[0] for h in hits}) == 1000   # distinct entities

    def test_recipe_top_k_raises_the_cap(self, deep_run):
        recipe, data, run, col = deep_run
        deep = dataclasses.replace(
            recipe, score=dataclasses.replace(recipe.score, top_k=1000))
        s = EntitySearcher(deep, data, run, k=5)
        assert s.k_max == 1000
        text = col.topics[sorted(col.topics)[0]]
        assert len(s.search(text)) == 5            # default k still 5
        assert len(s.search(text, k=1000)) == 1000  # free slice to the cap

    def test_cap_clamps_to_entity_count(self, deep_run):
        recipe, data, run, col = deep_run
        s = EntitySearcher(recipe, data, run, k=5000)
        assert s.k_max == E
        text = col.topics[sorted(col.topics)[0]]
        assert len(s.search(text, k=5000)) == E
