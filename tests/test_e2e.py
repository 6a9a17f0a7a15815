"""End-to-end on synthetic planted-signal data (SURVEY.md section 5, item 4):
a correctly built pipeline must reach near-perfect NDCG@100."""

import os

import pytest

from sert_tpu import pipeline, recipes


class TestEndToEnd:
    def test_loglinear_planted_ndcg(self, tmp_path):
        col = recipes.tiny_spec(seed=0).build()
        recipe = recipes.tiny_recipe("loglinear")
        results = pipeline.run_end_to_end(col, recipe, str(tmp_path))
        agg = results["all"]
        assert agg["ndcg@100"] > 0.95, agg
        assert agg["recip_rank"] > 0.9, agg
        # artifacts on disk
        assert os.path.exists(tmp_path / "run" / "run.trec")
        assert os.path.exists(tmp_path / "run" / "qrels.trec")
        assert os.path.exists(tmp_path / "run" / "train_log.jsonl")
        assert os.path.exists(tmp_path / "run" / "recipe.json")

    def test_lse_planted_ndcg(self, tmp_path):
        col = recipes.tiny_spec(seed=1).build()
        recipe = recipes.tiny_recipe("lse", negative_distribution="unigram")
        results = pipeline.run_end_to_end(col, recipe, str(tmp_path))
        agg = results["all"]
        assert agg["ndcg@100"] > 0.85, agg

    def test_10m_knob_composition_tiny(self, tmp_path):
        """The synthetic_10m_training recipe's EXACT knob set (bf16
        params + row-sparse lazy adam + params-only bf16 epoch snapshots
        + params-only final + cosine + fused-auto sampled softmax +
        rescore auto), driven end-to-end at tiny scale: the single-chip
        10M memory configuration must stay a working composition, not
        just per-knob-tested units."""
        import numpy as np

        from sert_tpu.train import checkpoint as ckpt

        big = recipes.synthetic_10m_training()
        tiny = recipes.tiny_recipe("lse")
        # tiny's scale hyperparameters (dims/lr/epochs/batch), big's KNOBS.
        recipe = big.__class__(
            name="tiny10m", data=tiny.data,
            model=big.model.replace(word_dim=32, entity_dim=32,
                                    num_negatives=8),
            train=big.train.__class__(**{**big.train.__dict__,
                                         "batch_size": tiny.train.batch_size,
                                         "num_epochs": 4,
                                         "learning_rate":
                                             tiny.train.learning_rate,
                                         "steps_per_call": 1,
                                         "async_checkpoint": False}),
            score=big.score.__class__(**{**big.score.__dict__,
                                         "top_k": 32}),
        )
        col = recipes.tiny_spec(seed=7).build()
        results = pipeline.run_end_to_end(col, recipe, str(tmp_path))
        agg = results["all"]
        assert agg["ndcg@100"] > 0.85, agg
        cdir = str(tmp_path / "run" / "checkpoints")
        steps = sorted(ckpt.list_checkpoints(cdir))
        last = ckpt.list_checkpoints(cdir)[steps[-1]]
        meta = ckpt.load_meta(last)
        assert meta.get("params_only") is True           # final_snapshot
        assert meta.get("snapshot_dtype") == "bfloat16"  # snapshot_dtype
        with np.load(last) as z:
            assert all(z[k].dtype == np.uint16
                       for k in z.files if k.startswith(".params"))

    def test_sweep_and_dump(self, tmp_path):
        from sert_tpu import pipeline
        col = recipes.tiny_spec(seed=3).build()
        recipe = recipes.tiny_recipe("loglinear")
        pipeline.run_end_to_end(col, recipe, str(tmp_path))
        res = pipeline.sweep_checkpoints(
            recipe, str(tmp_path / "data"), str(tmp_path / "run"),
            str(tmp_path / "run" / "topics.tsv"),
            str(tmp_path / "run" / "qrels.trec"))
        assert res["best"] > 0.9
        assert str(res["best_step"]) in res["per_step"]
        assert len(res["per_step"]) == recipe.train.num_epochs

        from sert_tpu.cli import main
        out = str(tmp_path / "emb.npz")
        import json as _json
        from sert_tpu.utils.config import save_config
        rp = str(tmp_path / "r.json")
        save_config(recipe, rp)
        rc = main(["dump", "--recipe", rp, "--data", str(tmp_path / "data"),
                   "--run-dir", str(tmp_path / "run"), "--out", out])
        assert rc == 0
        import numpy as _np
        z = _np.load(out, allow_pickle=True)
        assert z["entity_matrix"].shape[0] == len(z["entities"])
        assert z["word_emb"].shape[0] == len(z["terms"])

    def test_scorer_reload_from_checkpoint(self, tmp_path):
        """Query-side loads a chosen snapshot (reference behavior) and
        reproduces the same run."""
        col = recipes.tiny_spec(seed=0).build()
        recipe = recipes.tiny_recipe("loglinear")
        pipeline.run_end_to_end(col, recipe, str(tmp_path))

        data_dir = str(tmp_path / "data")
        run_dir = str(tmp_path / "run")
        from sert_tpu.data.instances import InstanceDataset
        ds = InstanceDataset(data_dir)
        resolved = pipeline.resolve_model_config(recipe, ds.meta)
        params, vocab, registry = pipeline.load_scorer(run_dir, data_dir,
                                                       resolved)
        from sert_tpu.data.prepare import encode_queries
        from sert_tpu.scoring.run import score_topics
        from sert_tpu.eval.trec import read_run
        encoded = encode_queries(col.topics, vocab, recipe.data)
        run = score_topics(params, resolved.model, encoded, registry.names,
                           resolved.score)
        on_disk = read_run(os.path.join(run_dir, "run.trec"))
        for qid, entries in on_disk.items():
            got = dict(run[qid])
            for name, score in entries[:5]:
                assert name in got
                assert got[name] == pytest.approx(score, abs=1e-4)
