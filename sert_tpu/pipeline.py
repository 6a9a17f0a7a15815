"""End-to-end pipeline driver: collection -> trained model -> run -> metrics.

This is the reference's four entry points (prepare/train/query/evaluate,
SURVEY.md section 4) composed into one reproducible function, used by the
CLI, the recipe runner, the e2e tests, and the benchmark harness.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional

import jax
import numpy as np

from sert_tpu.data.assoc import Associations, EntityRegistry
from sert_tpu.data.instances import InstanceDataset
from sert_tpu.data.prepare import (ASSOC_NAME, ENTITIES_NAME, VOCAB_NAME,
                                   encode_queries, prepare)
from sert_tpu.data.synthetic import SyntheticCollection
from sert_tpu.data.vocab import Vocabulary
from sert_tpu.eval.metrics import evaluate_run
from sert_tpu.eval.trec import write_qrels, write_run, write_topics
from sert_tpu.scoring.run import score_topics
from sert_tpu.train import checkpoint as ckpt
from sert_tpu.train.loop import train as train_loop
from sert_tpu.train.step import init_state
from sert_tpu.utils.config import RecipeConfig, save_config
from sert_tpu.utils.logging import get_logger

log = get_logger("pipeline")


def prepare_collection(col: SyntheticCollection, out_dir: str,
                       recipe: RecipeConfig) -> Dict:
    """Prepare any (docs, doc->entities) collection given as a
    SyntheticCollection-shaped object. Returns instance meta."""
    registry = EntityRegistry(col.entities)
    assoc = Associations()
    for doc_id, ents in col.doc_entities.items():
        for e in ents:
            assoc.add(doc_id, registry.id(e))
    return prepare(col.docs, assoc, registry, out_dir, recipe.data)


def resolve_model_config(recipe: RecipeConfig, meta: Mapping) -> RecipeConfig:
    """Fill vocab_size / num_entities from the prepared dataset."""
    mcfg = recipe.model.replace(vocab_size=int(meta["vocab_size"]),
                                num_entities=int(meta["num_entities"]))
    return RecipeConfig(name=recipe.name, data=recipe.data, model=mcfg,
                        train=recipe.train, score=recipe.score)


def load_pretrained_word_emb(npz_path: str, vocab: Vocabulary,
                             base_emb: np.ndarray):
    """Overwrite rows of ``base_emb`` with vectors from a dump-format npz
    (``word_emb`` + ``terms`` arrays, as written by the dump CLI). Terms are
    matched by string; vocabulary terms absent from the dump keep their
    fresh initialization. Returns (embeddings, matched_count)."""
    with np.load(npz_path, allow_pickle=True) as z:
        if "word_emb" not in z or "terms" not in z:
            raise ValueError(
                f"{npz_path} is not a dump npz (needs word_emb + terms)")
        emb = np.asarray(z["word_emb"], np.float32)
        terms = z["terms"]
    if emb.shape[1] != base_emb.shape[1]:
        raise ValueError(
            f"pretrained word_dim {emb.shape[1]} != model word_dim "
            f"{base_emb.shape[1]}")
    out = np.asarray(base_emb, np.float32).copy()
    hits = 0
    for i, t in enumerate(terms):
        t = str(t)
        if t in vocab:
            out[vocab.id(t)] = emb[i]
            hits += 1
    return out, hits


def train_from_dir(recipe: RecipeConfig, data_dir: str, out_dir: str,
                   resume: bool = True, init_word_emb: Optional[str] = None,
                   **loop_kwargs):
    dataset = InstanceDataset(data_dir, seed=recipe.train.seed)
    recipe = resolve_model_config(recipe, dataset.meta)
    assoc = Associations.load(os.path.join(data_dir, ASSOC_NAME))
    counts = np.asarray(
        assoc.entity_instance_counts(recipe.model.num_entities), np.float64)
    os.makedirs(out_dir, exist_ok=True)
    save_config(recipe, os.path.join(out_dir, "recipe.json"))
    if init_word_emb:
        vocab = Vocabulary.load(os.path.join(data_dir, VOCAB_NAME))

        def hook(params):
            we, hits = load_pretrained_word_emb(init_word_emb, vocab,
                                                params["word_emb"])
            log.info("init: seeded %d/%d word embeddings from %s",
                     hits, we.shape[0], init_word_emb)
            return {**params, "word_emb": we}

        loop_kwargs = {**loop_kwargs, "init_params_hook": hook}
    state = train_loop(recipe, dataset, out_dir, entity_counts=counts,
                       resume=resume, **loop_kwargs)
    return state, recipe


def load_scorer(run_dir: str, data_dir: str, recipe: RecipeConfig,
                step: Optional[int] = None):
    """Load a checkpoint (latest or specific step) + vocab + entity names.

    Refuses to score with a vocabulary whose hash differs from the one
    recorded at train time (SURVEY.md section 6, checkpoint contract).
    """
    vocab = Vocabulary.load(os.path.join(data_dir, VOCAB_NAME))
    registry = EntityRegistry.load(os.path.join(data_dir, ENTITIES_NAME))
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if step is None:
        path = ckpt.latest_checkpoint(ckpt_dir)
    else:
        path = ckpt.list_checkpoints(ckpt_dir).get(step)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    # Shape-only template: never materialize a throwaway random init (at
    # LSE scale that is 3x the entity matrix in params + Adam moments).
    # opt_state flavor follows the FILE, not the live config: sparse_update
    # ="auto" must not brick checkpoints written dense (or vice versa).
    sparse_opt = ckpt.has_sparse_opt_state(path)
    template = jax.eval_shape(
        lambda: init_state(jax.random.key(0), recipe.model, recipe.train,
                           sparse_override=sparse_opt))
    state, meta = ckpt.load_checkpoint(path, template)
    trained_hash = meta.get("vocab_hash")
    if trained_hash and trained_hash != vocab.content_hash():
        raise ValueError("vocabulary hash mismatch between checkpoint and data dir")
    return state.params, vocab, registry


def sweep_checkpoints(recipe: RecipeConfig, data_dir: str, run_dir: str,
                      topics_path: str, qrels_path: str,
                      measure: str = "ndcg@100") -> Dict:
    """Evaluate EVERY checkpoint in the run (the reference's per-epoch
    snapshot selection workflow): returns {"per_step": {step: metric},
    "best_step": ..., "best": ...}."""
    from sert_tpu.eval.trec import read_qrels, read_topics

    ds = InstanceDataset(data_dir)
    resolved = resolve_model_config(recipe, ds.meta)
    vocab = Vocabulary.load(os.path.join(data_dir, VOCAB_NAME))
    registry = EntityRegistry.load(os.path.join(data_dir, ENTITIES_NAME))
    topics = read_topics(topics_path)
    qrels = read_qrels(qrels_path)
    encoded = encode_queries(topics, vocab, resolved.data)

    templates: Dict[bool, object] = {}  # opt_state flavor -> shape template

    def template_for(path: str):
        # opt_state flavor follows each FILE (a run dir can mix snapshots
        # from before and after a sparse_update default change).
        sparse_opt = ckpt.has_sparse_opt_state(path)
        if sparse_opt not in templates:
            templates[sparse_opt] = jax.eval_shape(
                lambda: init_state(jax.random.key(0), resolved.model,
                                   resolved.train,
                                   sparse_override=sparse_opt))
        return templates[sparse_opt]

    per_step: Dict[str, float] = {}
    ckpts = ckpt.list_checkpoints(os.path.join(run_dir, "checkpoints"))
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints in {run_dir}")
    vocab_hash = vocab.content_hash()
    for step, path in ckpts.items():
        # Meta sidecar first: skipping a mid-epoch checkpoint must not cost
        # a multi-GB npz deserialization.
        meta = ckpt.load_meta(path)
        trained_hash = meta.get("vocab_hash")
        if trained_hash and trained_hash != vocab_hash:
            raise ValueError(
                f"checkpoint {path} was trained against a different "
                f"vocabulary than {data_dir}")
        if meta.get("cursor") is not None:
            continue  # mid-epoch step checkpoint; sweep epoch snapshots only
        state, _ = ckpt.load_checkpoint(path, template_for(path))
        run = score_topics(state.params, resolved.model, encoded,
                           registry.names, resolved.score)
        res = evaluate_run(run, qrels, measures=(measure,))
        per_step[str(step)] = res["all"][measure]
        log.info("sweep: step %d %s=%.4f", step, measure, per_step[str(step)])
    if not per_step:
        raise FileNotFoundError(f"no epoch snapshots in {run_dir}")
    best_step = max(per_step, key=per_step.get)
    return {"per_step": per_step, "best_step": int(best_step),
            "best": per_step[best_step], "measure": measure}


def run_end_to_end(col: SyntheticCollection, recipe: RecipeConfig,
                   workdir: str) -> Dict[str, Dict[str, float]]:
    """prepare -> train -> score -> evaluate; returns per-topic metrics
    (with the macro-average under key "all")."""
    data_dir = os.path.join(workdir, "data")
    run_dir = os.path.join(workdir, "run")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(run_dir, exist_ok=True)

    meta = prepare_collection(col, data_dir, recipe)
    state, recipe = train_from_dir(recipe, data_dir, run_dir)
    # Scoring never reads optimizer state, and at large E adam's moments
    # are GBs of HBM the engine staging needs (train/step.release_opt_state).
    from sert_tpu.train.step import release_opt_state
    state = release_opt_state(state)

    vocab = Vocabulary.load(os.path.join(data_dir, VOCAB_NAME))
    registry = EntityRegistry.load(os.path.join(data_dir, ENTITIES_NAME))
    encoded = encode_queries(col.topics, vocab, recipe.data)
    run = score_topics(state.params, recipe.model, encoded, registry.names,
                       recipe.score)

    write_run(run, os.path.join(run_dir, "run.trec"))
    write_qrels(col.qrels, os.path.join(run_dir, "qrels.trec"))
    write_topics(col.topics, os.path.join(run_dir, "topics.tsv"))
    results = evaluate_run(run, col.qrels)
    log.info("e2e %s: %s", recipe.name,
             {k: round(v, 4) for k, v in results["all"].items()})
    return results
