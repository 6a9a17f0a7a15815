"""Topics -> TREC run glue: batch queries, score, emit ranked entity names.

Mirrors the reference query CLI (SURVEY.md section 4.3): tokenize/encode each
topic with the training vocabulary, score ALL entities, keep top-k, append to
a run dict. Queries are padded to a fixed term budget (static shapes under
jit); topics whose terms are all OOV yield empty result lists (they score 0
everywhere and would be noise).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sert_tpu.scoring.scorer import (_entity_matrix, dense_scores,
                                     pallas_topk, streaming_topk)
from sert_tpu.utils.config import ModelConfig, ScoreConfig


def pad_queries(encoded: Mapping[str, Sequence[int]], max_terms: int = 16
                ) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """(qids, term_ids [Q, T], num_terms [Q]); long queries truncate to T."""
    qids = sorted(encoded)
    Q = len(qids)
    term_ids = np.zeros((Q, max_terms), np.int32)
    num_terms = np.zeros((Q,), np.int32)
    for i, qid in enumerate(qids):
        ids = list(encoded[qid])[:max_terms]
        term_ids[i, :len(ids)] = ids
        num_terms[i] = len(ids)
    return qids, term_ids, num_terms


def score_topics(
    params,
    cfg: ModelConfig,
    encoded_topics: Mapping[str, Sequence[int]],
    entity_names: Sequence[str],
    score_cfg: Optional[ScoreConfig] = None,
    max_terms: int = 16,
) -> Dict[str, List[Tuple[str, float]]]:
    """Score every topic against every entity; returns a TREC run dict
    {qid: [(entity_name, score), ...]} with top-k entries per topic."""
    sc = score_cfg or ScoreConfig()
    qids, term_ids, num_terms = pad_queries(encoded_topics, max_terms)
    E = len(entity_names)
    run: Dict[str, List[Tuple[str, float]]] = {qid: [] for qid in qids}

    prep = None
    if sc.use_pallas:
        from sert_tpu.ops.exact_topk import prepare_entities
        prep = prepare_entities(_entity_matrix(params, cfg, sc.similarity))

    B = sc.query_batch
    for lo in range(0, len(qids), B):
        hi = min(lo + B, len(qids))
        n = hi - lo
        # Pad the last batch to the static batch size.
        t = np.zeros((B, max_terms), np.int32)
        m = np.zeros((B,), np.int32)
        t[:n], m[:n] = term_ids[lo:hi], num_terms[lo:hi]

        if sc.use_pallas:
            top_s, idx = pallas_topk(params, cfg, jnp.asarray(t),
                                     jnp.asarray(m), k=min(sc.top_k, E),
                                     similarity=sc.similarity, prep=prep)
            top_s, idx = np.asarray(top_s), np.asarray(idx)
        elif sc.entity_chunk >= E:
            scores = np.asarray(dense_scores(
                params, cfg, jnp.asarray(t), jnp.asarray(m),
                similarity=sc.similarity))
            k = min(sc.top_k, E)
            idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
            top_s = np.take_along_axis(scores, idx, axis=1)
        else:
            top_s, idx = streaming_topk(
                params, cfg, jnp.asarray(t), jnp.asarray(m),
                k=sc.top_k, chunk=sc.entity_chunk, similarity=sc.similarity)
            top_s, idx = np.asarray(top_s), np.asarray(idx)

        for qi in range(n):
            qid = qids[lo + qi]
            if m[qi] == 0:
                continue  # all-OOV query: no meaningful scores
            order = np.argsort(-top_s[qi], kind="stable")
            run[qid] = [(entity_names[idx[qi, j]], float(top_s[qi, j]))
                        for j in order]
    return run
