"""Deterministic synthetic collections with planted term->entity structure.

The reference validated on W3C/CERC (TREC Enterprise) and Amazon review data
(SURVEY.md section 1), none of which can be downloaded offline. This module
generates a stand-in collection where the ranking signal is planted and
known: each entity owns a signature set of terms; its documents mix
signature terms (probability ``signal``) with background Zipf noise. A
correctly trained model must push the planted entity to the top for queries
drawn from its signature, so end-to-end NDCG@100 near 1.0 is achievable and
any large shortfall indicates a real bug (SURVEY.md section 5, test item 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class SyntheticCollection:
    docs: Dict[str, str]                    # doc_id -> raw text
    doc_entities: Dict[str, List[str]]      # doc_id -> entity names
    entities: List[str]                     # all entity names
    topics: Dict[str, str]                  # topic_id -> query text
    qrels: Dict[str, Dict[str, int]]        # topic_id -> {entity: grade}
    vocab_terms: List[str] = field(default_factory=list)


def _term(i: int) -> str:
    return f"term{i:06d}"


def make_synthetic(
    num_entities: int = 64,
    vocab_size: int = 2000,
    docs_per_entity: int = 12,
    doc_len: int = 120,
    signature_size: int = 12,
    signal: float = 0.7,
    num_topics: int = 32,
    query_len: int = 3,
    seed: int = 0,
) -> SyntheticCollection:
    """Build a planted-signal collection. Fully deterministic in ``seed``."""
    rng = np.random.default_rng(seed)
    terms = [_term(i) for i in range(vocab_size)]

    # Background Zipf distribution over the whole vocabulary.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    zipf = 1.0 / ranks
    zipf /= zipf.sum()

    # Signatures come from the mid/tail of the vocab (background Zipf noise
    # rarely collides with them). Deal consecutive slices of a shuffled
    # pool: disjoint while the pool lasts, then reshuffle and keep dealing —
    # large collections (entities * signature_size > pool) get overlapping
    # but still entity-identifying signatures.
    sig_pool = rng.permutation(np.arange(vocab_size // 4, vocab_size))
    signatures = []
    pos = 0
    for _ in range(num_entities):
        if pos + signature_size > sig_pool.shape[0]:
            sig_pool = rng.permutation(sig_pool)
            pos = 0
        signatures.append(sig_pool[pos:pos + signature_size].copy())
        pos += signature_size

    entities = [f"entity{i:04d}" for i in range(num_entities)]
    docs: Dict[str, str] = {}
    doc_entities: Dict[str, List[str]] = {}
    # One vectorized draw for every token of every document (a per-doc
    # Python loop took minutes at 200k entities).
    sig_matrix = np.stack(signatures)                       # [E, sig]
    shape = (num_entities, docs_per_entity, doc_len)
    sig_pick = sig_matrix[
        np.arange(num_entities)[:, None, None],
        rng.integers(0, signature_size, size=shape)]
    noise_pick = rng.choice(vocab_size, size=shape, p=zipf)
    token_ids = np.where(rng.random(shape) < signal, sig_pick, noise_pick)
    for ei, ent in enumerate(entities):
        for di in range(docs_per_entity):
            doc_id = f"doc-{ei:04d}-{di:03d}"
            docs[doc_id] = " ".join(terms[t] for t in token_ids[ei, di])
            doc_entities[doc_id] = [ent]

    # Topics: queries drawn from one entity's signature; that entity is the
    # single relevant answer (grade 1). Topic entities cycle deterministically.
    topics: Dict[str, str] = {}
    qrels: Dict[str, Dict[str, int]] = {}
    for ti in range(num_topics):
        ei = ti % num_entities
        q_terms = rng.choice(signatures[ei], size=query_len, replace=False)
        tid = f"T{ti:03d}"
        topics[tid] = " ".join(terms[t] for t in q_terms)
        qrels[tid] = {entities[ei]: 1}

    return SyntheticCollection(
        docs=docs,
        doc_entities=doc_entities,
        entities=entities,
        topics=topics,
        qrels=qrels,
        vocab_terms=terms,
    )
