"""The 'prepare' step: collection -> vocabulary + instance shards.

Mirrors SURVEY.md section 4.1 end to end: parse, tokenize (pass 1: counts;
pass 2: encode), associate, window, serialize. Works from any in-memory or
streaming (doc_id, text) source, so the synthetic generator and the real
corpus parsers share one path.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional, Tuple

from sert_tpu.data.assoc import Associations, EntityRegistry
from sert_tpu.data.instances import InstanceWriter
from sert_tpu.data.tokenize import tokenize
from sert_tpu.data.vocab import Vocabulary
from sert_tpu.data.windows import extract_windows
from sert_tpu.utils.config import DataConfig
from sert_tpu.utils.logging import get_logger

log = get_logger("prepare")

VOCAB_NAME = "vocab.json"
ENTITIES_NAME = "entities.json"
ASSOC_NAME = "assoc.json"


def _tok(text: str, cfg: DataConfig):
    return tokenize(
        text,
        lowercase=cfg.lowercase,
        filter_stopwords=cfg.filter_stopwords,
        min_token_len=cfg.min_token_len,
        drop_numeric=cfg.drop_numeric,
    )


def prepare(
    docs: Dict[str, str],
    assoc: Associations,
    registry: EntityRegistry,
    out_dir: str,
    cfg: DataConfig,
    use_native: bool = True,
) -> Dict:
    """Run the full prepare pipeline; returns the instance meta dict.

    ``use_native`` routes the hot window sweep through the C++ feeder when
    the extension is built (sert_tpu/native), with identical output.
    """
    os.makedirs(out_dir, exist_ok=True)

    log.info("prepare: pass 1 (vocabulary) over %d docs", len(docs))
    vocab = Vocabulary.build(
        (_tok(text, cfg) for text in docs.values()),
        max_size=cfg.vocab_max_size,
        min_count=cfg.vocab_min_count,
    )
    vocab.save(os.path.join(out_dir, VOCAB_NAME))
    registry.save(os.path.join(out_dir, ENTITIES_NAME))
    assoc.save(os.path.join(out_dir, ASSOC_NAME))

    native = None
    if use_native:
        from sert_tpu.native import loader as native_loader
        native = native_loader.maybe_load()

    log.info("prepare: pass 2 (windows) vocab=%d entities=%d", len(vocab), len(registry))
    writer = InstanceWriter(
        out_dir,
        window_size=cfg.window_size,
        instances_per_shard=cfg.instances_per_shard,
        seed=cfg.seed,
    )
    n_docs_used = 0
    for doc_id, text in docs.items():
        ents = assoc.entities_for(doc_id)
        if not ents:
            continue
        token_ids = vocab.encode(_tok(text, cfg))
        if native is not None:
            w, l, e = native.extract_windows(token_ids, ents, cfg.window_size, cfg.stride)
        else:
            w, l, e = extract_windows(token_ids, ents, cfg.window_size, cfg.stride)
        if w.shape[0]:
            writer.add(w, l, e)
            n_docs_used += 1

    meta = writer.finalize(extra_meta={
        "vocab_size": len(vocab),
        "num_entities": len(registry),
        "vocab_hash": vocab.content_hash(),
        "docs_used": n_docs_used,
    })
    log.info("prepare: wrote %d instances in %d shards",
             meta["num_instances"], len(meta["shards"]))
    return meta


def encode_queries(
    topics: Dict[str, str],
    vocab: Vocabulary,
    cfg: DataConfig,
) -> Dict[str, list]:
    """Tokenize + encode topics with the SAME preprocessing as documents
    (OOV query terms are dropped, reference semantics)."""
    return {tid: vocab.encode(_tok(text, cfg)) for tid, text in topics.items()}
