"""Single-query serving latency: the production number bench.py's
batch-throughput figure does not show.

A serve deployment cares about ms/query at low concurrency, where the
engine's query tile (tq) is mostly padding: exact_topk_prepared pads Q up
to tq, so a lone query pays a tq-row sweep. This harness measures the
staged engine end to end (query rep + sweep + selection) at several batch
sizes and tq settings on the real chip, with the same fencing discipline
as score_bench (scalar fetch; per-dispatch tunnel RTT reported separately
so on-chip latency and tunnel-inflated latency are both visible).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_serve_latency(
    num_entities: int = 1_000_000,
    dim: int = 128,
    num_terms: int = 4,
    vocab: int = 50_000,
    k: int = 100,
    iters: int = 30,
    seed: int = 0,
) -> Dict:
    import jax
    import jax.numpy as jnp

    from sert_tpu.models import api
    from sert_tpu.ops.exact_topk import exact_topk_prepared, prepare_entities
    from sert_tpu.scoring.scorer import _entity_matrix, _query_reps_and_terms
    from sert_tpu.utils.config import ModelConfig

    cfg = ModelConfig(model="lse", vocab_size=vocab,
                      num_entities=num_entities, word_dim=dim,
                      entity_dim=dim)
    params = api.init_params(jax.random.key(seed), cfg)
    prep = prepare_entities(_entity_matrix(params, cfg, "dot"),
                            rescore_dtype="bfloat16")
    jax.block_until_ready(prep.M_binned)
    rng = np.random.default_rng(seed)

    rows = []
    for Q, tq in ((1, 8), (1, 256), (16, 16), (64, 64), (256, 256)):
        t_ids = jnp.asarray(
            rng.integers(0, vocab, size=(Q, num_terms)).astype(np.int32))
        n_t = jnp.asarray(np.full(Q, num_terms, np.int32))

        # params/prep as ARGUMENTS: closed-over device arrays embed as
        # jaxpr constants and the remote-compile request would ship the
        # 256MB staged matrix (HTTP 413 on the tunnel).
        @jax.jit
        def one_batch(params, prep, t_ids, n_t):
            R, _, _ = _query_reps_and_terms(params, cfg, t_ids, n_t, "dot")
            s, i = exact_topk_prepared(R.astype(jnp.float32), prep, k=k,
                                       tq=tq)
            return s[0, 0] + jnp.float32(i[0, 0])

        float(one_batch(params, prep, t_ids, n_t))  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(one_batch(params, prep, t_ids, n_t))
            times.append(time.perf_counter() - t0)
        times = np.asarray(times)
        # Per-dispatch floor on this platform = the tunnel RTT; report the
        # min as "with RTT" and min-minus-RTT estimate via the spread.
        rows.append({
            "Q": Q, "tq": tq,
            "ms_per_dispatch": float(times.min() * 1e3),
            "ms_per_query": float(times.min() * 1e3 / Q),
        })
    return {"num_entities": num_entities, "k": k,
            "platform": jax.devices()[0].platform, "rows": rows}


def measure_concurrent_serving(
    num_entities: int = 50_000,
    num_clients: int = 64,
    queries_per_client: int = 8,
    seed: int = 0,
    workdir: str = "/tmp/serve_conc_bench",
) -> Dict:
    """Concurrent-client throughput through the REAL serving stack
    (EntitySearcher + micro-batcher), vs the sequential baseline.

    Builds a small-doc synthetic collection at ``num_entities``, trains one
    fast epoch (serving only needs a loadable checkpoint), then drives the
    searcher with ``num_clients`` threads issuing ``queries_per_client``
    searches each. Before the micro-batcher, concurrent clients serialized
    one ~dispatch each (~200 q/s at 1M entities); with queue-drain
    batching the engine call amortizes over every request that arrived
    while the previous one was in flight."""
    import dataclasses
    import threading

    from sert_tpu import pipeline, recipes
    from sert_tpu.data.synthetic import make_synthetic
    from sert_tpu.serving import EntitySearcher

    recipe = recipes.amazon_musical_instruments()
    recipe = dataclasses.replace(
        recipe,
        train=dataclasses.replace(recipe.train, num_epochs=1,
                                  steps_per_call=8),
        score=dataclasses.replace(recipe.score, query_batch=256))
    col = make_synthetic(num_entities=num_entities, vocab_size=30_000,
                         docs_per_entity=1, doc_len=24, num_topics=256,
                         seed=seed)
    data, run = f"{workdir}/data", f"{workdir}/run"
    if not os.path.exists(f"{run}/checkpoints"):
        pipeline.prepare_collection(col, data, recipe)
        pipeline.train_from_dir(recipe, data, run, resume=False)
    s = EntitySearcher(recipe, data, run, k=10, query_batch=256)

    topics = sorted(col.topics)
    texts = [col.topics[t] for t in topics]
    n_total = num_clients * queries_per_client

    # Sequential baseline: one client, one dispatch per query.
    seq_n = min(64, len(texts))
    t0 = time.perf_counter()
    for i in range(seq_n):
        s.search(texts[i % len(texts)])
    seq_s = time.perf_counter() - t0

    base = dict(s.stats)
    results = [0] * num_clients

    def client(ci):
        ok = 0
        for j in range(queries_per_client):
            if s.search(texts[(ci * queries_per_client + j) % len(texts)]):
                ok += 1
        results[ci] = ok

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(num_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_s = time.perf_counter() - t0
    d = s.stats["dispatches"] - base["dispatches"]
    assert sum(results) == n_total

    import jax
    return {
        "num_entities": num_entities,
        "platform": jax.devices()[0].platform,
        "sequential_qps": round(seq_n / seq_s, 1),
        "concurrent_clients": num_clients,
        "concurrent_qps": round(n_total / conc_s, 1),
        "engine_dispatches": d,
        "queries_per_dispatch": round(n_total / max(d, 1), 1),
        "speedup_vs_sequential": round((n_total / conc_s) / (seq_n / seq_s),
                                       1),
    }


if __name__ == "__main__":
    import json
    which = sys.argv[1] if len(sys.argv) > 1 else "latency"
    if which == "concurrent":
        print(json.dumps(measure_concurrent_serving(), indent=2))
    else:
        print(json.dumps(measure_serve_latency(), indent=2))
