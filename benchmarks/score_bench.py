"""Entity-scoring throughput benchmark (the BASELINE.json headline metric).

Measures entities scored per second per chip with the streaming top-k engine
on a 1M-entity LSE matrix: Q queries x E entities per iteration, timed after
a warmup compile, fenced with block_until_ready (SURVEY.md section 6,
tracing row: honest steps/sec only with an explicit fence).

The same harness runs on CPU (the self-measured stand-in for the reference's
Theano-CPU baseline, see BASELINE.md) and on TPU; bench.py reports the ratio.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def measure_entities_per_sec(
    num_entities: int = 1_000_000,
    dim: int = 128,
    num_queries: int = 256,
    num_terms: int = 4,
    vocab: int = 50_000,
    k: int = 100,
    chunk: int = 1 << 15,
    iters: int = 5,
    model: str = "lse",
    seed: int = 0,
) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp
    from sert_tpu.models import api
    from sert_tpu.scoring.scorer import streaming_topk
    from sert_tpu.utils.config import ModelConfig

    cfg = ModelConfig(model=model, vocab_size=vocab,
                      num_entities=num_entities, word_dim=dim, entity_dim=dim)
    params = api.init_params(jax.random.key(seed), cfg)
    rng = np.random.default_rng(seed)
    term_ids = jnp.asarray(
        rng.integers(0, vocab, size=(num_queries, num_terms)).astype(np.int32))
    num_terms_arr = jnp.asarray(np.full(num_queries, num_terms, np.int32))

    def run():
        s, i = streaming_topk(params, cfg, term_ids, num_terms_arr,
                              k=k, chunk=chunk)
        jax.block_until_ready((s, i))
        return s, i

    run()  # compile + warm caches
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters

    scored = num_queries * num_entities
    return {
        "entities_per_sec": scored / dt,
        "sec_per_batch": dt,
        "num_entities": num_entities,
        "num_queries": num_queries,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def measure_train_steps_per_sec(
    num_entities: int = 1100,
    vocab: int = 50_000,
    dim: int = 128,
    batch_size: int = 1024,
    window: int = 8,
    iters: int = 20,
    model: str = "loglinear",
    seed: int = 0,
) -> Dict[str, float]:
    import jax
    from sert_tpu.train.step import init_state, make_train_step
    from sert_tpu.utils.config import ModelConfig, TrainConfig

    cfg = ModelConfig(model=model, vocab_size=vocab, num_entities=num_entities,
                      word_dim=dim, entity_dim=dim)
    tcfg = TrainConfig(batch_size=batch_size, learning_rate=1e-3,
                       donate_state=True)
    state = init_state(jax.random.key(seed), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(seed)
    batch = {
        "windows": rng.integers(0, vocab, size=(batch_size, window)).astype(np.int32),
        "lengths": np.full(batch_size, window, np.int32),
        "entities": rng.integers(0, num_entities, size=batch_size).astype(np.int32),
    }
    batch = {k_: jax.device_put(v) for k_, v in batch.items()}

    state, m = step(state, batch)  # compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {
        "steps_per_sec": 1.0 / dt,
        "instances_per_sec": batch_size / dt,
        "platform": jax.devices()[0].platform,
    }
