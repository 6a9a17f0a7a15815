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
    sweeps_per_iter: int = 10,
    model: str = "lse",
    seed: int = 0,
    engine: str = "auto",   # "pallas" | "streaming" | "auto"
    layout: str = "natural",        # pallas staging: "natural"|"clustered"
    adaptive_bins: int = 0,         # pallas: two-phase rescore bin budget
    params_npz: Optional[str] = None,  # checkpoint npz: bench TRAINED params
) -> Dict[str, float]:
    """Timing honesty notes (benchmarks/NOTES.md): on the tunneled axon
    platform block_until_ready does NOT wait for execution, and each
    dispatch pays ~24 ms RTT — so sweeps run inside ONE jit (lax.scan, with
    per-sweep-varying queries) and a scalar is fetched to host to fence."""
    import jax
    import jax.numpy as jnp
    from sert_tpu.models import api
    from sert_tpu.scoring.scorer import (_entity_matrix, pallas_topk,
                                         streaming_topk)
    from sert_tpu.utils.config import ModelConfig

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "streaming"

    if params_npz:
        # Trained-geometry benchmarking (clustered layout / adaptive
        # rescore only matter when winners CLUSTER, which random params
        # cannot show). Host-side npz read, minimal device upload —
        # the tunnel moves a few MB/s (NOTES.md platform gotchas).
        import io
        with open(params_npz, "rb") as fh:
            z = np.load(io.BytesIO(fh.read()))
        p_host = {name: z[f".params['{name}']"]
                  for name in ("word_emb", "entity_emb", "proj_w", "proj_b")}
        num_entities, dim = p_host["entity_emb"].shape
        vocab = p_host["word_emb"].shape[0]
        cfg = ModelConfig(model="lse", vocab_size=vocab,
                          num_entities=num_entities, word_dim=dim,
                          entity_dim=dim)
        params = {k_: jnp.asarray(v) for k_, v in p_host.items()}
    else:
        cfg = ModelConfig(model=model, vocab_size=vocab,
                          num_entities=num_entities, word_dim=dim,
                          entity_dim=dim)
        params = api.init_params(jax.random.key(seed), cfg)
    rng = np.random.default_rng(seed)
    term_ids = jnp.asarray(
        rng.integers(0, vocab, size=(num_queries, num_terms)).astype(np.int32))
    num_terms_arr = jnp.asarray(np.full(num_queries, num_terms, np.int32))

    prep = None
    if engine == "pallas":
        from sert_tpu.ops.exact_topk import prepare_entities
        # Throughput configuration: bf16 rescore (same numeric class as the
        # bf16 prefilter and as TPU's DEFAULT-precision f32 matmuls; the
        # scoring CLI default remains fp32 rescore).
        prep = prepare_entities(_entity_matrix(params, cfg, "dot"),
                                rescore_dtype="bfloat16", layout=layout)

    n_sweep = sweeps_per_iter

    @jax.jit
    def run_sweeps(params, term_ids, num_terms_arr, prep):
        def body(c, o):
            tids = jnp.where(term_ids + o < vocab, term_ids + o, term_ids)
            if engine == "pallas":
                s, i = pallas_topk(params, cfg, tids, num_terms_arr, k=k,
                                   prep=prep, adaptive_bins=adaptive_bins)
            else:
                s, i = streaming_topk(params, cfg, tids, num_terms_arr,
                                      k=k, chunk=chunk)
            return c + s[0, 0] + jnp.float32(i[0, 0]), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n_sweep, dtype=jnp.int32))
        return out

    float(run_sweeps(params, term_ids, num_terms_arr, prep))  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run_sweeps(params, term_ids, num_terms_arr, prep))  # host fence
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_sweep

    scored = num_queries * num_entities
    return {
        "entities_per_sec": scored / dt,
        "sec_per_batch": dt,
        "num_entities": num_entities,
        "num_queries": num_queries,
        "engine": engine,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def measure_train_steps_per_sec(
    num_entities: int = 1100,
    vocab: int = 50_000,
    dim: int = 128,
    batch_size: int = 1024,
    window: int = 8,
    iters: int = 8,
    steps_per_call: int = 16,
    model: str = "loglinear",
    optimizer: str = "adam",
    compute_dtype: str = "float32",
    seed: int = 0,
) -> Dict[str, float]:
    """Honest steps/s: micro-steps scanned inside one compiled call
    (TrainConfig.steps_per_call, the shipped-recipe configuration) and a
    host scalar fetch as the fence — block_until_ready does NOT wait on the
    tunneled platform (NOTES.md)."""
    import jax
    from sert_tpu.train.step import init_state, make_train_step
    from sert_tpu.utils.config import ModelConfig, TrainConfig

    cfg = ModelConfig(model=model, vocab_size=vocab, num_entities=num_entities,
                      word_dim=dim, entity_dim=dim,
                      compute_dtype=compute_dtype)
    tcfg = TrainConfig(batch_size=batch_size, learning_rate=1e-3,
                       donate_state=True, optimizer=optimizer,
                       steps_per_call=steps_per_call)
    state = init_state(jax.random.key(seed), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(seed)
    lead = (steps_per_call,) if steps_per_call > 1 else ()
    batch = {
        "windows": rng.integers(0, vocab, size=lead + (batch_size, window)).astype(np.int32),
        "lengths": np.full(lead + (batch_size,), window, np.int32),
        "entities": rng.integers(0, num_entities, size=lead + (batch_size,)).astype(np.int32),
    }
    batch = {k_: jax.device_put(v) for k_, v in batch.items()}

    state, m = step(state, batch)  # compile
    float(m["loss"])               # host fetch = the only real fence here
    # The loss is ready BEFORE the final call's optimizer writes land
    # (observed: params fetch blocked ~2s after the loss was available),
    # so also fence on a param scalar: benchmarks/fence.py (pre-compiled
    # there, outside the timed region).
    from benchmarks.fence import make_param_fence
    param_fence = make_param_fence(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    param_fence(state)
    dt = (time.perf_counter() - t0) / (iters * max(steps_per_call, 1))
    return {
        "steps_per_sec": 1.0 / dt,
        "instances_per_sec": batch_size / dt,
        "platform": jax.devices()[0].platform,
    }


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser(description="entity-scoring throughput")
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sweeps", type=int, default=50)
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--layout", default="natural")
    ap.add_argument("--adaptive-bins", type=int, default=0)
    ap.add_argument("--params-npz", default=None,
                    help="checkpoint npz path: bench the TRAINED matrix")
    a = ap.parse_args()
    r = measure_entities_per_sec(
        num_entities=a.entities, num_queries=a.queries, iters=a.iters,
        sweeps_per_iter=a.sweeps, engine=a.engine, layout=a.layout,
        adaptive_bins=a.adaptive_bins, params_npz=a.params_npz)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in r.items()}))
