"""Trained-geometry scoring bench: clustered layout x adaptive rescore.

The clustered staging layout and the two-phase adaptive rescore
(ops/exact_topk.py) only pay off when one query's winners CLUSTER —
which random matrices cannot show (their winner bins are uniformly
spread, so adaptive_bins always takes the fallback). This bench runs the
engine on the TRAINED 1M-entity matrix from the stress run
(benchmarks/stress_1m.py saves entity_emb.npy / topic_reps.npy into its
workdir) with the REAL evaluation topics as queries, across
(layout, adaptive_bins) configurations, and cross-checks exactness
between configurations on identical queries.

Timing discipline matches score_bench.py: sweeps scanned inside ONE jit
with per-sweep-varying queries (small renormalized perturbations of the
topic reps, so the query geometry stays trained), host scalar fetch as
the fence (block_until_ready does not wait on the tunneled platform —
benchmarks/NOTES.md platform gotchas).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_trained(workdir: str, num_queries: int):
    """Trained [E, d] matrix + real topic reps tiled/perturbed to Q rows,
    both cosine-normalized (the stress recipe's similarity)."""
    M = np.load(os.path.join(workdir, "entity_emb.npy")).astype(np.float32)
    R = np.load(os.path.join(workdir, "topic_reps.npy")).astype(np.float32)
    M /= np.maximum(np.linalg.norm(M, axis=-1, keepdims=True), 1e-9)
    R /= np.maximum(np.linalg.norm(R, axis=-1, keepdims=True), 1e-9)
    reps = -(-num_queries // R.shape[0])
    R = np.tile(R, (reps, 1))[:num_queries]
    return M, R


def bench_config(M_dev, R_dev, ref, layout: str, adaptive_bins: int,
                 k: int = 100, iters: int = 5, sweeps: int = 50,
                 noise: float = 0.02):
    """M_dev/R_dev are device-resident (the 512MB M upload through the
    tunnel is paid ONCE by the caller, not per config); ``ref`` is the
    natural-layout exact result on the unperturbed topics."""
    import jax
    import jax.numpy as jnp

    from sert_tpu.ops.exact_topk import exact_topk_prepared, prepare_entities

    t0 = time.time()
    prep = prepare_entities(M_dev, rescore_dtype="bfloat16", layout=layout)
    jax.block_until_ready(prep.M_binned)
    stage_s = time.time() - t0

    key = jax.random.key(0)

    @jax.jit
    def run_sweeps(R_dev, prep):
        def body(c, o):
            # per-sweep query variation INSIDE trained geometry: small
            # perturbation + renorm (defeats cross-sweep CSE without
            # changing the winner-clustering the bench exists to measure)
            eps = noise * jax.random.normal(jax.random.fold_in(key, o),
                                            R_dev.shape, jnp.float32)
            Rq = R_dev + eps
            Rq = Rq / jnp.maximum(
                jnp.linalg.norm(Rq, axis=-1, keepdims=True), 1e-9)
            s, i = exact_topk_prepared(Rq, prep, k=k,
                                       adaptive_bins=adaptive_bins)
            return c + s[0, 0] + jnp.float32(i[0, 0]), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(sweeps, dtype=jnp.int32))
        return out

    float(run_sweeps(R_dev, prep))      # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run_sweeps(R_dev, prep))  # host fetch = fence
        times.append(time.perf_counter() - t0)
    dt = min(times) / sweeps

    # Exactness evidence on the UNperturbed topics: scores must match the
    # plain natural-layout engine (same rescore dtype; indices may swap
    # only on exact score ties).
    s_ref, i_ref = ref
    s_got, i_got = exact_topk_prepared(R_dev, prep, k=k,
                                       adaptive_bins=adaptive_bins)
    score_diff = float(jnp.max(jnp.abs(s_ref - s_got)))
    idx_match = float(jnp.mean((i_ref == i_got).astype(jnp.float32)))

    return {
        "layout": layout,
        "adaptive_bins": adaptive_bins,
        "sec_per_batch": dt,
        "entities_per_sec": R_dev.shape[0] * M_dev.shape[0] / dt,
        "stage_s": round(stage_s, 1),
        "max_score_diff_vs_natural": score_diff,
        "idx_agreement_vs_natural": idx_match,
    }


def winner_bin_stats(M, R, k: int = 100):
    """Mean/median number of DISTINCT bins holding one query's true top-k,
    natural vs clustered order — the quantity adaptive_bins converts into
    fewer gather bytes. Host/CPU-only (run with JAX_PLATFORMS=cpu: the
    tunneled chip would spend minutes just uploading the 512MB matrix)."""
    import jax.numpy as jnp

    from sert_tpu.ops.exact_topk import _cluster_order

    scores = R @ M.T
    top = np.argsort(-scores, axis=1)[:, :k]
    perm = np.asarray(_cluster_order(jnp.asarray(M)))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    out = {}
    for name, ids in (("natural", top), ("clustered", inv[top])):
        nb = [len(set((row // 128).tolist())) for row in ids]
        out[name] = {"mean_winner_bins": float(np.mean(nb)),
                     "p90": float(np.percentile(nb, 90))}
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/stress_1m")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--sweeps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--stats-only", action="store_true")
    ap.add_argument("--configs", default=(
        "natural:0,clustered:0,natural:64,clustered:32,clustered:48,"
        "clustered:64"))
    args = ap.parse_args()

    M, R = load_trained(args.workdir, args.queries)
    if args.stats_only:
        # The axon site plugin can override JAX_PLATFORMS after env setup
        # (same workaround as tests/conftest.py): pin through jax.config.
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(winner_bin_stats(M, R[:200]), indent=2))
        raise SystemExit(0)

    import jax.numpy as jnp

    from sert_tpu.ops.exact_topk import exact_topk_prepared, prepare_entities

    t0 = time.time()
    M_dev, R_dev = jnp.asarray(M), jnp.asarray(R)
    ref = exact_topk_prepared(
        R_dev, prepare_entities(M_dev, rescore_dtype="bfloat16"), k=100)
    ref = (ref[0].copy(), ref[1].copy())    # keep across config staging
    print(f"# upload + natural reference {time.time()-t0:.0f}s", flush=True)

    for spec in args.configs.split(","):
        layout, nb = spec.split(":")
        r = bench_config(M_dev, R_dev, ref, layout, int(nb),
                         iters=args.iters, sweeps=args.sweeps)
        print(json.dumps({k_: (round(v, 6) if isinstance(v, float) else v)
                          for k_, v in r.items()}), flush=True)
