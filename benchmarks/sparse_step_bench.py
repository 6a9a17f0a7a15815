"""A/B the row-sparse lazy optimizer step against the dense step on chip.

Stress-1M configuration (E=1M, V=250k, d=128, B=4096, k=1024 shared
negatives, adam, steps_per_call=4): the dense step's per-step HBM bill is
dominated by the materialized [E,d]/[V,d] scatter-add gradients plus
adam's full moment-pair read/rewrite (~3.5 GB/step of traffic carrying
~0.2% information); the lazy path (train/sparse.py) touches only the
~37k visited rows. This bench reports ms/step for both paths on the real
chip — the number NOTES.md's "optimizer update is the largest non-kernel
cost" row is settled by.

Usage: python benchmarks/sparse_step_bench.py [--entities 1000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(E, V=250_000, d=128, B=4096, k=1024, spc=4, iters=10):
    import jax
    import jax.numpy as jnp

    from sert_tpu.train.step import init_state, make_train_step
    from sert_tpu.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig(model="lse", vocab_size=V, num_entities=E,
                       word_dim=d, entity_dim=d,
                       objective="sampled_softmax", num_negatives=k,
                       negative_distribution="unigram",
                       compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.random(E).astype(np.float32))

    def batch(seed):
        r = np.random.default_rng(seed)
        return {
            "windows": jnp.asarray(
                r.integers(0, V, size=(spc, B, 8)).astype(np.int32)),
            "lengths": jnp.asarray(np.full((spc, B), 8, np.int32)),
            "entities": jnp.asarray(
                r.integers(0, E, size=(spc, B)).astype(np.int32)),
        }

    out = {}
    for mode in ("off", "on"):
        tcfg = TrainConfig(batch_size=B, optimizer="adam",
                           learning_rate=3e-3, steps_per_call=spc,
                           sparse_update=mode)
        state = init_state(jax.random.key(0), mcfg, tcfg)
        step = make_train_step(mcfg, tcfg, noise=noise)
        t0 = time.time()
        state, m = step(state, batch(1))
        _ = float(m["loss"])         # host fetch: block_until_ready has
        print(f"{mode}: compile+first {time.time()-t0:.1f}s", flush=True)
        # ... been observed returning EARLY through the axon relay (see
        # fused_step_bench.py / NOTES.md round-3), so fence every call
        # with a host fetch of its loss — and fence the FINAL call's
        # optimizer writes too (the dense arm's full scatter + moment
        # rewrite is the very cost being A/B'd): benchmarks/fence.py.
        from benchmarks.fence import make_param_fence
        pfence = make_param_fence(state)
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, batch(2 + i))
            _ = float(m["loss"])
        pfence(state)
        ms = (time.time() - t0) / (iters * spc) * 1e3
        out[mode] = ms
        print(f"{mode}: {ms:.2f} ms/step (steps_per_call={spc})", flush=True)
        del state, step
    print(f"speedup dense/sparse: {out['off'] / out['on']:.2f}x", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=1_000_000)
    a = ap.parse_args()
    main(a.entities)
