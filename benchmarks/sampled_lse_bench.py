"""A/B the fused sampled-LSE kernel against the XLA composition on chip.

The round-4 negatives ladder (benchmarks/NOTES.md) measured the flagship
1M train dropping 108 -> 57 steps/s as the shared-candidate count climbs
1024 -> 16384: the [B, k] corrected-logits array (fp32, materialized for
fwd, accidental-hit where, and grad) is the step's HBM bill while the MXU
work stays nearly free. ops/sampled_lse.py is the flash treatment — this
bench reports ms/step and steps/s for fused_softmax on/off per k at the
flagship shapes (B=4096, d=128, E=1M, adam), settling what the kernel
buys at each rung of the ladder.

Usage: python benchmarks/sampled_lse_bench.py [--entities 1000000]
       [--negatives 2048,8192,16384] [--batch 4096] [--dim 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(E, V=250_000, d=128, B=4096, spc=8, iters=10,
         negatives=(2048, 8192, 16384), platform=None, optimizer="adam"):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from benchmarks.fence import make_param_fence
    from sert_tpu.train.step import init_state, make_train_step
    from sert_tpu.utils.config import ModelConfig, TrainConfig

    def batch(seed):
        r = np.random.default_rng(seed)
        return {
            "windows": jnp.asarray(
                r.integers(0, V, size=(spc, B, 16)).astype(np.int32)),
            "lengths": jnp.asarray(np.full((spc, B), 16, np.int32)),
            "entities": jnp.asarray(
                r.integers(0, E, size=(spc, B)).astype(np.int32)),
        }

    for k in negatives:
        mbase = ModelConfig(model="lse", objective="sampled_softmax",
                            vocab_size=V, num_entities=E, word_dim=d,
                            entity_dim=d, num_negatives=k)
        out = {}
        for mode in ("off", "on"):
            mcfg = mbase.replace(fused_softmax=mode)
            tcfg = TrainConfig(batch_size=B, optimizer=optimizer,
                               learning_rate=1e-3, steps_per_call=spc)
            state = init_state(jax.random.key(0), mcfg, tcfg)
            step = make_train_step(mcfg, tcfg)
            t0 = time.time()
            state, m = step(state, batch(1))
            print(f"k={k}/{mode}: compile+first {time.time()-t0:.1f}s "
                  f"(first loss {float(m['loss']):.4f})", flush=True)
            # Host-fetch fences only (benchmarks/fence.py: the relay has
            # returned early from block_until_ready before).
            pfence = make_param_fence(state)
            t0 = time.time()
            for i in range(iters):
                state, m = step(state, batch(2 + i))
                _ = float(m["loss"])
            pfence(state)
            ms = (time.time() - t0) / (iters * spc) * 1e3
            out[mode] = ms
            print(f"k={k}/{mode}: {ms:.2f} ms/step = {1e3/ms:.0f} steps/s "
                  f"(steps_per_call={spc}) loss={float(m['loss']):.4f}",
                  flush=True)
            del state, step
        print(f"k={k}: fused speedup {out['off'] / out['on']:.2f}x",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--spc", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--negatives", default="2048,8192,16384")
    ap.add_argument("--optimizer", default="adam")
    ap.add_argument("--platform", default=None)
    a = ap.parse_args()
    main(a.entities, d=a.dim, B=a.batch, spc=a.spc, iters=a.iters,
         negatives=tuple(int(x) for x in a.negatives.split(",")),
         platform=a.platform, optimizer=a.optimizer)
