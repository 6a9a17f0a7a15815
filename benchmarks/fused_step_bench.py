"""A/B the optimizer-in-backward fused step against the dense step on chip.

BASELINE.md's dense-softmax train rows (E=500k full softmax, B=1024,
fused kernel) measured 122 steps/s (adam) / 139 (adagrad) in round 2. The
dense step's [d, E] matrix traffic is 10 passes/step (fwd W; bwd W + dW
write; optimizer dW/m/v/W reads + W/m/v writes); the fused-update step
(train/fused.py) is 7. This bench reports ms/step and steps/s for
fused_update on/off per optimizer — the number docs/STATUS.md round-3
item 13's "pass arithmetic predicts ~+40%" claim is settled by.

Usage: python benchmarks/fused_step_bench.py [--entities 500000]
       [--dim 256] [--batch 1024] [--optimizers adam,adagrad,sgd]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(E, V=60_000, d=256, B=1024, spc=8, iters=10,
         optimizers=("adam", "adagrad", "sgd"), platform=None,
         dtype="float32"):
    import jax
    if platform:                 # env JAX_PLATFORMS is pinned to axon by
        jax.config.update("jax_platforms", platform)  # the site hook
    import jax.numpy as jnp

    from sert_tpu.train.step import init_state, make_train_step
    from sert_tpu.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig(model="loglinear", vocab_size=V, num_entities=E,
                       word_dim=d, fused_softmax="on", compute_dtype=dtype)

    def batch(seed):
        r = np.random.default_rng(seed)
        return {
            "windows": jnp.asarray(
                r.integers(0, V, size=(spc, B, 8)).astype(np.int32)),
            "lengths": jnp.asarray(np.full((spc, B), 8, np.int32)),
            "entities": jnp.asarray(
                r.integers(0, E, size=(spc, B)).astype(np.int32)),
        }

    for optn in optimizers:
        out = {}
        for mode in ("off", "on"):
            tcfg = TrainConfig(batch_size=B, optimizer=optn,
                               learning_rate=1e-2, steps_per_call=spc,
                               fused_update=mode)
            state = init_state(jax.random.key(0), mcfg, tcfg)
            step = make_train_step(mcfg, tcfg)
            t0 = time.time()
            state, m = step(state, batch(1))
            print(f"{optn}/{mode}: compile+first {time.time()-t0:.1f}s "
                  f"(first loss {float(m['loss']):.4f})", flush=True)
            # Fence each call with a HOST FETCH of its loss:
            # jax.block_until_ready has been observed returning early on
            # the axon relay (an adam/off run "measured" 0.17 ms/step
            # while float() later blocked for the full compute). The
            # per-call fetch adds one tunnel RTT (~1.4 ms) per spc-step
            # call — noise against the ~50-90 ms of real work per call.
            # Also fence the FINAL call's optimizer writes (the loss is
            # ready before they land): benchmarks/fence.py.
            from benchmarks.fence import make_param_fence
            pfence = make_param_fence(state)
            t0 = time.time()
            for i in range(iters):
                state, m = step(state, batch(2 + i))
                _ = float(m["loss"])
            pfence(state)
            ms = (time.time() - t0) / (iters * spc) * 1e3
            out[mode] = ms
            print(f"{optn}/{mode}: {ms:.2f} ms/step = {1e3/ms:.0f} steps/s "
                  f"(steps_per_call={spc}) loss={float(m['loss']):.4f}",
                  flush=True)
            del state, step
        print(f"{optn}: fused speedup {out['off'] / out['on']:.2f}x",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--spc", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--optimizers", default="adam,adagrad,sgd")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute_dtype (BASELINE.md rows are bfloat16)")
    ap.add_argument("--platform", default=None,
                    help="override jax platform (e.g. cpu for smoke runs)")
    a = ap.parse_args()
    main(a.entities, d=a.dim, B=a.batch, spc=a.spc, iters=a.iters,
         optimizers=tuple(a.optimizers.split(",")), platform=a.platform,
         dtype=a.dtype)
