"""Decompose the flagship train step's wall clock: loss vs optimizer.

The fused sampled-LSE kernel (round 4) took the k=16384 flagship step to
~13 ms, and the NOTES arithmetic says exact dense adam's HBM floor at
E=1M/d=128 is ~6 passes over p/mu/nu (~3.8 GB -> ~4.7 ms at v5e HBM),
yet dense adam was measured at 11.75 ms/step standalone. This probe
times matched variants of the SAME step (fused sampled loss, B=4096,
steps_per_call scan, donated state, host-fetch fenced) to find where
the non-loss milliseconds actually go:

  full          make_train_step as deployed (optax adam + global_norm
                metric) -- the production step.
  optax_nognorm optax adam, grad_norm metric replaced by 0.0
                -> isolates the per-step dense global_norm pass.
  manual_adam   hand-fused adam (one elementwise DAG: reads p/mu/nu/g,
                writes p/mu/nu; no optax chain temporaries), no gnorm
                -> isolates optax composition overhead.
  manual_sgd    p -= lr * g, no optimizer state, no gnorm
                -> lower bound: loss fwd+bwd + dense-grad scatter +
                   one read-modify-write pass over params.

Usage: python benchmarks/opt_probe.py [--entities 1000000] [--negatives
       16384] [--iters 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _batches(V, E, B, spc, w=16):
    def batch(seed):
        import jax.numpy as jnp
        r = np.random.default_rng(seed)
        return {
            "windows": jnp.asarray(
                r.integers(0, V, size=(spc, B, w)).astype(np.int32)),
            "lengths": jnp.asarray(np.full((spc, B), w, np.int32)),
            "entities": jnp.asarray(
                r.integers(0, E, size=(spc, B)).astype(np.int32)),
        }
    return batch


def main(E, V=250_000, d=128, B=4096, spc=4, iters=12, k=16384,
         platform=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import optax

    from benchmarks.fence import make_param_fence
    from sert_tpu.models import api
    from sert_tpu.train.step import TrainState, init_state, make_train_step
    from sert_tpu.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig(model="lse", objective="sampled_softmax",
                       vocab_size=V, num_entities=E, word_dim=d,
                       entity_dim=d, num_negatives=k, fused_softmax="on")
    tcfg = TrainConfig(batch_size=B, optimizer="adam", learning_rate=1e-3,
                       steps_per_call=spc)
    batch = _batches(V, E, B, spc)

    def scan_wrap(inner):
        def step(state, stacked):
            state, metrics = jax.lax.scan(inner, state, stacked)
            return state, jax.tree.map(lambda m: m[-1], metrics)
        return jax.jit(step, donate_argnums=(0,))

    def make_custom(update_fn):
        """A step matching make_train_step's structure, with the optimizer
        application swapped and the grad_norm metric pinned to 0."""
        def inner(state, b):
            rng, sub = jax.random.split(state.rng)
            loss, grads = jax.value_and_grad(api.loss_fn)(
                state.params, b, mcfg, rng=sub, noise=None)
            params, opt_state = update_fn(state.params, grads,
                                          state.opt_state, state.step)
            new = TrainState(params=params, opt_state=opt_state,
                             step=state.step + 1, rng=rng)
            return new, {"loss": loss, "grad_norm": jnp.zeros(())}
        return scan_wrap(inner)

    lr, b1, b2, eps = tcfg.learning_rate, 0.9, 0.999, 1e-8

    def manual_adam(params, grads, opt_state, step):
        mu, nu = opt_state
        t = (step + 1).astype(jnp.float32)
        c1 = 1.0 - jnp.power(b1, t)
        c2 = 1.0 - jnp.power(b2, t)

        def upd(p, g, m, v):
            g = g.astype(jnp.float32)
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            p = p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
            return p, m, v
        out = {kk: upd(params[kk], grads[kk], mu[kk], nu[kk]) for kk in params}
        return ({kk: o[0] for kk, o in out.items()},
                ({kk: o[1] for kk, o in out.items()},
                 {kk: o[2] for kk, o in out.items()}))

    def manual_sgd(params, grads, opt_state, step):
        return ({kk: params[kk] - lr * grads[kk].astype(params[kk].dtype)
                 for kk in params}, opt_state)

    def fresh_state(variant):
        st = init_state(jax.random.key(0), mcfg, tcfg)
        if variant == "manual_adam":
            zeros = jax.tree.map(jnp.zeros_like, st.params)
            return st._replace(opt_state=(zeros,
                                          jax.tree.map(jnp.zeros_like,
                                                       st.params)))
        if variant == "manual_sgd":
            return st._replace(opt_state=())
        return st

    def optax_step(gnorm):
        opt = optax.adam(lr)

        def inner(state, b):
            rng, sub = jax.random.split(state.rng)
            loss, grads = jax.value_and_grad(api.loss_fn)(
                state.params, b, mcfg, rng=sub, noise=None)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            params = optax.apply_updates(state.params, updates)
            new = TrainState(params=params, opt_state=opt_state,
                             step=state.step + 1, rng=rng)
            gn = optax.global_norm(grads) if gnorm else jnp.zeros(())
            return new, {"loss": loss, "grad_norm": gn}
        return scan_wrap(inner)

    variants = [
        ("full", make_train_step(mcfg, tcfg)),
        ("optax_nognorm", optax_step(gnorm=False)),
        ("manual_adam", make_custom(manual_adam)),
        ("manual_sgd", make_custom(manual_sgd)),
    ]
    results = {}
    for name, step in variants:
        state = fresh_state(name if name.startswith("manual") else "optax")
        t0 = time.time()
        state, m = step(state, batch(1))
        print(f"{name}: compile+first {time.time()-t0:.1f}s "
              f"(loss {float(m['loss']):.4f})", flush=True)
        pfence = make_param_fence(state)
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, batch(2 + i))
            _ = float(m["loss"])
        pfence(state)
        ms = (time.time() - t0) / (iters * spc) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/step = {1e3/ms:.0f} steps/s",
              flush=True)
        del state, step

    print("\ndecomposition:")
    print(f"  global_norm pass: {results['full'] - results['optax_nognorm']:+.2f} ms")
    print(f"  optax vs manual adam: "
          f"{results['optax_nognorm'] - results['manual_adam']:+.2f} ms")
    print(f"  adam state traffic over sgd: "
          f"{results['manual_adam'] - results['manual_sgd']:+.2f} ms")
    print(f"  loss+scatter+sgd floor: {results['manual_sgd']:.2f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--negatives", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--platform", default=None)
    a = ap.parse_args()
    main(a.entities, k=a.negatives, iters=a.iters, platform=a.platform)
