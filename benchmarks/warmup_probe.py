"""Decompose the flagship run's pre-epoch-0 warmup (round-4 weak #4).

The round-4 flagship e2e (run10k16f) carried ~310 s of wall before the
first logged step; the round-5 loop instrumentation (train/loop.py
"warmup" log) splits it into setup / device-init / pre-feeder /
first-batch / first-step. This probe replays exactly the stages of
train() up to the first step on the existing prepared 1M data dir, with
a fine-grained timer around each candidate (step construction, device
init per leaf, the resume probe, num_batches_per_epoch, the feeder
construction, the first int(state.step) device sync, the first batch,
the first compiled step), so the bucket's contents get names.

RESOLVED (NOTES.md round 5): the stall sits at the first
int(state.step) even though every state leaf block_until_ready's
instantly — on the remote-compile platform the ~20 tiny eager
init_state programs (each its own server-side compile, each below the
persistent cache's entry threshold) drain only at the first
device->host transfer (50 s in this sequential replay, 257 s in the
live run where the feeder thread concurrently enqueues H2D puts). The
train loop now jits init_state as one cacheable program; the live
step_sync measured 257.6 -> 0.56 s. This probe still calls the EAGER
init_state deliberately, so the failure mode stays reproducible;
benchmarks/init_probe.py holds the eager-vs-jitted A/B.

Usage (chip must be otherwise idle):
    python benchmarks/warmup_probe.py [--workdir /tmp/stress_1m]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time


def main(workdir):
    from benchmarks.stress_1m import build_recipe

    marks = {}
    t = time.perf_counter()

    def mark(name):
        nonlocal t
        now = time.perf_counter()
        marks[name] = round(now - t, 2)
        print(f"{name}: {marks[name]}s", flush=True)
        t = now

    import jax

    from sert_tpu import pipeline
    from sert_tpu.data.instances import InstanceDataset
    from sert_tpu.models import lse as lse_model
    from sert_tpu.train.step import init_state, make_train_step
    import numpy as np

    ddir = os.path.join(workdir, "data")
    ds = InstanceDataset(ddir, seed=0)
    recipe = pipeline.resolve_model_config(
        build_recipe(0, 0, epochs=10, lr_schedule="cosine",
                     num_negatives=16384), ds.meta)
    mcfg, tcfg = recipe.model, recipe.train
    mark("dataset+recipe")

    from sert_tpu.data import Associations
    assoc = Associations.load(os.path.join(ddir, "assoc.json"))
    counts = np.asarray(
        assoc.entity_instance_counts(mcfg.num_entities), np.float64)
    mark("assoc_counts")

    noise = lse_model.noise_logits(counts, mcfg)
    mark("noise_logits")

    import dataclasses
    horizon = tcfg.num_epochs * ds.num_batches_per_epoch(tcfg.batch_size)
    tcfg = dataclasses.replace(tcfg, lr_decay_steps=horizon)
    step_fn = make_train_step(mcfg, tcfg, noise=noise)
    mark("make_train_step")

    state = init_state(jax.random.key(tcfg.seed), mcfg, tcfg)
    mark("init_state_dispatch")
    for name in sorted(state.params):
        jax.block_until_ready(state.params[name])
        mark(f"init_ready:{name}")
    jax.block_until_ready(jax.tree_util.tree_leaves(state.opt_state))
    mark("init_ready:opt_state")

    n_b = ds.num_batches_per_epoch(tcfg.batch_size)
    mark(f"num_batches({n_b})")

    s0 = int(state.step)
    mark(f"int_state_step({s0})")

    from sert_tpu.data import wirepack
    from sert_tpu.data.feeder import PrefetchFeeder
    from sert_tpu.train.loop import _group_batches

    V, E = mcfg.vocab_size, mcfg.num_entities
    packed = wirepack.feed_enabled(tcfg.packed_feed, V, E,
                                   recipe.data.window_size)
    pack_fn = (lambda b: wirepack.pack_batch(b, V, E)) if packed else None
    if packed:
        base = step_fn

        def step_fn2(s, pb):
            return base(s, wirepack.unpack_batch_jnp(pb, V, E))
        step_fn = jax.jit(step_fn2, donate_argnums=())
    mark(f"wirepack(packed={packed})")

    batches = ds.iter_batches(tcfg.batch_size, epoch=0)
    grouped = _group_batches(batches, max(tcfg.steps_per_call, 1),
                             stack=tcfg.steps_per_call > 1)

    def put(item):
        b, cur = item
        hb = pack_fn(b) if pack_fn else b
        return jax.device_put(hb), cur

    feeder = PrefetchFeeder(grouped, put_fn=put)
    mark("feeder_ctor")
    it = iter(feeder)
    dev_batch, cur = next(it)
    jax.block_until_ready(dev_batch)
    mark("first_batch_ready")
    state, metrics = step_fn(state, dev_batch)
    loss = float(metrics["loss"])
    mark(f"first_step(loss={loss:.3f})")
    dev_batch, cur = next(it)
    state, metrics = step_fn(state, dev_batch)
    loss = float(metrics["loss"])
    mark("second_step")
    feeder.close()
    print(json.dumps(marks, indent=2))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/stress_1m")
    args = ap.parse_args()
    from sert_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main(args.workdir)
