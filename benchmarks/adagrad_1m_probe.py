"""Adagrad-at-scale mitigation probe (round-3 VERDICT item 7).

Round 3 measured adagrad CANNOT train the sampled-softmax LSE objective at
E=1M: loss pinned at ln(1M)=13.8 across lr 0.5..0.02, dense and lazy alike
(benchmarks/NOTES.md "Escape attempt"; mechanism: an early tanh-saturating
step kills the gradient and adagrad's monotone accumulator then locks the
step size). This probe runs the cheap, principled mitigations against that
mechanism, a few hundred steps each on the SAME prepared 1M data as the
stress run, and reports loss trajectories:

  * lr warmup (TrainConfig.lr_warmup_steps) — avoid the early huge step;
  * larger initial accumulator (adagrad_init_accumulator) — damp the first
    steps before the monotone sum takes over (step ~ g/sqrt(acc0));
  * larger eps (adagrad_eps) — floor the rsqrt;
  * gradient clipping (grad_clip_norm) — bound the saturating step;
  * adam at the recipe lr as the "this is what training looks like"
    reference trajectory at the identical budget.

A config "escapes" if its final-window loss drops materially below the
ln(E) pin (the adam reference reaches ~half the pin within 600 steps).

Usage (after benchmarks/stress_1m.py has prepared /tmp/stress_1m/data):
  python benchmarks/adagrad_1m_probe.py [--steps 600] [--workdir ...]
"""

import argparse
import dataclasses
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.stress_1m import build_recipe


def probe_one(name, dataset, recipe, steps, log_every=100):
    import jax
    import jax.numpy as jnp

    from sert_tpu.data.feeder import PrefetchFeeder
    from sert_tpu.models import lse as lse_model
    from sert_tpu.train.loop import _batch_put, _group_batches
    from sert_tpu.train.step import init_state, make_train_step

    mcfg, tcfg = recipe.model, recipe.train
    noise = lse_model.noise_logits(None, mcfg)  # uniform: counts-free probe
    step_fn = make_train_step(mcfg, tcfg, noise=noise)
    state = init_state(jax.random.key(tcfg.seed), mcfg, tcfg)
    n_micro = max(tcfg.steps_per_call, 1)

    losses, t0 = [], time.time()
    batches = dataset.iter_batches(tcfg.batch_size, epoch=0)
    feeder = PrefetchFeeder(_group_batches(batches, n_micro),
                            put_fn=_batch_put(None))
    try:
        done = 0
        for dev_batch, _cur in feeder:
            state, metrics = step_fn(state, dev_batch)
            done += n_micro
            if done % log_every < n_micro or done >= steps:
                losses.append((done, float(metrics["loss"])))
                print(f"  {name}: step {done} loss {losses[-1][1]:.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            if done >= steps:
                break
    finally:
        feeder.close()
    del state
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/stress_1m")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--only", default="",
                    help="comma list of config names to run")
    args = ap.parse_args()

    from sert_tpu.data.instances import InstanceDataset
    ds = InstanceDataset(os.path.join(args.workdir, "data"))
    E = args.entities
    base = build_recipe(E, ds.meta["vocab_size"], epochs=1)

    def tr(**kw):
        return dataclasses.replace(base.train, **kw)

    # lr 0.1 was round 3's center probe; every adagrad row pins identically
    # across 0.5..0.02 there, so mitigations run at 0.1 (plus one 0.5 row
    # for the strongest mitigation — a damped accumulator start wants a lr
    # that can still move once gradients flow).
    ag = dict(optimizer="adagrad", learning_rate=0.1)
    configs = {
        "adam_ref": tr(),                                    # recipe adam
        "adagrad_base": tr(**ag),                            # known pinned
        "adagrad_warmup300": tr(**ag, lr_warmup_steps=300),
        "adagrad_acc1": tr(**ag, adagrad_init_accumulator=1.0),
        "adagrad_acc10": tr(**ag, adagrad_init_accumulator=10.0),
        "adagrad_eps1e3": tr(**ag, adagrad_eps=1e-3),
        "adagrad_clip1": tr(**ag, grad_clip_norm=1.0),
        "adagrad_acc10_lr0.5": tr(optimizer="adagrad", learning_rate=0.5,
                                  adagrad_init_accumulator=10.0),
        "adagrad_warm_acc10": tr(**ag, lr_warmup_steps=300,
                                 adagrad_init_accumulator=10.0),
    }
    only = {s for s in args.only.split(",") if s}
    results = {}
    pin = math.log(E)
    for name, tcfg in configs.items():
        if only and name not in only:
            continue
        print(f"== {name}", flush=True)
        recipe = dataclasses.replace(base, train=tcfg)
        curve = probe_one(name, ds, recipe, args.steps)
        tail = np.mean([l for _, l in curve[-2:]])
        results[name] = {"curve": curve, "tail_loss": round(float(tail), 4),
                         "below_pin": round(float(pin - tail), 4)}
    print(json.dumps(results, indent=2))
    out = os.path.join(args.workdir, "adagrad_probe.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
