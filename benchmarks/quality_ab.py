"""Propagate the round-4 flagship training lessons to the small recipes.

Round 4 measured, at E=1M: cosine decay is worth +0.060 NDCG@100 at
equal budget, and widening the sampled-softmax candidate set k climbs
monotonically toward the exact-softmax anchor. docs/QUALITY.md's CERC
(0.923, round 2) and Amazon-MI (0.856, round 3) rows predate both
lessons, and their recipes still run lr_schedule="none" with the
original k. This A/B answers whether the lessons TRANSFER below E=1M —
either outcome updates the recipes/table (round-4 VERDICT item 6):

  cerc_expert_finding   (3.5k experts, log-linear): constant vs cosine
  amazon_musical_instruments (900 products, LSE sampled k=256):
      {constant, cosine} x {k=256, k=1024}

Each variant is a full prepare->train->score->evaluate on the recipe's
registered hard stand-in (same collection seed across variants; the
only differences are the A/B'd training fields). Prints one JSON table.

Usage: python benchmarks/quality_ab.py [--workdir /tmp/quality_ab]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time

_METRICS = ("ndcg@100", "map", "recall@100", "recall@1000", "p@5")


def variant(recipe, lr_schedule=None, num_negatives=None):
    train, model, tag = recipe.train, recipe.model, []
    if lr_schedule is not None:
        train = dataclasses.replace(train, lr_schedule=lr_schedule,
                                    lr_final_fraction=0.05)
        tag.append(lr_schedule)
    else:
        tag.append(getattr(train, "lr_schedule", "constant"))
    if num_negatives is not None:
        model = model.replace(num_negatives=num_negatives)
        tag.append(f"k{num_negatives}")
    elif model.model == "lse":
        tag.append(f"k{model.num_negatives}")
    return dataclasses.replace(recipe, train=train, model=model), "_".join(tag)


def run_variant(name, recipe, tag, workdir):
    from sert_tpu import pipeline, recipes
    col = recipes.SYNTH_SPECS[name].build()
    w = os.path.join(workdir, f"{name}__{tag}")
    t0 = time.time()
    res = pipeline.run_end_to_end(col, recipe, w)
    row = {k: round(v, 4) for k, v in res["all"].items() if k in _METRICS}
    row["wall_s"] = round(time.time() - t0, 1)
    print(f"{name} [{tag}]: {row}", flush=True)
    return row


def main(workdir):
    from sert_tpu import recipes
    table = {}

    cerc = recipes.RECIPES["cerc_expert_finding"]()
    for sched in (None, "cosine"):
        r, tag = variant(cerc, lr_schedule=sched)
        table[f"cerc_{tag}"] = run_variant("cerc_expert_finding", r, tag,
                                           workdir)

    mi = recipes.RECIPES["amazon_musical_instruments"]()
    for sched in (None, "cosine"):
        for k in (None, 1024):
            r, tag = variant(mi, lr_schedule=sched, num_negatives=k)
            table[f"mi_{tag}"] = run_variant("amazon_musical_instruments",
                                             r, tag, workdir)
    print(json.dumps(table, indent=2))
    return table


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quality_ab")
    args = ap.parse_args()
    from sert_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main(args.workdir)
