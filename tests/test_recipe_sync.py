"""Recipes on disk must equal the Python registry — field by field.

Round-4 verdict found `recipes/synthetic_1m_retrieval.json` silently
carrying num_negatives=1024 while `sert_tpu/recipes.py` had moved to the
measured-best 16384: the CLI accepts both spellings (name -> registry,
path -> JSON), so the same `--recipe` flag trained two different models
depending on spelling. This test makes that drift impossible: every
`recipes/*.json` must round-trip equal to its `RECIPES[...]()` builder,
and every registry entry must have a JSON on disk.

Regenerate with:
    python -c "from sert_tpu import recipes; from sert_tpu.utils.config \
import save_config; [save_config(b(), f'recipes/{n}.json') \
for n, b in recipes.RECIPES.items()]"
"""

import glob
import os

import pytest

from sert_tpu import recipes
from sert_tpu.utils.config import config_to_dict, load_recipe

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPE_DIR = os.path.join(REPO, "recipes")


@pytest.mark.parametrize("name", sorted(recipes.RECIPES))
def test_json_matches_registry(name):
    path = os.path.join(RECIPE_DIR, f"{name}.json")
    assert os.path.exists(path), (
        f"registry recipe {name!r} has no JSON on disk; regenerate "
        f"(see module docstring)")
    disk = config_to_dict(load_recipe(path))
    code = config_to_dict(recipes.RECIPES[name]())
    # Field-by-field diff for a readable failure message.
    diffs = _dict_diff(disk, code)
    assert not diffs, (
        f"recipes/{name}.json drifted from sert_tpu/recipes.py: "
        + "; ".join(diffs))


def test_no_orphan_jsons():
    on_disk = {os.path.splitext(os.path.basename(p))[0]
               for p in glob.glob(os.path.join(RECIPE_DIR, "*.json"))}
    orphans = on_disk - set(recipes.RECIPES)
    assert not orphans, (
        f"recipes/*.json without a registry builder: {sorted(orphans)}")


def _dict_diff(a, b, prefix=""):
    out = []
    for k in sorted(set(a) | set(b)):
        key = f"{prefix}{k}"
        if k not in a:
            out.append(f"{key}: missing on disk (code={b[k]!r})")
        elif k not in b:
            out.append(f"{key}: extra on disk ({a[k]!r})")
        elif isinstance(a[k], dict) and isinstance(b[k], dict):
            out.extend(_dict_diff(a[k], b[k], prefix=f"{key}."))
        elif a[k] != b[k]:
            out.append(f"{key}: disk={a[k]!r} code={b[k]!r}")
    return out
