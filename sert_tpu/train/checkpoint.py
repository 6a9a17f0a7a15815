"""Checkpoint/resume: params + optimizer state + data cursor + RNG + config.

Reference behavior (SURVEY.md section 6): per-epoch pickle/npz dumps of
params + meta; a crash loses at most one epoch. This implementation keeps
that contract but checkpoints the FULL training state (optimizer moments,
RNG key, data cursor), so resume is exact, not approximate.

Format: one ``.npz`` of flattened pytree leaves (keyed by their tree paths)
plus a JSON sidecar (step, epoch, cursor, configs, vocab hash). Arrays are
gathered to host before saving — at SERT scale (<= a few GB of embeddings)
single-file checkpoints are the right tradeoff; sharded-per-chip
serialization would only matter past host memory, out of scope per SURVEY.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_CKPT_RE = re.compile(r"ckpt-(\d+)\.npz$")


def _is_prng_key(leaf: Any) -> bool:
    return (hasattr(leaf, "dtype")
            and jax.numpy.issubdtype(leaf.dtype, jax.dtypes.prng_key))


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        if _is_prng_key(leaf):
            # Typed PRNG keys serialize as their uint32 key data.
            flat[key] = np.asarray(jax.device_get(jax.random.key_data(leaf)))
        else:
            flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _unflatten(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Template leaves only provide shape/dtype — live arrays are NOT copied
    to host (that would round-trip the whole state) and abstract
    ShapeDtypeStructs (from jax.eval_shape) work equally well."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if _is_prng_key(leaf):
            data = jax.numpy.asarray(arr)
            try:
                impl = jax.random.key_impl(leaf)
                leaves.append(jax.random.wrap_key_data(data, impl=impl))
            except (TypeError, AttributeError):  # abstract template leaf
                leaves.append(jax.random.wrap_key_data(data))
            continue
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != expected "
                f"{tuple(leaf.shape)}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    meta: Optional[Dict] = None,
                    max_to_keep: int = 0) -> str:
    """Write ckpt-{step}.npz + ckpt-{step}.json atomically (tmp + rename).

    ``max_to_keep > 0`` prunes the oldest checkpoints beyond that count
    (the reference kept every epoch snapshot; epoch-level keeps are cheap,
    but step-level checkpointing wants a bound)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    base = os.path.join(ckpt_dir, f"ckpt-{step:08d}")
    flat = _flatten(state)
    tmp = base + ".npz.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **flat)
    os.replace(tmp, base + ".npz")
    with open(base + ".json.tmp", "w") as fh:
        json.dump({"step": int(step), **(meta or {})}, fh, indent=2)
    os.replace(base + ".json.tmp", base + ".json")
    if max_to_keep > 0:
        existing = list_checkpoints(ckpt_dir)
        for old_step in sorted(existing)[:-max_to_keep]:
            os.remove(existing[old_step])
            j = existing[old_step][:-len(".npz")] + ".json"
            if os.path.exists(j):
                os.remove(j)
    return base + ".npz"


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best: Tuple[int, Optional[str]] = (-1, None)
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m:
            step = int(m.group(1))
            if step > best[0]:
                best = (step, os.path.join(ckpt_dir, name))
    return best[1]


def list_checkpoints(ckpt_dir: str) -> Dict[int, str]:
    out: Dict[int, str] = {}
    if os.path.isdir(ckpt_dir):
        for name in os.listdir(ckpt_dir):
            m = _CKPT_RE.match(name)
            if m:
                out[int(m.group(1))] = os.path.join(ckpt_dir, name)
    return dict(sorted(out.items()))


def load_meta(path: str) -> Dict:
    """Read a checkpoint's JSON sidecar without touching the npz (cheap
    cursor/hash inspection — sweep uses this to skip checkpoints unloaded)."""
    meta_path = path[:-len(".npz")] + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            return json.load(fh)
    return {}


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict]:
    """Restore a state pytree (shaped like ``template``) + the JSON meta."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(template, flat), load_meta(path)
