"""Numeric and input sanitizers (SURVEY.md section 6, race-detection row).

JAX's functional model leaves two real failure surfaces: bad host-side
batches (out-of-range ids from a corrupted shard) and numeric blowups
inside the compiled step (NaN/Inf loss or grads). Both get explicit,
cheap guards here; the feeder's deterministic mode covers the only
host-side concurrency (sert_tpu/data/feeder.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from sert_tpu.utils.config import ModelConfig


def validate_batch(batch: Dict[str, np.ndarray], cfg: ModelConfig) -> None:
    """Host-side shape/range validation of one instance batch; raises
    ValueError with a precise message on corruption."""
    w, l, e = batch["windows"], batch["lengths"], batch["entities"]
    B, width = w.shape
    if l.shape != (B,) or e.shape != (B,):
        raise ValueError(f"batch shape mismatch: {w.shape} {l.shape} {e.shape}")
    if B == 0:
        # Precise error before any min/max reduction (which has no
        # identity on a zero-size array and raises opaquely).
        raise ValueError("empty batch (B=0 rows)")
    if w.min() < 0 or w.max() >= cfg.vocab_size:
        raise ValueError(
            f"window term id out of range [0, {cfg.vocab_size}): "
            f"min={w.min()} max={w.max()}")
    if l.min() < 0 or l.max() > width:
        raise ValueError(f"length out of range [0, {width}]: "
                         f"min={l.min()} max={l.max()}")
    if e.min() < 0 or e.max() >= cfg.num_entities:
        raise ValueError(
            f"entity id out of range [0, {cfg.num_entities}): "
            f"min={e.min()} max={e.max()}")


def checked(fn: Callable) -> Callable:
    """Wrap a jittable function with checkify NaN/div checks. Returns
    (err, out); call ``err.throw()`` on host to surface failures.

    >>> loss_checked = checked(lambda p, b: api.loss_fn(p, b, cfg))
    >>> err, loss = jax.jit(loss_checked)(params, batch)
    >>> err.throw()
    """
    return checkify.checkify(fn, errors=checkify.float_checks)


def assert_all_finite(tree: Any, what: str = "tree") -> None:
    """Host-side finite check over a pytree (use at checkpoint boundaries:
    a snapshot of NaN params is worse than a crash)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            arr = np.asarray(jax.device_get(leaf))
            if not np.isfinite(arr).all():
                key = jax.tree_util.keystr(path)
                raise FloatingPointError(f"non-finite values in {what}{key}")
