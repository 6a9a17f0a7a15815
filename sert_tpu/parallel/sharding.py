"""Sharding rules: which axis of which array lives on which mesh axis.

Rule (SURVEY.md section 3.3): the ENTITY axis is the tensor-parallel axis.
Any array axis whose length equals ``num_entities`` shards over mesh axis
``model``; everything else replicates. The rule is applied by shape, so it
covers optimizer moments (which mirror parameter shapes) without
model-specific plumbing:

  loglinear: proj_w [d, E] -> P(None, "model");  proj_b [E] -> P("model")
  lse:       entity_emb [E, d_e] -> P("model", None)
  word_emb:  replicated (vocab gathers are random-access; replicating the
             word table keeps them local — it is the small table at SERT
             scale, entities are the big axis)

Caveat (documented): if vocab_size == num_entities exactly, the shape rule
would also shard word_emb; ``state_shardings`` asserts they differ.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sert_tpu.utils.config import ModelConfig


def _spec_for_shape(shape, num_entities: int) -> P:
    # Only the FIRST axis matching num_entities shards (a square array like
    # entity_emb [E, d_e] with d_e == E must not map 'model' twice).
    out, used = [], False
    for s in shape:
        if s == num_entities and not used:
            out.append("model")
            used = True
        else:
            out.append(None)
    return P(*out)


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def state_shardings(state_shapes: Any, mesh: Mesh, cfg: ModelConfig) -> Any:
    """Map a TrainState (or any pytree of ShapeDtypeStructs/arrays) to
    NamedShardings by the entity-axis rule."""
    if cfg.vocab_size == cfg.num_entities:
        raise ValueError(
            "vocab_size == num_entities would make the shape-based sharding "
            "rule ambiguous; offset one of them by 1")

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if _is_key(leaf) or len(shape) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for_shape(shape, cfg.num_entities))

    return jax.tree.map(rule, state_shapes)


def batch_sharding(mesh: Mesh) -> Any:
    """Batch arrays shard their leading (batch) axis over ``data``."""
    def put(batch):
        out = {}
        for k, v in batch.items():
            spec = P("data", *(None,) * (v.ndim - 1))
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
        return out
    return put


def shard_state(state: Any, mesh: Mesh, cfg: ModelConfig) -> Any:
    """Place an existing (host/single-device) TrainState onto the mesh."""
    sh = state_shardings(state, mesh, cfg)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)
