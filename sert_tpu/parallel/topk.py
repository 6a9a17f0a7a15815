"""Distributed top-k over the mesh-sharded entity matrix.

Each ``model``-axis device owns a contiguous row-block of the entity matrix
and runs the SAME chunked sweep as the single-chip engine
(sert_tpu.scoring.scorer.chunked_topk_core); only the merge differs:

  * ``"allgather"`` — every device all-gathers the [Q, k] per-shard winners
    (k is small) and locally re-top-ks. One collective, minimal latency.
  * ``"ring"`` — the running top-k carry rotates around the ICI ring via
    ``ppermute``, merging against each resident shard's winners; after S-1
    hops every device holds the global top-k. Same systolic pattern as ring
    attention, applied to the entity axis (SURVEY.md section 6) — preferable
    when Q*k is large enough that one big all-gather would spike memory.

The log-linear normalizer needs GLOBAL per-term logsumexp: local
(max, sumexp) accumulators combine with a pmax/psum pair before the constant
is applied — exactness is preserved across shardings (tested against the
single-device engine).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sert_tpu.models import api
from sert_tpu.scoring.scorer import (_entity_matrix,
                                     _query_reps_and_terms,
                                     apply_ll_normalizer, chunked_topk_core)
from sert_tpu.utils.config import ModelConfig


def _merge_topk(s_a, i_a, s_b, i_b, k):
    s = jnp.concatenate([s_a, s_b], axis=1)
    i = jnp.concatenate([i_a, i_b], axis=1)
    new_s, sel = jax.lax.top_k(s, k)
    return new_s, jnp.take_along_axis(i, sel, axis=1)


def _shard_body(R, term_emb, mask, M_shard, bias_shard, *, k, chunk, is_ll,
                merge, axis):
    """Runs on each model-axis device inside shard_map."""
    n_shards = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    rows = M_shard.shape[0]
    offset = my * rows

    top_s, top_i, run_max, run_sum = chunked_topk_core(
        R, term_emb, mask, M_shard, bias_shard, k, chunk, is_ll,
        vary_axes=("data", "model"))
    top_i = top_i + offset

    if is_ll:
        # Global per-term logsumexp: combine local (max, sumexp) pairs.
        g_max = jax.lax.pmax(run_max, axis)
        g_sum = jax.lax.psum(run_sum * jnp.exp(run_max - g_max), axis)
        run_max, run_sum = g_max, g_sum

    if merge == "allgather":
        all_s = jax.lax.all_gather(top_s, axis)          # [S, Q, k]
        all_i = jax.lax.all_gather(top_i, axis)
        S, Q, K = all_s.shape
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(Q, S * K)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, S * K)
        top_s, sel = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, sel, axis=1)
    elif merge == "ring":
        # Rotate a carry of winners around the ring; each hop merges the
        # incoming carry with the local winners. After S-1 hops every
        # device's carry saw every shard.
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        carry_s, carry_i = top_s, top_i
        for _ in range(n_shards - 1):
            carry_s = jax.lax.ppermute(carry_s, axis, perm)
            carry_i = jax.lax.ppermute(carry_i, axis, perm)
            carry_s, carry_i = _merge_topk(carry_s, carry_i, top_s, top_i, k)
        top_s, top_i = carry_s, carry_i
    else:
        raise ValueError(f"unknown merge strategy {merge!r}")

    if is_ll:
        top_s = apply_ll_normalizer(top_s, run_max, run_sum, mask)
    return top_s, top_i


def distributed_topk(params, cfg: ModelConfig, term_ids: jax.Array,
                     num_terms: jax.Array, mesh: Mesh, k: int = 100,
                     chunk: int = 32768, similarity: str = "dot",
                     merge: str = "allgather"
                     ) -> Tuple[jax.Array, jax.Array]:
    """Global top-k over an entity matrix sharded on mesh axis ``model``.

    Queries shard over ``data``; every entity shard sees every query in its
    data-row. Entity count must divide evenly by the model-axis size (pad
    the entity matrix upstream if not — recipes do).
    """
    E = api.entity_matrix(params, cfg).shape[0]
    k = min(k, E)
    n_model = mesh.shape["model"]
    if E % n_model:
        raise ValueError(f"num_entities={E} must divide by model axis {n_model}")

    R, term_emb, mask = _query_reps_and_terms(params, cfg, term_ids,
                                              num_terms, similarity)
    M = _entity_matrix(params, cfg, similarity)
    is_ll = cfg.model == "loglinear"
    bias = params["proj_b"].astype(jnp.float32) if is_ll else jnp.zeros((E,), jnp.float32)
    if term_emb is None:
        term_emb = jnp.zeros(mask.shape + (1,), jnp.float32)  # placeholder

    body = functools.partial(_shard_body, k=k, chunk=chunk, is_ll=is_ll,
                             merge=merge, axis="model")
    # check_vma=False: after the all_gather/ring merge every model-axis
    # device holds the same winners, but the static varying-axes analysis
    # cannot see through top_k to infer that replication.
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None, None), P("data", None),
                  P("model", None), P("model")),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    return fn(R, term_emb, mask, M, bias)
