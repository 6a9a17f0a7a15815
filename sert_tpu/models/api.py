"""Uniform model API dispatching on ``ModelConfig.model``.

The train loop, scorer, and distributed code talk to models only through
these five functions, so adding a model family means adding a module with
the same surface (the reference kept both families behind one models.py for
the same reason, SURVEY.md section 3.1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sert_tpu.models import loglinear, lse
from sert_tpu.models.common import Params
from sert_tpu.utils.config import ModelConfig

MODEL_FAMILIES = ("loglinear", "lse", "lse_full")


def _family(cfg: ModelConfig) -> str:
    if cfg.model not in MODEL_FAMILIES:
        raise ValueError(f"unknown model family: {cfg.model!r}")
    return cfg.model


def init_params(rng: jax.Array, cfg: ModelConfig) -> Params:
    fam = _family(cfg)
    return loglinear.init(rng, cfg) if fam == "loglinear" else lse.init(rng, cfg)


def loss_fn(params: Params, batch, cfg: ModelConfig,
            rng: Optional[jax.Array] = None,
            noise: Optional[jax.Array] = None) -> jax.Array:
    fam = _family(cfg)
    if fam == "loglinear":
        return loglinear.loss(params, batch, cfg)
    if fam == "lse_full":
        return lse.loss_full_softmax(params, batch, cfg)
    if cfg.objective == "sampled_softmax":
        return lse.loss_sampled_softmax(params, batch, cfg, rng=rng,
                                        noise=noise)
    if cfg.objective != "nce":
        raise ValueError(f"unknown LSE objective: {cfg.objective!r}")
    return lse.loss(params, batch, cfg, rng=rng, noise=noise)


def window_rep(params: Params, windows: jax.Array, lengths: jax.Array,
               cfg: ModelConfig) -> jax.Array:
    """[B, d] query/window representations in scoring space."""
    if _family(cfg) == "loglinear":
        from sert_tpu.models.common import masked_mean_embed, compute_dtype
        return masked_mean_embed(
            params["word_emb"].astype(compute_dtype(cfg)), windows, lengths)
    return lse.window_rep(params, windows, lengths, cfg)


def entity_matrix(params: Params, cfg: ModelConfig) -> jax.Array:
    """[E, d] the dense entity matrix the scoring engine multiplies against.

    For log-linear this is proj_w.T (each entity's column of the candidate
    map); for LSE it is the learned entity embedding matrix.
    """
    if _family(cfg) == "loglinear":
        return params["proj_w"].T
    return params["entity_emb"]


def entity_bias(params: Params, cfg: ModelConfig) -> Optional[jax.Array]:
    return params["proj_b"] if _family(cfg) == "loglinear" else None


def all_entity_scores(params: Params, windows: jax.Array, lengths: jax.Array,
                      cfg: ModelConfig) -> jax.Array:
    """[B, E] dense scores of window reps against every entity (pre-softmax
    for log-linear, similarity for LSE)."""
    reps = window_rep(params, windows, lengths, cfg)
    scores = jnp.dot(reps.astype(jnp.float32),
                     entity_matrix(params, cfg).astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
    b = entity_bias(params, cfg)
    return scores + b.astype(jnp.float32) if b is not None else scores


def query_scores(params: Params, term_ids: jax.Array, num_terms: jax.Array,
                 cfg: ModelConfig, similarity: str = "dot") -> jax.Array:
    """[E] retrieval scores for one (padded) query."""
    if _family(cfg) == "loglinear":
        return loglinear.query_scores(params, term_ids, num_terms, cfg)
    return lse.query_scores(params, term_ids, num_terms, cfg, similarity)
