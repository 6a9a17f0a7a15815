"""Drop-in mesh-sharded fused-softmax losses for the full-softmax families.

Builds a loss with the api.loss_fn signature whose entity-axis softmax runs
through ops.xent.make_sharded_xent_loss (per-shard Pallas kernels + psum
stitching) instead of the XLA composition GSPMD would otherwise partition.
The pooling front (word_emb gather + masked mean [+ tanh projection for
lse_full]) stays outside shard_map: word_emb is replicated and the batch is
data-sharded, so GSPMD partitions it with zero collectives, and its gradient
flows through the shard_map boundary like any other jax op.

SURVEY.md section 3.2 (build consequence): the fused training kernel is
mandated WITH data-parallel batches over the mesh — this module is that
deployment; parallel/train.py routes to it whenever the fused path is
selected on a multi-device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.sharding import Mesh

from sert_tpu.models.common import compute_dtype, masked_mean_embed
from sert_tpu.ops.xent import make_sharded_xent_loss
from sert_tpu.utils.config import ModelConfig


def make_sharded_fused_loss(cfg: ModelConfig, mesh: Mesh):
    """Returns ``loss_fn(params, batch, cfg, rng=None, noise=None)`` for
    ``cfg.model`` in {"loglinear", "lse_full"} with the entity softmax fused
    per shard. Raises for other families (LSE's sampled objective gathers k
    rows — there is no entity-wide softmax to fuse)."""
    if cfg.model not in ("loglinear", "lse_full"):
        raise ValueError(
            f"sharded fused softmax applies to full-softmax families only, "
            f"got {cfg.model!r}")
    tp = mesh.shape["model"]
    if cfg.num_entities % tp:
        raise ValueError(
            f"num_entities={cfg.num_entities} must divide the model axis "
            f"({tp}) for the sharded fused kernel; pad the entity count")
    layout = "de" if cfg.model == "loglinear" else "ed"
    xent = make_sharded_xent_loss(mesh, layout=layout,
                                  dtype=cfg.compute_dtype)

    def loss_fn(params, batch, cfg_: ModelConfig, rng=None,
                noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        del rng, noise  # full softmax needs no sampling
        ct = compute_dtype(cfg_)
        pooled = masked_mean_embed(params["word_emb"].astype(ct),
                                   batch["windows"], batch["lengths"])
        if cfg_.model == "loglinear":
            W, b = params["proj_w"], params["proj_b"]
        else:  # lse_full: tanh projection into entity space, zero bias
            h = jnp.dot(pooled, params["proj_w"].astype(ct),
                        preferred_element_type=jnp.float32)
            pooled = jnp.tanh(h + params["proj_b"].astype(jnp.float32))
            W = params["entity_emb"]
            b = jnp.zeros((cfg_.num_entities,), jnp.float32)
        total = xent(pooled.astype(jnp.float32), W, b, batch["entities"])
        return total / batch["windows"].shape[0]

    return loss_fn
