"""Optimizer update fused into the dense-softmax backward kernel.

The dense full-softmax train step (loglinear — SURVEY.md section 1, model
family 1 — and the lse_full cross-check mode) is HBM-pass-bound on the
[d, E] entity matrix: forward reads W; backward reads W and writes dW; the
XLA-fused optimizer chain then reads dW, m, v, W and writes W, m, v — ten
matrix-sized passes per step. ops/xent.xent_loss_apply applies the
optimizer inside the backward sweep's final dW revisit instead: forward
reads W; backward reads W, m, v and writes W', m', v' — seven passes, and
the [nE, Bp, dp] dpooled HBM transient of the plain backward becomes a
VMEM-resident accumulator on top.

The remaining (small) leaves — word_emb, and the LSE projection — update
with the SAME optimizer arithmetic in XLA, replicated from optax exactly
like train/sparse.py's row path, and the result is written back into the
standard optax state tree (ScaleByAdamState / ScaleByRssState surgery), so
the checkpoint layout is byte-identical to the dense step's: runs can
switch fused_update on/off across resumes freely.

Applicability (mirrored by ``TrainConfig.fused_update="auto"``): dense
softmax model (loglinear / lse_full), optimizer in (adam, adagrad, sgd),
no weight decay, no gradient clipping (the global norm would need dW
before any update), single device, and a batch small enough that the
[Bp, dp] dpooled accumulator fits VMEM.

Mesh deployment (``fused_update="on"`` only): on a PURE-TP mesh (data
axis 1) each model shard's dW is the complete gradient slice for its
entity columns — the full batch is resident on every shard — so the same
in-kernel update applies per shard (ops/xent.make_sharded_xent_apply)
with the entity matrix, bias, and optimizer slots sharded over ``model``.
Under data parallelism the per-shard dW must psum across ``data`` before
any update, re-materializing the round-trip the fusion removes, so that
regime keeps the sharded-loss + XLA-optimizer path (parallel/fused_loss).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sert_tpu.models.common import compute_dtype, masked_mean_embed
from sert_tpu.utils.config import ModelConfig, TrainConfig


def _geometry_ok(model_cfg: ModelConfig, train_cfg: TrainConfig) -> bool:
    """The mesh-independent part of the gate: model family, optimizer menu,
    no-decay/no-clip semantics, and the kernel's VMEM plan. Geometry (tile
    sizes, VMEM plan) comes from ops/xent.py's own constants, so the gate
    and the kernel cannot drift apart."""
    from sert_tpu.ops.xent import FUSED_TB, fused_update_te
    d = (model_cfg.word_dim if model_cfg.model == "loglinear"
         else model_cfg.entity_dim)
    bp = -(-train_cfg.batch_size // FUSED_TB) * FUSED_TB
    return (
        model_cfg.model in ("loglinear", "lse_full")
        and train_cfg.optimizer in ("adam", "adagrad", "sgd")
        and train_cfg.weight_decay == 0.0
        and train_cfg.grad_clip_norm == 0.0
        # the kernel bakes a FIXED lr into the update arithmetic; any
        # schedule or warmup keeps the XLA optimizer (which threads the
        # optax schedule through its own count state)
        and getattr(train_cfg, "lr_schedule", "constant") == "constant"
        and getattr(train_cfg, "lr_warmup_steps", 0) == 0
        # the kernel bakes adagrad's eps (ops/xent.py); the initial
        # accumulator flows through optax state init and is fine
        and (train_cfg.optimizer != "adagrad"
             or getattr(train_cfg, "adagrad_eps", 1e-7) == 1e-7)
        and d % 128 == 0
        and fused_update_te(train_cfg.optimizer, d, bp) is not None
    )


def fused_applicable(model_cfg: ModelConfig, train_cfg: TrainConfig) -> bool:
    """True when the SINGLE-DEVICE fused-update step exists AND matches the
    dense step's semantics exactly (see module docstring)."""
    return (tuple(train_cfg.mesh_shape) == (1, 1)
            and _geometry_ok(model_cfg, train_cfg))


def fused_tp_applicable(model_cfg: ModelConfig, train_cfg: TrainConfig,
                        mesh_shape=None) -> bool:
    """The pure-TP mesh variant: data axis of size 1 (so each model shard's
    dW is the COMPLETE gradient slice for its entity columns — no cross-
    shard reduction is owed before the update) and the entity count
    divisible by the model axis. Under data parallelism the per-shard dW
    must psum over ``data`` first, re-materializing exactly the HBM
    round-trip the fusion removes, so the fused update does not apply there
    (ops/xent.make_sharded_xent_apply docstring)."""
    dp_, tp_ = (tuple(mesh_shape) if mesh_shape is not None
                else tuple(train_cfg.mesh_shape))
    return (dp_ == 1 and tp_ > 1
            and model_cfg.num_entities % tp_ == 0
            and _geometry_ok(model_cfg, train_cfg))


def fused_tp_enabled(model_cfg: ModelConfig, train_cfg: TrainConfig,
                     mesh) -> bool:
    """Gate used by parallel/train.make_sharded_train_step. ``auto`` stays
    off on meshes: the single-device measurements (NOTES.md round-3) do not
    transfer to multi-chip, and only ``on`` opts into the parity-tested
    pure-TP deployment."""
    mode = getattr(train_cfg, "fused_update", "auto")
    if mode in ("off", "auto"):
        return False
    if mode != "on":
        raise ValueError(f"unknown fused_update mode: {mode!r}")
    shape = (mesh.shape.get("data", 1), mesh.shape.get("model", 1))
    if fused_tp_applicable(model_cfg, train_cfg, mesh_shape=shape):
        return True
    raise ValueError(
        "fused_update='on' on a mesh requires a pure-TP layout (data axis "
        "of size 1 — under data parallelism dW must psum across 'data' "
        "before any update, so the in-kernel update cannot apply), "
        "num_entities divisible by the model axis, model in (loglinear, "
        "lse_full), optimizer in (adam, adagrad, sgd), weight_decay=0, "
        "grad_clip_norm=0, a constant lr (no schedule/warmup), word/entity "
        "dim a multiple of 128, and a "
        "working set inside the VMEM plan; got "
        f"mesh={shape} model={model_cfg.model!r} "
        f"optimizer={train_cfg.optimizer!r} "
        f"E={model_cfg.num_entities} "
        f"weight_decay={train_cfg.weight_decay} "
        f"grad_clip_norm={train_cfg.grad_clip_norm} "
        f"batch={train_cfg.batch_size}")


def fused_enabled(model_cfg: ModelConfig, train_cfg: TrainConfig) -> bool:
    mode = getattr(train_cfg, "fused_update", "auto")
    if mode == "off":
        return False
    if mode == "auto":
        # Auto additionally requires the fused xent kernel itself to be
        # the active loss path (TPU backend or an explicit fused_softmax
        # override) — on other backends the XLA composition wins.
        # Measured on-chip (E=500k, d=128, bf16, B=1024 — benchmarks/
        # fused_step_bench.py, NOTES.md round-3): sgd 1.08x, adagrad
        # 0.99x, adam 0.82x (adam's 6-stream working set forces te=512
        # tiles, and the step is compute- not pass-bound at this scale),
        # so auto enables the fusion only where it wins. "on" remains
        # available for every applicable optimizer.
        from sert_tpu.models.loglinear import _use_fused
        return (train_cfg.optimizer == "sgd"
                and fused_applicable(model_cfg, train_cfg)
                and _use_fused(model_cfg))
    if mode == "on":
        if not fused_applicable(model_cfg, train_cfg):
            raise ValueError(
                "fused_update='on' requires model in (loglinear, lse_full), "
                "optimizer in (adam, adagrad, sgd), weight_decay=0, "
                "grad_clip_norm=0, a constant lr (no schedule/warmup — the "
                "kernel bakes a fixed lr), mesh_shape=(1, 1), word/entity "
                "dim a "
                "multiple of 128, and a kernel working set that fits the "
                "VMEM plan (ops/xent.fused_update_te: streamed W/state "
                "tiles + the [batch, dim] dpooled accumulator); got "
                f"model={model_cfg.model!r} "
                f"optimizer={train_cfg.optimizer!r} "
                f"weight_decay={train_cfg.weight_decay} "
                f"grad_clip_norm={train_cfg.grad_clip_norm} "
                f"mesh={tuple(train_cfg.mesh_shape)} "
                f"batch={train_cfg.batch_size} "
                f"dim={model_cfg.word_dim if model_cfg.model == 'loglinear' else model_cfg.entity_dim}")
        return True
    raise ValueError(f"unknown fused_update mode: {mode!r}")


# ---------------------------------------------------------------------------
# Small-leaf updates: STOCK optax on a sliced state (exact-by-construction
# vs the dense step — no third copy of the optimizer arithmetic; the one
# unavoidable replication is inside the kernel itself) + state surgery.


def _opt_tree_of(optimizer: str, opt_state, key: str) -> Dict:
    """Extract {m,v}/{acc}/{} for one param leaf from the optax state
    (the kernel's view of the matrix leaf's slots)."""
    inner = opt_state[0]
    if optimizer == "adam":
        return {"m": inner.mu[key], "v": inner.nu[key]}
    if optimizer == "adagrad":
        return {"acc": inner.sum_of_squares[key]}
    return {}


def _check_state_shape(optimizer: str, opt_state) -> None:
    inner = opt_state[0]
    want = {"adam": ("count", "mu", "nu"), "adagrad": ("sum_of_squares",),
            "sgd": ()}[optimizer]
    for attr in want:
        if not hasattr(inner, attr):
            raise ValueError(
                f"unexpected optax state {type(inner).__name__!r} for "
                f"{optimizer}; fused_update expects the stock "
                "adam/adagrad/sgd layout — set fused_update='off'")


def _slice_state(optimizer: str, opt_state, keys):
    """The optax state restricted to the given param leaves (count and any
    trailing chain states shared)."""
    inner = opt_state[0]
    if optimizer == "adam":
        inner = inner._replace(mu={k: inner.mu[k] for k in keys},
                               nu={k: inner.nu[k] for k in keys})
    elif optimizer == "adagrad":
        inner = inner._replace(
            sum_of_squares={k: inner.sum_of_squares[k] for k in keys})
    return (inner,) + tuple(opt_state[1:])


def _merge_state(optimizer: str, opt_state, sub_state,
                 mat_key: str, mat_tree: Dict):
    """Recombine the sliced optax state (small leaves, updated by the
    stock transform) with the kernel-updated matrix slots."""
    inner, sub = opt_state[0], sub_state[0]
    if optimizer == "sgd":
        return opt_state
    if optimizer == "adagrad":
        sos = dict(inner.sum_of_squares)
        sos.update(sub.sum_of_squares)
        sos[mat_key] = mat_tree["acc"]
        return (inner._replace(sum_of_squares=sos),) + tuple(sub_state[1:])
    mu, nu = dict(inner.mu), dict(inner.nu)
    mu.update(sub.mu)
    nu.update(sub.nu)
    mu[mat_key] = mat_tree["m"]
    nu[mat_key] = mat_tree["v"]
    return (inner._replace(count=sub.count, mu=mu, nu=nu),
            ) + tuple(sub_state[1:])


# ---------------------------------------------------------------------------
# The step


def make_fused_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                          noise: Optional[jax.Array] = None,
                          jit: bool = True, mesh=None):
    """Build the fused-update train step (same contract as
    train.step.make_train_step, including steps_per_call scanning).

    With ``mesh`` (a pure-TP jax.sharding.Mesh, data axis 1) the entity
    matrix, its optimizer slots, and the bias live sharded over ``model``
    and the update applies per shard (ops/xent.make_sharded_xent_apply);
    parallel/train.make_sharded_train_step routes here when
    ``fused_tp_enabled`` says so and wraps the result in the standard
    state shardings."""
    from sert_tpu.ops.xent import make_sharded_xent_apply, xent_loss_apply
    from sert_tpu.train.step import TrainState, make_optimizer

    if mesh is None:
        if not fused_applicable(model_cfg, train_cfg):
            raise ValueError("fused step built for an inapplicable config; "
                             "see fused_applicable")
    else:
        shape = (mesh.shape.get("data", 1), mesh.shape.get("model", 1))
        if not fused_tp_applicable(model_cfg, train_cfg, mesh_shape=shape):
            raise ValueError("mesh fused step built for an inapplicable "
                             "config; see fused_tp_applicable")
    del noise  # full softmax: no sampling
    cfg, opt_name, lr = model_cfg, train_cfg.optimizer, train_cfg.learning_rate
    opt = make_optimizer(train_cfg)      # the stock transform (small leaves)
    loglin = cfg.model == "loglinear"
    mat_key = "proj_w" if loglin else "entity_emb"
    layout = "de" if loglin else "ed"
    ct = compute_dtype(cfg)
    sharded_apply = None
    if mesh is not None:
        sharded_apply = make_sharded_xent_apply(
            mesh, layout=layout, opt=opt_name, lr=lr,
            dtype=cfg.compute_dtype)

    def step(state: TrainState, batch: Dict[str, jax.Array]
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, _ = jax.random.split(state.rng)      # same rng walk as dense
        params, opt_state = state.params, state.opt_state
        _check_state_shape(opt_name, opt_state)
        count = (opt_state[0].count if opt_name == "adam"
                 else state.step)
        B = batch["windows"].shape[0]

        if loglin:
            def head(word_emb):
                return masked_mean_embed(
                    word_emb.astype(ct), batch["windows"],
                    batch["lengths"]).astype(jnp.float32)
            head_in = (params["word_emb"],)
            bias = params["proj_b"]
        else:
            def head(word_emb, proj_w, proj_b):
                pooled = masked_mean_embed(
                    word_emb.astype(ct), batch["windows"], batch["lengths"])
                h = jnp.dot(pooled, proj_w.astype(ct),
                            preferred_element_type=jnp.float32)
                return jnp.tanh(h + proj_b.astype(jnp.float32))
            head_in = (params["word_emb"], params["proj_w"],
                       params["proj_b"])
            bias = jnp.zeros((cfg.num_entities,), jnp.float32)

        pooled, head_vjp = jax.vjp(head, *head_in)
        opt_tree = _opt_tree_of(opt_name, opt_state, mat_key)
        if sharded_apply is not None:
            loss_sum, W_new, st_new, db, dpooled, gsq = sharded_apply(
                pooled, params[mat_key], bias, batch["entities"],
                opt_tree, count)
        else:
            loss_sum, W_new, st_new, db, dpooled, gsq = xent_loss_apply(
                pooled, params[mat_key], bias, batch["entities"],
                opt=opt_name, opt_tree=opt_tree,
                lr=lr, count=count, gscale=1.0 / B, layout=layout,
                dtype=cfg.compute_dtype)
        head_grads = head_vjp(dpooled)

        if loglin:
            # db IS the proj_b gradient here; for lse_full the kernel bias
            # is a constant zero vector, not a parameter — db is discarded.
            leaf_grads = {"word_emb": head_grads[0], "proj_b": db}
        else:
            leaf_grads = dict(zip(("word_emb", "proj_w", "proj_b"),
                                  head_grads))
        # Small leaves: the STOCK optax transform on the sliced state —
        # identical code path to the dense step, so exact by construction.
        sub_params = {k: params[k] for k in leaf_grads}
        updates, sub_state = opt.update(
            leaf_grads, _slice_state(opt_name, opt_state, leaf_grads),
            sub_params)
        new_params = dict(params, **optax.apply_updates(sub_params, updates))
        new_params[mat_key] = W_new

        grads_sq = gsq
        for g in leaf_grads.values():
            grads_sq = grads_sq + jnp.sum(jnp.square(g.astype(jnp.float32)))
        new_state = TrainState(
            params=new_params,
            opt_state=_merge_state(opt_name, opt_state, sub_state,
                                   mat_key, st_new),
            step=state.step + 1, rng=rng)
        metrics = {"loss": loss_sum / B, "grad_norm": jnp.sqrt(grads_sq)}
        return new_state, metrics

    n = train_cfg.steps_per_call
    if n > 1:
        inner = step

        def step(state, stacked):
            state, metrics = jax.lax.scan(inner, state, stacked)
            return state, jax.tree.map(lambda m: m[-1], metrics)

    if not jit:
        return step
    donate = (0,) if train_cfg.donate_state else ()
    return jax.jit(step, donate_argnums=donate)
