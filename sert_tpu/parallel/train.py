"""Sharded training: the single-device step compiled over the mesh.

GSPMD approach: the pure step function from sert_tpu.train.step is jitted
with NamedSharding in/out specs; XLA partitions the full-softmax matmul over
the ``model`` axis (inserting the log-sum-exp psum) and the batch over
``data`` (inserting the gradient all-reduce). No manual collectives in the
training path — that is the TPU-native replacement for the NCCL/MPI plumbing
a torch port would have carried (SURVEY.md section 6, comm backend row).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sert_tpu.parallel.sharding import state_shardings
from sert_tpu.train.step import TrainState, init_state, make_train_step
from sert_tpu.utils.config import ModelConfig, TrainConfig


def _want_fused(model_cfg: ModelConfig) -> bool:
    if model_cfg.model not in ("loglinear", "lse_full"):
        return False  # LSE's sampled objective has no entity-wide softmax
    # ONE policy for on/off/auto, shared with the single-device dispatch
    # (models.loglinear._use_fused): "auto" requires E >= 4096, a TPU
    # backend, AND a VMEM-plan-feasible kernel tile at this model width —
    # very wide models fall back to the XLA composition on the mesh exactly
    # like they do single-device, instead of raising at trace time.
    from sert_tpu.models.loglinear import _use_fused
    return _use_fused(model_cfg)


def make_sharded_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                            mesh: Mesh, noise=None):
    """Returns (train_step, init_fn, put_fn) with mesh shardings applied."""
    from sert_tpu.train import fused as fused_mod
    if mesh.size > 1 and fused_mod.fused_tp_enabled(model_cfg, train_cfg,
                                                    mesh):
        # Pure-TP mesh (data=1) with fused_update='on': the optimizer
        # applies inside each shard's backward kernel (dW never reaches
        # HBM; ops/xent.make_sharded_xent_apply). Checked before the loss
        # routing below — this step embeds its own shard_map.
        return _finish(fused_mod.make_fused_train_step(
            model_cfg, train_cfg, jit=False, mesh=mesh),
            model_cfg, train_cfg, mesh)
    loss_override = None
    if mesh.size > 1 and _want_fused(model_cfg):
        # pallas_call has no GSPMD partitioning rule, so the single-device
        # fused path would force operand gathers on a multi-device mesh.
        # Route the loss through the shard_map formulation instead: the same
        # kernels run per shard and exactness is stitched with psum/pmax
        # (ops/xent.py, sharded variant). The inner single-device dispatch
        # is pinned off so it cannot double-fuse.
        from sert_tpu.parallel.fused_loss import make_sharded_fused_loss
        loss_override = make_sharded_fused_loss(model_cfg, mesh)
        model_cfg = model_cfg.replace(fused_softmax="off")
    elif mesh.size > 1 and model_cfg.fused_softmax == "auto":
        model_cfg = model_cfg.replace(fused_softmax="off")
    step = make_train_step(model_cfg, train_cfg, noise=noise, jit=False,
                           loss_fn=loss_override)
    return _finish(step, model_cfg, train_cfg, mesh)


def _finish(step, model_cfg: ModelConfig, train_cfg: TrainConfig,
            mesh: Mesh):
    """Wrap a pure step in the mesh shardings (state by the entity-axis
    rule, batch over ``data``) and jit it."""
    def host_init() -> TrainState:
        return init_state(jax.random.key(train_cfg.seed), model_cfg, train_cfg)

    state_shapes = jax.eval_shape(host_init)
    st_sh = state_shardings(state_shapes, mesh, model_cfg)
    # steps_per_call > 1 stacks batches with a leading micro-step axis that
    # stays unsharded; the batch axis shards over "data" either way.
    lead = (None,) if train_cfg.steps_per_call > 1 else ()
    batch_sh = {
        "windows": NamedSharding(mesh, P(*lead, "data", None)),
        "lengths": NamedSharding(mesh, P(*lead, "data")),
        "entities": NamedSharding(mesh, P(*lead, "data")),
    }
    metrics_sh = {"loss": NamedSharding(mesh, P()),
                  "grad_norm": NamedSharding(mesh, P())}

    sharded_step = jax.jit(
        step,
        in_shardings=(st_sh, batch_sh),
        out_shardings=(st_sh, metrics_sh),
        donate_argnums=(0,) if train_cfg.donate_state else (),
    )

    init_fn = jax.jit(host_init, out_shardings=st_sh)

    def put_fn(batch):
        import jax.numpy as jnp
        dp = mesh.shape["data"]
        bdim = 1 if train_cfg.steps_per_call > 1 else 0
        n = next(iter(batch.values())).shape[bdim]
        if n % dp:
            raise ValueError(
                f"batch size {n} must be a multiple of the data mesh axis "
                f"({dp}); set TrainConfig.batch_size accordingly (the "
                f"feeder emits mesh-divisible batches when configured so)")
        return {k: jax.device_put(jnp.asarray(v), batch_sh[k])
                for k, v in batch.items()}

    return sharded_step, init_fn, put_fn
