"""Typed configuration dataclasses.

The reference shared argparse validators across scripts (SURVEY.md section 3.1,
"CLI / arg parsing"); here configs are frozen dataclasses serialized into
checkpoints and recipe files so every run is a reproducible command.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple, Type, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class DataConfig:
    """Corpus → instances parameters (reference 'prepare' step, SURVEY 4.1)."""

    window_size: int = 8            # sliding window width in tokens
    stride: int = 1                 # window stride over the token stream
    vocab_max_size: int = 65536     # top-N terms kept
    vocab_min_count: int = 2        # minimum term frequency
    filter_stopwords: bool = True
    lowercase: bool = True
    min_token_len: int = 1
    drop_numeric: bool = False      # drop pure-digit tokens
    instances_per_shard: int = 1 << 18
    seed: int = 0
    num_workers: int = 0            # >0: multiprocessing tokenize/encode
    # Collect per-entity term counts during the prepare sweep (lm_stats.npz)
    # so the lexical LM baseline (`query --ranker lm`) and run fusion work
    # without a second corpus pass.
    build_lm_stats: bool = True

    def __post_init__(self):
        # Validate here, not downstream: the native window sweep divides by
        # stride in C++ where stride=0 is an uncatchable SIGFPE, and the
        # numpy path would diverge (ValueError vs reversed windows) — a bad
        # recipe JSON must fail at load, identically on both paths.
        if self.window_size < 1:
            raise ValueError(f"window_size must be >= 1, got {self.window_size}")
        if self.stride < 1:
            raise ValueError(f"stride must be >= 1, got {self.stride}")


@dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters covering both families (SURVEY 3.1 models)."""

    model: str = "loglinear"        # "loglinear" | "lse"
    vocab_size: int = 0             # filled from the built vocabulary
    num_entities: int = 0           # filled from the entity registry
    word_dim: int = 128             # word-embedding dimensionality
    entity_dim: int = 128           # entity-space dimensionality (LSE)
    # LSE negative sampling:
    num_negatives: int = 10
    negative_distribution: str = "uniform"   # "uniform" | "unigram"
    unigram_power: float = 0.75
    # LSE sampled objective: "nce" = per-example binary negative sampling
    # (word2vec-style, the reference's method); "sampled_softmax" =
    # batch-shared candidate set with importance-corrected softmax CE —
    # ranking-calibrated, tracks the full softmax far more closely at the
    # same entity-row cost (models/lse.py loss_sampled_softmax; shared
    # negatives make large k nearly free on the MXU). Ignored by the other
    # families.
    objective: str = "nce"          # "nce" | "sampled_softmax"
    # Numerics:
    compute_dtype: str = "float32"  # "float32" | "bfloat16" (MXU-friendly)
    param_dtype: str = "float32"
    # Fused Pallas softmax-CE over the entity axis (ops/xent.py):
    # "auto" = on TPU when num_entities >= 4096; "on" | "off" force it.
    fused_softmax: str = "auto"

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    ``optimizer``: "adam" | "adagrad" | "sgd" | "adafactor". adafactor's
    factored second moment is the large-E choice for the DENSE-gradient
    families (loglinear, lse_full) — O(d+E) state instead of O(d*E). It is
    a measured quality trap for the sampled-objective LSE model (sparse
    per-step updates; NDCG 0.46-0.52 vs adam's 0.89 on the 200k stress,
    benchmarks/NOTES.md): the train step warns on that combination. Use
    adam/adagrad for LSE.
    """

    batch_size: int = 1024
    num_epochs: int = 5
    optimizer: str = "adam"         # see class docstring for the menu
    learning_rate: float = 1e-3
    # Learning-rate schedule on top of ``learning_rate`` (the peak value).
    # "constant" is the reference's semantics (SURVEY.md section 3.1 fixed
    # lr per run); "cosine"/"linear" decay from the peak to
    # lr_final_fraction * peak over lr_decay_steps, after an optional
    # linear warmup from 0 over lr_warmup_steps. lr_decay_steps=0 lets the
    # training loop fill the horizon with the run's total step count
    # (num_epochs x batches/epoch); building a step directly with a decay
    # schedule requires it explicitly. Schedules thread through optax (the
    # opt state gains the schedule's count leaf) AND the row-sparse lazy
    # step (lr evaluated at state.step, identical arithmetic); the fused
    # optimizer-in-backward kernel bakes a fixed lr, so any non-constant
    # schedule or warmup keeps fused_update off.
    lr_schedule: str = "constant"   # "constant" | "cosine" | "linear"
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0         # 0 = loop fills num_epochs*batches/epoch
    lr_final_fraction: float = 0.0  # end lr = fraction * learning_rate
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0     # 0 disables clipping
    # Adagrad escape hatches for the measured tanh-saturation /
    # accumulator-lock failure at scale (benchmarks/NOTES.md round-3
    # "Escape attempt": LSE at E=1M pins at ln(E) under adagrad). A larger
    # initial accumulator damps the first steps before the monotone sum
    # takes over; eps floors the rsqrt. Defaults are optax's own, so the
    # stock arithmetic (and every parity test) is unchanged unless set.
    # A non-default eps gates the fused-update kernel off (it bakes 1e-7).
    adagrad_init_accumulator: float = 0.1
    adagrad_eps: float = 1e-7
    checkpoint_every_steps: int = 0  # 0 = per-epoch only
    keep_checkpoints: int = 0        # >0: prune to the newest N on disk
    # Overlap checkpoint device->host fetch + write with training (the
    # state is device-copied first, so donation stays safe). Single-process
    # only; multi-host saves are collective and always run synchronously.
    async_checkpoint: bool = True
    seed: int = 0
    log_every_steps: int = 50
    # Mesh: (data_parallel, model_parallel) axis sizes; (1, 1) = single chip.
    mesh_shape: Tuple[int, int] = (1, 1)
    donate_state: bool = True
    # Micro-steps executed inside ONE compiled call (lax.scan over stacked
    # batches). >1 amortizes per-dispatch overhead — essential on dispatch-
    # latency-bound platforms (see benchmarks/NOTES.md, ~24ms RTT here).
    steps_per_call: int = 1
    # Row-sparse (lazy) optimizer updates for the sampled-objective LSE
    # step (train/sparse.py): gradients are taken w.r.t. the gathered
    # embedding rows and adam/adagrad/sgd update only those rows, so
    # optimizer HBM traffic scales with B + k + B*w visited rows instead
    # of V + E total rows. "auto" enables it for adagrad/sgd (lazy is
    # BIT-IDENTICAL to dense there) under lse + nce/sampled_softmax +
    # no weight decay + single device. adam is excluded from auto:
    # LazyAdam's skipped momentum decay on untouched rows measured
    # -0.034 NDCG@100 / -0.089 recall@100 on the 1M hard stress for a
    # wall-clock wash (NOTES.md round-3 run3) — "on" still forces it.
    sparse_update: str = "auto"     # "auto" | "on" | "off"
    # Optimizer update fused into the dense-softmax backward kernel
    # (train/fused.py): for loglinear / lse_full with adam/adagrad/sgd the
    # [d, E] matrix's dW never reaches HBM — 10 matrix passes/step become
    # 7. Measured on-chip this is a win only for sgd (1.08x; adagrad
    # 0.99x, adam 0.82x — the step is compute-bound at E=500k/d=128 and
    # adam's extra m/v streams shrink the entity tile; NOTES.md round-3),
    # so "auto" enables it exactly when semantics match the dense step
    # (no clipping/decay, single device) AND optimizer == sgd. "on"
    # forces it for any applicable optimizer, including on a PURE-TP mesh
    # (data axis 1, entity count divisible by the model axis): each
    # shard's dW is then the complete gradient slice for its entity
    # columns and the update applies per shard with no cross-shard
    # reduction (ops/xent.make_sharded_xent_apply; under data parallelism
    # dW must psum over 'data' first, so the fusion does not apply and
    # "on" errors). The optax state layout is UNCHANGED, so checkpoints
    # interoperate with fused_update on or off.
    fused_update: str = "auto"      # "auto" | "on" | "off"
    # Wire-format packing of the host->device feed (data/wirepack.py):
    # batch id planes travel at their true bit width (uint16 lo + packed
    # hi bits; lengths as uint8) and unpack inside the jitted step,
    # bit-exact — ~1.8x fewer feed bytes at vocab 250k / 1M entities.
    # Matters wherever the feed link is the wall (measured 23 ms/MB on
    # the tunneled bench chip; PCIe/DCN-fed hosts benefit less but
    # linearly). "auto" packs single-device TPU runs when both id spaces
    # fit 24 bits; sharded meshes keep raw transfer (their put_fn shards
    # the raw planes).
    packed_feed: str = "auto"       # "auto" | "on" | "off"
    # Per-epoch snapshot contents. "full" (default) stores params +
    # optimizer + RNG, so any epoch boundary is an exact resume point.
    # "params" matches the REFERENCE's own per-epoch dump (params only —
    # SURVEY.md section 3.1) at 1/3 the bytes of an adam full state (the
    # moments never even leave the device): epoch snapshots then serve
    # query/sweep but not resume — the FINAL epoch still writes full
    # state, and resume falls back to the newest full checkpoint (use
    # checkpoint_every_steps for mid-run full saves). At 1M entities the
    # full fetch is ~1.9 GB/epoch over the host link; "params" cuts it
    # to ~0.65 GB.
    epoch_snapshot: str = "full"    # "full" | "params"
    # Storage dtype for params-only INTERMEDIATE epoch snapshots. The
    # round-4 flagship e2e was snapshot-bound: the 0.65 GB fp32 params
    # fetch over the ~5.6 MB/s tunneled host link (~2 min/epoch) erased
    # the fused kernel's 1.32x step win (benchmarks/NOTES.md round 4).
    # "bfloat16" casts params ON DEVICE before the host fetch — half the
    # bytes over the link AND on disk. Query/sweep consumers already run
    # bf16 compute, so rankings are unchanged (test_checkpoint parity).
    # The FINAL epoch always writes full fp32 state (exact resume), and
    # full-flavor snapshots ignore this knob (they exist to be resume
    # points, which must be bit-exact).
    snapshot_dtype: str = "float32"  # "float32" | "bfloat16"
    # Write intermediate epoch snapshots only every N epochs (the final
    # epoch always writes). 1 = every epoch (reference behavior). On
    # snapshot-bound hosts this divides the per-epoch fetch/write cost;
    # the trade is sweep granularity and, for epoch_snapshot="full",
    # resume granularity (a crash loses up to N epochs, SURVEY.md
    # section 6's "at most one epoch" contract relaxes to N).
    epoch_snapshot_every: int = 1
    # Flavor of the FINAL epoch's snapshot. "full" (default) keeps the
    # exact-resume contract (params + optimizer + RNG, fp32). "params"
    # ends the run with a params-only snapshot at ``snapshot_dtype``
    # instead — for E=10M the full bf16 adam state is a ~7.8 GB
    # device->host fetch over a link that moves ~10 MB/s, vs ~2.6 GB
    # params-only; a finished run then serves query/sweep but cannot be
    # exactly CONTINUED (resume restarts, with the loud loop.py warning).
    final_snapshot: str = "full"    # "full" | "params"


@dataclass(frozen=True)
class ScoreConfig:
    top_k: int = 100
    entity_chunk: int = 1 << 15      # streaming chunk over the entity axis
    query_batch: int = 64
    similarity: str = "dot"          # "dot" | "cosine" (LSE query time)
    aggregate: str = "sum_log_prob"  # log-linear per-term aggregation
    # Engine: "auto" picks pallas on TPU, else dense (small E) / streaming.
    # "approx" = dense scores + lax.approx_max_k (fast, recall ~0.99,
    # materializes [Q, E] — not for the 10M configuration). "distributed"
    # shards the entity matrix over mesh_shape's model axis (shard_map +
    # all_gather/ring merge).
    engine: str = "auto"    # auto|dense|streaming|pallas|approx|distributed
    recall_target: float = 0.99      # approx engine only
    # Log-linear only: fold the exact softmax normalizer into run-file
    # scores (one extra matmul-bound sweep on the pallas path). Rankings
    # and all metrics are identical with False.
    normalize_scores: bool = True
    use_pallas: bool = False         # legacy alias for engine="pallas"
    # distributed engine: mesh axes, merge strategy, and per-shard engine.
    # local_engine "auto" = the fused Pallas kernels on TPU (the single-chip
    # fast path per shard) else "binmax" (same algorithm in partitionable
    # XLA, O(Q * E/n_shards) transient); "scan" is fixed-memory (chunk rows
    # at a time) — pick it when E/n_shards * query_batch * 4 bytes
    # approaches HBM.
    mesh_shape: Tuple[int, int] = (1, -1)   # (data, model); -1 = all devices
    merge: str = "allgather"                # "allgather" | "ring"
    local_engine: str = "auto"              # auto | pallas | binmax | scan
    # Pallas engine staging (ops/exact_topk.py): "clustered" permutes the
    # staged rows so one query's winners pack into fewer bins (coarse
    # spherical k-means order; results exact, indices mapped back), and
    # adaptive_bins > 0 rescores only that many top bins with a
    # verified-exact fallback — together they cut the gather-rescore
    # bytes, the engine's one remaining HBM-bound stage.
    layout: str = "natural"                 # "natural" | "clustered"
    adaptive_bins: int = 0                  # 0 = rescore all k+pad bins
    # Staged rescore-copy dtype for the pallas engine. "auto" = fp32 until
    # the staged fp32 copy would exceed ops.exact_topk's byte limit (2 GiB:
    # every config through E=1M stays fp32-exact), then bf16 — at E=10M the
    # fp32 staging next to just-trained params exceeds 16 GB HBM, and bf16
    # is the dtype the 10M scoring benchmark always measured at.
    rescore_dtype: str = "auto"             # "auto" | "float32" | "bfloat16"


@dataclass(frozen=True)
class RecipeConfig:
    """One end-to-end run: data + model + train + score (BASELINE.json configs)."""

    name: str = "recipe"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    score: ScoreConfig = field(default_factory=ScoreConfig)


def config_to_dict(cfg: Any) -> Dict[str, Any]:
    """Recursively serialize a (possibly nested) config dataclass."""
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        out[f.name] = config_to_dict(v) if dataclasses.is_dataclass(v) else (
            list(v) if isinstance(v, tuple) else v)
    return out


def config_from_dict(cls: Type[T], d: Dict[str, Any]) -> T:
    """Inverse of :func:`config_to_dict`; ignores unknown keys for forward compat."""
    kwargs: Dict[str, Any] = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = config_from_dict(f.type, v)
        elif f.name in ("data", "model", "train", "score") and isinstance(v, dict):
            sub = {"data": DataConfig, "model": ModelConfig,
                   "train": TrainConfig, "score": ScoreConfig}[f.name]
            kwargs[f.name] = config_from_dict(sub, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(config_to_dict(cfg), fh, indent=2, sort_keys=True)


def load_recipe(path: str) -> RecipeConfig:
    with open(path) as fh:
        return config_from_dict(RecipeConfig, json.load(fh))
