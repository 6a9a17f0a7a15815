"""Fused softmax cross-entropy over the entity axis ("flash xent").

The training hot loop of both full-softmax families (log-linear; LSE
full-softmax mode) is ``loss = mean(logsumexp(pooled @ W + b) - z_gold)``.
Composed in XLA this materializes [B, E] logits in HBM three times (fwd,
softmax, grad). These kernels never materialize them:

  forward:  grid (B/tb, ceil(E/te)); each step computes one logits tile in
            VMEM and writes only per-tile (max, sumexp) partials —
            O(B * E/te). The gold logit is one XLA gather (B rows).
  backward: ONE fused sweep, grid (j, i) with the batch axis innermost:
            recomputes the logits tile (flash-attention style), forms
            p = exp(z - lse) - onehot in VMEM once, and feeds all grads —
            dW += pooled^T p and db += sum p accumulate in the revisited
            per-j VMEM block; dpooled is emitted as per-tile partials
            dpp[j, i] = p W_j^T and reduced by one XLA sum (a [E/te, B, d]
            transient costs ~1/3 of the second full z/exp sweep the
            two-kernel round-1 design paid to revisit dpooled blocks).

The big matrix W is consumed IN ITS STORAGE FORM — no pre-pass:
  * no padding of the entity axis: the grid is ceil(E/te) and the last tile
    reads out of bounds (Pallas TPU masks the DMA; contents unspecified),
    with validity restored by an in-kernel ``col < E`` mask — any HBM-level
    pad of a [d, E] matrix is a full extra copy (~2 ms at E=500k, more than
    the matmul itself on this chip's effective bandwidth);
  * no dtype pre-cast: ``dtype="bfloat16"`` casts each W tile in VMEM on
    its way into the MXU (VPU work overlapped with the tile DMA), keeping
    fp32 master weights in HBM with zero per-step cast passes.

Entity matrix layout is static: "de" = [d, E] (log-linear proj_w) or
"ed" = [E, d] (LSE entity_emb) — no transposes of the big matrix, ever.

Exposed as ``xent_loss`` with a custom VJP; gradient parity vs the XLA
composition is tested in interpret mode (tests/test_ops.py) and the model
integration keeps an XLA fallback (ModelConfig.fused_softmax).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sert_tpu.ops.score_binmax import LANES, _pad_to


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _ct(dtype: str):
    return jnp.bfloat16 if dtype == "bfloat16" else jnp.float32


# Batch-row tile used by every kernel in this module, and the per-core VMEM
# working-set plan the accumulator/tile-width choices are budgeted against.
# One definition: train/fused.py's applicability gate imports these instead
# of keeping copies (the gate and the kernel must agree or a config could
# pass the gate and fail Mosaic allocation).
FUSED_TB = 256
_VMEM_PLAN_BYTES = 14 << 20


def _accum_dpool_ok(Bp: int, dp: int, te: int) -> bool:
    """Can the plain backward hold dpooled [Bp, dp] in VMEM? Budgets the
    WHOLE working set — W in + dW out (double-buffered) + p stripes + the
    accumulator — not just the accumulator, so configs that compiled with
    the HBM-transient layout keep compiling (the transient path's own
    envelope is the proven baseline; this only opts in when strictly
    within plan)."""
    streams = 2 * 2 * dp * te * 4            # W in + dW out, 2x buffered
    stripes = 2 * 2 * FUSED_TB * dp * 4      # p in + dpp-fallback-sized
    return streams + stripes + Bp * dp * 4 <= _VMEM_PLAN_BYTES


def plain_xent_te(dp: int, cap: int = 4096) -> int:
    """Largest entity-tile width (multiple of 128, <= ``cap``) whose PLAIN
    fwd/bwd working set fits the VMEM plan. The backward's streams govern:
    W in + dW out, each double-buffered, are ``4*dp*te*4`` bytes — at
    dp=256 fp32 a te=4096 tile alone is 16MB, over the terminal-pinned
    scoped-VMEM limit (measured on-chip: "exceeded ... by 512K" at
    E=500k/d=256; benchmarks/NOTES.md round-3). Round-2's measured d=128
    configs still resolve to te=4096 under this budget."""
    te = cap
    stripes = 2 * 2 * FUSED_TB * dp * 4      # p in + dpp-fallback stripes
    while te >= 128:
        if 2 * 2 * dp * te * 4 + stripes <= _VMEM_PLAN_BYTES:
            return te
        te //= 2
    # Even the narrowest tile is over budget (the dp-scaled stripes alone
    # can exceed the plan at dp >= ~2432). Returning an unchecked 128
    # would just move the failure to an opaque Mosaic scoped-VMEM error
    # on-chip; fail here with the actionable message instead.
    raise ValueError(
        f"fused softmax-CE cannot fit the VMEM plan at model width "
        f"dp={dp}: even a 128-wide entity tile exceeds "
        f"{_VMEM_PLAN_BYTES >> 20}MB. Use fused_softmax='off' (the XLA "
        f"composition) for models this wide.")


def _resolve_te(te, d: int) -> int:
    """The auto (``te=None``) tile width for a model/pooled width ``d`` —
    budgeted on the LANES-padded dp the kernels actually see. fwd and bwd
    must resolve identically (te is a nondiff arg of the custom VJP); both
    call this with the same padded width."""
    if te is not None:
        return te
    dp = max(-(-d // LANES) * LANES, LANES)
    return plain_xent_te(dp)


def fused_update_te(opt: str, dp: int, Bp: int):
    """Largest tile width (multiple of 128, capped by _FUSED_TE) whose
    optimizer-fused backward working set — streamed W/state blocks in+out
    (double-buffered), the dW scratch, the [Bp, dp] dpooled accumulator,
    and the p stripes — fits the VMEM plan; None when even 128 does not
    (the config is then inapplicable, see train/fused.py)."""
    n_mat = {"adam": 3, "adagrad": 2, "sgd": 1}[opt]   # W + state slots
    te = _FUSED_TE[opt]
    while te >= 128:
        streams = 2 * n_mat * 2 * dp * te * 4          # in+out, 2x buffered
        total = (streams + dp * te * 4                 # dW scratch
                 + Bp * dp * 4                         # dpooled accumulator
                 + 2 * FUSED_TB * dp * 4)              # p stripes
        if total <= _VMEM_PLAN_BYTES:
            return te
        te //= 2
    return None


def _z_tile(p_ref, w_ref, b_ref, j, *, te, e_total, layout, ct):
    """One logits tile [tb, te] in fp32 from VMEM operands, with columns
    beyond ``e_total`` (entity padding / OOB tail reads) forced to -1e30 so
    they lose every max and vanish under exp."""
    p = p_ref[:]
    w = w_ref[:].astype(ct)
    if layout == "de":
        z = jnp.dot(p, w, preferred_element_type=jnp.float32)
    else:  # "ed": rows are entities
        z = jnp.dot(p, w.T, preferred_element_type=jnp.float32)
    z = z + b_ref[:]                        # b block [1, te]
    cols = j * te + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    return jnp.where(cols < e_total, z, -1e30)


# --------------------------- forward ---------------------------------------

def _fwd_kernel(p_ref, w_ref, b_ref, m_ref, s_ref, *, te, e_total, layout,
                ct):
    j = pl.program_id(1)
    z = _z_tile(p_ref, w_ref, b_ref, j, te=te, e_total=e_total,
                layout=layout, ct=ct)                   # [tb, te]
    m = jnp.max(z, axis=-1)                             # [tb]
    s = jnp.sum(jnp.exp(z - m[:, None]), axis=-1)       # [tb]
    m_ref[0, 0, :] = m
    s_ref[0, 0, :] = s


# --------------------------- backward ---------------------------------------

def _p_tile(p_ref, w_ref, b_ref, lse_ref, lab_ref, j, *, te, e_total,
            layout, ct):
    """softmax - onehot for one tile, in VMEM."""
    z = _z_tile(p_ref, w_ref, b_ref, j, te=te, e_total=e_total,
                layout=layout, ct=ct)
    prob = jnp.exp(z - lse_ref[:])                      # lse block [tb, 1]
    cols = j * te + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    onehot = (cols == lab_ref[:]).astype(jnp.float32)   # lab block [tb, 1]
    return prob - onehot


def _tile_grads(p_ref, w_ref, b_ref, lse_ref, lab_ref, j, *, te, e_total,
                layout, ct):
    """(dw, dpp, db, wmask) for one (j, i) grid tile — the gradient math
    shared by the plain and optimizer-fused backward kernels."""
    p = _p_tile(p_ref, w_ref, b_ref, lse_ref, lab_ref, j, te=te,
                e_total=e_total, layout=layout, ct=ct)
    pooled = p_ref[:]
    w = w_ref[:].astype(ct)
    # The dpp dot CONTRACTS over the entity axis, so the OOB tail tile's
    # unspecified W contents must be zeroed (0 * NaN = NaN would leak into
    # dpooled; dW/db are safe — p is exactly 0 on invalid columns and they
    # contract over rows). One VPU select per tile, negligible.
    eaxis = 1 if layout == "de" else 0
    ecols = j * te + jax.lax.broadcasted_iota(jnp.int32, w.shape, eaxis)
    wmask = ecols < e_total
    wz = jnp.where(wmask, w, jnp.zeros((), ct))
    # p is fp32 from exp(); cast to the compute dtype so the dots hit the
    # MXU at full rate (fp32 accumulation via preferred type).
    pc = p.astype(ct)
    if layout == "de":
        dw = jnp.dot(pooled.T, pc, preferred_element_type=jnp.float32)
        dpp = jnp.dot(pc, wz.T, preferred_element_type=jnp.float32)
    else:
        dw = jnp.dot(pc.T, pooled, preferred_element_type=jnp.float32)
        dpp = jnp.dot(pc, wz, preferred_element_type=jnp.float32)
    db = jnp.sum(p, axis=0)[None, :]
    return dw, dpp, db, wmask


def _accum_dpool_stripe(dp_ref, dpp, j, i, tb):
    """Accumulate one [tb, dp] dpooled stripe into the VMEM-resident
    [Bp, dp] output block (constant index map; flushed once at the end)."""
    rows = pl.ds(i * tb, tb)

    @pl.when(j == 0)
    def _():
        dp_ref[rows, :] = dpp

    @pl.when(j > 0)
    def _():
        dp_ref[rows, :] += dpp


def _bwd_kernel(p_ref, w_ref, b_ref, lse_ref, lab_ref,
                dw_ref, db_ref, dpp_ref, *, te, e_total, layout, ct,
                accum_dpool=False, tb=0):
    """One fused backward sweep, grid (j, i) with i (batch) innermost.

    Computes the p = softmax - onehot tile ONCE and feeds all three grads:
      dW  [per-j block]: accumulated in VMEM across the inner i revisits,
      db  [per-j block]: same accumulation,
      dpooled: with ``accum_dpool`` the whole [Bp, dp] result lives in ONE
               VMEM-resident output block (constant index map) and row
               stripes accumulate across j — no HBM transient at all.
               When the working set exceeds the VMEM plan, falls back to
               PER-TILE PARTIALS dpp[j, i-block] = p @ W_j^T reduced over
               j by one XLA sum afterwards — a [nE, Bp, d] HBM transient
               that is still ~3x cheaper than a second full kernel sweep
               recomputing z/exp (the round-1 two-kernel design; see
               benchmarks/NOTES.md round-2 row).
    """
    j, i = pl.program_id(0), pl.program_id(1)
    dw, dpp, db, _ = _tile_grads(p_ref, w_ref, b_ref, lse_ref, lab_ref, j,
                                 te=te, e_total=e_total, layout=layout,
                                 ct=ct)
    if accum_dpool:
        _accum_dpool_stripe(dpp_ref, dpp, j, i, tb)
    else:
        dpp_ref[0] = dpp

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dw_ref[:] += dw
        db_ref[:] += db


# --------------------------- host-side wrappers -----------------------------

def _specs(tb, te, dp, layout):
    p_spec_i = pl.BlockSpec((tb, dp), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    if layout == "de":
        w_spec = lambda im: pl.BlockSpec((dp, te), im, memory_space=pltpu.VMEM)
    else:
        w_spec = lambda im: pl.BlockSpec((te, dp), im, memory_space=pltpu.VMEM)
    b_spec = lambda im: pl.BlockSpec((1, te), im, memory_space=pltpu.VMEM)
    return p_spec_i, w_spec, b_spec


def _fwd_partials(pooled, W, b, tb, te, layout, interpret, e_total, ct):
    """Per-tile (max, sumexp) partials, [nE, B] each. ``W`` is the raw
    (unpadded-entity-axis) matrix; the last tile reads OOB and is masked."""
    B, dp = pooled.shape
    nB, nE = B // tb, -(-e_total // te)
    p_spec, w_spec, b_spec = _specs(tb, te, dp, layout)
    w_idx = ((lambda i, j: (0, j)) if layout == "de" else (lambda i, j: (j, 0)))
    out_shape = [jax.ShapeDtypeStruct((nE, 1, B), jnp.float32)] * 2
    out_spec = pl.BlockSpec((1, 1, tb), lambda i, j: (j, 0, i),
                            memory_space=pltpu.VMEM)
    m, s = pl.pallas_call(
        functools.partial(_fwd_kernel, te=te, e_total=e_total, layout=layout,
                          ct=ct),
        grid=(nB, nE),
        in_specs=[p_spec, w_spec(w_idx), b_spec(lambda i, j: (0, j))],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(pooled, W, b)
    return m[:, 0, :], s[:, 0, :]          # [nE, B] each


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def xent_loss(pooled: jax.Array, W: jax.Array, b: jax.Array,
              labels: jax.Array, layout: str = "de",
              tb: int = 256, te: Optional[int] = None,
              interpret: Optional[bool] = None,
              dtype: str = "float32") -> jax.Array:
    """SUM of softmax cross-entropies over the batch (divide by B for the
    mean). pooled [B, d] fp32; W [d, E] ("de") or [E, d] ("ed"); b [E];
    labels int32 [B]. B and d are padded internally (cheap); the entity
    axis is consumed unpadded via OOB tail tiles (see module docstring).
    ``te=None`` (default) picks the widest VMEM-budgeted entity tile for
    this d (``plain_xent_te``); pass an explicit te only for tests.

    ``dtype="bfloat16"`` runs every matmul (fwd logits, bwd dW/dpooled) on
    bf16 MXU passes with fp32 accumulation, casting W tiles in VMEM —
    softmax/exp/log stay fp32 and W keeps its storage dtype in HBM (fp32
    master weights). Same numeric class as TPU's DEFAULT-precision f32
    matmuls; parity tested against the XLA composition."""
    loss, _ = _xent_fwd(pooled, W, b, labels, layout, tb, te, interpret,
                        dtype)
    return loss


def _prep(pooled, W, b, labels, layout, tb, te, ct=jnp.float32):
    """Pad the SMALL operands (pooled rows to tb, the shared d axis to
    LANES, bias to the tile grid, labels to tb) and cast pooled to the
    compute dtype. W's entity axis is NOT padded and W is NOT cast — the
    kernels handle both (OOB tail tiles + in-VMEM tile casts)."""
    B_orig = pooled.shape[0]
    E_orig = W.shape[1] if layout == "de" else W.shape[0]
    pooled = _pad_to(_pad_to(pooled.astype(ct), 0, tb), 1, LANES)
    # d-axis alignment: only copies when d % LANES != 0 (small models).
    W = _pad_to(W, 0 if layout == "de" else 1, LANES)
    nE = -(-E_orig // te)
    bpad = _pad_to(b.astype(jnp.float32)[None, :], 1, te)
    if bpad.shape[1] != nE * te:  # guard: _pad_to only reaches next multiple
        bpad = jnp.pad(bpad, ((0, 0), (0, nE * te - bpad.shape[1])))
    labels = _pad_to(labels.astype(jnp.int32), 0, tb)
    return pooled, W, bpad, labels, B_orig, E_orig


def _xent_fwd(pooled, W, b, labels, layout, tb, te, interpret,
              dtype="float32"):
    if interpret is None:
        interpret = _interpret_default()
    ct = _ct(dtype)
    d_orig = pooled.shape[1]
    te = _resolve_te(te, d_orig)
    pooled_p, W_k, b_p, labels_p, B, E = _prep(pooled, W, b, labels,
                                               layout, tb, te, ct)

    m, s = _fwd_partials(pooled_p, W_k, b_p, tb, te, layout, interpret, E, ct)
    M = jnp.max(m, axis=0)                               # [Bp]
    lse = M + jnp.log(jnp.sum(s * jnp.exp(m - M[None, :]), axis=0))

    # gold logits via one XLA gather of W rows/cols; the elementwise product
    # uses the SAME compute dtype as the kernel's MXU inputs, fp32-summed.
    if layout == "de":
        w_gold = W_k[:, labels_p].T                      # [Bp, d]
    else:
        w_gold = W_k[labels_p, :]                        # [Bp, d]
    z_gold = (jnp.sum(pooled_p.astype(jnp.float32)
                      * w_gold.astype(ct).astype(jnp.float32), axis=1)
              + b_p[0, labels_p])

    row = jnp.arange(pooled_p.shape[0])
    per_row = jnp.where(row < B, lse - z_gold, 0.0)
    loss = jnp.sum(per_row)
    residuals = (pooled_p, W_k, b_p, labels_p, lse, B, E, d_orig)
    return loss, residuals


def _bwd_calls(pooled_p, W_k, b_p, lse_m, lab_m, tb, te, layout, interpret,
               e_total, ct):
    """The fused backward pallas_call on (row-padded) operands: returns
    (dW [padded-grid shape], db [1, nE*te], dpooled [Bp, dp]), all fp32,
    unscaled. ``lse_m`` [Bp, 1] must be poisoned (1e30) on rows that should
    not contribute; ``lab_m`` [Bp, 1] holds LOCAL column indices or -1 for
    rows whose gold column is not in W_k (sharded use) / padded rows."""
    Bp, dp = pooled_p.shape
    nB, nE = Bp // tb, -(-e_total // te)
    Ep = nE * te

    _, w_spec, b_spec = _specs(tb, te, dp, layout)
    # batch-row blocks: row index is i — the LAST grid axis of the (j, i)
    # fused backward grid.
    def row_spec():
        return pl.BlockSpec((tb, 1), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)

    w_idx_ji = ((lambda j, i: (0, j)) if layout == "de"
                else (lambda j, i: (j, 0)))
    p_spec_ji = pl.BlockSpec((tb, dp), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM)
    dw_shape = ((dp, Ep) if layout == "de" else (Ep, dp))
    dw_block = ((dp, te) if layout == "de" else (te, dp))
    dw_idx = ((lambda j, i: (0, j)) if layout == "de"
              else (lambda j, i: (j, 0)))
    # dpooled: VMEM-resident accumulation when the WHOLE working set fits
    # the plan (saves the [nE, Bp, dp] HBM transient + its XLA reduction
    # read); the transient fallback keeps the proven envelope otherwise.
    accum = _accum_dpool_ok(Bp, dp, te)
    if accum:
        dpp_spec = pl.BlockSpec((Bp, dp), lambda j, i: (0, 0),
                                memory_space=pltpu.VMEM)
        dpp_shape = jax.ShapeDtypeStruct((Bp, dp), jnp.float32)
    else:
        dpp_spec = pl.BlockSpec((1, tb, dp), lambda j, i: (j, i, 0),
                                memory_space=pltpu.VMEM)
        dpp_shape = jax.ShapeDtypeStruct((nE, Bp, dp), jnp.float32)
    dW, db, dpp = pl.pallas_call(
        functools.partial(_bwd_kernel, te=te, e_total=e_total, layout=layout,
                          ct=ct, accum_dpool=accum, tb=tb),
        grid=(nE, nB),
        in_specs=[p_spec_ji, w_spec(w_idx_ji), b_spec(lambda j, i: (0, j)),
                  row_spec(), row_spec()],
        out_specs=[pl.BlockSpec(dw_block, dw_idx, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, te), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM),
                   dpp_spec],
        out_shape=[jax.ShapeDtypeStruct(dw_shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, Ep), jnp.float32),
                   dpp_shape],
        interpret=interpret,
    )(pooled_p, W_k, b_p, lse_m, lab_m)
    dpooled = dpp if accum else jnp.sum(dpp, axis=0)    # [Bp, dp]
    return dW, db, dpooled


def _xent_bwd(layout, tb, te, interpret, dtype, residuals, g):
    if interpret is None:
        interpret = _interpret_default()
    ct = _ct(dtype)
    pooled_p, W_k, b_p, labels_p, lse, B, E, d_orig = residuals
    # pooled_p is already LANES-padded, so this resolves identically to
    # the forward's _resolve_te(te, d_orig) call.
    te = _resolve_te(te, pooled_p.shape[1])
    Bp = pooled_p.shape[0]

    # Padded batch rows must contribute zero grad: poison their lse so
    # exp(z - lse) ~ 0, and point their label at an invalid column.
    row = jnp.arange(Bp)
    lse_m = jnp.where(row < B, lse, 1e30)[:, None]       # [Bp, 1]
    lab_m = jnp.where(row < B, labels_p, -1)[:, None]    # [Bp, 1]

    dW, db, dpooled = _bwd_calls(pooled_p, W_k, b_p, lse_m, lab_m,
                                 tb, te, layout, interpret, E, ct)
    g = g.astype(jnp.float32)
    if layout == "de":
        dW_out = g * dW[:d_orig, :E]
    else:
        dW_out = g * dW[:E, :d_orig]
    return (g * dpooled[:B, :d_orig], dW_out, g * db[0, :E], None)


xent_loss.defvjp(_xent_fwd, _xent_bwd)


# ------------- backward fused with the optimizer update ----------------------
#
# The dense-softmax train step's HBM traffic over the [d, E] entity matrix
# is pass-bound: fwd reads W; bwd reads W and WRITES dW; the (XLA-fused)
# optimizer then reads dW, m, v, W and writes W, m, v — 10 matrix-sized
# passes. Applying the optimizer INSIDE the backward sweep's final dW
# revisit removes dW from HBM entirely and reuses the bwd's W tile: fwd
# reads W; bwd reads W, m, v and writes W', m', v' — 7 passes. The same
# kernel also accumulates dpooled in a VMEM-resident output block instead
# of the [nE, Bp, dp] HBM transient the plain backward pays (possible here
# because the fused-update tiles are narrow enough that Bp*dp fits VMEM).
# Semantics match optax scale_by_adam / scale_by_rss / sgd exactly (the
# same contracts train/sparse.py mirrors for rows); gradient scaling
# (mean-loss 1/B) is folded in via ``gscale``.

_FUSED_TE = {"adam": 512, "adagrad": 1024, "sgd": 2048}  # VMEM-budgeted


def _bwd_update_kernel(*refs, te, e_total, layout, ct, opt, lr, b1, b2,
                       eps, gscale, n_i, tb):
    if opt == "adam":
        (sc_ref, p_ref, w_ref, b_ref, lse_ref, lab_ref, m_ref, v_ref,
         wout_ref, mout_ref, vout_ref, db_ref, dp_ref, gsq_ref,
         dw_scr) = refs
    elif opt == "adagrad":
        (p_ref, w_ref, b_ref, lse_ref, lab_ref, a_ref,
         wout_ref, aout_ref, db_ref, dp_ref, gsq_ref, dw_scr) = refs
    else:                                                  # sgd
        (p_ref, w_ref, b_ref, lse_ref, lab_ref,
         wout_ref, db_ref, dp_ref, gsq_ref, dw_scr) = refs
    j, i = pl.program_id(0), pl.program_id(1)
    dw, dpp, db, wmask = _tile_grads(p_ref, w_ref, b_ref, lse_ref, lab_ref,
                                     j, te=te, e_total=e_total,
                                     layout=layout, ct=ct)
    _accum_dpool_stripe(dp_ref, dpp, j, i, tb)

    @pl.when(i == 0)
    def _():
        dw_scr[:] = dw
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dw_scr[:] += dw
        db_ref[:] += db

    @pl.when(i == n_i - 1)
    def _():
        # The tile's full gradient is in; apply the optimizer to this W
        # block. OOB columns are zeroed in g (their m/v loads are
        # unspecified, but the corresponding stores are masked off).
        g = jnp.where(wmask, dw_scr[:] * gscale, 0.0)
        # gsq lives in SMEM as ONE whole [nE, 1] array: scalar stores are
        # legal there, while VMEM rejects both rank-0 stores ("Cannot
        # store scalars to VMEM") and (1, 1) per-tile blocks (Mosaic's
        # (8, 128) block-divisibility rule) on real lowering. Each j
        # writes its row once, at its last batch revisit.
        gsq_ref[j, 0] = jnp.sum(g * g)
        wf = w_ref[:].astype(jnp.float32)
        if opt == "adam":
            bc1, bc2 = sc_ref[0, 0], sc_ref[0, 1]
            m2 = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
            v2 = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
            upd = lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            mout_ref[:] = m2.astype(mout_ref.dtype)
            vout_ref[:] = v2.astype(vout_ref.dtype)
        elif opt == "adagrad":
            a2 = a_ref[:].astype(jnp.float32) + g * g
            upd = lr * g * jnp.where(a2 > 0, jax.lax.rsqrt(a2 + eps), 0.0)
            aout_ref[:] = a2.astype(aout_ref.dtype)
        else:                                              # sgd
            upd = lr * g
        wout_ref[:] = (wf - upd).astype(wout_ref.dtype)


def xent_bwd_apply(pooled_p, W_k, b_p, lse_m, lab_m, *, e_total, layout,
                   opt, opt_tree, lr, bias_corr, gscale, tb, te,
                   interpret, ct):
    """Fused backward + optimizer update over (row-padded) operands.

    ``opt_tree``: {"m","v"} (adam) / {"acc"} (adagrad) / {} (sgd), arrays
    shaped like ``W_k``. ``bias_corr``: [1, 2] f32 (1-b1^t, 1-b2^t), adam
    only. Returns (W_new, opt_tree_new, db, dpooled, gsq) where db/dpooled
    are UNSCALED sum-loss gradients (the W update itself already folded
    ``gscale`` in) and gsq = ||gscale * dW||^2 for the caller's grad-norm
    metric. W/m/v HBM buffers are donated via input-output aliasing."""
    Bp, dp = pooled_p.shape
    nB, nE = Bp // tb, -(-e_total // te)
    Ep = nE * te

    _, w_spec, b_spec = _specs(tb, te, dp, layout)
    w_idx_ji = ((lambda j, i: (0, j)) if layout == "de"
                else (lambda j, i: (j, 0)))
    p_spec_ji = pl.BlockSpec((tb, dp), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((tb, 1), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    wkind = w_spec(w_idx_ji)
    w_shape = jax.ShapeDtypeStruct(W_k.shape, W_k.dtype)

    kern = functools.partial(
        _bwd_update_kernel, te=te, e_total=e_total, layout=layout, ct=ct,
        opt=opt, lr=float(lr), b1=0.9, b2=0.999,
        eps=(1e-8 if opt == "adam" else 1e-7), gscale=float(gscale),
        n_i=nB, tb=tb)

    common_outs = [
        pl.BlockSpec((1, te), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),            # db
        pl.BlockSpec((Bp, dp), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),            # dpooled
        pl.BlockSpec(memory_space=pltpu.SMEM),            # gsq (whole array)
    ]
    common_shapes = [jax.ShapeDtypeStruct((1, Ep), jnp.float32),
                     jax.ShapeDtypeStruct((Bp, dp), jnp.float32),
                     jax.ShapeDtypeStruct((nE, 1), jnp.float32)]
    scratch = [pltpu.VMEM(((dp, te) if layout == "de" else (te, dp)),
                          jnp.float32)]

    if opt == "adam":
        st_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (opt_tree["m"], opt_tree["v"]))
        out = pl.pallas_call(
            kern, grid=(nE, nB),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),   # bias_corr
                      p_spec_ji, wkind, b_spec(lambda j, i: (0, j)),
                      row_spec, row_spec, wkind, wkind],
            out_specs=[wkind, wkind, wkind] + common_outs,
            out_shape=[w_shape, st_spec[0], st_spec[1]] + common_shapes,
            input_output_aliases={2: 0, 6: 1, 7: 2},
            scratch_shapes=scratch, interpret=interpret,
        )(bias_corr, pooled_p, W_k, b_p, lse_m, lab_m,
          opt_tree["m"], opt_tree["v"])
        W_new, m_new, v_new, db, dpooled, gsq = out
        st_new = {"m": m_new, "v": v_new}
    elif opt == "adagrad":
        a_spec = jax.ShapeDtypeStruct(opt_tree["acc"].shape,
                                      opt_tree["acc"].dtype)
        out = pl.pallas_call(
            kern, grid=(nE, nB),
            in_specs=[p_spec_ji, wkind, b_spec(lambda j, i: (0, j)),
                      row_spec, row_spec, wkind],
            out_specs=[wkind, wkind] + common_outs,
            out_shape=[w_shape, a_spec] + common_shapes,
            input_output_aliases={1: 0, 5: 1},
            scratch_shapes=scratch, interpret=interpret,
        )(pooled_p, W_k, b_p, lse_m, lab_m, opt_tree["acc"])
        W_new, a_new, db, dpooled, gsq = out
        st_new = {"acc": a_new}
    else:                                                  # sgd
        out = pl.pallas_call(
            kern, grid=(nE, nB),
            in_specs=[p_spec_ji, wkind, b_spec(lambda j, i: (0, j)),
                      row_spec, row_spec],
            out_specs=[wkind] + common_outs,
            out_shape=[w_shape] + common_shapes,
            input_output_aliases={1: 0},
            scratch_shapes=scratch, interpret=interpret,
        )(pooled_p, W_k, b_p, lse_m, lab_m)
        W_new, db, dpooled, gsq = out
        st_new = {}
    return W_new, st_new, db, dpooled, jnp.sum(gsq)


def xent_loss_apply(pooled, W, b, labels, *, opt, opt_tree, lr, count,
                    gscale, layout="de", tb: int = 256,
                    te: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    dtype: str = "float32"):
    """Fused softmax-xent loss + backward + optimizer update of W.

    One forward partials sweep (loss) + one backward sweep that applies
    adam/adagrad/sgd to W in its final dW revisit (see the section comment
    for the HBM-pass arithmetic). Returns
    (loss_sum, W_new, opt_tree_new, db_scaled, dpooled_scaled, gsq):
    db/dpooled carry ``gscale`` so they ARE the mean-loss gradients the
    caller backprops / applies; gsq = ||scaled dW||^2 for grad-norm
    metrics. NOT differentiable — it performs the update itself.
    """
    if interpret is None:
        interpret = _interpret_default()
    ct = _ct(dtype)
    if te is None:
        Bp_plan = -(-pooled.shape[0] // tb) * tb
        dp_plan = max(-(-pooled.shape[1] // LANES) * LANES, LANES)
        te = fused_update_te(opt, dp_plan, Bp_plan)
        if te is None:
            raise ValueError(
                f"fused update working set does not fit the VMEM plan at "
                f"d={pooled.shape[1]}, B={pooled.shape[0]} for {opt}; "
                "disable fused_update for this config")
    loss, residuals = _xent_fwd(pooled, W, b, labels, layout, tb, te,
                                interpret, dtype)
    pooled_p, W_k, b_p, labels_p, lse, B, E, d_orig = residuals
    if W_k.shape != W.shape:
        raise ValueError(
            f"fused update needs W's non-entity axis LANES-aligned "
            f"(got {W.shape}); pad word/entity dim to a multiple of "
            f"{LANES} or disable fused_update")
    Bp = pooled_p.shape[0]
    row = jnp.arange(Bp)
    lse_m = jnp.where(row < B, lse, 1e30)[:, None]
    lab_m = jnp.where(row < B, labels_p, -1)[:, None]
    t = (jnp.asarray(count, jnp.float32) + 1.0)
    bias_corr = jnp.stack([1.0 - 0.9 ** t, 1.0 - 0.999 ** t])[None, :]
    W_new, st_new, db, dpooled, gsq = xent_bwd_apply(
        pooled_p, W_k, b_p, lse_m, lab_m, e_total=E, layout=layout,
        opt=opt, opt_tree=opt_tree, lr=lr, bias_corr=bias_corr,
        gscale=gscale, tb=tb, te=te, interpret=interpret, ct=ct)
    return (loss, W_new, st_new, gscale * db[0, :E],
            gscale * dpooled[:B, :d_orig], gsq)


# --------------------- sharded (shard_map) variant ---------------------------
#
# The [D]-mandated deployment of this kernel is "fused pass ... with
# data-parallel batches over the mesh" (SURVEY.md section 3.2 build
# consequence). pallas_call has no GSPMD partitioning rule, so under plain
# pjit the kernel forces an all-gather of whichever operand is sharded. The
# shard_map formulation below runs the SAME kernels per device on the local
# (batch-shard x entity-shard) block and stitches exactness back with
# collectives:
#
#   forward:  per-shard (max, sumexp) over local entity tiles
#             -> pmax/psum over the ``model`` axis = global logsumexp;
#             gold logit contributed only by the shard owning the label
#             column -> psum over ``model``; row losses summed locally.
#   backward: plain per-shard dW/db/dpooled from the fused kernel; the
#             shard_map transpose's replicated-axis psums perform the
#             cross-shard reductions (see the note inside).
#             Off-shard gold columns enter the kernel as label -1 (the
#             onehot never fires on this shard — the owning shard supplies
#             the -1 term of softmax-minus-onehot).
#
# Exactness therefore matches the single-device kernel bit-for-bit up to
# fp32 reduction order (grad-parity tested on the fake 8-device mesh).


def _shard_fwd_stitch(pooled_p, W_k, b_p, labels_p, tb, te, layout, ip, El,
                      ct, model_axis):
    """Per-shard forward stitching shared by the sharded loss and apply
    paths: local tile partials -> global logsumexp via pmax/psum over the
    ``model`` axis, plus the gold logit contributed only by the shard
    owning the label column and psummed global. Returns
    ``(lse, z_gold, in_shard, idx)`` with lse/z_gold GLOBAL [Bp] and
    in_shard/idx local to this shard."""
    m, s = _fwd_partials(pooled_p, W_k, b_p, tb, te, layout, ip, El, ct)
    M_l = jnp.max(m, axis=0)                            # [Bp] local max
    S_l = jnp.sum(s * jnp.exp(m - M_l[None, :]), axis=0)
    g_max = jax.lax.pmax(M_l, model_axis)
    g_sum = jax.lax.psum(S_l * jnp.exp(M_l - g_max), model_axis)
    lse = g_max + jnp.log(g_sum)                        # [Bp] GLOBAL

    offset = jax.lax.axis_index(model_axis) * El
    lab_loc = labels_p - offset
    in_shard = (lab_loc >= 0) & (lab_loc < El)
    idx = jnp.clip(lab_loc, 0, El - 1)
    if layout == "de":
        w_gold = W_k[:, idx].T                          # [Bp, dp]
    else:
        w_gold = W_k[idx, :]
    z_gold_l = jnp.where(
        in_shard,
        jnp.sum(pooled_p.astype(jnp.float32)
                * w_gold.astype(ct).astype(jnp.float32), axis=1)
        + b_p[0, idx], 0.0)
    z_gold = jax.lax.psum(z_gold_l, model_axis)         # [Bp] GLOBAL
    return lse, z_gold, in_shard, idx


def make_sharded_xent_loss(mesh, layout: str = "de",
                           data_axis: str = "data",
                           model_axis: str = "model",
                           tb: int = 256, te: Optional[int] = None,
                           interpret: Optional[bool] = None,
                           dtype: str = "float32"):
    """Build ``fn(pooled [B,d], W, b [E], labels [B]) -> scalar loss SUM``
    where W/b are sharded over ``model_axis`` (entity axis) and pooled/labels
    over ``data_axis``, using the fused Pallas kernels per shard.

    B must divide mesh[data] and E must divide mesh[model] (recipes pad the
    entity count; the feeder emits mesh-divisible batches).
    """
    from jax.sharding import PartitionSpec as P

    # The body returns a PER-SHARD partial loss ([1], out_specs sharded over
    # both axes -> global [n_devices]; the wrapper sums it). Why not a
    # replicated scalar: shard_map's transpose convention for a replicated
    # output scales the incoming cotangent by 1/mesh.size and psums returned
    # input-cotangents over each input's replicated in_spec axes — correct
    # for plain code, but a custom_vjp must then bake mesh-size factors into
    # its bwd. With a fully-sharded output the cotangent arrives unscaled,
    # and the machinery's replicated-axis psums (over ``model`` for
    # pooled/labels, over ``data`` for W/b) are EXACTLY the reductions the
    # math needs, so the bwd below returns plain local grads with no
    # explicit collectives.
    n_model = mesh.shape[model_axis]
    ct = _ct(dtype)

    @jax.custom_vjp
    def _loss(pooled_l, W_l, b_l, labels_l):
        loss, _ = _fwd(pooled_l, W_l, b_l, labels_l)
        return loss

    def _fwd(pooled_l, W_l, b_l, labels_l):
        ip = _interpret_default() if interpret is None else interpret
        d_orig = pooled_l.shape[1]
        te_r = _resolve_te(te, d_orig)
        # _prep pads the LOCAL block; its E_orig is the local row/col count.
        pooled_p, W_k, b_p, labels_p, Bl, El = _prep(
            pooled_l, W_l, b_l, labels_l, layout, tb, te_r, ct)

        lse, z_gold, in_shard, idx = _shard_fwd_stitch(
            pooled_p, W_k, b_p, labels_p, tb, te_r, layout, ip, El, ct,
            model_axis)

        row = jnp.arange(pooled_p.shape[0])
        valid = row < Bl
        # Per-shard partial: the row losses are replicated across the model
        # axis (lse/z_gold are global after the collectives above), so each
        # model-shard contributes 1/n_model of its data-rows' sum; the
        # wrapper's sum over all shards reassembles the total exactly.
        local = jnp.sum(jnp.where(valid, lse - z_gold, 0.0))[None] / n_model
        lab_kernel = jnp.where(valid & in_shard, idx, -1)   # LOCAL col or -1
        residuals = (pooled_p, W_k, b_p, lab_kernel, lse, Bl, El, d_orig)
        return local, residuals

    def _bwd(residuals, g):
        ip = _interpret_default() if interpret is None else interpret
        pooled_p, W_k, b_p, lab_kernel, lse, Bl, El, d_orig = residuals
        Bp = pooled_p.shape[0]
        row = jnp.arange(Bp)
        lse_m = jnp.where(row < Bl, lse, 1e30)[:, None]
        lab_m = lab_kernel[:, None]

        dW, db, dpooled = _bwd_calls(pooled_p, W_k, b_p, lse_m, lab_m,
                                     tb, _resolve_te(te, pooled_p.shape[1]),
                                     layout, ip, El, ct)
        # Plain LOCAL grads: the shard_map transpose psums dW/db over
        # ``data`` (they enter replicated over it) and dpooled over
        # ``model`` — no collectives here (see note above _loss).
        g = g[0].astype(jnp.float32)
        if layout == "de":
            dW_out = g * dW[:d_orig, :El]
        else:
            dW_out = g * dW[:El, :d_orig]
        return (g * dpooled[:Bl, :d_orig], dW_out, g * db[0, :El], None)

    _loss.defvjp(_fwd, _bwd)

    w_spec = P(None, model_axis) if layout == "de" else P(model_axis, None)
    # check_vma=False: pallas_call outputs carry no varying-axes metadata, so
    # the static analysis cannot type the kernel results; correctness is
    # pinned by the mesh-vs-single-device grad-parity tests.
    mapped = jax.shard_map(
        _loss, mesh=mesh,
        in_specs=(P(data_axis, None), w_spec, P(model_axis), P(data_axis)),
        out_specs=P((data_axis, model_axis)),
        check_vma=False,
    )

    def total_loss(pooled, W, b, labels):
        return jnp.sum(mapped(pooled, W, b, labels))

    return total_loss


def make_sharded_xent_apply(mesh, *, layout: str, opt: str, lr: float,
                            dtype: str = "float32",
                            data_axis: str = "data",
                            model_axis: str = "model",
                            tb: int = FUSED_TB,
                            interpret: Optional[bool] = None):
    """Pure-TP deployment of the optimizer-in-backward kernel: the fused
    softmax-CE backward applies adam/adagrad/sgd to each shard's W block in
    place (xent_bwd_apply per shard).

    Requires mesh[data] == 1: with the batch whole on every model shard, the
    per-shard dW is the COMPLETE gradient slice for the shard's entity
    columns, so the update can apply locally with no cross-shard reduction.
    Under data parallelism the per-shard dW would have to psum over ``data``
    before any update — re-materializing the dW round-trip the fusion exists
    to remove — which is why that regime keeps the plain sharded loss
    (make_sharded_xent_loss) + XLA optimizer instead.

    Returns ``fn(pooled, W, b, labels, opt_tree, count)`` with the same
    result contract as xent_loss_apply: (loss_sum, W_new, opt_tree_new,
    db_scaled, dpooled_scaled, gsq); W/b/opt_tree sharded over
    ``model_axis``, pooled/labels replicated (the data axis has size 1),
    db_scaled comes back sharded over ``model_axis`` and dpooled/loss/gsq
    replicated.
    """
    from jax.sharding import PartitionSpec as P

    if mesh.shape.get(data_axis) is None:
        raise ValueError(
            f"make_sharded_xent_apply: mesh {tuple(mesh.shape)} has no "
            f"'{data_axis}' axis; pass data_axis= matching the mesh (the "
            "fused_tp_enabled gate treats a missing axis as size 1)")
    if mesh.shape[data_axis] != 1:
        raise ValueError(
            f"make_sharded_xent_apply needs a pure-TP mesh "
            f"(data axis of size 1, got {mesh.shape[data_axis]}): under "
            "data parallelism the per-shard dW must be psummed across "
            "'data' before any optimizer update, so the in-kernel update "
            "does not apply — use make_sharded_xent_loss there")
    ct = _ct(dtype)

    def body(bias_corr, pooled, W_l, b_l, labels, opt_tree_l):
        ip = _interpret_default() if interpret is None else interpret
        B, d_orig = pooled.shape
        Bp_plan = -(-B // tb) * tb
        dp_plan = max(-(-d_orig // LANES) * LANES, LANES)
        te = fused_update_te(opt, dp_plan, Bp_plan)
        if te is None:
            raise ValueError(
                f"fused update working set does not fit the VMEM plan at "
                f"d={d_orig}, B={B} for {opt}; disable fused_update")
        gscale = 1.0 / B
        pooled_p, W_k, b_p, labels_p, Bl, El = _prep(
            pooled, W_l, b_l, labels, layout, tb, te, ct)
        if W_k.shape != W_l.shape:
            raise ValueError(
                f"fused update needs W's non-entity axis LANES-aligned "
                f"(got local shard {W_l.shape}); pad the dim or disable "
                "fused_update")

        # Global logsumexp / gold logit: same stitching as the sharded loss.
        lse, z_gold, in_shard, idx = _shard_fwd_stitch(
            pooled_p, W_k, b_p, labels_p, tb, te, layout, ip, El, ct,
            model_axis)

        row = jnp.arange(pooled_p.shape[0])
        valid = row < Bl
        # lse/z_gold are global after the collectives, so the loss is
        # REPLICATED over the model axis (out_spec P()).
        loss = jnp.sum(jnp.where(valid, lse - z_gold, 0.0))

        lse_m = jnp.where(valid, lse, 1e30)[:, None]
        lab_m = jnp.where(valid & in_shard, idx, -1)[:, None]
        W_new, st_new, db, dpooled, gsq = xent_bwd_apply(
            pooled_p, W_k, b_p, lse_m, lab_m, e_total=El, layout=layout,
            opt=opt, opt_tree=opt_tree_l, lr=lr, bias_corr=bias_corr,
            gscale=gscale, tb=tb, te=te, interpret=ip, ct=ct)
        db_out = gscale * db[0, :El]                        # local slice
        dpooled_out = gscale * jax.lax.psum(
            dpooled[:Bl, :d_orig], model_axis)
        gsq_g = jax.lax.psum(gsq, model_axis)
        return loss, W_new, st_new, db_out, dpooled_out, gsq_g

    w_spec = P(None, model_axis) if layout == "de" else P(model_axis, None)
    st_spec = {"adam": {"m": w_spec, "v": w_spec},
               "adagrad": {"acc": w_spec}, "sgd": {}}[opt]
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None), P(data_axis, None), w_spec, P(model_axis),
                  P(data_axis), st_spec),
        out_specs=(P(), w_spec, st_spec, P(model_axis), P(None, None), P()),
        check_vma=False,
    )

    def apply_fn(pooled, W, b, labels, opt_tree, count):
        t = jnp.asarray(count, jnp.float32) + 1.0
        bias_corr = jnp.stack([1.0 - 0.9 ** t, 1.0 - 0.999 ** t])[None, :]
        return mapped(bias_corr, pooled, W, b, labels, opt_tree)

    return apply_fn
