"""Fused softmax cross-entropy over the entity axis ("flash xent").

The training hot loop of both full-softmax families (log-linear; LSE
full-softmax mode) is ``loss = mean(logsumexp(pooled @ W + b) - z_gold)``.
Composed in XLA this materializes [B, E] logits in HBM three times (fwd,
softmax, grad). These kernels never materialize them:

  forward:  grid (B/tb, E/te); each step computes one logits tile in VMEM
            and writes only per-tile (max, sumexp) partials — O(B * E/te).
            The gold logit is one XLA gather (B rows).
  backward: recomputes the logits tile (flash-attention style), forms
            p = exp(z - lse) - onehot in VMEM, and accumulates
            dW += pooled^T p  (grid (j, i): revisit across the inner i axis)
            dpooled += p W^T  (grid (i, j): revisit across the inner j axis)
            in two kernels, because each accumulator must be the innermost-
            revisited output block to stay resident in VMEM.

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


def _z_tile(p_ref, w_ref, b_ref, layout):
    """One logits tile [tb, te] in fp32 from VMEM operands."""
    p = p_ref[:]
    if layout == "de":
        z = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
    else:  # "ed": rows are entities
        z = jnp.dot(p, w_ref[:].T, preferred_element_type=jnp.float32)
    return z + b_ref[:]                     # b block [1, te]


# --------------------------- forward ---------------------------------------

def _fwd_kernel(p_ref, w_ref, b_ref, m_ref, s_ref, *, layout):
    z = _z_tile(p_ref, w_ref, b_ref, layout)            # [tb, te]
    m = jnp.max(z, axis=-1)                             # [tb]
    s = jnp.sum(jnp.exp(z - m[:, None]), axis=-1)       # [tb]
    m_ref[0, 0, :] = m
    s_ref[0, 0, :] = s


# --------------------------- backward ---------------------------------------

def _p_tile(p_ref, w_ref, b_ref, lse_ref, lab_ref, j, te, layout):
    """softmax - onehot for one tile, in VMEM."""
    z = _z_tile(p_ref, w_ref, b_ref, layout)
    prob = jnp.exp(z - lse_ref[:])                      # lse block [tb, 1]
    cols = j * te + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    onehot = (cols == lab_ref[:]).astype(jnp.float32)   # lab block [tb, 1]
    return prob - onehot


def _bwd_w_kernel(p_ref, w_ref, b_ref, lse_ref, lab_ref, dw_ref, db_ref,
                  *, te, layout):
    j, i = pl.program_id(0), pl.program_id(1)
    p = _p_tile(p_ref, w_ref, b_ref, lse_ref, lab_ref, j, te, layout)
    pooled = p_ref[:]
    if layout == "de":
        dw = jnp.dot(pooled.T, p, preferred_element_type=jnp.float32)
    else:
        dw = jnp.dot(p.T, pooled, preferred_element_type=jnp.float32)
    db = jnp.sum(p, axis=0)[None, :]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dw_ref[:] += dw
        db_ref[:] += db


def _bwd_p_kernel(p_ref, w_ref, b_ref, lse_ref, lab_ref, dp_ref,
                  *, te, layout):
    i, j = pl.program_id(0), pl.program_id(1)
    p = _p_tile(p_ref, w_ref, b_ref, lse_ref, lab_ref, j, te, layout)
    if layout == "de":
        dp = jnp.dot(p, w_ref[:].T, preferred_element_type=jnp.float32)
    else:
        dp = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dp_ref[:] = dp

    @pl.when(j > 0)
    def _():
        dp_ref[:] += dp


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


def _fwd_partials(pooled, W, b, tb, te, layout, interpret):
    B, dp = pooled.shape
    nB, nE = B // tb, (W.shape[1] if layout == "de" else W.shape[0]) // te
    p_spec, w_spec, b_spec = _specs(tb, te, dp, layout)
    w_idx = ((lambda i, j: (0, j)) if layout == "de" else (lambda i, j: (j, 0)))
    out_shape = [jax.ShapeDtypeStruct((nE, 1, B), jnp.float32)] * 2
    out_spec = pl.BlockSpec((1, 1, tb), lambda i, j: (j, 0, i),
                            memory_space=pltpu.VMEM)
    m, s = pl.pallas_call(
        functools.partial(_fwd_kernel, layout=layout),
        grid=(nB, nE),
        in_specs=[p_spec, w_spec(w_idx), b_spec(lambda i, j: (0, j))],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(pooled, W, b)
    return m[:, 0, :], s[:, 0, :]          # [nE, B] each


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def xent_loss(pooled: jax.Array, W: jax.Array, b: jax.Array,
              labels: jax.Array, layout: str = "de",
              tb: int = 256, te: int = 2048,
              interpret: Optional[bool] = None) -> jax.Array:
    """SUM of softmax cross-entropies over the batch (divide by B for the
    mean). pooled [B, d] fp32; W [d, E] ("de") or [E, d] ("ed"); b [E];
    labels int32 [B]. B, d, E are padded internally."""
    loss, _ = _xent_fwd(pooled, W, b, labels, layout, tb, te, interpret)
    return loss


def _prep(pooled, W, b, labels, layout, tb, te):
    B_orig = pooled.shape[0]
    E_orig = W.shape[1] if layout == "de" else W.shape[0]
    pooled = _pad_to(_pad_to(pooled.astype(jnp.float32), 0, tb), 1, LANES)
    # Padded batch rows: label 0 with zero pooled vector -> their loss is a
    # constant log(E) which we SUBTRACT after; simpler: mask via labels = -1
    # handled by gold-gather in XLA (padded rows contribute lse(0@W+b)-z0;
    # we instead zero them in the final sum).
    W = _pad_to(_pad_to(W.astype(jnp.float32), 0, te if layout == "ed" else LANES),
                1, LANES if layout == "ed" else te)
    bpad = _pad_to(b.astype(jnp.float32)[None, :], 1, te)
    labels = _pad_to(labels.astype(jnp.int32), 0, tb)
    return pooled, W, bpad, labels, B_orig, E_orig


def _xent_fwd(pooled, W, b, labels, layout, tb, te, interpret):
    if interpret is None:
        interpret = _interpret_default()
    d_orig = pooled.shape[1]
    pooled_p, W_p, b_p, labels_p, B, E = _prep(pooled, W, b, labels,
                                               layout, tb, te)
    Ep = W_p.shape[1] if layout == "de" else W_p.shape[0]
    # Padded entity columns must not win the max: bias them to -inf.
    col = jnp.arange(Ep)
    b_masked = jnp.where(col[None, :] < E, b_p, -1e30)

    m, s = _fwd_partials(pooled_p, W_p, b_masked, tb, te, layout, interpret)
    M = jnp.max(m, axis=0)                               # [Bp]
    lse = M + jnp.log(jnp.sum(s * jnp.exp(m - M[None, :]), axis=0))

    # gold logits via one XLA gather of W rows/cols
    if layout == "de":
        w_gold = W_p[:, labels_p].T                      # [Bp, d]
    else:
        w_gold = W_p[labels_p, :]                        # [Bp, d]
    z_gold = jnp.sum(pooled_p * w_gold, axis=1) + b_p[0, labels_p]

    row = jnp.arange(pooled_p.shape[0])
    per_row = jnp.where(row < B, lse - z_gold, 0.0)
    loss = jnp.sum(per_row)
    residuals = (pooled_p, W_p, b_masked, labels_p, lse, B, E, d_orig)
    return loss, residuals


def _bwd_calls(pooled_p, W_p, b_masked, lse_m, lab_m, tb, te, layout,
               interpret):
    """The two backward pallas_calls on (padded) operands: returns
    (dW [W_p.shape], db [1, Ep], dpooled [Bp, dp]), all fp32, unscaled.
    ``lse_m`` [Bp, 1] must be poisoned (1e30) on rows that should not
    contribute; ``lab_m`` [Bp, 1] holds LOCAL column indices or -1 for rows
    whose gold column is not in W_p (sharded use) / padded rows."""
    Bp, dp = pooled_p.shape
    Ep = W_p.shape[1] if layout == "de" else W_p.shape[0]
    nB, nE = Bp // tb, Ep // te

    p_spec, w_spec, b_spec = _specs(tb, te, dp, layout)
    # batch-row blocks: row index is i — the LAST grid axis in the (j, i)
    # dW kernel, the FIRST in the (i, j) dpooled kernel.
    def row_spec(pos):
        return pl.BlockSpec((tb, 1), lambda *idx: (idx[pos], 0),
                            memory_space=pltpu.VMEM)
    lse_spec_ji, lab_spec_ji = row_spec(-1), row_spec(-1)
    lse_spec_ij, lab_spec_ij = row_spec(0), row_spec(0)

    # dW/db: grid (j, i) — i innermost so the dW_j block accumulates in VMEM
    w_idx_ji = ((lambda j, i: (0, j)) if layout == "de"
                else (lambda j, i: (j, 0)))
    p_spec_ji = pl.BlockSpec((tb, dp), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM)
    dw_shape = ((dp, Ep) if layout == "de" else (Ep, dp))
    dw_block = ((dp, te) if layout == "de" else (te, dp))
    dw_idx = ((lambda j, i: (0, j)) if layout == "de"
              else (lambda j, i: (j, 0)))
    dW, db = pl.pallas_call(
        functools.partial(_bwd_w_kernel, te=te, layout=layout),
        grid=(nE, nB),
        in_specs=[p_spec_ji, w_spec(w_idx_ji), b_spec(lambda j, i: (0, j)),
                  lse_spec_ji, lab_spec_ji],
        out_specs=[pl.BlockSpec(dw_block, dw_idx, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, te), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(dw_shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, Ep), jnp.float32)],
        interpret=interpret,
    )(pooled_p, W_p, b_masked, lse_m, lab_m)

    # dpooled: grid (i, j) — j innermost so the dpooled_i block accumulates
    w_idx_ij = ((lambda i, j: (0, j)) if layout == "de"
                else (lambda i, j: (j, 0)))
    dpooled = pl.pallas_call(
        functools.partial(_bwd_p_kernel, te=te, layout=layout),
        grid=(nB, nE),
        in_specs=[p_spec, w_spec(w_idx_ij), b_spec(lambda i, j: (0, j)),
                  lse_spec_ij, lab_spec_ij],
        out_specs=pl.BlockSpec((tb, dp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, dp), jnp.float32),
        interpret=interpret,
    )(pooled_p, W_p, b_masked, lse_m, lab_m)
    return dW, db, dpooled


def _xent_bwd(layout, tb, te, interpret, residuals, g):
    if interpret is None:
        interpret = _interpret_default()
    pooled_p, W_p, b_masked, labels_p, lse, B, E, d_orig = residuals
    Bp = pooled_p.shape[0]

    # Padded batch rows must contribute zero grad: poison their lse so
    # exp(z - lse) ~ 0, and point their label at a padded column.
    row = jnp.arange(Bp)
    lse_m = jnp.where(row < B, lse, 1e30)[:, None]       # [Bp, 1]
    lab_m = jnp.where(row < B, labels_p, -1)[:, None]    # [Bp, 1]

    dW, db, dpooled = _bwd_calls(pooled_p, W_p, b_masked, lse_m, lab_m,
                                 tb, te, layout, interpret)
    g = g.astype(jnp.float32)
    if layout == "de":
        dW_out = g * dW[:d_orig, :E]
    else:
        dW_out = g * dW[:E, :d_orig]
    return (g * dpooled[:B, :d_orig], dW_out, g * db[0, :E], None)


xent_loss.defvjp(_xent_fwd, _xent_bwd)


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
#             column -> psum over ``model``; row losses summed locally,
#             psum over ``data``.
#   backward: dW/db computed from local batch rows -> psum over ``data``;
#             dpooled from local entity columns -> psum over ``model``.
#             Off-shard gold columns enter the kernel as label -1 (the
#             onehot never fires on this shard — the owning shard supplies
#             the -1 term of softmax-minus-onehot).
#
# Exactness therefore matches the single-device kernel bit-for-bit up to
# fp32 reduction order (grad-parity tested on the fake 8-device mesh).


def make_sharded_xent_loss(mesh, layout: str = "de",
                           data_axis: str = "data",
                           model_axis: str = "model",
                           tb: int = 256, te: int = 2048,
                           interpret: Optional[bool] = None):
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

    @jax.custom_vjp
    def _loss(pooled_l, W_l, b_l, labels_l):
        loss, _ = _fwd(pooled_l, W_l, b_l, labels_l)
        return loss

    def _fwd(pooled_l, W_l, b_l, labels_l):
        ip = _interpret_default() if interpret is None else interpret
        d_orig = pooled_l.shape[1]
        # _prep pads the LOCAL block; its E_orig is the local row/col count.
        pooled_p, W_p, b_p, labels_p, Bl, El = _prep(
            pooled_l, W_l, b_l, labels_l, layout, tb, te)
        Ep = W_p.shape[1] if layout == "de" else W_p.shape[0]
        col = jnp.arange(Ep)
        b_masked = jnp.where(col[None, :] < El, b_p, -1e30)

        m, s = _fwd_partials(pooled_p, W_p, b_masked, tb, te, layout, ip)
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
            w_gold = W_p[:, idx].T                          # [Bp, dp]
        else:
            w_gold = W_p[idx, :]
        z_gold_l = jnp.where(
            in_shard,
            jnp.sum(pooled_p * w_gold, axis=1) + b_p[0, idx], 0.0)
        z_gold = jax.lax.psum(z_gold_l, model_axis)         # [Bp] GLOBAL

        row = jnp.arange(pooled_p.shape[0])
        valid = row < Bl
        # Per-shard partial: the row losses are replicated across the model
        # axis (lse/z_gold are global after the collectives above), so each
        # model-shard contributes 1/n_model of its data-rows' sum; the
        # wrapper's sum over all shards reassembles the total exactly.
        local = jnp.sum(jnp.where(valid, lse - z_gold, 0.0))[None] / n_model
        lab_kernel = jnp.where(valid & in_shard, idx, -1)   # LOCAL col or -1
        residuals = (pooled_p, W_p, b_masked, lab_kernel, lse, Bl, El, d_orig)
        return local, residuals

    def _bwd(residuals, g):
        ip = _interpret_default() if interpret is None else interpret
        pooled_p, W_p, b_masked, lab_kernel, lse, Bl, El, d_orig = residuals
        Bp = pooled_p.shape[0]
        row = jnp.arange(Bp)
        lse_m = jnp.where(row < Bl, lse, 1e30)[:, None]
        lab_m = lab_kernel[:, None]

        dW, db, dpooled = _bwd_calls(pooled_p, W_p, b_masked, lse_m, lab_m,
                                     tb, te, layout, ip)
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
