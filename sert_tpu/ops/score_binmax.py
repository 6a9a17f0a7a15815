"""Fused scoring + bin-max Pallas kernel.

Computes ``S = R @ M^T (+ alpha_q * bias_e)`` tile-by-tile in VMEM and emits
only per-bin maxima over groups of LANES=128 consecutive entities:
``out[q, b] = max_{l<128} S[q, b*128 + l]``. The [Q, E] score matrix never
touches HBM — output is 128x smaller than the scores, so the kernel is
matmul-bound (MXU) instead of sort- or bandwidth-bound.

Tiling: grid (Q/TQ, E/TE); each step one MXU matmul [TQ, d] x [d, TE] with
fp32 accumulation from bf16 inputs, one VPU max-reduce, one tiny HBM write.
Non-TPU backends run the same kernel under the Pallas interpreter (tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# Output is stored TRANSPOSED, bins-major ([n_bins, Q]): a [TQ, TE/128] bin
# block would violate Mosaic's (8, 128)-divisible block rule, but its
# transpose [TE/128, TQ] tiles cleanly.

def _binmax_tile(s, tq, te, bw):
    """[TQ, TE] scores -> [TE/bw, TQ] per-bin maxima (transposed).

    For bw < LANES, Mosaic cannot shape-cast the lane axis below 128, so
    sub-bin maxima are computed as masked maxes over the 128-lane groups and
    interleaved on the SUBLANE axis (leading-dim reshape is supported);
    bin order stays entity order: bin = group*(LANES//bw) + part."""
    nb = te // LANES
    s3 = s.reshape(tq, nb, LANES)
    if bw == LANES:
        return jnp.max(s3, axis=-1).T
    lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    parts = []
    for k in range(LANES // bw):
        m = jnp.max(jnp.where((lane >= k * bw) & (lane < (k + 1) * bw),
                              s3, float("-inf")), axis=-1)      # [tq, nb]
        parts.append(m.T)                                       # [nb, tq]
    return jnp.stack(parts, axis=1).reshape((LANES // bw) * nb, tq)


def _kernel_bias(r_ref, m_ref, b_ref, a_ref, o_ref, *, tq, te, bw):
    s = jnp.dot(r_ref[:], m_ref[:].T, preferred_element_type=jnp.float32)
    s = s + a_ref[:] * b_ref[:]          # [TQ,1] * [1,TE] broadcast
    o_ref[:] = _binmax_tile(s, tq, te, bw)


def _kernel_nobias(r_ref, m_ref, o_ref, *, tq, te, bw):
    s = jnp.dot(r_ref[:], m_ref[:].T, preferred_element_type=jnp.float32)
    o_ref[:] = _binmax_tile(s, tq, te, bw)


def _pad_to(x: jax.Array, axis: int, mult: int, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def prepare_binmax_matrix(M: jax.Array, te: int = 2048,
                          dtype=jnp.bfloat16) -> jax.Array:
    """One-time cast+pad of the entity matrix for the binmax sweep. Keep the
    result resident across calls — re-preparing 512MB per sweep costs more
    than the sweep itself (benchmarks/NOTES.md).

    ``dtype=jnp.float32`` gives a full-precision prefilter (slower MXU
    passes, 2x memory) for score distributions whose top-k margins sit
    below bf16 resolution — see ops/exact_topk.py precision caveat."""
    Mp = _pad_to(M.astype(dtype), 0, te)
    return _pad_to(Mp, 1, LANES)


@functools.partial(jax.jit, static_argnames=("num_entities", "tq", "te",
                                             "interpret", "bin_width"))
def score_binmax_prepared(R: jax.Array, Mp: jax.Array, num_entities: int,
                          bias: Optional[jax.Array] = None,
                          alpha: Optional[jax.Array] = None,
                          tq: int = 256, te: int = 2048,
                          interpret: Optional[bool] = None,
                          bin_width: int = LANES) -> jax.Array:
    """[Q, ceil(E/bin_width)] bin maxima of R @ M^T (+ alpha*bias).

    ``Mp`` must come from :func:`prepare_binmax_matrix`. bias [E] and alpha
    [Q] are optional (log-linear's per-entity bias scaled by the per-query
    term count). Entity padding produces -inf bins the caller can trust to
    lose any merge; the tail PARTIAL bin may be inflated by padding — the
    exact_topk wrapper budgets extra bins for it.

    ``bin_width`` (64 or 128): smaller bins double the prefilter output but
    HALVE the bytes the rescore gather must read — the top-k still spans at
    most k+pad bins regardless of width (each winner needs its bin fetched
    once). 64 is the measured throughput sweet spot at E=1M (NOTES.md).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q, d = R.shape
    E = num_entities

    Rp = _pad_to(R.astype(Mp.dtype), 0, tq)
    Rp = _pad_to(Rp, 1, LANES)
    Qp, Ep, dp = Rp.shape[0], Mp.shape[0], Rp.shape[1]
    assert Mp.shape[1] == dp, "R/M dim mismatch after padding"
    assert te % bin_width == 0 and LANES % bin_width == 0
    if Ep % te:
        # Grid flooring below would silently skip the tail rows (their bins
        # would come back as uninitialized memory) — the te used here MUST
        # match the one prepare_binmax_matrix padded for.
        raise ValueError(
            f"Mp has {Ep} rows, not a multiple of te={te}: the sweep tile "
            f"size must match the prepare_binmax_matrix te")
    n_bins_padded = Ep // bin_width

    grid = (Qp // tq, Ep // te)
    out_shape = jax.ShapeDtypeStruct((n_bins_padded, Qp), jnp.float32)
    out_spec = pl.BlockSpec((te // bin_width, tq),
                            lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((tq, dp), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((te, dp), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)

    if bias is not None:
        if alpha is None:
            alpha = jnp.ones((Q,), jnp.float32)
        bp = _pad_to(bias.astype(jnp.float32)[None, :], 1, te)
        ap = _pad_to(alpha.astype(jnp.float32)[:, None], 0, tq)
        bins = pl.pallas_call(
            functools.partial(_kernel_bias, tq=tq, te=te, bw=bin_width),
            grid=grid,
            in_specs=[r_spec, m_spec,
                      pl.BlockSpec((1, te), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(Rp, Mp, bp, ap)
    else:
        bins = pl.pallas_call(
            functools.partial(_kernel_nobias, tq=tq, te=te, bw=bin_width),
            grid=grid,
            in_specs=[r_spec, m_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(Rp, Mp)

    bins = bins.T[:Q]
    # Bins made ENTIRELY of padded entities are exactly known: mask to -inf.
    n_valid_bins = -(-E // bin_width)
    return bins[:, :n_valid_bins]


def score_binmax(R: jax.Array, M: jax.Array,
                 bias: Optional[jax.Array] = None,
                 alpha: Optional[jax.Array] = None,
                 tq: int = 256, te: int = 2048,
                 interpret: Optional[bool] = None) -> jax.Array:
    """Convenience wrapper: prepare M and sweep in one call (tests / one-shot
    use). Hot paths should prepare once via prepare_binmax_matrix."""
    Mp = prepare_binmax_matrix(M, te=te)
    return score_binmax_prepared(R, Mp, M.shape[0], bias, alpha,
                                 tq=tq, te=te, interpret=interpret)
