"""Fused candidate gather + rescore Pallas kernel.

After the bin prefilter picks NB candidate bins per query, the scores of
those bins' entities must be recomputed exactly. XLA's gather materializes
the gathered vectors ([Q, NB*128, d] — 1.8GB at the benchmark shape) and
round-trips them through HBM (~15 ms measured). This kernel instead uses
PrefetchScalarGridSpec: the bin indices are scalar-prefetched, each grid
step DMAs the needed bin rows of M straight into VMEM via the BlockSpec
index_map, computes the [128] scores on the MXU, and writes only the scores
(14MB) — the gathered matrix never exists in HBM.

Grid: (Q/QB, NB); each step rescores one bin for QB queries (each query
needs its own bin, so the M operand appears QB times with per-row index
maps). Output is bins-major [NB, Q, 128] to satisfy Mosaic block tiling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
QB = 16  # default queries per grid step (benchmarks/NOTES.md: best of {8,16,32})


def _kernel(idx_ref, r_ref, *refs, qb, bw, d):
    # refs = (m_0, ..., m_{qb-1}, o_ref)
    m_refs, o_ref = refs[:-1], refs[-1]
    r_block = r_ref[:].astype(jnp.float32)              # [QB, d]
    rows = []
    for r in range(qb):
        mrow = m_refs[r][0].astype(jnp.float32)         # [bw, d]
        rows.append(jnp.dot(mrow, r_block[r, :],
                            preferred_element_type=jnp.float32))   # [bw]
    o_ref[0] = jnp.stack(rows, axis=0)                  # [QB, bw]


# The bin-index table is scalar-prefetched into SMEM (capacity ~1MB on
# v5e); chunk the NB axis so one call stays well under it — 256KB leaves
# headroom for Mosaic's own scalar state (Q=256, k=1000 unchunked would
# need 1.008MB of bin_idx alone and OOM).
_SMEM_IDX_BUDGET = 1 << 18  # bytes of bin_idx per pallas_call


@functools.partial(jax.jit, static_argnames=("interpret", "qb"))
def gather_rescore(R: jax.Array, M_binned: jax.Array, bin_idx: jax.Array,
                   interpret: Optional[bool] = None, qb: int = QB) -> jax.Array:
    """[Q, NB*bw] exact scores of the selected bins.

    R [Q, d] (Q must be a multiple of ``qb``, default 16 — pad upstream as
    exact_topk_prepared does), M_binned [n_bins, bw, d] (from
    ops.exact_topk.prepare_entities; bw = bin width, 64 or 128), bin_idx
    [Q, NB] int32 in [0, n_bins).
    """
    Q = R.shape[0]
    NB = bin_idx.shape[1]
    nb_chunk = max(_SMEM_IDX_BUDGET // (4 * Q), 1)
    if NB > nb_chunk:
        parts = [
            _gather_rescore_one(R, M_binned, bin_idx[:, lo:lo + nb_chunk],
                                interpret=interpret, qb=qb)
            for lo in range(0, NB, nb_chunk)
        ]
        return jnp.concatenate(parts, axis=1)
    return _gather_rescore_one(R, M_binned, bin_idx, interpret=interpret, qb=qb)


def _gather_rescore_one(R: jax.Array, M_binned: jax.Array, bin_idx: jax.Array,
                        interpret: Optional[bool] = None, qb: int = QB) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q, d = R.shape
    NB = bin_idx.shape[1]
    bw = M_binned.shape[1]
    assert Q % qb == 0, f"Q={Q} must be a multiple of {qb}"

    grid = (Q // qb, NB)

    def m_spec(r):
        return pl.BlockSpec((1, bw, d),
                            lambda i, j, idx: (idx[i * qb + r, j], 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda i, j, idx: (i, 0),
                         memory_space=pltpu.VMEM),
            *[m_spec(r) for r in range(qb)],
        ],
        out_specs=pl.BlockSpec((1, qb, bw), lambda i, j, idx: (j, i, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, qb=qb, bw=bw, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, Q, bw), jnp.float32),
        interpret=interpret,
    )(bin_idx, R.astype(M_binned.dtype), *([M_binned] * qb))

    # [NB, Q, bw] -> [Q, NB*bw]
    return jnp.moveaxis(out, 0, 1).reshape(Q, NB * bw)
