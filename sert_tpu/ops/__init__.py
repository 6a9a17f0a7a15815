"""Pallas (Mosaic) TPU kernels for the hot scoring path.

Profiling on the real chip (see benchmarks/NOTES.md) showed the entity-sweep
matmul takes ~0.7 ms while XLA's exact TopK over [Q, 1M] takes ~85 ms — the
selection, not the matmul, dominates brute-force retrieval. The kernels here
restructure selection so the TPU only ever sorts tiny arrays:

  * ``score_binmax`` — fused (R @ M^T + alpha*bias) -> per-128-lane bin
    maxima, tiled in VMEM; the [Q, E] score matrix NEVER reaches HBM.
  * ``exact_topk`` — exact top-k from bin maxima: top (k+pad) bins, gather
    only those bins' entities, rescore, final small top-k. Exactness: every
    bin holding a true top-k element has bin-max >= the k-th value, and at
    most k bins can (see ops/exact_topk.py for the tie caveat).
"""

from sert_tpu.ops.score_binmax import score_binmax  # noqa: F401
from sert_tpu.ops.exact_topk import exact_topk  # noqa: F401
