"""Run fusion: combine two (or more) TREC runs into one.

The companion papers' headline tables combine the semantic model with a
lexical language model by linear score interpolation (SURVEY.md section 1
evaluation protocol); reciprocal rank fusion is included as the
rank-based alternative that needs no score calibration.

Methods:
  interp: score = sum_i w_i * norm(score_i), per topic. Documents missing
          from a run contribute that run's per-topic minimum (rank-safe
          neutral value under minmax; configurable normalization).
  rrf:    score = sum_i w_i / (rrf_k + rank_i), unretrieved documents
          contribute 0 (Cormack et al., the standard convention).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np

Run = Mapping[str, Sequence[Tuple[str, float]]]


def _normalize(entries: Sequence[Tuple[str, float]],
               how: str) -> Dict[str, float]:
    docs = [d for d, _ in entries]
    s = np.asarray([v for _, v in entries], np.float64)
    if how == "none" or len(s) == 0:
        return dict(zip(docs, s.tolist()))
    if how == "minmax":
        lo, hi = s.min(), s.max()
        s = (s - lo) / (hi - lo) if hi > lo else np.zeros_like(s)
    elif how == "zscore":
        sd = s.std()
        s = (s - s.mean()) / sd if sd > 0 else np.zeros_like(s)
    else:
        raise ValueError(f"unknown normalization {how!r}")
    return dict(zip(docs, s.tolist()))


def fuse_runs(runs: Sequence[Run], weights: Sequence[float] = None,
              method: str = "interp", norm: str = "minmax",
              rrf_k: float = 60.0, k: int = 0,
              ) -> Dict[str, List[Tuple[str, float]]]:
    """Fuse runs over the union of their topics and documents.

    ``weights`` defaults to uniform; they need not sum to 1 (rankings are
    scale-invariant). ``k`` > 0 truncates each fused topic to the top k.
    """
    if not runs:
        raise ValueError("need at least one run")
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError(f"{len(runs)} runs but {len(weights)} weights")
    if method not in ("interp", "rrf"):
        raise ValueError(f"unknown fusion method {method!r}")

    topics = sorted({t for r in runs for t in r})
    fused: Dict[str, List[Tuple[str, float]]] = {}
    for topic in topics:
        acc: Dict[str, float] = {}
        if method == "rrf":
            for run, w in zip(runs, weights):
                # Ranks follow the run file's score order (desc, stable).
                order = sorted(run.get(topic, ()), key=lambda e: -e[1])
                for rank, (doc, _) in enumerate(order, start=1):
                    acc[doc] = acc.get(doc, 0.0) + w / (rrf_k + rank)
        else:
            per_run = [_normalize(run.get(topic, ()), norm) for run in runs]
            floors = [min(s.values()) if s else 0.0 for s in per_run]
            for doc in set().union(*per_run):
                acc[doc] = sum(w * s.get(doc, f) for s, f, w
                               in zip(per_run, floors, weights))
        ranked = sorted(acc.items(), key=lambda e: (-e[1], e[0]))
        fused[topic] = ranked[:k] if k > 0 else ranked
    return fused
