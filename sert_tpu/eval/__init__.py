"""L6 evaluation: TREC topic/qrel/run I/O + native retrieval metrics.

The reference shelled out to the external ``trec_eval`` C binary (SURVEY.md
section 4.4); that binary is unavailable offline, so the metrics (NDCG@k,
MAP, MRR, P@k, recall@k) are implemented natively with trec_eval's exact
conventions (score-desc sort with docno-desc tie-break, linear NDCG gain)
and unit-tested against hand-worked tables.
"""

from sert_tpu.eval.metrics import (  # noqa: F401
    average_precision,
    evaluate_run,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
    reciprocal_rank,
)
from sert_tpu.eval.trec import (  # noqa: F401
    read_qrels,
    read_run,
    read_topics,
    write_run,
)
