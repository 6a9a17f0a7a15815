#!/usr/bin/env python3
"""Cross-check sert_tpu's native metrics against real trec_eval.

The environment this framework was built in has no network and no trec_eval
binary or pytrec_eval wheel (SURVEY.md section 4.4), so the native metric
implementations (sert_tpu/eval/metrics.py) are validated against hand-worked
tables only. The moment a real oracle is reachable, THIS script closes the
loop (round-1 VERDICT, missing item 5: tie-break and unjudged-handling
conventions have never been diffed against trec_eval output):

    python tools/trec_eval_crosscheck.py [--run RUN --qrels QRELS]
    python tools/trec_eval_crosscheck.py --trec-eval /path/to/trec_eval

Without --run/--qrels it generates a deterministic adversarial fixture
(score ties, unjudged documents, topics with no relevant docs, topics
missing from the run) and diffs every shared measure. Exit code 0 = parity
within 1e-4; nonzero = divergence (printed per topic/measure).

Also usable as a pytest (tests/test_trec_eval_oracle.py) that skips unless
an oracle is importable/executable.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import subprocess
import sys
import tempfile
from typing import Dict, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sert_tpu.eval.metrics import evaluate_run  # noqa: E402
from sert_tpu.eval.trec import (read_qrels, read_run, write_qrels,  # noqa: E402
                                write_run)

# our measure name -> (pytrec_eval measure, trec_eval output label)
MEASURE_MAP = {
    "ndcg@100": ("ndcg_cut_100", "ndcg_cut_100"),
    "map": ("map", "map"),
    "recip_rank": ("recip_rank", "recip_rank"),
    "p@5": ("P_5", "P_5"),
    "p@10": ("P_10", "P_10"),
    "recall@100": ("recall_100", "recall_100"),
    "recall@1000": ("recall_1000", "recall_1000"),
}


def adversarial_fixture() -> Tuple[Dict, Dict]:
    """A run/qrels pair exercising the conventions that differ between
    naive implementations and trec_eval: exact score ties (trec_eval
    breaks by docno DESCENDING), unjudged docs interleaved with judged,
    graded relevance for ndcg, an all-irrelevant topic, and a judged topic
    absent from the run."""
    run = {
        "q1": [("d1", 3.0), ("d2", 3.0), ("d3", 3.0), ("d4", 1.0),
               ("dU", 0.5), ("d5", 0.25)],
        "q2": [("a", 2.0), ("b", 2.0), ("c", 2.0), ("unj1", 2.0),
               ("unj2", 1.0)],
        "q3": [("x", 1.0), ("y", 0.5)],
    }
    qrels = {
        "q1": {"d1": 2, "d2": 0, "d3": 1, "d4": 0, "d5": 1},
        "q2": {"a": 1, "b": 0, "c": 2},
        "q3": {"x": 0, "y": 0},          # judged, nothing relevant
        "q4": {"zzz": 1},                # judged topic missing from the run
    }
    return run, qrels


def eval_native(run, qrels) -> Dict[str, Dict[str, float]]:
    return evaluate_run(run, qrels)


def eval_pytrec(run, qrels) -> Dict[str, Dict[str, float]]:
    import pytrec_eval
    measures = {m[0] for m in MEASURE_MAP.values()}
    ev = pytrec_eval.RelevanceEvaluator(
        {q: dict(d) for q, d in qrels.items()},
        {m.rsplit("_", 1)[0] if m[-1].isdigit() else m for m in measures}
        | {"ndcg_cut", "P", "recall"})
    scored = ev.evaluate(
        {q: {d: float(s) for d, s in entries} for q, entries in run.items()})
    out = {}
    for qid, row in scored.items():
        out[qid] = {ours: row[theirs[0]] for ours, theirs in
                    MEASURE_MAP.items() if theirs[0] in row}
    return out


def eval_binary(run, qrels, trec_eval_path) -> Dict[str, Dict[str, float]]:
    tmp = tempfile.mkdtemp()
    run_p, qrels_p = os.path.join(tmp, "run"), os.path.join(tmp, "qrels")
    write_run(run, run_p)
    write_qrels(qrels, qrels_p)
    cmd = [trec_eval_path, "-q", "-m", "ndcg_cut.100", "-m", "map",
           "-m", "recip_rank", "-m", "P.5,10", "-m", "recall.100,1000",
           qrels_p, run_p]
    text = subprocess.run(cmd, capture_output=True, text=True,
                          check=True).stdout
    label_to_ours = {v[1]: k for k, v in MEASURE_MAP.items()}
    out: Dict[str, Dict[str, float]] = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) != 3:
            continue
        label, qid, val = parts
        if label in label_to_ours and qid != "all":
            out.setdefault(qid, {})[label_to_ours[label]] = float(val)
    return out


def diff(native, oracle, tol=1e-4) -> List[str]:
    problems = []
    for qid, row in oracle.items():
        for measure, want in row.items():
            got = native.get(qid, {}).get(measure)
            if got is None:
                problems.append(f"{qid}/{measure}: missing from native")
            elif not math.isclose(got, want, abs_tol=tol):
                problems.append(
                    f"{qid}/{measure}: native {got:.6f} != oracle {want:.6f}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run"), ap.add_argument("--qrels")
    ap.add_argument("--trec-eval", default=shutil.which("trec_eval"),
                    help="path to a trec_eval binary (default: on PATH)")
    args = ap.parse_args()

    if args.run and args.qrels:
        run, qrels = read_run(args.run), read_qrels(args.qrels)
    else:
        run, qrels = adversarial_fixture()

    native = eval_native(run, qrels)
    oracle = None
    try:
        oracle = eval_pytrec(run, qrels)
        source = "pytrec_eval"
    except ImportError:
        if args.trec_eval and os.path.exists(args.trec_eval):
            oracle = eval_binary(run, qrels, args.trec_eval)
            source = f"trec_eval binary ({args.trec_eval})"
    if oracle is None:
        print("NO ORACLE AVAILABLE: install pytrec_eval or pass "
              "--trec-eval /path/to/binary. Nothing was checked.")
        return 2

    problems = diff(native, oracle)
    if problems:
        print(f"DIVERGENCE vs {source}:")
        for p in problems:
            print(" ", p)
        return 1
    n = sum(len(r) for r in oracle.values())
    print(f"OK: {n} (topic, measure) values match {source} within 1e-4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
