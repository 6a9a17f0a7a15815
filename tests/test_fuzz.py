"""Property/fuzz tests: random inputs vs independent brute-force oracles.

The native metric implementations replace the external trec_eval binary
(SURVEY.md section 4.4), so they get adversarial random checking beyond the
hand-worked tables; the scoring engines get random-shape agreement checks.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sert_tpu.eval import metrics
from sert_tpu.models import api
from sert_tpu.ops.exact_topk import exact_topk, hierarchical_topk
from sert_tpu.scoring.scorer import dense_scores, streaming_topk
from sert_tpu.utils.config import ModelConfig


def _brute_metrics(entries, rels, k):
    """Deliberately naive re-implementation (sorting + textbook formulas)."""
    ranking = [d for d, _ in sorted(entries, key=lambda e: (e[1], e[0]),
                                    reverse=True)]
    rel = {d for d, g in rels.items() if g > 0}
    # AP
    hits, ap = 0, 0.0
    for i, d in enumerate(ranking):
        if d in rel:
            hits += 1
            ap += hits / (i + 1)
    ap = ap / len(rel) if rel else 0.0
    # NDCG@k, linear gain
    dcg = sum(rels.get(d, 0) / math.log2(i + 2)
              for i, d in enumerate(ranking[:k]) if rels.get(d, 0) > 0)
    ideal = sorted((g for g in rels.values() if g > 0), reverse=True)[:k]
    idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal))
    ndcg = dcg / idcg if idcg else 0.0
    # MRR
    rr = 0.0
    for i, d in enumerate(ranking):
        if d in rel:
            rr = 1.0 / (i + 1)
            break
    return ap, ndcg, rr


class TestMetricFuzz:
    def test_random_runs_match_bruteforce(self):
        rng = np.random.default_rng(0)
        for trial in range(200):
            n_docs = int(rng.integers(1, 30))
            docs = [f"d{i}" for i in range(n_docs)]
            # random graded qrels over a random subset; some ties in scores
            rels = {d: int(rng.integers(0, 4)) for d in docs
                    if rng.random() < 0.6}
            scores = np.round(rng.normal(size=n_docs), 1)  # ties likely
            entries = list(zip(docs, scores.tolist()))
            k = int(rng.integers(1, 12))
            got = metrics.evaluate_topic(entries, rels,
                                         measures=("map", f"ndcg@{k}",
                                                   "recip_rank"))
            ap, ndcg, rr = _brute_metrics(entries, rels, k)
            assert got["map"] == pytest.approx(ap, abs=1e-12), trial
            assert got[f"ndcg@{k}"] == pytest.approx(ndcg, abs=1e-12), trial
            assert got["recip_rank"] == pytest.approx(rr, abs=1e-12), trial


class TestFusionFuzz:
    def test_interp_matches_bruteforce(self):
        """fuse_runs(interp, minmax) vs a literal reimplementation of its
        contract (normalize per topic, missing docs at the floor) on random
        multi-run inputs, including all-tied and single-doc topics."""
        from sert_tpu.eval.fuse import fuse_runs
        rng = np.random.default_rng(1)
        for trial in range(100):
            n_runs = int(rng.integers(2, 4))
            topics = [f"q{i}" for i in range(rng.integers(1, 4))]
            runs, weights = [], rng.random(n_runs).tolist()
            for _ in range(n_runs):
                r = {}
                for t in topics:
                    if rng.random() < 0.2:
                        continue  # topic absent from this run
                    n = int(rng.integers(1, 8))
                    docs = rng.choice(20, size=n, replace=False)
                    s = (np.full(n, 3.0) if rng.random() < 0.2   # all-tied
                         else rng.normal(size=n))
                    r[t] = [(f"d{d}", float(v)) for d, v in zip(docs, s)]
                runs.append(r)
            fused = fuse_runs(runs, weights=weights, method="interp")
            for t in topics:
                # brute force
                normed = []
                for r in runs:
                    e = r.get(t, [])
                    d = {}
                    if e:
                        vals = np.asarray([v for _, v in e])
                        lo, hi = vals.min(), vals.max()
                        nv = ((vals - lo) / (hi - lo) if hi > lo
                              else np.ones_like(vals))
                        d = dict(zip([x for x, _ in e], nv.tolist()))
                    normed.append(d)
                all_docs = set().union(*normed)
                want = {doc: sum(w * d.get(doc, 0.0)
                                 for d, w in zip(normed, weights))
                        for doc in all_docs}
                got = dict(fused.get(t, []))
                assert set(got) == set(want), trial
                for doc in want:
                    assert got[doc] == pytest.approx(want[doc],
                                                     abs=1e-12), trial

    def test_run_file_roundtrip_preserves_eval(self, tmp_path):
        """Metrics on an in-memory run == metrics on the same run after a
        write_run/read_run round trip (repr-precision scores; tiny gaps
        must not collapse into ties that re-rank)."""
        from sert_tpu.eval.trec import read_run, write_run
        rng = np.random.default_rng(2)
        for trial in range(20):
            run = {}
            qrels = {}
            for q in range(3):
                docs = [f"d{i}" for i in range(10)]
                base = rng.normal()
                # scores separated by ~1e-9: below the old %.6f resolution
                run[f"q{q}"] = [(d, float(base + i * 1e-9))
                                for i, d in enumerate(docs)]
                qrels[f"q{q}"] = {d: int(rng.integers(0, 2)) for d in docs}
            p = str(tmp_path / f"r{trial}.trec")
            write_run(run, p)
            direct = metrics.evaluate_run(run, qrels)
            tripped = metrics.evaluate_run(read_run(p), qrels)
            for m, v in direct["all"].items():
                assert tripped["all"][m] == pytest.approx(v,
                                                          abs=1e-12), trial


class TestTopkFuzz:
    def test_hierarchical_topk_random_shapes(self):
        rng = np.random.default_rng(1)
        for trial in range(25):
            Q = int(rng.integers(1, 9))
            N = int(rng.integers(2, 900))
            k = int(rng.integers(1, min(N, 40) + 1))
            x = jnp.asarray(rng.normal(size=(Q, N)).astype(np.float32))
            vals, idx = hierarchical_topk(x, k)
            want_v = np.sort(np.asarray(x), axis=1)[:, ::-1][:, :k]
            np.testing.assert_allclose(np.asarray(vals), want_v, rtol=1e-6,
                                       err_msg=f"trial {trial} Q={Q} N={N} k={k}")
            got_v = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
            np.testing.assert_allclose(got_v, want_v, rtol=1e-6)

    def test_hierarchical_topk_adversarial_packing(self):
        # all winners inside a single group, plus exact ties at theta
        rng = np.random.default_rng(2)
        Q, N, k = 4, 1024, 50
        x = np.full((Q, N), -5.0, np.float32)
        x[:, 256:256 + 60] = 1.0           # 60 tied winners in one group
        vals, idx = hierarchical_topk(jnp.asarray(x), k)
        assert (np.asarray(vals) == 1.0).all()
        assert ((np.asarray(idx) >= 256) & (np.asarray(idx) < 316)).all()

    def test_engines_agree_random_models(self):
        rng = np.random.default_rng(3)
        for trial in range(8):
            E = int(rng.integers(10, 400))
            d = int(rng.integers(4, 40))
            model = ("loglinear", "lse")[trial % 2]
            cfg = ModelConfig(model=model, vocab_size=50, num_entities=E,
                              word_dim=d, entity_dim=d)
            params = api.init_params(jax.random.key(trial), cfg)
            Q = int(rng.integers(1, 6))
            T = int(rng.integers(1, 5))
            term_ids = jnp.asarray(rng.integers(0, 50, size=(Q, T)).astype(np.int32))
            num_terms = jnp.asarray(rng.integers(1, T + 1, size=Q).astype(np.int32))
            k = int(rng.integers(1, min(E, 20) + 1))
            dense = np.asarray(dense_scores(params, cfg, term_ids, num_terms))
            want = np.sort(dense, axis=1)[:, ::-1][:, :k]
            s_stream, _ = streaming_topk(params, cfg, term_ids, num_terms,
                                         k=k, chunk=int(rng.integers(4, 64)))
            np.testing.assert_allclose(np.asarray(s_stream), want,
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"stream trial {trial}")


class TestExactTopkFuzz:
    def test_random_shapes_vs_oracle(self):
        rng = np.random.default_rng(4)
        for trial in range(10):
            E = int(rng.integers(130, 3000))
            d = int(rng.integers(8, 64))
            Q = int(rng.integers(1, 10))
            k = int(rng.integers(1, 60))
            R = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))
            M = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
            s, i = exact_topk(R, M, k=k)
            dense = np.asarray(R) @ np.asarray(M).T
            want = np.sort(dense, axis=1)[:, ::-1][:, :min(k, E)]
            got = np.take_along_axis(dense, np.asarray(i), axis=1)
            # bf16 prefilter: allow boundary noise only
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.1,
                                       err_msg=f"trial {trial}")
