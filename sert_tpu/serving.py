"""Query serving: the scorer staged once behind a reusable searcher.

The reference toolkit's only query surface was a batch CLI (topics file ->
run file; SURVEY.md section 4.3). Production deployment also needs a
long-lived server process: load once, stage the entity matrix on-device
once, answer free-text queries repeatedly with no per-query compile or
re-staging. This module provides that as

  * :class:`EntitySearcher` — the load/stage/warmup lifecycle plus a
    thread-safe ``search(text)``;
  * :func:`serve_stdin` — the reference-style interactive loop
    (one query per line, ranked entities out), used by ``serve``;
  * :func:`make_http_server` — a dependency-free JSON HTTP API on the
    stdlib ``ThreadingHTTPServer`` (GET /healthz, GET|POST /search),
    used by ``serve --http PORT``.

Device dispatches are serialized by a lock: JAX dispatch is thread-safe,
but serializing keeps per-query latency predictable instead of letting
concurrent requests queue arbitrarily deep on one chip.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

from sert_tpu.utils.config import RecipeConfig
from sert_tpu.utils.logging import get_logger

log = get_logger("serving")


class EntitySearcher:
    """Load a trained run and answer ranked-entity queries repeatedly.

    Loads checkpoint + vocab + entity registry, resolves the scoring
    engine, stages the entity matrix once (pallas engine), and fires one
    warm-up dispatch so the first real query does not pay the compile.
    """

    def __init__(self, recipe: RecipeConfig, data_dir: str, run_dir: str,
                 step: Optional[int] = None, k: int = 10,
                 query_batch: int = 16):
        from sert_tpu import pipeline
        from sert_tpu.data.instances import InstanceDataset
        from sert_tpu.scoring.run import resolve_engine, score_topics
        from sert_tpu.scoring.scorer import _entity_matrix

        ds = InstanceDataset(data_dir)
        self.recipe = pipeline.resolve_model_config(recipe, ds.meta)
        self.params, self.vocab, self.registry = pipeline.load_scorer(
            run_dir, data_dir, self.recipe, step=step)
        # Stage the engine at a k CAP (>= the default) so per-request k
        # overrides up to the cap are a free slice instead of a re-staged
        # engine; requests beyond the cap clamp to it.
        self.default_k = k
        self.k_max = max(k, min(100, len(self.registry.names)))
        self.score_cfg = dataclasses.replace(
            self.recipe.score, top_k=self.k_max, query_batch=query_batch)
        self.num_entities = len(self.registry.names)
        self._score_topics = score_topics
        self._lock = threading.Lock()
        self.prep = None
        engine = resolve_engine(self.score_cfg, self.num_entities)
        if engine == "pallas":
            from sert_tpu.ops.exact_topk import prepare_entities
            self.prep = prepare_entities(_entity_matrix(
                self.params, self.recipe.model, self.score_cfg.similarity))
        elif engine == "distributed":
            # Mesh placement + per-shard Pallas staging once, not per query
            # (score_topics otherwise re-stages the entity matrix per call).
            from sert_tpu.scoring.run import stage_distributed
            self.prep = stage_distributed(self.params, self.recipe.model,
                                          self.score_cfg)
            # Drop the pre-placement copy: score_topics only ever uses the
            # staged params on this path, and keeping both doubles HBM for
            # exactly the matrices the distributed engine exists for.
            self.params = self.prep.params
        # Warm-up dispatch: compile happens here, not on the first query.
        self._score({"_warmup": self.vocab.encode(["warmup"])})

    def _score(self, encoded):
        return self._score_topics(self.params, self.recipe.model, encoded,
                                  self.registry.names, self.score_cfg,
                                  prep=self.prep)

    def encode(self, text: str) -> List[int]:
        """Query terms -> vocab ids with document preprocessing (OOV
        dropped, reference semantics)."""
        from sert_tpu.data.prepare import encode_queries
        return encode_queries({"q": text}, self.vocab, self.recipe.data)["q"]

    def search(self, text: str, k: Optional[int] = None
               ) -> Optional[List[Tuple[str, float]]]:
        """Ranked ``[(entity_name, score), ...]`` for a free-text query, or
        ``None`` when every query term is out of vocabulary (the caller
        distinguishes "no signal" from "low scores")."""
        ids = self.encode(text)
        if not ids:
            return None
        with self._lock:
            run = self._score({"q": ids})
        return run["q"][:self._clamp_k(k)]

    def search_many(self, texts: List[str], k: Optional[int] = None
                    ) -> List[Optional[List[Tuple[str, float]]]]:
        """Batched search: one device pipeline for all queries (the
        scorer batches query_batch topics per dispatch, so N queries cost
        far less than N search() calls on a remote chip). Positions whose
        query is entirely out of vocabulary come back as ``None``."""
        from sert_tpu.data.prepare import encode_queries
        encoded = encode_queries(
            {str(i): t for i, t in enumerate(texts)},
            self.vocab, self.recipe.data)
        live = {qid: ids for qid, ids in encoded.items() if ids}
        run = {}
        if live:
            with self._lock:
                run = self._score(live)
        kk = self._clamp_k(k)
        return [run[str(i)][:kk] if str(i) in run else None
                for i in range(len(texts))]

    def _clamp_k(self, k: Optional[int]) -> int:
        """Requested k -> [1, k_max]; None and non-positive values (a
        negative slice would return ~everything) fall back to the default."""
        if k is None or k < 1:
            return min(self.default_k, self.k_max)
        return min(k, self.k_max)


def serve_stdin(searcher: EntitySearcher, in_stream, out_stream) -> None:
    """One query per line ('qid<TAB>text' or bare text); ranked entities as
    'qid<TAB>rank<TAB>entity<TAB>score' lines; empty line or EOF exits."""
    qn = 0
    for line in in_stream:
        line = line.rstrip("\n")
        if not line.strip():
            break
        if "\t" in line:
            qid, text = line.split("\t", 1)
        else:
            qn += 1
            qid, text = f"q{qn}", line
        hits = searcher.search(text)
        if hits is None:
            print(f"{qid}\t-\t-\t-\t# all terms out of vocabulary",
                  file=out_stream, flush=True)
            continue
        for rank, (name, score) in enumerate(hits, 1):
            print(f"{qid}\t{rank}\t{name}\t{score:.6f}", file=out_stream)
        out_stream.flush()


def _hits_payload(query: str, hits) -> dict:
    if hits is None:
        return {"query": query, "results": [],
                "warning": "all query terms out of vocabulary"}
    return {"query": query,
            "results": [{"rank": r, "entity": name, "score": float(s)}
                        for r, (name, s) in enumerate(hits, 1)]}


def _search_payload(searcher: EntitySearcher, query: str,
                    k: Optional[int]) -> dict:
    return _hits_payload(query, searcher.search(query, k=k))


class _Handler(BaseHTTPRequestHandler):
    # set by make_http_server
    searcher: EntitySearcher = None

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # route through the package logger
        log.debug("http: " + fmt, *args)

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/healthz":
            self._reply(200, {
                "status": "ok",
                "entities": self.searcher.num_entities,
                "model": self.searcher.recipe.model.model,
                "vocab_size": len(self.searcher.vocab),
                "k_default": self.searcher.default_k,
                "k_max": self.searcher.k_max,
            })
            return
        if url.path == "/search":
            q = parse_qs(url.query)
            query = (q.get("q") or q.get("query") or [""])[0]
            if not query:
                self._reply(400, {"error": "missing q= parameter"})
                return
            try:
                k = int(q["k"][0]) if "k" in q else None
            except ValueError:
                self._reply(400, {"error": "k must be an integer"})
                return
            self._reply(200, _search_payload(self.searcher, query, k))
            return
        self._reply(404, {"error": f"unknown path {url.path!r}; "
                                   "use /healthz or /search"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/search":
            self._reply(404, {"error": f"unknown path {url.path!r}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            query = req.get("query") or req.get("q") or ""
            queries = req.get("queries")
            k = req.get("k")
            # bool is an int subclass; floats are rejected, matching the
            # GET path's "k must be an integer" instead of int(2.5) -> 2.
            if k is not None and (isinstance(k, bool)
                                  or not isinstance(k, int)):
                raise ValueError("k must be an integer")
        except (ValueError, json.JSONDecodeError) as e:
            self._reply(400, {"error": f"bad request body: {e}"})
            return
        if queries is not None:
            if (not isinstance(queries, list)
                    or not all(isinstance(q, str) for q in queries)):
                self._reply(400, {"error": "'queries' must be a list of "
                                           "strings"})
                return
            batches = self.searcher.search_many(queries, k=k)
            self._reply(200, {"batched": [
                _hits_payload(q, hits) for q, hits in zip(queries, batches)
            ]})
            return
        if not query:
            self._reply(400, {"error": "missing 'query' or 'queries' field"})
            return
        self._reply(200, _search_payload(self.searcher, query, k))


def make_http_server(searcher: EntitySearcher, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Build (without starting) the HTTP server; ``port=0`` binds an
    ephemeral port (tests). Call ``serve_forever()`` / ``shutdown()``."""
    handler = type("BoundHandler", (_Handler,), {"searcher": searcher})
    return ThreadingHTTPServer((host, port), handler)
