"""ES percolator re-expressed Ray-Data-first: a STREAM of documents is
tagged with the registered queries each one matches (content routing /
alerting at ingest — at 100 TB this is "route fresh crawl pages to
standing subscriptions" without ever building an index over them).

Reference counterpart: none (the course project has no percolator); the
query semantics reuse the engine's own conventions — free-text queries
match on ANY analyzed term (the match-query hit-set convention of
``pipelines/query.py::_agg_route``), boolean queries evaluate the same
shunting-yard RPN as ``oracle/oracle.py::query_boolean`` (NOT = unary
complement, implicit AND).

Scale shape: the registered query set is compiled ONCE per actor
(``__init__``); each batch is tokenized with the vectorized flat path
(Arrow C++ split + per-unique-token stemming) and every query evaluates
as boolean-mask algebra over the batch's (row, term) stream — no per-doc
Python loop, no shuffle, embarrassingly parallel over blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..normalizer import make_normalizer, preprocess_boolean_query
from ..normalizer.tokenize import tokenize_rows_flat
from ..oracle.oracle import looks_boolean, to_rpn


class Percolator:
    """Callable actor class for ``map_batches``: emits one
    ``(doc_id, query_id)`` row per (document, matching registered query)."""

    def __init__(self, queries: list[str], analyzer: str = "plain"):
        import re as _re

        self.norm = make_normalizer(analyzer)
        self.compiled: list[tuple[int, str, tuple]] = []
        for qid, q in enumerate(queries):
            if '"' in q:
                # quoted phrases (optionally sloppy "a b"~N) + residual
                # free terms: ALL must match (the engine's phrase-query
                # AND semantics)
                spans = _re.findall(r'"([^"]*)"(?:~(\d+))?', q)
                residual = self.norm.preprocess_query_list(
                    _re.sub(r'"[^"]*"(?:~\d+)?', " ", q)
                )
                phrases = []
                for text, slop in spans:
                    terms = self.norm.preprocess_query_list(text)
                    if terms:
                        phrases.append(
                            (tuple(terms), int(slop) if slop else 0)
                        )
                self.compiled.append(
                    (qid, "phrase", (tuple(phrases), tuple(residual)))
                )
            elif looks_boolean(q):
                self.compiled.append(
                    (qid, "bool",
                     to_rpn(preprocess_boolean_query(q, self.norm)))
                )
            else:
                self.compiled.append(
                    (qid, "match",
                     tuple(self.norm.preprocess_query_list(q)))
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = self.norm.clean_batch(batch.column("text").to_pylist())
        tok_doc, codes, terms = tokenize_rows_flat(self.norm, texts)
        n = batch.num_rows
        tid = {t: i for i, t in enumerate(terms)}
        memo: dict[str, np.ndarray] = {}

        def mask_for(term: str) -> np.ndarray:
            m = memo.get(term)
            if m is None:
                m = np.zeros(n, dtype=bool)
                i = tid.get(term)
                if i is not None:
                    m[tok_doc[codes == i]] = True
                memo[term] = m
            return m

        # token positions within each doc (index among KEPT tokens — the
        # same positions semantics the index stores), as composite
        # row<<32 | pos keys for vectorized phrase adjacency
        if tok_doc.size:
            starts = np.flatnonzero(
                np.r_[True, tok_doc[1:] != tok_doc[:-1]]
            )
            lens = np.diff(np.r_[starts, tok_doc.size])
            pos = np.arange(tok_doc.size) - np.repeat(starts, lens)
            keys_all = (tok_doc << np.int64(32)) | pos
        else:
            keys_all = np.empty(0, dtype=np.int64)

        def keys_for(term: str) -> np.ndarray:
            i = tid.get(term)
            if i is None:
                return np.empty(0, dtype=np.int64)
            return keys_all[codes == i]

        def phrase_rows(terms: tuple, slop: int) -> np.ndarray:
            """Rows matching one phrase — the slack-budget DP of
            ``scoring.phrase_eval`` over the batch's composite keys."""
            cur = keys_for(terms[0])
            if slop == 0:
                for t in terms[1:]:
                    if not cur.size:
                        break
                    nxt = keys_for(t)
                    cur = np.intersect1d(
                        cur + 1, nxt, assume_unique=False
                    )
            else:
                R = [cur] * (slop + 1)
                for t in terms[1:]:
                    if not R[slop].size:
                        break
                    nxt = keys_for(t)
                    newR = []
                    for c in range(slop + 1):
                        parts = [
                            R[c - d] + np.int64(1 + d)
                            for d in range(c + 1)
                        ]
                        u = (
                            np.unique(np.concatenate(parts))
                            if len(parts) > 1 else parts[0]
                        )
                        newR.append(
                            np.intersect1d(u, nxt, assume_unique=False)
                        )
                    R = newR
                cur = R[slop]
            return (
                np.unique(cur >> np.int64(32)) if cur.size
                else np.empty(0, dtype=np.int64)
            )

        doc_ids = batch.column("doc_id").to_numpy()
        out_doc: list[np.ndarray] = []
        out_q: list[np.ndarray] = []
        for qid, kind, payload in self.compiled:
            if kind == "phrase":
                phrases, residual = payload
                m = np.ones(n, dtype=bool)
                for terms, slop in phrases:
                    pm = np.zeros(n, dtype=bool)
                    pm[phrase_rows(terms, slop)] = True
                    m &= pm
                for t in residual:
                    m &= mask_for(t)
                if not phrases and not residual:
                    m = np.zeros(n, dtype=bool)
            elif kind == "match":
                m = np.zeros(n, dtype=bool)
                for t in payload:
                    m |= mask_for(t)
            else:
                stack: list[np.ndarray] = []
                try:
                    for tok in payload:
                        if tok == "AND":
                            b = stack.pop(); a = stack.pop()
                            stack.append(a & b)
                        elif tok == "OR":
                            b = stack.pop(); a = stack.pop()
                            stack.append(a | b)
                        elif tok == "NOT":
                            stack.append(~stack.pop())
                        else:
                            stack.append(mask_for(tok))
                    m = stack.pop() if stack else np.zeros(n, dtype=bool)
                except IndexError:  # malformed query: no matches (oracle
                    m = np.zeros(n, dtype=bool)  # convention)
            rows = np.flatnonzero(m)
            out_doc.append(doc_ids[rows])
            out_q.append(np.full(rows.size, qid, dtype=np.int64))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_doc) if out_doc
                    else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "query_id": pa.array(
                    np.concatenate(out_q) if out_q
                    else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )


def percolate(ds, queries: list[str], analyzer: str = "plain",
              concurrency: int = 2):
    """Percolate a document Dataset against registered queries: returns a
    Dataset of (doc_id, query_id) match pairs.  Pure streaming map — state
    (compiled queries) lives in the actor, blocks never co-locate."""
    return ds.map_batches(
        Percolator,
        fn_constructor_kwargs={"queries": queries, "analyzer": analyzer},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
