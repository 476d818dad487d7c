"""In-repo reference oracle: single-process, dict-based index + scorers.

A faithful (but tiny) reimplementation of the reference semantics, used
by tests as ground truth for the distributed engine.  NOT tests-only:
``to_rpn`` / ``looks_boolean`` / ``BOOLEAN_OPERATORS`` are ALSO the
engine's production boolean parser (pipelines/query.py imports them),
so oracle-vs-engine comparisons of RPN construction are tautological —
parser changes here change BOTH sides and need their own direct tests
(tests/test_rpn.py):

* index build:       ``selfindex_q_daat.py:59-125`` (A1-A6)
* TAAT BM25/TF-IDF:  ``selfindex_q_taat.py:139-209`` (Q1, F5, F6)
* DAAT:              ``selfindex_q_daat.py:177-252`` (Q2)
* boolean RPN:       ``measure_latency_datastores.py:88-188`` (Q5)
* idf:               ``ln((N+1)/(df+1))`` (``selfindex_q_taat.py:133``)

One deliberate difference (documented in SURVEY.md §2.6 K2): the reference's
top-k tie order is accumulator-insertion / set-iteration order, which is not
portable; both the oracle and the engine use the deterministic tie-break
(-score, doc_id ascending).
"""

from __future__ import annotations

import math
from collections import Counter

from ..normalizer import (
    BOOLEAN_OPERATORS,
    Normalizer,
    preprocess_boolean_query,
)

PRECEDENCE = {"OR": 1, "AND": 2, "NOT": 3}


def to_rpn(tokens: tuple[str, ...]) -> tuple[str, ...]:
    """Shunting-yard with implicit-AND insertion.

    Transcribed semantics of ``measure_latency_datastores.py:88-133``.
    """
    tokens_list = list(tokens)

    infix: list[str] = []
    for i, token in enumerate(tokens_list):
        infix.append(token)
        if i < len(tokens_list) - 1:
            nxt = tokens_list[i + 1]
            is_operand_or_close = (
                token not in BOOLEAN_OPERATORS and token != "("
            ) or token == ")"
            is_next_operand_or_open_or_not = (
                (nxt not in BOOLEAN_OPERATORS and nxt != ")")
                or nxt == "("
                or nxt == "NOT"
            )
            if is_operand_or_close and is_next_operand_or_open_or_not:
                infix.append("AND")

    output: list[str] = []
    stack: list[str] = []
    for token in infix:
        if token not in BOOLEAN_OPERATORS and token not in ("(", ")"):
            output.append(token)
        elif token == "(":
            stack.append(token)
        elif token == ")":
            while stack and stack[-1] != "(":
                output.append(stack.pop())
            if stack:
                stack.pop()
        else:
            # NOT is unary and right-associative: pop only STRICTLY
            # higher precedence, so 'NOT NOT a' nests as NOT(NOT a)
            # instead of popping the outer NOT before any operand
            # exists (which produced an underflowing RPN defined as
            # empty)
            limit = PRECEDENCE[token] + (0 if token == "NOT" else -1)
            while (
                stack
                and stack[-1] != "("
                and PRECEDENCE.get(stack[-1], 0) > limit
            ):
                output.append(stack.pop())
            stack.append(token)
    while stack:
        output.append(stack.pop())
    return tuple(output)


def span_terms(text: str, normalizer) -> list[str]:
    """Analyzed terms of ONE quoted span with ES match_phrase_prefix
    handling: a raw trailing-``*`` last word becomes an unanalyzed
    lowercased prefix term (``net*``), the leading words analyze
    normally.  Shared by the pure-phrase AND boolean-phrase routes of
    both the engine and the oracle, so a prefix span keeps its
    semantics when combined with boolean operators instead of the
    ``*`` being silently analyzed away."""
    import re as _re

    prefix_term = None
    if text.rstrip().endswith("*"):
        body = text.rstrip().rstrip("*")
        head, _, last = body.rpartition(" ")
        last = _re.sub(r"[^a-z0-9]", "", last.lower())
        if last:
            prefix_term, text = last + "*", head
    terms = normalizer.preprocess_query_list(text)
    if prefix_term is not None:
        terms.append(prefix_term)
    return terms


VANISHED = "\0GONE"


def drop_vanished_operands(tokens: list[str]) -> list[str]:
    """Remove ``VANISHED`` placeholder operands (quoted spans whose text
    analyzed to zero terms) TOGETHER with the operator that bound them —
    Lucene drops null clauses from a BooleanQuery wholesale, so
    ``'"x" OR dog'`` (with 'x' analyzed away) must mean ``dog``, not a
    dangling-operator RPN that underflows into defined-empty.  Rules,
    applied to a fixpoint: ``NOT GONE -> GONE`` (a dropped must_not
    clause contributes nothing), ``op GONE`` / ``GONE op`` for binary
    ops remove both, ``( GONE )`` collapses to GONE, and a bare
    leftover GONE disappears (an all-vanished query is match-none)."""
    toks = list(tokens)
    changed = True
    while changed:
        changed = False
        for i, t in enumerate(toks):
            if t != VANISHED:
                continue
            if i > 0 and toks[i - 1] == "NOT":
                toks[i - 1:i + 1] = [VANISHED]
            elif (0 < i and toks[i - 1] in ("AND", "OR")):
                del toks[i - 1:i + 1]
            elif (i + 1 < len(toks) and toks[i + 1] in ("AND", "OR")):
                del toks[i:i + 2]
            elif (0 < i and i + 1 < len(toks)
                  and toks[i - 1] == "(" and toks[i + 1] == ")"):
                toks[i - 1:i + 2] = [VANISHED]
            else:
                del toks[i]
            changed = True
            break
    return toks


def looks_boolean(query: str) -> bool:
    """Query router (reference Q7, ``selfindex_i0_no_optimization.py:126-132``)."""
    return (
        " AND " in query
        or " OR " in query
        or " NOT " in query
        or "(" in query
        or ")" in query
    )


class OracleIndex:
    """Dict-based inverted index over (doc_id, text) pairs."""

    def __init__(self, k1: float = 1.2, b: float = 0.75,
                 store_positions: bool = False):
        self.k1 = k1
        self.b = b
        self.store_positions = store_positions
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.normalizer = Normalizer()
        self.inverted_index: dict[str, list[int]] = {}
        self.doc_tf: dict[int, dict[str, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.doc_ids: list[int] = []
        self.doc_count = 0
        self.avg_doc_length = 0.0
        self.term_doc_freq: dict[str, int] = {}
        self.idf_cache: dict[str, float] = {}

    def build(self, docs: list[tuple[int, str]]) -> None:
        """docs: (doc_id, raw_text).  Mirrors ``create_index`` A1-A6."""
        seen_ids = set()
        for doc_id, text in docs:
            if doc_id in seen_ids:
                # silent duplicates would double-count postings and
                # inflate doc_count/avgdl — wrong 'ground truth'
                raise ValueError(f"duplicate doc_id {doc_id} in build()")
            seen_ids.add(doc_id)
            tokens = self.normalizer.tokenize(text)
            tf = dict(Counter(tokens))
            self.doc_tf[doc_id] = tf
            self.doc_len[doc_id] = len(tokens)
            self.doc_ids.append(doc_id)
            for term in set(tokens):
                self.inverted_index.setdefault(term, []).append(doc_id)
            if self.store_positions:
                for p, term in enumerate(tokens):
                    self.positions.setdefault(term, {}).setdefault(
                        doc_id, []
                    ).append(p)
        self.doc_count = len(self.doc_ids)
        total = sum(self.doc_len.values())
        self.avg_doc_length = total / self.doc_count if self.doc_count else 0.0
        for term, postings in self.inverted_index.items():
            postings.sort()
            self.term_doc_freq[term] = len(postings)
            df = self.term_doc_freq[term]
            self.idf_cache[term] = (
                math.log((self.doc_count + 1) / (df + 1)) if df > 0 else 0.0
            )

    # --- ranked retrieval -------------------------------------------------

    def _score(self, term: str, doc_id: int, scoring: str) -> float:
        idf = self.idf_cache.get(term, 0.0)
        tf = self.doc_tf[doc_id].get(term, 0)
        doc_len = self.doc_len[doc_id]
        if doc_len == 0 or tf == 0 or idf == 0.0:
            return 0.0
        if scoring == "bm25":
            numerator = tf * (self.k1 + 1)
            denominator = tf + self.k1 * (
                1 - self.b + self.b * (doc_len / self.avg_doc_length)
            )
            return idf * (numerator / denominator)
        return (tf / doc_len) * idf

    def query_taat(
        self, query_text: str, size: int = 10, scoring: str = "bm25",
        minimum_should_match: int = 0,
        doc_filter: set[int] | None = None,
    ) -> dict:
        terms = self.normalizer.preprocess_query_list(query_text)
        doc_scores: dict[int, float] = {}
        nmatch: dict[int, int] = {}
        for term in dict.fromkeys(terms):  # distinct, order kept
            if term not in self.inverted_index:
                continue
            idf = self.idf_cache.get(term, 0.0)
            if idf == 0.0:
                continue
            reps = terms.count(term)
            for doc_id in self.inverted_index[term]:
                s = self._score(term, doc_id, scoring) * reps
                doc_scores[doc_id] = doc_scores.get(doc_id, 0.0) + s
                nmatch[doc_id] = nmatch.get(doc_id, 0) + 1
        if minimum_should_match > 1:
            doc_scores = {
                d: s for d, s in doc_scores.items()
                if nmatch[d] >= minimum_should_match
            }
        if doc_filter is not None:  # ES filter context: non-scoring
            doc_scores = {
                d: s for d, s in doc_scores.items() if d in doc_filter
            }
        return self._topk(query_text, doc_scores, size)

    def query_daat(
        self, query_text: str, size: int = 10, scoring: str = "bm25"
    ) -> dict:
        terms = self.normalizer.preprocess_query_list(query_text)
        candidates: set[int] = set()
        for term in terms:
            candidates.update(self.inverted_index.get(term, []))
        doc_scores: dict[int, float] = {}
        for doc_id in candidates:
            if self.doc_len[doc_id] == 0:
                continue
            score = 0.0
            for term in terms:
                if self.doc_tf[doc_id].get(term, 0) > 0:
                    score += self._score(term, doc_id, scoring)
            if score > 0:
                doc_scores[doc_id] = score
        return self._topk(query_text, doc_scores, size)

    @staticmethod
    def _topk(query_text: str, doc_scores: dict[int, float], size: int) -> dict:
        ranked = sorted(doc_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
        return {
            "query": query_text,
            "total_hits": len(doc_scores),
            "results": [{"doc_id": d, "score": s} for d, s in ranked],
        }

    # --- boolean retrieval ------------------------------------------------

    def query_boolean(self, query_text: str, size: int = 10) -> dict:
        tokens = preprocess_boolean_query(query_text, self.normalizer)
        rpn = to_rpn(tokens)
        all_docs = set(self.doc_ids)
        stack: list[set[int]] = []
        try:
            for token in rpn:
                if token == "AND":
                    b = stack.pop()
                    a = stack.pop()
                    stack.append(a & b if a and b else set())
                elif token == "OR":
                    b = stack.pop()
                    a = stack.pop()
                    stack.append(a | b)
                elif token == "NOT":
                    a = stack.pop()
                    stack.append(all_docs - a)
                else:
                    stack.append(set(self.inverted_index.get(token, [])))
        except IndexError:
            # malformed boolean expression (e.g. bare operators): no matches
            # — the reference would raise here; we define empty instead, the
            # same on engine and oracle
            stack = []
        result = stack[0] if stack else set()
        ordered = sorted(result)
        return {
            "query": query_text,
            "total_hits": len(result),
            "results": [{"doc_id": d, "score": 1.0} for d in ordered[:size]],
        }

    def _pos_map(self, t: str) -> dict:
        """doc -> sorted positions; a trailing-* term merges every
        vocabulary term sharing the prefix (match_phrase_prefix).
        CONTRACT NOTE: the engine caps prefix expansion at
        max_expansions=50 per segment (the ES default); the oracle
        merges the WHOLE vocabulary, so engine-vs-oracle comparisons
        are exact only while each segment has <= 50 expansions of the
        prefix — keep fuzz prefixes narrow."""
        if len(t) > 1 and t.endswith("*"):
            merged: dict[int, list[int]] = {}
            for vt, m in self.positions.items():
                if vt.startswith(t[:-1]):
                    for d, ps in m.items():
                        merged.setdefault(d, []).extend(ps)
            return {d: sorted(ps) for d, ps in merged.items()}
        return self.positions.get(t, {})

    def _phrase_docs(self, terms: list[str], slop: int) -> set[int]:
        """Docs matching ONE phrase (in-order slack-budget DP; the oracle
        twin of ``scoring.phrase_eval``'s single-phrase semantics)."""
        maps = [self._pos_map(t) for t in terms]
        docs: set[int] | None = None
        for m in maps:
            s = set(m)
            docs = s if docs is None else docs & s
        out: set[int] = set()
        for d in docs or ():
            frontier = {p: 0 for p in maps[0][d]}
            ok = True
            for m in maps[1:]:
                new: dict[int, int] = {}
                for p in m[d]:
                    costs = [
                        c + (p - q - 1)
                        for q, c in frontier.items()
                        if q < p and c + (p - q - 1) <= slop
                    ]
                    if costs:
                        new[p] = min(costs)
                frontier = new
                if not frontier:
                    ok = False
                    break
            if ok:
                out.add(d)
        return out

    def query_boolean_phrases(self, query_text: str, size: int = 10) -> dict:
        """Boolean query with quoted-phrase operands — the oracle twin of
        ``QueryEngine._search_boolean_phrases`` (same placeholder
        tokenization, same RPN, sets instead of slot arrays)."""
        import re as _re

        parts_re = _re.compile(r'("[^"]*"(?:~\d+)?)')
        span_re = _re.compile(r'^"([^"]*)"(?:~(\d+))?$')
        tokens: list[str] = []
        phrase_sets: dict[str, set[int]] = {}
        for part in parts_re.split(query_text):
            m = span_re.match(part)
            if m:
                terms = span_terms(m.group(1), self.normalizer)
                if not terms:
                    tokens.append(VANISHED)  # null clause: dropped with
                    continue                 # its operator below
                key = f"\0PH{len(phrase_sets)}"
                phrase_sets[key] = self._phrase_docs(
                    terms, int(m.group(2)) if m.group(2) else 0
                )
                tokens.append(key)
            elif part.strip():
                tokens.extend(
                    preprocess_boolean_query(part, self.normalizer)
                )
        rpn = to_rpn(tuple(drop_vanished_operands(tokens)))
        all_docs = set(self.doc_ids)
        stack: list[set[int]] = []
        try:
            for token in rpn:
                if token == "AND":
                    b = stack.pop(); a = stack.pop()
                    stack.append(a & b)
                elif token == "OR":
                    b = stack.pop(); a = stack.pop()
                    stack.append(a | b)
                elif token == "NOT":
                    stack.append(all_docs - stack.pop())
                elif token in phrase_sets:
                    stack.append(set(phrase_sets[token]))
                else:
                    stack.append(set(self.inverted_index.get(token, [])))
        except IndexError:
            stack = []
        result = sorted(stack[0]) if stack else []
        return {
            "query": query_text,
            "total_hits": len(result),
            "results": [{"doc_id": d, "score": 1.0} for d in result[:size]],
        }

    def query_phrase(self, query_text: str, size: int = 10) -> dict:
        import re as _re

        spans = _re.findall(r'"([^"]*)"(?:~(\d+))?', query_text)
        residual_text = _re.sub(r'"[^"]*"(?:~\d+)?', " ", query_text)
        phrases, slops = [], []
        for text, slop in spans:
            terms = span_terms(text, self.normalizer)
            if terms:
                phrases.append(terms)
                slops.append(int(slop) if slop else 0)
        residual = self.normalizer.preprocess_query_list(residual_text)
        if looks_boolean(_re.sub(r'"[^"]*"(?:~\d+)?', " ", query_text)):
            # boolean expression with phrase operands — decided BEFORE
            # the empty-phrases fallback, like the engine: a query whose
            # every span analyzed away must still take the boolean route
            # (where vanished spans drop with their operators), not
            # re-tokenize the span text as plain boolean operands
            return self.query_boolean_phrases(query_text, size)
        if not phrases:
            stripped = query_text.replace('"', " ")
            if looks_boolean(stripped):
                return self.query_boolean(stripped, size)
            return self.query_taat(stripped, size)

        # one phrase-matcher: the same _phrase_docs DP the boolean-
        # phrases route uses (an inline second copy of the slack-budget
        # DP could silently drift from it)
        cand: set[int] | None = None
        for phrase, slop in zip(phrases, slops):
            docs = self._phrase_docs(phrase, slop)
            cand = docs if cand is None else cand & docs
        for t in residual:
            cand = (cand if cand is not None
                    else set(self.doc_ids)) & set(
                self.inverted_index.get(t, []))
        matched = sorted(cand or ())
        return {
            "query": query_text,
            "total_hits": len(matched),
            "results": [{"doc_id": d, "score": 1.0} for d in matched[:size]],
        }

    def query(self, query_text: str, size: int = 10, scoring: str = "bm25") -> dict:
        if '"' in query_text and self.store_positions:
            return self.query_phrase(query_text, size)
        if looks_boolean(query_text):
            return self.query_boolean(query_text, size)
        return self.query_taat(query_text, size, scoring)
