"""Distributed query serving: segment actors + scatter-gather top-k merge.

Reference counterpart: the single-process ``query`` methods
(``selfindex_q_taat.py:139-209``, ``selfindex_q_daat.py:177-252``) and the
boolean RPN engine (``measure_latency_datastores.py:88-188``).  Here the index
is doc-partitioned across immutable segments; each ``SegmentSearcher`` actor
pins a set of segments (mmap'd Arrow, loaded once in ``__init__`` —
SURVEY.md §2.3 T2) and serves:

* ``dfs(terms)``      — local df gather (round 1: global idf needs global df;
                        the driver caches per-term global dfs so warm queries
                        are a single round)
* ``search_ranked``   — per-segment TAAT / DAAT / block-max WAND top-k with
                        the deterministic (-score, doc_id) tie-break
* ``search_boolean``  — per-segment RPN set algebra

The driver merges partial top-k heaps (final reduce) — correct because
segments partition the doc space.  Collection stats (N, avgdl) come from the
build's stats artifact and are passed to every scoring call, so BM25 scores
are globally consistent and rank-identical to the reference oracle.
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np
import ray

from ..normalizer import make_normalizer, preprocess_boolean_query
from ..state.dfshards import idf as _dfshards_idf

# one bare term containing * or ? -> ES wildcard-query routing
_WILDCARD_RE = re.compile(r"^(?=.*[*?])[A-Za-z0-9*?]+$")
# Lucene fuzzy syntax: term~ (AUTO), term~1, term~2
_FUZZY_RE = re.compile(r"^([A-Za-z0-9]+)~([0-2]?)$")
# Lucene query-string term boost: term^2, term^0.5
_BOOST_RE = re.compile(r"(\S+)\^(\d+(?:\.\d+)?)")


def fuzzy_auto_edits(term: str) -> int:
    """ES ``fuzziness=AUTO``: 0 edits for length <=2, 1 for 3-5, 2 above."""
    n = len(term)
    return 0 if n <= 2 else (1 if n <= 5 else 2)


_MUSTACHE_RE = re.compile(r"\{\{\{?\s*([A-Za-z0-9_.]+)\s*\}?\}\}")


def render_template(template: str, params: dict) -> str:
    """Mustache ``{{var}}`` substitution for ES search templates.
    ``{{{var}}}`` (triple-stash) is accepted and identical — query
    strings have no HTML escaping.  Unknown placeholders raise (ES's
    render API errors on missing required params rather than silently
    emitting an empty string into the query)."""
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"search_template param {name!r} missing")
        v = params[name]
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    return _MUSTACHE_RE.sub(sub, template)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz
    evaluation — the standard public algorithm; see Numerical Recipes
    §6.4 / DLMF 8.17.22)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    d = 1.0 / (d if abs(d) >= tiny else tiny)
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        c = 1.0 + aa / (c if abs(c) >= tiny else tiny)
        d = 1.0 / (d if abs(d) >= tiny else tiny)
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        c = 1.0 + aa / (c if abs(c) >= tiny else tiny)
        d = 1.0 / (d if abs(d) >= tiny else tiny)
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < 3e-12:
            break
    return h


def _ibeta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided p-value of Student's t: I_{df/(df+t^2)}(df/2, 1/2)."""
    return _ibeta(df / 2.0, 0.5, df / (df + t * t))
from ..oracle.oracle import BOOLEAN_OPERATORS, looks_boolean, to_rpn
from ..stages import scoring as sc
from ..state.segment import SegmentReader


class Searcher:
    """Segment search logic; used in-process (embedded mode) or wrapped as
    the ``SegmentSearcher`` Ray actor."""

    def __init__(self, index_dir: str, seg_ids: list[int],
                 tombstones: list[int] | None = None):
        self.index_dir = index_dir
        # doc_id_base order, NOT seg-id order: merged segments get fresh
        # (high) ids, and every driver-side "actor order == doc order"
        # merge (boolean/wildcard/fuzzy limits) depends on readers
        # ascending by doc range
        self.readers = sorted(
            (SegmentReader(index_dir, s, tombstones=tombstones)
             for s in seg_ids),
            key=lambda r: r.doc_id_base,
        )
        # facet doc-values, loaded lazily once per actor per field:
        # field -> list of (codes per slot, category strings) per reader
        self._facet_vals: dict[str, list] = {}

    def ready(self) -> int:
        return sum(r.num_terms for r in self.readers)

    def set_tombstones(self, tombstones: list[int]) -> int:
        """NRT delete visibility: re-apply the tombstone list to every
        pinned reader (copy-on-write doc_lens, no re-mmap); facet
        doc-value caches stay valid (liveness is checked at query time)."""
        for r in self.readers:
            r.apply_tombstones(tombstones)
        return len(tombstones)

    def _facet_column(self, field: str) -> list:
        cached = self._facet_vals.get(field)
        if cached is not None:
            return cached
        import pyarrow.dataset as pads

        dset = pads.dataset(
            os.path.join(self.index_dir, "docmap"), format="parquet"
        )
        per_reader = []
        for r in self.readers:
            lo = r.doc_id_base
            hi = lo + r.doc_lens.size
            tbl = dset.to_table(
                columns=["doc_id", field],
                filter=(pads.field("doc_id") >= lo)
                & (pads.field("doc_id") < hi)
                & ~pads.field(field).is_null(),  # nulls stay code -1
            ).sort_by("doc_id")
            col = tbl.column(field).combine_chunks()
            denc = col.dictionary_encode()
            codes = np.full(r.doc_lens.size, -1, dtype=np.int64)
            slots = tbl.column("doc_id").to_numpy() - lo
            codes[slots] = denc.indices.to_numpy(zero_copy_only=False)
            per_reader.append((codes, denc.dictionary.to_pylist()))
        self._facet_vals[field] = per_reader
        return per_reader

    def _facet_numeric(self, field: str) -> list:
        key = "\0num\0" + field
        cached = self._facet_vals.get(key)
        if cached is not None:
            return cached
        import pyarrow.dataset as pads

        dset = pads.dataset(
            os.path.join(self.index_dir, "docmap"), format="parquet"
        )
        per_reader = []
        for r in self.readers:
            lo = r.doc_id_base
            hi = lo + r.doc_lens.size
            cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
            tbl = dset.to_table(
                columns=cols,
                filter=(pads.field("doc_id") >= lo)
                & (pads.field("doc_id") < hi)
                & ~pads.field(field).is_null(),  # nulls keep the sentinel
            ).sort_by("doc_id")
            vals = np.full(r.doc_lens.size, np.iinfo(np.int64).min, np.int64)
            slots = tbl.column("doc_id").to_numpy() - lo
            vals[slots] = tbl.column(field).to_numpy().astype(np.int64)
            per_reader.append(vals)
        self._facet_vals[key] = per_reader
        return per_reader

    def _flt_mask(self, ri: int, flt: tuple, slots: np.ndarray) -> np.ndarray:
        """ES filter-context predicate over candidate slots of reader ``ri``
        (doc-value lookup, never touches postings; scores unaffected).
        ``flt``: ('range', field, gte|None, lte|None) over an integer
        doc-value, or ('term', field, value) over a categorical one."""
        if flt[0] == "range":
            _, field, lo, hi = flt
            vals = self._facet_numeric(field)[ri][slots]
            m = vals != np.iinfo(np.int64).min  # docmap gaps never match
            if lo is not None:
                m &= vals >= lo
            if hi is not None:
                m &= vals <= hi
            return m
        _, field, value = flt
        codes, cats = self._facet_column(field)[ri]
        try:
            code = cats.index(value)
        except ValueError:
            return np.zeros(slots.size, dtype=bool)
        return codes[slots] == code

    def _embeddings(self, path: str, id_col: str, col: str) -> list:
        """Per-reader slot-aligned, L2-normalized float64 embedding matrix
        (ES dense_vector analogue): each shard loads ONLY its doc range
        from the embeddings parquet (row-group-pruned read), cached once
        per actor like the facet doc-values.  Docs with no vector stay
        zero rows (cosine 0, never top-k)."""
        key = "\0emb\0" + path
        cached = self._facet_vals.get(key)
        if cached is not None:
            return cached
        import pyarrow.dataset as pads

        dset = pads.dataset(path, format="parquet")
        per_reader = []
        for r in self.readers:
            lo = r.doc_id_base
            hi = lo + r.doc_lens.size
            tbl = dset.to_table(
                columns=[id_col, col],
                filter=(pads.field(id_col) >= lo)
                & (pads.field(id_col) < hi),
            ).sort_by(id_col)
            from elasticsearch_ray.ops.partition import list_to_matrix

            slots = tbl.column(id_col).to_numpy() - lo
            vecs = (
                list_to_matrix(tbl.column(col), np.float64)
                if tbl.num_rows
                else np.empty((0, 0))
            )
            if vecs.size:
                n = np.linalg.norm(vecs, axis=1, keepdims=True)
                n[n == 0] = 1.0
                vecs = vecs / n
                mat = np.zeros((r.doc_lens.size, vecs.shape[1]))
                mat[slots] = vecs
            else:
                mat = np.zeros((r.doc_lens.size, 0))
            per_reader.append(mat)
        self._facet_vals[key] = per_reader
        return per_reader

    def knn_local(self, path: str, id_col: str, col: str,
                  qvec: list[float], k: int,
                  kind: str | None = None, payload=None):
        """ES knn search per shard: exact cosine of every live doc against
        the query vector (one matvec over the shard's cached matrix),
        local top-k by (-cos, doc_id).  With ``kind``/``payload`` set,
        the candidate set is PRE-filtered to the filter query's hit set
        (ES's knn ``filter`` semantics for exact search — top-k OF the
        filtered docs, never filter-after-rank)."""
        q = np.asarray(qvec, dtype=np.float64)
        nrm = float(np.linalg.norm(q))
        q = q / (nrm if nrm else 1.0)
        all_ids: list[np.ndarray] = []
        all_cos: list[np.ndarray] = []
        for r, mat in zip(self.readers, self._embeddings(path, id_col, col)):
            if not mat.shape[1]:
                continue
            if kind is not None:
                live = self._match_slots(r, kind, payload)
                live = live[r.doc_lens[live] >= 0]
                if not live.size:
                    continue
            else:
                live = np.flatnonzero(r.doc_lens >= 0)
            sims = mat[live] @ q
            order = np.lexsort((live, -sims))[:k]
            all_ids.append(live[order] + r.doc_id_base)
            all_cos.append(sims[order])
        if not all_ids:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        return np.concatenate(all_ids), np.concatenate(all_cos)

    def _match_slots(self, r, kind: str, payload) -> np.ndarray:
        """FULL local hit set (slots) for an aggregation query."""
        if kind == "all":  # match_all: every live (non-tombstoned) doc
            return np.flatnonzero(r.doc_lens >= 0)
        if kind == "bool":
            ids, _ = sc.boolean_eval(r, payload, None)
        elif kind == "wildcard":
            ids, _ = sc.wildcard_eval(r, payload, None)
        elif kind == "fuzzy":
            ids, _ = sc.fuzzy_eval(r, payload[0], payload[1], None)
        else:  # 'terms': OR of term postings (match-query hit set)
            parts = [
                res[0]
                for t in payload
                if (res := r.postings_slots(t)) is not None
            ]
            if not parts:
                return np.empty(0, dtype=np.int64)
            slots = (
                np.unique(np.concatenate(parts))
                if len(parts) > 1
                else parts[0]
            )
            return slots[r.doc_lens[slots] >= 0]
        return ids - r.doc_id_base

    def stats_agg(self, kind: str, payload, field: str) -> dict:
        """ES stats aggregation over an INTEGER doc-value field: exact
        (count, sum, sum of squares, min, max) of the full hit set; driver
        merges.  sum2 feeds the extended_stats variance as exact integer
        arithmetic (python ints — no int64 overflow at any scale)."""
        per_reader = self._facet_numeric(field)
        n = 0
        s = 0
        s2 = 0
        mn: int | None = None
        mx: int | None = None
        for r, vals in zip(self.readers, per_reader):
            slots = self._match_slots(r, kind, payload)
            v = vals[slots]
            v = v[v != np.iinfo(np.int64).min]  # lang-filtered gaps
            if not v.size:
                continue
            n += int(v.size)
            s += int(v.sum())
            s2 += int((v.astype(object) ** 2).sum())
            mn = int(v.min()) if mn is None else min(mn, int(v.min()))
            mx = int(v.max()) if mx is None else max(mx, int(v.max()))
        return {"count": n, "sum": s, "sum2": s2, "min": mn, "max": mx}

    def histogram_agg(self, kind: str, payload, field: str,
                      interval: int) -> dict:
        """ES histogram aggregation over an INTEGER doc-value field: bucket
        key = floor(v / interval) * interval (ES's Math.floor semantics,
        correct for negatives), exact doc counts over the full hit set.
        Returns {bucket_key: count}; driver merges by key."""
        per_reader = self._facet_numeric(field)
        out: dict[int, int] = {}
        for r, vals in zip(self.readers, per_reader):
            slots = self._match_slots(r, kind, payload)
            v = vals[slots]
            v = v[v != np.iinfo(np.int64).min]
            if not v.size:
                continue
            keys = np.floor_divide(v, interval) * interval
            uk, cnt = np.unique(keys, return_counts=True)
            for k_, c in zip(uk.tolist(), cnt.tolist()):
                out[k_] = out.get(k_, 0) + c
        return out

    def value_counts_agg(self, kind: str, payload, field: str,
                         numeric: bool) -> dict:
        """Exact per-value doc counts of a doc-value field over the full hit
        set — the merge primitive behind the percentiles and cardinality
        aggregations.  Exact up to the field's value cardinality (bounded
        doc-value domains; a 100 TB high-cardinality field would swap in a
        t-digest/HLL sketch at this same merge point)."""
        out: dict = {}
        if numeric:
            for r, vals in zip(self.readers, self._facet_numeric(field)):
                slots = self._match_slots(r, kind, payload)
                v = vals[slots]
                v = v[v != np.iinfo(np.int64).min]
                if not v.size:
                    continue
                uk, cnt = np.unique(v, return_counts=True)
                for k_, c in zip(uk.tolist(), cnt.tolist()):
                    out[k_] = out.get(k_, 0) + c
        else:
            for r, (codes, cats) in zip(
                self.readers, self._facet_column(field)
            ):
                slots = self._match_slots(r, kind, payload)
                c = codes[slots]
                c = c[c >= 0]
                if not c.size:
                    continue
                counts = np.bincount(c, minlength=len(cats))
                for i in np.flatnonzero(counts):
                    v = cats[i]
                    out[v] = out.get(v, 0) + int(counts[i])
        return out

    def hll_agg(self, kind: str, payload, field: str,
                numeric: bool) -> np.ndarray:
        """HyperLogLog register array of the hit set's doc-values — the
        SKETCH merge primitive behind the approx cardinality aggregation:
        fixed 2^p bytes per searcher regardless of field cardinality
        (the exact ``value_counts_agg`` path is O(distinct values) of
        actor->driver traffic on an unbounded field).  Categorical fields
        hash per DISTINCT dictionary entry, never per row."""
        from ..functions.sketches import (
            hash64,
            hash64_strings,
            hll_add_hashes,
            hll_empty,
        )

        regs = hll_empty()
        if numeric:
            for r, vals in zip(self.readers, self._facet_numeric(field)):
                slots = self._match_slots(r, kind, payload)
                v = vals[slots]
                v = v[v != np.iinfo(np.int64).min]
                hll_add_hashes(regs, hash64(v))
        else:
            for r, (codes, cats) in zip(
                self.readers, self._facet_column(field)
            ):
                slots = self._match_slots(r, kind, payload)
                c = codes[slots]
                c = c[c >= 0]
                if c.size:
                    present = np.unique(c)
                    hll_add_hashes(
                        regs, hash64_strings([cats[i] for i in present])
                    )
        return regs

    def centroid_agg(self, kind: str, payload, field: str, k: int):
        """Centroid-digest sketch of the hit set's integer doc-values —
        the SKETCH merge primitive behind the approx percentiles
        aggregation: <= k (mean, weight) centroids per searcher (rank
        error <= n/k) instead of the exact path's per-value count map."""
        from ..functions.sketches import centroids_from_counts, centroids_merge

        parts = []
        for r, vals in zip(self.readers, self._facet_numeric(field)):
            slots = self._match_slots(r, kind, payload)
            v = vals[slots]
            v = v[v != np.iinfo(np.int64).min]
            if not v.size:
                continue
            u, c = np.unique(v, return_counts=True)
            parts.append(centroids_from_counts(u, c, k))
        return centroids_merge(parts, k)

    def facet_counts(self, kind: str, payload, field: str) -> dict:
        """ES terms-aggregation: count FULL match set per facet value.
        kind: 'bool' (payload=rpn) | 'wildcard' (payload=pattern) |
        'terms' (payload=term list -> match-query OR semantics)."""
        per_reader = self._facet_column(field)
        out: dict[str, int] = {}
        for r, (codes, cats) in zip(self.readers, per_reader):
            slots = self._match_slots(r, kind, payload)
            c = codes[slots]
            c = c[c >= 0]
            if not c.size:
                continue
            counts = np.bincount(c, minlength=len(cats))
            for i in np.flatnonzero(counts):
                v = cats[i]
                out[v] = out.get(v, 0) + int(counts[i])
        return out

    def facet_counts_partition(self, kind: str, payload, field: str,
                               partition: int,
                               num_partitions: int) -> dict:
        """ES terms aggregation with ``include: {partition,
        num_partitions}``: per-value counts of the hit set, restricted
        to values whose md5-derived bucket equals ``partition`` — the
        documented ES recipe for paging a high-cardinality field
        without ever shipping the full value space.  The filter runs
        per DISTINCT dictionary value BEFORE anything leaves the shard,
        so traffic is O(values in this partition)."""
        import hashlib

        local = self._facet_counts_cached(kind, payload, field)
        out = {}
        for v, n in local.items():
            h = int(hashlib.md5((v or "").encode()).hexdigest()[:8], 16)
            if h % num_partitions == partition:
                out[v] = n
        return out

    def facet_counts_filtered(self, kind: str, payload, field: str,
                              include_re: str | None,
                              exclude_re: str | None,
                              count_missing: bool) -> tuple[dict, int]:
        """ES terms aggregation ``include``/``exclude`` regex filtering:
        per-value counts restricted to values whose WHOLE string matches
        ``include_re`` (when set) and doesn't match ``exclude_re`` —
        Lucene's anchored RegExp semantics (``re.fullmatch``).  The
        filter runs per DISTINCT dictionary value before shipping.
        Also returns this shard's count of hit docs with NO value for
        the field (the ``missing`` bucket's raw material) when asked."""
        inc = re.compile(include_re) if include_re else None
        exc = re.compile(exclude_re) if exclude_re else None

        def keep(v: str) -> bool:
            if inc is not None and not inc.fullmatch(v or ""):
                return False
            return not (exc is not None and exc.fullmatch(v or ""))

        out: dict[str, int] = {}
        miss = 0
        # ONE _match_slots pass per reader covers counts AND the
        # missing tally (re-using facet_counts would re-evaluate the
        # query a second time just to count nulls)
        for r, (codes, cats) in zip(self.readers,
                                    self._facet_column(field)):
            slots = self._match_slots(r, kind, payload)
            c = codes[slots]
            if count_missing:
                miss += int((c < 0).sum())
            c = c[c >= 0]
            if not c.size:
                continue
            counts = np.bincount(c, minlength=len(cats))
            for i in np.flatnonzero(counts):
                v = cats[i]
                if keep(v):
                    out[v] = out.get(v, 0) + int(counts[i])
        return out, miss

    def facet_cardinality(self, field: str) -> int:
        """Upper bound on this shard's distinct values of ``field`` (sum
        of per-reader doc-value dictionary sizes) — one int of traffic;
        the engine uses it to route terms/rare_terms aggregations to
        bounded-traffic paths above a cardinality threshold."""
        return sum(len(cats) for _codes, cats in self._facet_column(field))

    def _facet_counts_cached(self, kind: str, payload, field: str) -> dict:
        """One-slot memo so the rare_terms two-phase protocol (phase 2
        immediately re-probes the same query/field) aggregates the hit
        set ONCE per query instead of twice."""
        key = (kind, repr(payload), field)
        memo = getattr(self, "_facet_memo", None)
        if memo is not None and memo[0] == key:
            return memo[1]
        local = self.facet_counts(kind, payload, field)
        self._facet_memo = (key, local)
        return local

    def facet_counts_rare(self, kind: str, payload, field: str,
                          max_doc_count: int) -> dict:
        """Phase 1 of the bounded rare_terms path: ship ONLY values whose
        LOCAL count is <= max_doc_count.  Correct prune: a value's global
        count >= any local count, so a locally-common value can never be
        globally rare — traffic is O(locally rare values), not field
        cardinality."""
        local = self._facet_counts_cached(kind, payload, field)
        return {v: n for v, n in local.items() if n <= max_doc_count}

    def facet_counts_for(self, kind: str, payload, field: str,
                         values: list[str]) -> list[int]:
        """Phase 2 of the bounded rare_terms path: exact local counts for
        a driver-chosen candidate list (includes counts ABOVE the rare
        threshold — a candidate rare on one shard but common here must be
        disqualified globally).  Traffic is O(len(values))."""
        local = self._facet_counts_cached(kind, payload, field)
        return [local.get(v, 0) for v in values]

    def facet_counts_topn(self, kind: str, payload, field: str,
                          shard_size: int):
        """ES terms aggregation as ES actually distributes it: this shard
        ships ONLY its top ``shard_size`` buckets (count desc, key asc)
        plus its cutoff (the last shipped count — the max a dropped term
        could have here) and its docs-with-value total.  Actor->driver
        traffic is O(shard_size), never field cardinality — the scale
        path for high-cardinality fields, with ES's
        doc_count_error_upper_bound accounting at the driver."""
        local = self.facet_counts(kind, payload, field)
        items = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))
        top = items[:shard_size]
        cutoff = top[-1][1] if top and len(items) > shard_size else 0
        return top, cutoff, sum(local.values())

    def random_sampler_agg(self, kind: str, payload, seed: int,
                           p_micro: int, field: str):
        """ES ``random_sampler`` aggregation, shard phase: deterministic
        per-doc inclusion — doc d samples in iff
        ``md5(f"{seed}:{doc_id}")[:8] % 1e6 < p_micro`` (seeded,
        reproducible across runs/shards, exact DuckDB ``md5()`` parity —
        the same keying discipline as the corpus hash_split).  Returns
        (sampled doc count, sum of ``field`` over sampled docs holding a
        value) — integer partials, exact merge."""
        import hashlib

        sent = np.iinfo(np.int64).min
        n = 0
        tot = 0
        for ri, r in enumerate(self.readers):
            slots = self._match_slots(r, kind, payload)
            if not slots.size:
                continue
            gids = slots + r.doc_id_base
            keep = np.fromiter(
                (
                    int(hashlib.md5(
                        f"{seed}:{g}".encode()).hexdigest()[:8], 16)
                    % 1_000_000 < p_micro
                    for g in gids
                ),
                dtype=bool, count=gids.size,
            )
            n += int(keep.sum())
            vals = self._facet_numeric(field)[ri][slots][keep]
            vals = vals[vals != sent]
            tot += int(vals.sum())
        return n, tot

    def composite_agg(self, kind: str, payload, sources: tuple,
                      size: int, after: tuple | None):
        """ES ``composite`` aggregation, shard phase: the first ``size``
        composite buckets strictly AFTER ``after`` in ascending
        composite-key order, with exact local doc_counts.

        ``sources``: tuple of (stype, field, param) with stype in
        {'terms', 'terms_num', 'histogram'} (param = histogram interval).
        Docs missing any source value are excluded (ES default,
        ``missing_bucket=false``).

        Per reader, the hit set's doc-values aggregate under ONE lexsort
        + run-length scan; the after-cursor filter is vectorized over run
        starts (string cursors compare through the lexicographic rank of
        the sorted dictionary), so only <= ``size`` combos per reader
        ever cross into Python.  Shipping the local first-size is
        lossless: a combo in the global first-size is preceded, on every
        shard holding it, only by combos that are also global combos —
        so it lies within each local first-size (the ES composite shard
        protocol); counts for shipped combos are exact."""
        sent = np.iinfo(np.int64).min
        merged: dict[tuple, int] = {}
        for ri, r in enumerate(self.readers):
            slots = self._match_slots(r, kind, payload)
            if slots.size == 0:
                continue
            raw = []
            ok = np.ones(slots.size, dtype=bool)
            for stype, field, param in sources:
                if stype == "terms":
                    codes, cats = self._facet_column(field)[ri]
                    a = codes[slots]
                    ok &= a >= 0
                    raw.append(("s", a, cats))
                else:
                    v = self._facet_numeric(field)[ri][slots]
                    ok &= v != sent
                    raw.append(
                        ("h" if stype == "histogram" else "n", v, param)
                    )
            if not ok.any():
                continue
            full = bool(ok.all())
            keyarrs: list[np.ndarray] = []
            decs: list[np.ndarray | None] = []
            for t, a, extra in raw:
                if not full:
                    a = a[ok]
                if t == "s":
                    catarr = np.asarray(extra, dtype=object)
                    order = np.argsort(catarr)
                    rank = np.empty(catarr.size, dtype=np.int64)
                    rank[order] = np.arange(catarr.size)
                    keyarrs.append(rank[a])
                    decs.append(catarr[order])  # rank -> string
                elif t == "h":
                    keyarrs.append(np.floor_divide(a, extra) * extra)
                    decs.append(None)
                else:
                    keyarrs.append(a)
                    decs.append(None)
            n = keyarrs[0].size
            lex = np.lexsort(tuple(reversed(keyarrs)))
            sk = [k[lex] for k in keyarrs]
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for k in sk:
                change[1:] |= k[1:] != k[:-1]
            starts = np.flatnonzero(change)
            counts = np.diff(np.append(starts, n))
            run_keys = [k[starts] for k in sk]
            if after is not None:
                # vectorized strict tuple-greater-than over run starts
                keep = np.zeros(starts.size, dtype=bool)
                eq = np.ones(starts.size, dtype=bool)
                for rk, dec, av in zip(run_keys, decs, after):
                    if dec is not None:
                        pos = int(np.searchsorted(dec, av))
                        exact = pos < dec.size and dec[pos] == av
                    else:
                        pos, exact = int(av), True
                    gt = rk > pos
                    if not exact:
                        gt = gt | (rk == pos)
                    keep |= eq & gt
                    eq &= (rk == pos) & exact
                idx = np.flatnonzero(keep)[:size]
            else:
                idx = np.arange(min(size, starts.size))
            for i in idx:
                key = tuple(
                    (decs[j][run_keys[j][i]] if decs[j] is not None
                     else int(run_keys[j][i]))
                    for j in range(len(run_keys))
                )
                merged[key] = merged.get(key, 0) + int(counts[i])
        items = sorted(merged.items())[:size]
        return [list(k) for k, _ in items], [v for _, v in items]

    def missing_count(self, kind: str, payload, field: str,
                      is_string: bool) -> int:
        """ES ``missing`` aggregation: how many docs of the hit set have NO
        value for ``field`` — dictionary code -1 for string doc-values,
        the int64-min sentinel for numeric ones."""
        n = 0
        if is_string:
            for r, (codes, _cats) in zip(
                self.readers, self._facet_column(field)
            ):
                slots = self._match_slots(r, kind, payload)
                n += int((codes[slots] < 0).sum())
        else:
            sentinel = np.iinfo(np.int64).min
            for r, vals in zip(self.readers, self._facet_numeric(field)):
                slots = self._match_slots(r, kind, payload)
                n += int((vals[slots] == sentinel).sum())
        return n

    def _multi_key_columns(self, fields: list[str],
                           numerics: list[bool]) -> list:
        """Per-reader compound-key columns for ``multi_terms``: for each
        reader, a list of (codes-or-values int64 array, cats-or-None) per
        field, plus the per-slot validity mask primitive is left to the
        caller (ES multi_terms drops a doc missing ANY key field)."""
        cols = []
        for field, numeric in zip(fields, numerics):
            if numeric:
                cols.append([(vals, None)
                             for vals in self._facet_numeric(field)])
            else:
                cols.append([(codes, cats)
                             for codes, cats in self._facet_column(field)])
        # transpose: per reader -> per field
        return [
            [cols[f][ri] for f in range(len(fields))]
            for ri in range(len(self.readers))
        ]

    def multi_terms_agg(self, kind: str, payload, fields: list[str],
                        numerics: list[bool], shard_size: int):
        """ES ``multi_terms`` aggregation, shard side: doc counts per
        COMPOUND key tuple over the full hit set, docs missing any key
        field dropped (ES semantics).  With ``shard_size > 0`` ships only
        the local top buckets (count desc, key asc) plus the cutoff and
        the docs-with-all-values total — O(shard_size) traffic like
        ``facet_counts_topn``; ``shard_size <= 0`` ships the exact full
        map (bounded by the PRODUCT of the fields' cardinalities; the
        driver routes on that bound)."""
        sentinel = np.iinfo(np.int64).min
        out: dict[tuple, int] = {}
        per_reader = self._multi_key_columns(fields, numerics)
        for r, field_cols in zip(self.readers, per_reader):
            slots = self._match_slots(r, kind, payload)
            if not slots.size:
                continue
            keys = []
            valid = np.ones(slots.size, dtype=bool)
            for (col, cats), numeric in zip(field_cols, numerics):
                v = col[slots]
                valid &= (v != sentinel) if numeric else (v >= 0)
                keys.append(v)
            if not valid.any():
                continue
            mat = np.stack([k[valid] for k in keys], axis=1)
            uniq, cnt = np.unique(mat, axis=0, return_counts=True)
            for row, c in zip(uniq, cnt.tolist()):
                key = tuple(
                    int(v) if cats is None else cats[int(v)]
                    for v, (_col, cats) in zip(row, field_cols)
                )
                out[key] = out.get(key, 0) + c
        if shard_size <= 0:
            return out
        items = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
        top = items[:shard_size]
        cutoff = top[-1][1] if top and len(items) > shard_size else 0
        return top, cutoff, sum(out.values())

    def multi_terms_cardinality(self, fields: list[str],
                                numerics: list[bool]) -> int:
        """Upper bound on this shard's distinct compound keys: the product
        of per-field distinct-value bounds (dictionary size for strings,
        exact unique count for numerics) — one int of traffic, used by the
        driver to route multi_terms to the bounded path."""
        bound = 1
        sentinel = np.iinfo(np.int64).min
        for field, numeric in zip(fields, numerics):
            if numeric:
                card = 0
                for vals in self._facet_numeric(field):
                    u = np.unique(vals)
                    card += int(u.size - (1 if (u.size and
                                                u[0] == sentinel) else 0))
            else:
                card = sum(
                    len(cats) for _c, cats in self._facet_column(field)
                )
            bound *= max(card, 1)
        return bound

    def top_metrics_agg(self, kind: str, payload, sort_field: str,
                        asc: bool, metric_fields: list[str],
                        size: int) -> list:
        """ES ``top_metrics`` aggregation, shard side: the metric values
        of this shard's top ``size`` hits by the ``sort_field`` doc-value
        (ties broken doc_id asc — ES leaves ties undefined; we pin them
        for determinism).  Ships O(size) rows: (sort_value, doc_id,
        metrics...) tuples; the driver merges k-bounded."""
        sentinel = np.iinfo(np.int64).min
        rows = []
        per_sort = self._facet_numeric(sort_field)
        per_metric = [self._facet_numeric(f) for f in metric_fields]
        for ri, (r, sv) in enumerate(zip(self.readers, per_sort)):
            slots = self._match_slots(r, kind, payload)
            v = sv[slots]
            keep = v != sentinel
            slots, v = slots[keep], v[keep]
            if not v.size:
                continue
            order = np.lexsort((slots, v if asc else -v))[:size]
            for s in order.tolist():
                slot = int(slots[s])
                rows.append((
                    int(v[s]), int(r.doc_id_base + slot),
                    [int(pm[ri][slot]) for pm in per_metric],
                ))
        rows.sort(key=lambda t: ((t[0] if asc else -t[0]), t[1]))
        return rows[:size]

    def moments2_agg(self, kind: str, payload, fx: str, fy: str) -> dict:
        """Exact integer moment sums of TWO numeric doc-value fields over
        the hit set (docs with BOTH present): n, sum/sum2/sum3/sum4 per
        field and the cross sum(x*y) — python ints (no int64 overflow at
        any corpus size), merged losslessly at the driver into ES
        ``matrix_stats`` (means, variances, skewness, kurtosis,
        covariance, correlation)."""
        sentinel = np.iinfo(np.int64).min
        acc = {"n": 0, "sx": 0, "sx2": 0, "sx3": 0, "sx4": 0,
               "sy": 0, "sy2": 0, "sy3": 0, "sy4": 0, "sxy": 0}
        per_x = self._facet_numeric(fx)
        per_y = self._facet_numeric(fy)
        for r, xv, yv in zip(self.readers, per_x, per_y):
            slots = self._match_slots(r, kind, payload)
            x = xv[slots]
            y = yv[slots]
            keep = (x != sentinel) & (y != sentinel)
            x, y = x[keep].astype(object), y[keep].astype(object)
            if not x.size:
                continue
            acc["n"] += int(x.size)
            x2, y2 = x * x, y * y
            acc["sx"] += int(x.sum())
            acc["sx2"] += int(x2.sum())
            acc["sx3"] += int((x2 * x).sum())
            acc["sx4"] += int((x2 * x2).sum())
            acc["sy"] += int(y.sum())
            acc["sy2"] += int(y2.sum())
            acc["sy3"] += int((y2 * y).sum())
            acc["sy4"] += int((y2 * y2).sum())
            acc["sxy"] += int((x * y).sum())
        return acc

    def facet_stats(self, kind: str, payload, field: str,
                    metric_field: str) -> dict:
        """ES terms aggregation WITH a numeric sub-aggregation: per facet
        value of ``field`` -> (doc_count, metric_count, metric_sum) of the
        integer doc-value ``metric_field`` over the FULL hit set.  The
        driver merges by key and derives the avg — the standard ES
        ``terms { aggs: { avg } }`` shape.  Docs where the metric is null
        count toward doc_count but not the metric (ES sub-agg
        semantics)."""
        per_facet = self._facet_column(field)
        per_num = self._facet_numeric(metric_field)
        sentinel = np.iinfo(np.int64).min
        out: dict[str, list] = {}
        for r, (codes, cats), vals in zip(
            self.readers, per_facet, per_num
        ):
            slots = self._match_slots(r, kind, payload)
            c = codes[slots]
            v = vals[slots]
            keep = c >= 0
            c, v = c[keep], v[keep]
            if not c.size:
                continue
            counts = np.bincount(c, minlength=len(cats))
            present = v != sentinel
            mc = np.bincount(c[present], minlength=len(cats))
            ms = np.bincount(
                c[present], weights=v[present].astype(np.float64),
                minlength=len(cats),
            )  # float64 partial sums are exact for |sum| < 2^53; the
            # driver merge accumulates in python ints
            for i in np.flatnonzero(counts):
                key = cats[i]
                acc = out.setdefault(key, [0, 0, 0])
                acc[0] += int(counts[i])
                acc[1] += int(mc[i])
                acc[2] += int(ms[i])
        return out

    def search_range(self, kind: str, payload, field: str,
                     lo: int | None, hi: int | None, k: int):
        """ES range query (``gte``/``lte`` inclusive bounds, either side
        optional) over an INTEGER doc-value field, filtering the hit set of
        a match/bool/wildcard query (kind 'all' = standalone range).
        Returns (first k local doc_ids ascending, exact local total)."""
        per_reader = self._facet_numeric(field)
        parts: list[np.ndarray] = []
        total = 0
        for r, vals in zip(self.readers, per_reader):
            slots = self._match_slots(r, kind, payload)
            v = vals[slots]
            mask = v != np.iinfo(np.int64).min  # docmap gaps never match
            if lo is not None:
                mask &= v >= lo
            if hi is not None:
                mask &= v <= hi
            hit = slots[mask]  # ascending within a reader
            total += int(hit.size)
            parts.append(hit[:k] + r.doc_id_base)
        ids = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )
        return ids[:k], total  # readers are doc_id-ordered -> global asc

    def search_sort(self, kind: str, payload, field: str, desc: bool,
                    k: int, numeric: bool = True, after=None):
        """ES sort-by-field: the full hit set ordered by (doc-value,
        doc_id asc) over an integer (``numeric=True``) or string doc-value
        field; local top-k per shard, driver merges k*shards rows.  String
        sort is vectorized via per-reader dictionary ranks (rank order ==
        lexicographic order within a reader; the driver re-sorts the
        bounded merged rows by the value strings).  Docs with no doc-value
        (docmap gaps / NULLs) are excluded — ES 'missing' docs sort last
        and never reach a bounded top-k here.

        ``after=(value, doc_id)`` is the ES search_after cursor: only rows
        STRICTLY after the cursor in (value, doc_id asc) order survive the
        pre-top-k mask, so deep pagination stays k-bounded per shard at
        any depth (total stays the full hit-set count, ES behavior)."""
        out_ids: list[np.ndarray] = []
        out_vals: list = []
        total = 0
        if numeric:
            for r, vals in zip(self.readers, self._facet_numeric(field)):
                slots = self._match_slots(r, kind, payload)
                v = vals[slots]
                m = v != np.iinfo(np.int64).min
                slots, v = slots[m], v[m]
                total += int(slots.size)
                if after is not None and slots.size:
                    av, aid = int(after[0]), int(after[1])
                    gid = slots + r.doc_id_base
                    if desc:
                        keep = (v < av) | ((v == av) & (gid > aid))
                    else:
                        keep = (v > av) | ((v == av) & (gid > aid))
                    slots, v = slots[keep], v[keep]
                order = np.lexsort((slots, -v if desc else v))[:k]
                out_ids.append(slots[order] + r.doc_id_base)
                out_vals.append(v[order])
            ids = (
                np.concatenate(out_ids) if out_ids
                else np.empty(0, np.int64)
            )
            vals = (
                np.concatenate(out_vals) if out_vals
                else np.empty(0, np.int64)
            )
            return ids, vals.tolist(), total
        for (codes, cats), r in zip(
            self._facet_column(field), self.readers
        ):
            slots = self._match_slots(r, kind, payload)
            c = codes[slots]
            m = c >= 0
            slots, c = slots[m], c[m]
            total += int(slots.size)
            if after is not None and slots.size:
                av, aid = str(after[0]), int(after[1])
                # per-code cursor comparison (bounded by the reader's
                # dictionary cardinality), then one vectorized gather
                lt = np.array([cs < av for cs in cats], dtype=bool)
                eq = np.array([cs == av for cs in cats], dtype=bool)
                gid = slots + r.doc_id_base
                if desc:
                    keep = lt[c] | (eq[c] & (gid > aid))
                else:
                    keep = ~(lt[c] | eq[c]) | (eq[c] & (gid > aid))
                slots, c = slots[keep], c[keep]
            if not slots.size:
                continue
            # dictionary codes are in first-appearance order; rank them
            # lexicographically once per reader, then sort hits by rank
            rank_of_code = np.empty(len(cats), dtype=np.int64)
            rank_of_code[np.argsort(np.array(cats, dtype=object))] = (
                np.arange(len(cats))
            )
            rk = rank_of_code[c]
            order = np.lexsort((slots, -rk if desc else rk))[:k]
            out_ids.append(slots[order] + r.doc_id_base)
            out_vals.extend(cats[ci] for ci in c[order].tolist())
        ids = (
            np.concatenate(out_ids) if out_ids else np.empty(0, np.int64)
        )
        return ids, out_vals, total

    def search_boosted(self, terms: list[str], idfs: dict[str, float],
                       field: str, modifier: str, k: int, scoring: str,
                       k1: float, b: float, avgdl: float):
        """ES function_score field_value_factor: relevance score multiplied
        by a function of an integer doc-value (``ln1p`` -> ln(1+v), ``ln``,
        ``sqrt``, ``none`` -> v).  Boosting reorders docs, so scoring is
        exhaustive TAAT; the boost itself is one vectorized kernel over the
        candidate set.  Docs without a doc-value keep factor 1.0 (ES
        ``missing: 1``).  Returns the local top-k only."""
        per_reader = self._facet_numeric(field)
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        total = 0
        for r, vals in zip(self.readers, per_reader):
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            total += int(slots.size)
            if not slots.size:
                continue
            v = vals[slots]
            missing = v == np.iinfo(np.int64).min
            vf = v.astype(np.float64)
            vf[missing] = 0.0  # placeholder; factor forced to 1 below
            if modifier == "ln1p":
                f = np.log(1.0 + vf)
            elif modifier == "ln":
                f = np.log(np.maximum(vf, 1e-300))
            elif modifier == "sqrt":
                f = np.sqrt(np.maximum(vf, 0.0))
            else:  # 'none'
                f = vf
            f[missing] = 1.0
            ids, boosted = sc._topk_by_score(
                slots + r.doc_id_base, scores * f, k
            )
            all_ids.append(ids)
            all_scores.append(boosted)
        if not all_ids:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), total
        return (
            np.concatenate(all_ids), np.concatenate(all_scores), total
        )

    def search_rank_feature(self, terms: list[str],
                            idfs: dict[str, float], field: str,
                            func: str, params: tuple, boost: float,
                            k: int, scoring: str, k1: float, b: float,
                            avgdl: float):
        """ES ``bool { must: match, should: rank_feature }`` scoring:
        relevance score PLUS ``boost * S(v)`` of an integer doc-value —
        ``saturation`` S = v/(v+pivot), ``log`` S = ln(1 + scaling*v),
        ``sigmoid`` S = v^exp/(v^exp + pivot^exp), or the
        ``distance_feature`` query S = pivot/(pivot + |v - origin|).
        Additive boosting reorders docs, so scoring is exhaustive TAAT
        with one vectorized kernel over the candidate set; docs missing
        the feature get contribution 0 (the rank_feature clause doesn't
        match them).  Negative values clamp to 0 (ES rank_feature fields
        are positive).  Returns the local top-k only."""
        per_reader = self._facet_numeric(field)
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        total = 0
        for r, vals in zip(self.readers, per_reader):
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            total += int(slots.size)
            if not slots.size:
                continue
            v = vals[slots]
            missing = v == np.iinfo(np.int64).min
            vf = np.maximum(v.astype(np.float64), 0.0)
            if func == "saturation":
                (pivot,) = params
                s = vf / (vf + pivot)
            elif func == "log":
                (scaling,) = params
                s = np.log(1.0 + scaling * vf)
            elif func == "sigmoid":
                pivot, exp = params
                vp = vf ** exp
                s = vp / (vp + pivot ** exp)
            elif func == "distance":
                pivot, origin = params
                s = pivot / (pivot + np.abs(vf - origin))
            else:
                raise ValueError(f"unknown rank_feature function {func!r}")
            s[missing] = 0.0
            ids, ranked = sc._topk_by_score(
                slots + r.doc_id_base, scores + boost * s, k
            )
            all_ids.append(ids)
            all_scores.append(ranked)
        if not all_ids:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), total
        return (
            np.concatenate(all_ids), np.concatenate(all_scores), total
        )

    def search_boosting(self, terms: list[str], idfs: dict[str, float],
                        neg_kind: str, neg_payload, negative_boost: float,
                        k: int, scoring: str, k1: float, b: float,
                        avgdl: float):
        """ES ``boosting`` query: positive relevance demoted (score *=
        ``negative_boost``) wherever the negative query matches.  Demotion
        reorders docs, so positive scoring is exhaustive TAAT; the negative
        hit set is one boolean/terms match per reader and the demotion one
        vectorized membership test (both sides sorted-unique ->
        searchsorted).  Returns the local top-k only."""
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            total += int(slots.size)
            if not slots.size:
                continue
            neg = self._match_slots(r, neg_kind, neg_payload)
            if neg.size:
                pos = np.searchsorted(neg, slots)
                pos_c = np.minimum(pos, neg.size - 1)
                demote = neg[pos_c] == slots
                if demote.any():
                    scores = scores.copy()
                    scores[demote] *= negative_boost
            ids, s = sc._topk_by_score(slots + r.doc_id_base, scores, k)
            all_ids.append(ids)
            all_scores.append(s)
        if not all_ids:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), total
        return (
            np.concatenate(all_ids), np.concatenate(all_scores), total
        )

    def constant_score_ids(self, kind: str, payload, k: int):
        """ES ``constant_score`` query: the filter's live hit set with no
        scoring work at all — first k slots per reader in doc order plus
        the exact local total (the driver assigns the constant boost)."""
        parts: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            slots = self._match_slots(r, kind, payload)
            total += int(slots.size)
            parts.append(slots[:k] + r.doc_id_base)
        ids = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )
        return ids[:k], total

    def range_agg(self, kind: str, payload, field: str,
                  edges: list) -> list[int]:
        """ES ``range`` aggregation over an INTEGER doc-value field: exact
        doc count per [from, to) bucket (ES from-inclusive / to-exclusive,
        buckets may overlap) over the full hit set.  One vectorized mask
        per bucket; driver sums across shards."""
        per_reader = self._facet_numeric(field)
        counts = [0] * len(edges)
        for r, vals in zip(self.readers, per_reader):
            slots = self._match_slots(r, kind, payload)
            v = vals[slots]
            v = v[v != np.iinfo(np.int64).min]
            if not v.size:
                continue
            for i, (lo, hi) in enumerate(edges):
                m = np.ones(v.size, dtype=bool)
                if lo is not None:
                    m &= v >= lo
                if hi is not None:
                    m &= v < hi
                counts[i] += int(np.count_nonzero(m))
        return counts

    def weighted_avg_agg(self, kind: str, payload, field: str,
                         weight_field: str):
        """ES ``weighted_avg`` aggregation: exact integer partials
        (sum of v*w as python ints — no int64 overflow at any scale,
        sum of w, doc count) over the hit set; docs missing EITHER
        doc-value are skipped (ES default missing behavior)."""
        per_v = self._facet_numeric(field)
        per_w = self._facet_numeric(weight_field)
        sent = np.iinfo(np.int64).min
        num = 0
        den = 0
        cnt = 0
        for r, v, w in zip(self.readers, per_v, per_w):
            slots = self._match_slots(r, kind, payload)
            vv = v[slots]
            ww = w[slots]
            m = (vv != sent) & (ww != sent)
            n = int(np.count_nonzero(m))
            if not n:
                continue
            vv, ww = vv[m], ww[m]
            vmax = int(np.abs(vv).max())
            wmax = int(np.abs(ww).max())
            if vmax * wmax * n < 2 ** 62 and wmax * n < 2 ** 62:
                # every product, the running block sum, AND the bare
                # weight sum fit int64 (vmax == 0 would otherwise wave
                # huge weights through the first bound) -> vectorized
                # exact path (the common case)
                num += int((vv * ww).sum(dtype=np.int64))
                den += int(ww.sum(dtype=np.int64))
            else:  # arbitrary-precision fallback, still exact
                num += int((vv.astype(object) * ww.astype(object)).sum())
                den += int(ww.astype(object).sum())
            cnt += n
        return num, den, cnt

    def adjacency_counts(self, filters: list[tuple]):
        """ES ``adjacency_matrix`` aggregation: exact live hit count per
        filter and per filter-pair intersection.  Hit sets are sorted
        slot arrays, so each intersection is one ``np.intersect1d``
        (assume_unique) — no per-doc python.  Driver sums across shards."""
        n = len(filters)
        singles = [0] * n
        pairs: dict[tuple[int, int], int] = {}
        for r in self.readers:
            sets = [self._match_slots(r, k, p) for k, p in filters]
            for i, s in enumerate(sets):
                singles[i] += int(s.size)
            for i in range(n):
                if not sets[i].size:
                    continue
                for j in range(i + 1, n):
                    if not sets[j].size:
                        continue
                    c = int(np.intersect1d(
                        sets[i], sets[j], assume_unique=True
                    ).size)
                    if c:
                        pairs[(i, j)] = pairs.get((i, j), 0) + c
        return singles, [(i, j, c) for (i, j), c in sorted(pairs.items())]

    def search_collapse(self, terms: list[str], idfs: dict[str, float],
                        field: str, scoring: str, k1: float, b: float,
                        avgdl: float):
        """ES field collapse: the best-scoring live doc per value of a
        categorical doc-value field, over the FULL ranked hit set
        (exhaustive TAAT — the winner of a group can hide arbitrarily deep
        in score order).  Returns (values, scores, doc_ids, total): one row
        per group TOUCHED by this shard — bounded by the field's value
        cardinality, never the corpus; the driver re-reduces across shards.
        Vectorized: one lexsort + unique-first per reader, no per-group
        Python."""
        best: dict[str, tuple[float, int]] = {}
        total = 0
        for (codes, cats), r in zip(
            self._facet_column(field), self.readers
        ):
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            total += int(slots.size)
            if not slots.size:
                continue
            c = codes[slots]
            m = c >= 0  # docs with no doc-value can't be grouped
            slots, scores, c = slots[m], scores[m], c[m]
            # (-score, doc_id) order, then the first row per code is the
            # group winner (np.unique returns first occurrences on sorted-
            # stable order via return_index on the ordered code array)
            order = np.lexsort((slots, -scores))
            c_ord = c[order]
            uniq, first = np.unique(c_ord, return_index=True)
            for code, i in zip(uniq.tolist(), first.tolist()):
                s = float(scores[order[i]])
                d = int(slots[order[i]] + r.doc_id_base)
                v = cats[code]
                cur = best.get(v)
                if cur is None or (-s, d) < (-cur[0], cur[1]):
                    best[v] = (s, d)
        vals = list(best)
        return (
            vals,
            [best[v][0] for v in vals],
            [best[v][1] for v in vals],
            total,
        )

    def search_top_hits(self, terms: list[str], idfs: dict[str, float],
                        field: str, n: int, scoring: str, k1: float,
                        b: float, avgdl: float):
        """ES terms-agg + top_hits: the ``n`` best-scoring live docs per
        value of a categorical doc-value field over the FULL ranked hit
        set.  Per reader: one lexsort by (group, -score, doc_id) and a
        segmented rank mask — no per-group Python.  Returns
        {value: [(score, doc_id), ...]} (each list locally top-n and
        (-score, doc_id)-ordered) plus per-value exact doc counts."""
        best: dict[str, list[tuple[float, int]]] = {}
        counts: dict[str, int] = {}
        for (codes, cats), r in zip(
            self._facet_column(field), self.readers
        ):
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            if not slots.size:
                continue
            c = codes[slots]
            m = c >= 0
            slots, scores, c = slots[m], scores[m], c[m]
            if not slots.size:
                continue
            order = np.lexsort((slots, -scores, c))
            c_o, s_o, d_o = c[order], scores[order], slots[order]
            starts = np.flatnonzero(np.r_[True, c_o[1:] != c_o[:-1]])
            lens = np.diff(np.r_[starts, c_o.size])
            for st, ln in zip(starts.tolist(), lens.tolist()):
                v = cats[c_o[st]]
                counts[v] = counts.get(v, 0) + int(ln)
                take = min(int(ln), n)
                lst = best.setdefault(v, [])
                for i in range(st, st + take):
                    lst.append(
                        (float(s_o[i]), int(d_o[i]) + r.doc_id_base)
                    )
        return best, counts

    def significant_terms_counts(self, kind: str, payload):
        """ES significant_terms support: per-term foreground count inside
        the hit set over THIS shard's dictionary.  Per segment: one boolean
        hit mask + one pass over the postings lists (the same full-postings
        cost ES pays; at web scale front it with a sampler or a df ceiling —
        the candidate enumeration is the segment dictionary).  Background
        dfs are NOT accumulated here: a term can occur in readers (and
        shards) where it has zero foreground hits, so exact global df needs
        the driver's second ``dfs_live`` fanout over the surfaced term set.
        Returns (terms, fg_counts, local_hit_total)."""
        fg: dict[str, int] = {}
        total = 0
        for r in self.readers:
            hit_slots = self._match_slots(r, kind, payload)
            total += int(hit_slots.size)
            if not hit_slots.size:
                continue
            mask = np.zeros(r.num_docs, dtype=bool)
            mask[hit_slots] = True
            # one whole-column decode + a segmented sum instead of a
            # per-term Python loop over the dictionary
            slots_all, _, row_starts = r.decode_all_postings()
            if not slots_all.size:
                continue
            fg_counts = np.add.reduceat(
                mask[slots_all].astype(np.int64), row_starts[:-1]
            )
            # rows with df=0 can't exist, but guard reduceat's repeated-
            # index quirk anyway by masking on actual df
            fg_counts[np.diff(row_starts) == 0] = 0
            for row in np.flatnonzero(fg_counts):
                t = r.term_by_row(int(row))
                fg[t] = fg.get(t, 0) + int(fg_counts[row])
        terms = list(fg)
        return (terms, [fg[t] for t in terms], total)

    def dfs_live(self, terms: list[str]) -> list[int]:
        """Tombstone-aware doc frequency of each term over THIS shard's
        readers (the exact background count for significant_terms): one
        dictionary lookup + postings decode + live-mask count per
        (term, reader) — bounded by the surfaced vocabulary, never the
        dictionary."""
        out = [0] * len(terms)
        for r in self.readers:
            live = r.doc_lens >= 0
            for i, t in enumerate(terms):
                got = r.postings_slots(t)
                if got is not None:
                    out[i] += int(np.count_nonzero(live[got[0]]))
        return out

    def dfs_in_set(self, terms: list[str], kind: str,
                   payload) -> tuple[list[int], int]:
        """Doc frequency of each term WITHIN a filter query's hit set —
        the ``background_filter`` counts of significant_terms: one hit
        mask per reader, then a postings-intersection count per
        surfaced term (bounded by the candidate vocabulary).  Also
        returns this shard's background hit total."""
        out = [0] * len(terms)
        total = 0
        for r in self.readers:
            bg_slots = self._match_slots(r, kind, payload)
            total += int(bg_slots.size)
            if not bg_slots.size:
                continue
            mask = np.zeros(r.num_docs, dtype=bool)
            mask[bg_slots] = True
            for i, t in enumerate(terms):
                got = r.postings_slots(t)
                if got is not None:
                    out[i] += int(np.count_nonzero(mask[got[0]]))
        return out, total

    def filters_counts_other(self, specs: list[tuple]) -> tuple:
        """ES ``filters`` aggregation with ``other_bucket``: every named
        filter's live hit count PLUS the count of live docs matching
        NONE of them — one fanout instead of one per filter, and the
        complement comes from a per-reader mask union (never a
        driver-side id set).  ``specs`` = [(kind, payload), ...]."""
        counts = [0] * len(specs)
        other = 0
        for r in self.readers:
            live = r.doc_lens >= 0
            union = np.zeros(r.num_docs, dtype=bool)
            for i, (kind, payload) in enumerate(specs):
                slots = self._match_slots(r, kind, payload)
                counts[i] += int(slots.size)
                union[slots] = True
            other += int(np.count_nonzero(live & ~union))
        return counts, other

    def count(self, kind: str, payload) -> int:
        """ES _count API: exact live hit count, no scoring, no fetch."""
        return sum(
            int(self._match_slots(r, kind, payload).size)
            for r in self.readers
        )

    def scores_for(self, terms: list[str], idfs: dict[str, float],
                   doc_ids: list[int], scoring: str, k1: float, b: float,
                   avgdl: float) -> dict[int, float]:
        """Relevance score of a BOUNDED id set under a query (the rescore
        surface): exhaustive TAAT per owned segment, then a binary-search
        pick of the requested docs; ids outside the hit set are absent
        (score 0 to the caller)."""
        out: dict[int, float] = {}
        ids = np.asarray(sorted(doc_ids), dtype=np.int64)
        for r in self.readers:
            lo = r.doc_id_base
            sel = ids[(ids >= lo) & (ids < lo + r.doc_lens.size)]
            if not sel.size:
                continue
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            if not slots.size:
                continue
            want = sel - lo
            pos = np.searchsorted(slots, want)
            pos_c = np.minimum(pos, slots.size - 1)
            ok = slots[pos_c] == want
            for d, p in zip(sel[ok].tolist(), pos_c[ok].tolist()):
                out[int(d)] = float(scores[p])
        return out

    def doc_termvec(self, terms: list[str], doc_id: int):
        """(tf per term, doc length) for ONE live doc if this shard owns it
        (the explain surface); None otherwise.  One postings decode +
        binary search per distinct term."""
        for r in self.readers:
            lo = r.doc_id_base
            if not (lo <= doc_id < lo + r.doc_lens.size):
                continue
            slot = doc_id - lo
            if r.doc_lens[slot] < 0:  # tombstoned
                return None
            tfs: dict[str, int] = {}
            for t in dict.fromkeys(terms):
                got = r.postings_slots(t)
                if got is None:
                    continue
                slots, tf_arr = got
                i = int(np.searchsorted(slots, slot))
                if i < slots.size and slots[i] == slot:
                    tfs[t] = int(tf_arr[i])
            return {"tfs": tfs, "dl": int(r.doc_lens[slot])}
        return None

    def terms_docvalue_ids(self, field: str, values: list[str], k: int):
        """Filter-context terms query over a STRING doc-value field:
        live docs whose value is one of ``values`` (exact, unanalyzed —
        ES terms-query semantics on a keyword field).  The value set
        maps to per-reader dictionary codes once, then one vectorized
        ``isin`` mask — no per-doc string compares.  Returns (first k
        local doc_ids ascending, exact local total)."""
        per_reader = self._facet_column(field)
        vset = set(values)
        parts: list[np.ndarray] = []
        total = 0
        for r, (codes, cats) in zip(self.readers, per_reader):
            want = np.asarray(
                [i for i, c in enumerate(cats) if c in vset],
                dtype=np.int64,
            )
            if not want.size:
                parts.append(np.empty(0, dtype=np.int64))
                continue
            mask = np.isin(codes, want)
            slots = np.flatnonzero(mask & (r.doc_lens >= 0))
            total += int(slots.size)
            parts.append(slots[:k] + r.doc_id_base)
        ids = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )
        return ids[:k], total

    def ids_match(self, kind: str, payload, ids: list[int]) -> list[int]:
        """Which of the given GLOBAL doc ids match the routed query
        (same kind/payload contract as the agg layer) on this
        searcher's readers — membership via one searchsorted into each
        reader's hit-slot array, O(|ids| log hits)."""
        out: list[int] = []
        for r in self.readers:
            lo = r.doc_id_base
            hi = lo + r.doc_lens.size
            local = [d - lo for d in ids if lo <= d < hi]
            if not local:
                continue
            slots = self._match_slots(r, kind, payload)
            if not slots.size:
                continue
            la = np.asarray(sorted(local), dtype=np.int64)
            idx = np.searchsorted(slots, la)
            ok = (idx < slots.size) & (
                slots[np.minimum(idx, slots.size - 1)] == la
            )
            out.extend((la[ok] + lo).tolist())
        return out

    def exists_ids(self, field: str, k: int):
        """ES exists query per shard: live docs with a present doc-value
        for ``field`` — integer (sentinel gap) or categorical (code -1
        gap) — first k ascending, exact local total."""
        import pyarrow.dataset as pads
        import pyarrow.types as patypes

        schema = pads.dataset(
            os.path.join(self.index_dir, "docmap"), format="parquet"
        ).schema
        numeric = patypes.is_integer(schema.field(field).type)
        per_reader = (
            self._facet_numeric(field) if numeric
            else self._facet_column(field)
        )
        parts: list[np.ndarray] = []
        total = 0
        for r, vals in zip(self.readers, per_reader):
            present = (
                vals != np.iinfo(np.int64).min if numeric else vals[0] >= 0
            )
            slots = np.flatnonzero((r.doc_lens >= 0) & present)
            total += int(slots.size)
            parts.append(slots[:k] + r.doc_id_base)
        ids = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )
        return ids[:k], total

    def match_ids(self, kind: str, payload) -> np.ndarray:
        """ALL matching live global doc_ids (the delete_by_query surface) —
        output size is the match set, which the caller is about to
        materialize as tombstones anyway."""
        parts = [
            self._match_slots(r, kind, payload) + r.doc_id_base
            for r in self.readers
        ]
        return (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )

    def dfs(self, terms: list[str]) -> dict[str, int]:
        return {t: sum(r.df(t) for r in self.readers) for t in terms}

    def search_ranked(
        self,
        terms: list[str],
        idfs: dict[str, float],
        k: int,
        scoring: str,
        k1: float,
        b: float,
        avgdl: float,
        mode: str,
        after: tuple[float, int] | None = None,
        msm: int = 0,
        flt: tuple | None = None,
    ):
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        if after is not None:
            # search_after cursor (score, doc_id): exhaustive per-segment
            # scoring (cursor docs can hide arbitrarily deep under ties, so
            # heap-based early termination can't bound what survives the
            # filter), apply msm/filter context (so paginated deep scans
            # agree with page 0 of the same query), mask strictly-after in
            # (-score, doc_id) order, THEN the local top-k.  Exact for
            # every mode (taat/daat/wand are rank-identical by conformance).
            s_a, d_a = float(after[0]), int(after[1])
            total = 0
            for ri, r in enumerate(self.readers):
                slots, scores = sc.taat_candidates(
                    r, terms, idfs, scoring, k1, b, avgdl,
                    min_should_match=msm,
                )
                if flt is not None and slots.size:
                    fm = self._flt_mask(ri, flt, slots)
                    slots, scores = slots[fm], scores[fm]
                total += int(slots.size)
                ids = slots + r.doc_id_base
                m = (scores < s_a) | ((scores == s_a) & (ids > d_a))
                all_ids.append(ids[m])
                all_scores.append(scores[m])
            ids = (
                np.concatenate(all_ids) if all_ids
                else np.empty(0, dtype=np.int64)
            )
            scores = (
                np.concatenate(all_scores) if all_scores
                else np.empty(0, dtype=np.float64)
            )
            ids, scores = sc._topk_by_score(ids, scores, k)
            return ids, scores, total
        if msm > 1 or flt is not None:
            # minimum_should_match / filter context: exhaustive TAAT (heap
            # early-termination can't know a doc's final match count until
            # every term's postings are seen; the filter needs the exact
            # post-predicate total).  Filter masks candidates against the
            # actor-cached doc-values — scores are untouched (ES filter
            # context is non-scoring).
            total = 0
            for ri, r in enumerate(self.readers):
                slots, scores = sc.taat_candidates(
                    r, terms, idfs, scoring, k1, b, avgdl,
                    min_should_match=msm,
                )
                if flt is not None and slots.size:
                    m = self._flt_mask(ri, flt, slots)
                    slots, scores = slots[m], scores[m]
                total += int(slots.size)
                all_ids.append(slots + r.doc_id_base)
                all_scores.append(scores)
            ids = np.concatenate(all_ids)
            scores = np.concatenate(all_scores)
            ids, scores = sc._topk_by_score(ids, scores, k)
            return ids, scores, total
        total = -1 if mode == "wand" else 0
        threshold = 0.0  # WAND: carry the k-th score across segments
        for r in self.readers:
            if mode == "wand":
                slots, scores, _ = sc.wand_topk(
                    r, terms, idfs, k, scoring, k1, b, avgdl,
                    initial_threshold=threshold,
                )
                if k > 0 and scores.size >= k:
                    threshold = max(threshold, float(scores[k - 1]))
            elif mode == "daat":
                slots, scores, n = sc.daat_topk(
                    r, terms, idfs, k, scoring, k1, b, avgdl
                )
                total += n
            else:
                slots, scores = sc.taat_candidates(
                    r, terms, idfs, scoring, k1, b, avgdl
                )
                total += int(slots.size)
            all_ids.append(slots + r.doc_id_base)
            all_scores.append(scores)
        ids = np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.int64)
        scores = (
            np.concatenate(all_scores) if all_scores else np.empty(0, dtype=np.float64)
        )
        ids, scores = sc._topk_by_score(ids, scores, k)
        return ids, scores, total

    def search_synonyms(self, groups: list[list[str]],
                        group_idfs: list[float], k: int, scoring: str,
                        k1: float, b: float, avgdl: float):
        """Ranked search where each query position is a synonym GROUP
        scored with Lucene SynonymQuery semantics (member tfs summed
        before BM25 saturation, group idf from max member df) — see
        ``scoring.synonym_candidates``."""
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            slots, scores = sc.synonym_candidates(
                r, groups, group_idfs, scoring, k1, b, avgdl
            )
            total += int(slots.size)
            all_ids.append(slots + r.doc_id_base)
            all_scores.append(scores)
        ids = (
            np.concatenate(all_ids) if all_ids
            else np.empty(0, dtype=np.int64)
        )
        scores = (
            np.concatenate(all_scores) if all_scores
            else np.empty(0, dtype=np.float64)
        )
        ids, scores = sc._topk_by_score(ids, scores, k)
        return ids, scores, total

    def search_terms_set(self, terms: list[str], idfs: dict[str, float],
                         k: int, scoring: str, k1: float, b: float,
                         avgdl: float, msm_field: str, msm_spec: tuple):
        """ES ``terms_set`` over this searcher's segments: BM25-scored
        union of the terms, kept only where the doc's DISTINCT-term
        match count reaches the doc's own required number — read from
        the ``msm_field`` doc-value column via ``msm_spec`` (see
        ``_terms_set_required``).  Docs missing the field never match
        (Lucene CoveringQuery skips docs with no minimum value)."""
        per_reader_vals = self._facet_numeric(msm_field)
        nterms = len(dict.fromkeys(terms))
        sentinel = np.iinfo(np.int64).min
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        total = 0
        for ri, r in enumerate(self.readers):
            slots, scores, nmatch = sc.terms_set_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            )
            if slots.size:
                vals = per_reader_vals[ri][slots]
                required = _terms_set_required(vals, msm_spec, nterms)
                keep = (vals != sentinel) & (nmatch >= required)
                slots, scores = slots[keep], scores[keep]
            total += int(slots.size)
            all_ids.append(slots + r.doc_id_base)
            all_scores.append(scores)
        ids = (np.concatenate(all_ids) if all_ids
               else np.empty(0, dtype=np.int64))
        scores = (np.concatenate(all_scores) if all_scores
                  else np.empty(0, dtype=np.float64))
        ids, scores = sc._topk_by_score(ids, scores, k)
        return ids, scores, total

    def search_match_bool_prefix(self, terms: list[str],
                                 idfs: dict[str, float], prefix: str,
                                 k: int, scoring: str, k1: float, b: float,
                                 avgdl: float,
                                 max_expansions: int | None = None):
        """ES ``match_bool_prefix`` over this searcher's segments: the
        full terms score BM25 (TAAT sum) and the trailing prefix clause
        contributes a CONSTANT 1.0 to any doc containing a dictionary
        term with that prefix (Lucene's constant-score multi-term
        rewrite inside a bool should) — the union is the hit set."""
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            slots, scores = sc.taat_candidates(
                r, terms, idfs, scoring, k1, b, avgdl
            ) if terms else (np.empty(0, np.int64), np.empty(0, np.float64))
            rows = r.term_rows_matching(prefix + "*", max_expansions)
            if rows:
                arrs = [r.postings_slots_by_row(rw)[0] for rw in rows]
                ps = (np.unique(np.concatenate(arrs)) if len(arrs) > 1
                      else arrs[0])
                ps = ps[r.doc_lens[ps] > 0]
            else:
                ps = np.empty(0, dtype=np.int64)
            u = np.union1d(slots, ps)
            s = np.zeros(u.size, dtype=np.float64)
            if slots.size:
                s[np.searchsorted(u, slots)] += scores
            if ps.size:
                s[np.searchsorted(u, ps)] += 1.0
            total += int(u.size)
            all_ids.append(u + r.doc_id_base)
            all_scores.append(s)
        ids = (np.concatenate(all_ids) if all_ids
               else np.empty(0, dtype=np.int64))
        scores = (np.concatenate(all_scores) if all_scores
                  else np.empty(0, dtype=np.float64))
        ids, scores = sc._topk_by_score(ids, scores, k)
        return ids, scores, total

    def search_phrase(self, phrases: list[list[str]], residual: list[str], k: int,
                      slops: list[int] | None = None):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.phrase_eval(r, phrases, residual, k, slops=slops)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_span_near(self, terms: list[str], slop: int,
                         in_order: bool, k: int):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.span_near_eval(r, terms, slop, in_order, k)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_span_not(self, include_term: str,
                        exclude_terms: list[str], pre: int, post: int,
                        k: int):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.span_not_eval(
                r, include_term, exclude_terms, pre, post, k
            )
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_span_first(self, alt_terms: list[str], end: int | None,
                          k: int):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.span_first_eval(r, alt_terms, end, k)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_span_containing(self, big_terms: list[str],
                               little_term: str, slop: int, k: int):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.span_containing_eval(
                r, big_terms, little_term, slop, k
            )
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_span_multi(self, clauses: list[str], slop: int,
                          in_order: bool, k: int,
                          max_expansions: int | None = None):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.span_multi_near_eval(
                r, clauses, slop, in_order, k, max_expansions
            )
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_boolean(self, rpn: tuple[str, ...], k: int,
                       phrase_ops: dict | None = None):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:  # readers sorted by doc range -> output sorted
            ids, n = sc.boolean_eval(r, rpn, k, phrase_ops=phrase_ops)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_fuzzy(self, term: str, max_edits: int, k: int,
                     max_expansions: int | None = None):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.fuzzy_eval(r, term, max_edits, k, max_expansions)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_intervals(self, rule: tuple, k: int):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.intervals_eval(r, rule, k)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def complete_prefix(self, prefix: str, k: int):
        """Per-shard completion-suggester candidates: EVERY dictionary term
        starting with ``prefix`` with its df summed over this shard's
        segments (binary search + slice of the sorted dictionary).  All
        candidates ship — a local top-k cut would be globally wrong when a
        term's df spreads across shards; the prefix range bounds the
        payload (sharpen the prefix, not the shards, if it's too wide)."""
        _ = k  # kept in the RPC signature for future per-shard cuts
        agg: dict[str, int] = {}
        for r in self.readers:
            for row in r.term_rows_matching(prefix + "*", None):
                t = r.term_by_row(row)
                agg[t] = agg.get(t, 0) + r.df_by_row(row)
        terms = list(agg)
        return terms, [agg[t] for t in terms]

    def suggest_term(self, term: str, max_edits: int):
        """Per-shard term-suggester candidates: dictionary terms within
        Levenshtein distance ``max_edits`` of ``term``, each with its edit
        distance and df summed over this shard's live segments.  Returned
        as parallel lists (cheap actor serialization)."""
        agg: dict[str, list[int]] = {}
        for r in self.readers:
            rows, dists = r.term_rows_fuzzy(term, max_edits, with_dist=True)
            for row, d in zip(rows, dists):
                t = r.term_by_row(row)
                cur = agg.get(t)
                if cur is None:
                    agg[t] = [d, r.df_by_row(row)]
                else:
                    cur[1] += r.df_by_row(row)
        terms = list(agg)
        return terms, [agg[t][0] for t in terms], [agg[t][1] for t in terms]

    def search_regexp(self, pattern: str, k: int,
                      max_expansions: int | None = None):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.regexp_eval(r, pattern, k, max_expansions)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_wildcard(self, pattern: str, k: int,
                        max_expansions: int | None = None):
        out: list[np.ndarray] = []
        total = 0
        for r in self.readers:
            ids, n = sc.wildcard_eval(r, pattern, k, max_expansions)
            total += n
            out.append(ids)
        ids = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return ids[:k], total

    def search_many(self, jobs: list[tuple]) -> list:
        """Batched fan-out: many queries in ONE actor round-trip (amortizes
        the ~ms RPC cost that dominates small-corpus batch serving).  Each
        job is ('ranked', args...) or ('bool', rpn, k)."""
        out = []
        for job in jobs:
            if job[0] == "bool":
                out.append(self.search_boolean(*job[1:]))
            else:
                out.append(self.search_ranked(*job[1:]))
        return out


SegmentSearcher = ray.remote(Searcher)


class MultiIndexEngine:
    """ES multi-index search (an alias spanning indices): one ranked query
    over several ``QueryEngine``s with EXACT cross-index collection stats —
    N and total token count summed, df per term summed, so idf/avgdl (and
    therefore every BM25 score) are identical to a single index holding
    the union of the corpora.  Each member index fans out to its own
    searcher actors; the driver merge is over members' bounded top-k
    candidate sets with the deterministic (-score, index-order, doc_id)
    tie-break.

    All member indices must share an analyzer (ES requires compatible
    mappings under an alias for scoring to make sense)."""

    def __init__(self, engines: dict[str, "QueryEngine"]):
        if not engines:
            raise ValueError("MultiIndexEngine needs at least one index")
        self.engines = dict(engines)
        first = next(iter(self.engines.values()))
        analyzers = {
            e.stats.get("config", {}).get("analyzer", "reference")
            for e in self.engines.values()
        }
        if len(analyzers) > 1:
            raise ValueError(f"mixed analyzers under one alias: {analyzers}")
        self.normalizer = first.normalizer
        self.scoring = first.scoring
        self.k1, self.b = first.k1, first.b
        self.doc_count = sum(e.doc_count for e in self.engines.values())
        total_tokens = sum(
            e.avgdl * e.doc_count for e in self.engines.values()
        )
        self.avgdl = (
            total_tokens / self.doc_count if self.doc_count else 0.0
        )

    def _idfs(self, terms: list[str]) -> dict[str, float]:
        dfs = {t: 0 for t in terms}
        for e in self.engines.values():
            for t, df in e._global_dfs(terms).items():
                dfs[t] += df
        return {t: _dfshards_idf(self.doc_count, df)
                for t, df in dfs.items()}

    def search(self, query_text: str, size: int = 10,
               mode: str = "taat") -> dict:
        """Ranked search across every member index; hits carry the member
        index name.  Global stats make scores identical to a union index;
        ties order by (-score, index insertion order, doc_id)."""
        terms = self.normalizer.preprocess_query_list(query_text)
        if not terms or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        idfs = self._idfs(sorted(set(terms)))
        cands: list[tuple[float, int, int, str]] = []
        total = 0
        uncounted = False  # WAND shards return -1 ('not counted')
        for oi, (name, e) in enumerate(self.engines.items()):
            parts = e._fanout(
                "search_ranked", terms, idfs, size, self.scoring, self.k1,
                self.b, self.avgdl, mode, None, 0, None,
            )
            for ids, scores, n in parts:
                if n < 0:
                    uncounted = True
                else:
                    total += int(n)
                for d, s in zip(ids.tolist(), scores.tolist()):
                    cands.append((-s, oi, d, name))
        cands.sort()
        return {
            "query": query_text,
            # -1 propagates WAND's 'not counted' sentinel exactly like
            # the single-index path, instead of fabricating an
            # exact-looking partial count
            "total_hits": -1 if uncounted else total,
            "results": [
                {"index": name, "doc_id": d, "score": -negs}
                for negs, _, d, name in cands[:size]
            ],
        }


def _terms_set_required(vals: np.ndarray, spec: tuple,
                        num_terms: int) -> np.ndarray:
    """Vectorized ES ``terms_set`` minimum-match source: ``('field',)``
    reads the doc-value raw (``minimum_should_match_field``);
    ``('min_terms',)`` is the ES-documented Painless idiom
    ``Math.min(params.num_terms, doc[field].value)``; ``('mod_plus1',
    k)`` is ``1 + doc[field].value % k`` (a deterministic per-doc
    requirement for tests/twins).  Arbitrary Painless is out of scope —
    these cover the documented deployment patterns with one vectorized
    expression each."""
    if spec[0] == "field":
        return vals
    if spec[0] == "min_terms":
        return np.minimum(vals, num_terms)
    if spec[0] == "mod_plus1":
        return 1 + (vals % int(spec[1]))
    raise ValueError(f"unknown terms_set msm spec {spec!r}")


def _compile_filter(filter: dict | None) -> tuple | None:
    """ES filter-context clause -> internal tuple.  Accepts the ES shapes
    ``{"range": {field: {"gte": lo, "lte": hi}}}`` (inclusive bounds, either
    side optional, integer doc-value field) and ``{"term": {field: value}}``
    (categorical doc-value field)."""
    if filter is None:
        return None
    if "range" in filter:
        ((field, bounds),) = filter["range"].items()
        return ("range", field, bounds.get("gte"), bounds.get("lte"))
    if "term" in filter:
        ((field, value),) = filter["term"].items()
        return ("term", field, value)
    raise ValueError(f"unsupported filter clause: {sorted(filter)}")


class QueryEngine:
    """Driver-side front-end: query normalization, routing, RPN compilation,
    df caching, fan-out, final top-k heap merge."""

    def __init__(
        self,
        index_dir: str,
        num_searchers: int | None = None,
        scoring: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
        mode: str = "taat",  # 'taat' | 'daat' | 'wand'
        hybrid: bool | None = None,
        local_route_df_max: int | None = None,
    ):
        """``hybrid``: serve shard 0 from an IN-PROCESS Searcher and only
        the remaining shards from actors — the ES coordinating+data-node
        colocation.  Every fanout overlaps the local shard's work with the
        remote round-trip (submit remotes, score locally, then gather), so
        sequential-query latency drops by roughly the smaller of (local
        work, actor RTT) with results bit-identical (the local shard is
        chunk 0; part order is unchanged).  Default ``None``: auto-on when
        the shard count comes from the sizing heuristic and is small
        (<= 4, the RTT-dominated regime); an EXPLICIT ``num_searchers``
        keeps pure scatter-gather unless ``hybrid=True`` is passed."""
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.doc_count = self.stats["doc_count"]
        self.avgdl = self.stats["avg_doc_length"]
        self.scoring = scoring
        self.k1 = k1
        self.b = b
        self.mode = mode
        cfg = self.stats.get("config", {})
        analyzer = cfg.get("analyzer", "reference")
        self.has_positions = bool(cfg.get("store_positions", False))
        self.normalizer = make_normalizer(analyzer)
        # Bounded per-process df cache: unbounded growth at 1e9-term scale in
        # a long-lived engine is a slow leak.  Plain dict + oldest-inserted
        # eviction (dicts preserve insertion order) — FIFO, not strict LRU,
        # which is enough to bound memory without per-hit bookkeeping.
        self._df_cache: dict[str, int] = {}
        self._df_cache_cap = 1_000_000
        # Per-field facet cardinality (sum of shard dictionary sizes),
        # probed once per field on first facet use: terms/rare_terms
        # aggregations above this threshold route to the bounded-traffic
        # sharded paths instead of shipping full per-shard value dicts.
        self._facet_cards: dict[str, int] = {}
        self.facet_exact_max = 65_536
        # Cost-based phrase routing: a conjunctive phrase query's candidate
        # set is bounded by its rarest term's GLOBAL df (one cached shard
        # read), so a query with min-df <= this threshold is served from a
        # lazily-built in-process all-segments Searcher — skipping the
        # per-query scatter-gather whose slowest-of-N actor RTT dominates
        # light queries (measured on the 50k-doc bench corpus: warm local
        # 0.1-1.6 ms vs 4.5-11 ms fanout).  Head-term phrases (min-df
        # above the threshold) still fan out: their COLD evaluation walks
        # min-df candidates and genuinely needs the N-way split (measured
        # 2-4x faster distributed).  min-df == 0 short-circuits to an
        # empty result with no fanout at all.  The local route hard-gates
        # on doc_count <= _local_route_docs_max: opening every segment's
        # dictionary driver-side is only sane for an index that one
        # process could serve anyway — a 10^12-doc index never routes
        # locally, it always uses the distributed pool.
        #
        # Like ``hybrid``, routing auto-enables only when the shard count
        # comes from the sizing heuristic (the production default); an
        # EXPLICIT ``num_searchers`` means the caller wants that fanout
        # protocol exercised (tests, protocol benchmarks) unless
        # ``local_route_df_max`` is passed explicitly.  0 disables.
        self.local_route_df_max = (
            10_000 if local_route_df_max is None else int(local_route_df_max)
        )
        self._route_enabled = (
            local_route_df_max is not None or num_searchers is None
        ) and self.local_route_df_max > 0
        self._local_route_docs_max = 200_000
        self._cheap_local: Searcher | None = None
        # Term-range-sharded global df (written by _finalize): cold-term df
        # is ONE shard-file predicate read instead of an all-searcher
        # gather — at 1e9 terms the gather costs every searcher a postings
        # probe per cold term, the shard read costs one row-group scan on
        # shared storage (same storage assumption as the segment files).
        from ..state.dfshards import load_df_shards

        self._df_shards = load_df_shards(index_dir)  # (lo, hi, path)
        self._df_shard_los = [s[0] for s in self._df_shards]

        manifest_path = os.path.join(index_dir, "manifest.json")
        tombstones: list[int] = []
        seg_ids: list[int] = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            tombstones = manifest.get("tombstones", [])
            # Serve only finalized segments: leftover files from a crashed
            # extend or a prior larger build would otherwise be globbed in
            # with collection stats (N, avgdl) that don't include them.
            seg_ids = sorted(int(s) for s in manifest.get("segments", []))
        self.tombstones = set(tombstones)
        if not seg_ids:
            seg_ids = sorted(
                int(f.split("-")[1].split(".")[0])
                for f in os.listdir(os.path.join(index_dir, "segments"))
                if f.endswith(".arrow") and not f.endswith(".doclen.arrow")
            )
        # chunk segments across searchers in DOC order (merged segments
        # carry fresh high ids, so id order no longer tracks doc ranges);
        # per-seg manifests are tiny JSON reads
        mdir = os.path.join(index_dir, "manifests")
        bases = {}
        for s in seg_ids:
            mp = os.path.join(mdir, f"seg-{s:05d}.json")
            if not os.path.exists(mp):
                break
            with open(mp) as f:
                bases[s] = int(json.load(f)["doc_id_base"])
        else:
            seg_ids = sorted(seg_ids, key=lambda s: bases[s])
        self.embedded: Searcher | None = None
        self.local: Searcher | None = None
        self.searchers: list = []
        self._searcher_chunks: list[list[int]] = []
        self._served_seg_ids = set(seg_ids)
        heuristic_sized = num_searchers is None
        if num_searchers == 0:
            # embedded mode: segments pinned in THIS process — no actor RTT;
            # the low-latency single-replica serving option
            self.embedded = Searcher(index_dir, seg_ids, tombstones)
            return
        if num_searchers is None:
            # ES principle: don't over-shard small indices.  Per-query
            # scatter-gather pays ~0.4 ms of driver submission + one RTT
            # PER SEARCHER, so a searcher must own enough docs (~25k) for
            # its scoring work to amortize that; large corpora still fan
            # out to every core.  Measured on the 50k-doc bench corpus:
            # 2 searchers beat 8 by ~25% sustained QPS.  A positions index
            # serves phrase queries whose per-doc adjacency work is ~10x a
            # BM25 lookup, so far fewer docs amortize the RTT (measured:
            # Zipf-head bigram 100 ms @ 2 searchers -> 34 ms @ 8 on 50k
            # docs) — size those by a proportionally smaller doc budget.
            per_searcher_docs = 7_000 if self.has_positions else 25_000
            num_searchers = min(
                len(seg_ids),
                max(1, int(ray.cluster_resources().get("CPU", 4))),
                max(1, -(-self.doc_count // per_searcher_docs)),
            )
            if num_searchers == 1:
                # one remote searcher is strictly worse than embedded:
                # same serial work plus an actor RTT per query
                self.embedded = Searcher(index_dir, seg_ids, tombstones)
                return
        num_searchers = max(1, min(num_searchers, len(seg_ids)))
        # contiguous seg ranges per actor -> boolean merge stays doc-ordered
        chunks = [
            c.tolist()
            for c in np.array_split(np.array(seg_ids), num_searchers)
        ]
        if hybrid is None:
            hybrid = heuristic_sized and len(chunks) <= 4
        self._local_chunk: list[int] = []
        if hybrid and len(chunks) >= 2:
            # shard 0 lives in THIS process; its scoring overlaps the
            # remote shards' round-trip on every fanout
            self._local_chunk = chunks[0]
            self.local = Searcher(index_dir, self._local_chunk, tombstones)
            chunks = chunks[1:]
        # self._searcher_chunks stays index-aligned with self.searchers
        # (the revive path rebuilds searcher i from chunk i)
        self._searcher_chunks = chunks
        self.searchers = [
            SegmentSearcher.remote(index_dir, chunk, tombstones)
            for chunk in self._searcher_chunks
        ]
        ray.get([s.ready.remote() for s in self.searchers])

    def _revive_dead(self) -> bool:
        """Rebuild any searcher whose actor died (node loss, OOM kill).
        Segments are immutable files and the engine tracks each actor's
        chunk + the current tombstone set, so a replacement actor is
        state-identical (cold caches aside).  Returns True if any actor
        was replaced."""
        revived = False
        tombs = sorted(self.tombstones)
        for i, s in enumerate(self.searchers):
            try:
                ray.get(s.ready.remote())
            except ray.exceptions.RayActorError:
                actor = SegmentSearcher.remote(
                    self.index_dir, self._searcher_chunks[i], tombs
                )
                ray.get(actor.ready.remote())
                self.searchers[i] = actor
                revived = True
        return revived

    def _gather(self, make_refs) -> list:
        """ray.get with one revive-and-retry on actor death — a dead
        searcher fails a single gather, not the engine."""
        try:
            return ray.get(make_refs())
        except ray.exceptions.RayActorError:
            if not self._revive_dead():
                raise
            return ray.get(make_refs())

    def _fanout(self, method: str, *args) -> list:
        if self.embedded is not None:
            return [getattr(self.embedded, method)(*args)]
        if self.local is not None:
            # overlap: submit the remote shards FIRST, score the local
            # shard while they're in flight, then gather.  Local is chunk
            # 0, so [local] + remotes keeps parts in doc order (boolean
            # merges rely on it).
            def run():
                refs = [
                    getattr(s, method).remote(*args) for s in self.searchers
                ]
                local = getattr(self.local, method)(*args)
                return [local] + ray.get(refs)

            try:
                return run()
            except ray.exceptions.RayActorError:
                if not self._revive_dead():
                    raise
                return run()
        return self._gather(
            lambda: [getattr(s, method).remote(*args) for s in self.searchers]
        )

    def _fanout_many(self, method: str, calls: list[tuple]) -> list[list]:
        """Batched fanout for several independent calls of the same
        method: every remote ref is submitted before any gather, so n
        calls pay ONE scatter-gather round instead of n sequential ones
        (the hybrid local shard computes while the remotes fly).  Each
        returned element is that call's parts list, shaped exactly like
        a ``_fanout`` result."""
        if self.embedded is not None:
            return [[getattr(self.embedded, method)(*a)] for a in calls]
        if self.local is not None:
            def run():
                refs = [
                    [getattr(s, method).remote(*a)
                     for s in self.searchers]
                    for a in calls
                ]
                locs = [getattr(self.local, method)(*a) for a in calls]
                return [[loc] + ray.get(r)
                        for loc, r in zip(locs, refs)]

            try:
                return run()
            except ray.exceptions.RayActorError:
                if not self._revive_dead():
                    raise
                return run()
        flat = self._gather(lambda: [
            getattr(s, method).remote(*a)
            for a in calls for s in self.searchers
        ])
        ns = len(self.searchers)
        return [flat[i * ns:(i + 1) * ns] for i in range(len(calls))]

    def _facet_cardinality(self, field: str) -> int:
        """Distinct-value upper bound for a facet field (sum of shard
        dictionary sizes) — one extra fanout on FIRST use of the field,
        cached for the engine's lifetime (doc-values are build-time
        artifacts; refresh() clears the cache with the df cache)."""
        card = self._facet_cards.get(field)
        if card is None:
            card = sum(self._fanout("facet_cardinality", field))
            self._facet_cards[field] = card
        return card

    def refresh(self) -> dict:
        """ES-style NRT refresh: make segments added by ``extend_index``
        and new tombstones visible WITHOUT rebuilding the engine — existing
        searcher actors keep their mmap'd segments (and warm caches); only
        the NEW segments spawn a searcher.  Collection stats (N, avgdl)
        and the df shard index re-read from the finalized artifacts; the
        df cache drops (extend changes global dfs)."""
        with open(os.path.join(self.index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.doc_count = self.stats["doc_count"]
        self.avgdl = self.stats["avg_doc_length"]
        from ..state.dfshards import load_df_shards

        self._df_cache.clear()
        self._facet_cards.clear()
        self._cheap_local = None  # rebuilds lazily over the new served set
        self._df_shards = load_df_shards(self.index_dir)
        self._df_shard_los = [s[0] for s in self._df_shards]
        with open(os.path.join(self.index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        tombstones = manifest.get("tombstones", [])
        seg_ids = sorted(int(s) for s in manifest.get("segments", []))
        new_ids = sorted(set(seg_ids) - self._served_seg_ids)
        gone = self._served_seg_ids - set(seg_ids)
        if gone:
            raise ValueError(
                "segments were merged/removed underneath a live engine "
                f"({sorted(gone)}); reload the index instead of refresh()"
            )
        self.tombstones = set(tombstones)
        if self.embedded is not None:
            if new_ids:
                self.embedded.readers.extend(
                    SegmentReader(self.index_dir, s, tombstones=tombstones)
                    for s in new_ids
                )
                # Every cached per-reader list (facet codes, numeric
                # doc-values, embedding matrices) is now SHORTER than
                # self.readers: zip-based consumers would silently skip the
                # new segments and index-based ones would raise.  Drop the
                # caches; they rebuild lazily on next use.
                self.embedded._facet_vals.clear()
            self.embedded.set_tombstones(tombstones)
        else:
            if new_ids:
                actor = SegmentSearcher.remote(
                    self.index_dir, new_ids, tombstones
                )
                ray.get(actor.ready.remote())
                self.searchers.append(actor)
                self._searcher_chunks.append(list(new_ids))
            if tombstones:
                self._gather(
                    lambda: [
                        s.set_tombstones.remote(tombstones)
                        for s in self.searchers
                    ]
                )
            if self.local is not None:
                # hybrid local shard: same cache-drop rules as embedded
                if new_ids:
                    self.local._facet_vals.clear()
                self.local.set_tombstones(tombstones)
        self._served_seg_ids |= set(new_ids)
        return {"segments_added": len(new_ids),
                "tombstones": len(tombstones)}

    # -- df / idf ----------------------------------------------------------

    def _dfs_from_shards(self, terms: list[str]) -> dict[str, int]:
        """df for each term via the range-sharded df_global parquet
        (shared kernel: ``state.dfshards.dfs_from_shards``)."""
        from ..state.dfshards import dfs_from_shards

        return dfs_from_shards(self._df_shards, self._df_shard_los, terms)

    def _global_dfs(self, terms: list[str]) -> dict[str, int]:
        missing = sorted({t for t in terms if t not in self._df_cache})
        if missing:
            if self._df_shards:
                self._df_cache.update(self._dfs_from_shards(missing))
            else:  # pre-shard-index layout: gather per-segment dfs
                parts = self._fanout("dfs", missing)
                for t in missing:
                    self._df_cache[t] = sum(p[t] for p in parts)
        out = {t: self._df_cache[t] for t in terms}
        if len(self._df_cache) > self._df_cache_cap:
            # evict oldest-inserted first; dicts preserve insertion order
            drop = len(self._df_cache) - self._df_cache_cap // 2
            for t in list(self._df_cache)[:drop]:
                del self._df_cache[t]
        return out

    def _idfs(self, terms: list[str]) -> dict[str, float]:
        from ..state.dfshards import idf

        dfs = self._global_dfs(terms)
        # zero idf terms are skipped (including df == N) —
        # ``selfindex_q_taat.py:133,158-160``
        return {t: idf(self.doc_count, df) for t, df in dfs.items()}

    # -- search ------------------------------------------------------------

    def search(
        self,
        query_text: str,
        size: int = 10,
        mode: str | None = None,
        include_urls: bool = False,
        from_: int = 0,
        search_after: tuple[float, int] | None = None,
        minimum_should_match: int = 0,
        filter: dict | None = None,
        profile: bool = False,
    ) -> dict:
        """Reference result shape (``selfindex_q_taat.py:203-208``);
        ``include_urls`` joins the top-k against the docmap (reference J1,
        tiny k-row join).

        Pagination (ES surface): ``from_`` skips the first N results (every
        shard fetches from_+size, the driver merge slices — ES's from/size
        shallow pagination, same cost growth with depth); ``search_after``
        =(score, doc_id) of the previous page's last hit paginates ranked
        queries with a cursor filter in strict (-score, doc_id) order —
        constant result transfer per page.  ``search_after`` wins if both
        are given (ES behavior: from must be 0 with search_after)."""
        if profile:
            # ES "took"/profile surface: one opt-in wall-clock wrapper (the
            # result dict stays byte-stable when profile is off, so exact
            # result-equality tests and the driver hash are unaffected)
            import time as _time

            t0 = _time.perf_counter()
            res = self.search(
                query_text, size=size, mode=mode,
                include_urls=include_urls, from_=from_,
                search_after=search_after,
                minimum_should_match=minimum_should_match, filter=filter,
            )
            res["profile"] = {
                "took_ms": (_time.perf_counter() - t0) * 1e3,
                "shards": max(
                    1,
                    len(self.searchers)
                    + (1 if self.local is not None else 0),
                ),
            }
            return res
        if search_after is not None and not self._cursorable(query_text):
            # phrase/boolean/wildcard/fuzzy paths have no cursor filter;
            # silently re-serving page 1 would make scroll() loop forever
            raise ValueError(
                "search_after is only supported for ranked term queries; "
                "use from_ pagination for phrase/boolean/wildcard/fuzzy"
            )
        if (minimum_should_match or filter is not None) and not (
            search_after is not None or self._cursorable(query_text)
        ):
            # like the search_after guard above: silently running a
            # phrase/boolean/wildcard/fuzzy route WITHOUT the requested
            # constraint would return wrong results with no indication
            raise ValueError(
                "minimum_should_match / filter are only supported for "
                "ranked term queries; compose boolean/phrase constraints "
                "into the query string instead"
            )
        if search_after is not None:
            res = self._search_ranked(
                query_text, size, mode or self.mode, after=search_after,
                msm=minimum_should_match, flt=_compile_filter(filter),
            )
        elif '"' in query_text and self.has_positions:
            stripped = re.sub(r'"[^"]*"(?:~\d+)?', " ", query_text)
            if looks_boolean(stripped):
                # boolean expression with quoted-phrase operands:
                # '"ray data"~1 AND NOT spark'
                res = self._search_boolean_phrases(
                    query_text, size, from_=from_
                )
            else:
                res = self._search_phrase(query_text, size, mode,
                                          from_=from_)
        elif _WILDCARD_RE.match(query_text.strip()):
            res = self._search_wildcard(query_text.strip(), size, from_=from_)
        elif _FUZZY_RE.match(query_text.strip()):
            res = self._search_fuzzy(query_text.strip(), size, from_=from_)
        elif looks_boolean(query_text):
            res = self._search_boolean(query_text, size, from_=from_)
        else:
            res = self._search_ranked(
                query_text, size, mode or self.mode, from_=from_,
                msm=minimum_should_match, flt=_compile_filter(filter),
            )
        if include_urls and res["results"]:
            urls = self.lookup_urls([r["doc_id"] for r in res["results"]])
            for r in res["results"]:
                r["url"] = urls.get(r["doc_id"])
        return res

    def _search_ranked(self, query_text: str, size: int, mode: str,
                       from_: int = 0,
                       after: tuple[float, int] | None = None,
                       msm: int = 0, flt: tuple | None = None) -> dict:
        boosts: dict[str, float] = {}
        text = query_text
        if "^" in query_text:
            # Lucene query-string term boosts (term^2): the boost
            # multiplies the clause score, which is linear in idf — so it
            # folds into the idf map and every scorer (TAAT/DAAT/WAND,
            # incl. block-max bounds) stays correct unchanged
            raw: list[tuple[str, float]] = []

            def strip(m: re.Match) -> str:
                raw.append((m.group(1), float(m.group(2))))
                return m.group(1)

            text = _BOOST_RE.sub(strip, query_text)
            for word, b in raw:
                for t in self.normalizer.preprocess_query_list(word):
                    boosts[t] = boosts.get(t, 1.0) * b
        terms = self.normalizer.preprocess_query_list(text)
        return self._ranked_terms(terms, query_text, size, mode, from_,
                                  after, msm, flt, boosts=boosts)

    def _ranked_terms(self, terms: list[str], query_label: str, size: int,
                      mode: str, from_: int = 0,
                      after: tuple[float, int] | None = None,
                      msm: int = 0, flt: tuple | None = None,
                      boosts: dict[str, float] | None = None) -> dict:
        if not terms or self.doc_count == 0:
            return {"query": query_label, "total_hits": 0, "results": []}
        idfs = self._idfs(terms)
        if boosts:
            idfs = {
                t: v * boosts.get(t, 1.0) for t, v in idfs.items()
            }
        fetch = from_ + size
        route = self._route_disjunctive(terms)
        if route == "empty":
            # mirror the scorer's total_hits contract exactly: wand
            # reports -1 ("not counted") even for an empty hit set
            total = -1 if mode == "wand" else 0
            return {"query": query_label, "total_hits": total,
                    "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_ranked(
                terms, idfs, fetch, self.scoring, self.k1, self.b,
                self.avgdl, mode, after, msm, flt,
            )]
        else:
            parts = self._fanout(
                "search_ranked", terms, idfs, fetch, self.scoring, self.k1,
                self.b, self.avgdl, mode, after, msm, flt,
            )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        totals = [p[2] for p in parts]
        total = -1 if any(t < 0 for t in totals) else int(sum(totals))
        order = np.lexsort((ids, -scores))[from_:fetch]
        results = [
            {"doc_id": int(ids[i]), "score": float(scores[i])} for i in order
        ]
        return {"query": query_label, "total_hits": total, "results": results}

    def search_synonyms(self, query_text: str,
                        synonyms: dict[str, list[str]],
                        size: int = 10) -> dict:
        """ES query-time synonyms: a ``match`` query analyzed with a
        ``synonym_graph`` token filter.  Each analyzed query term expands
        to its equivalence class from ``synonyms`` (surface forms; both
        sides are run through the index analyzer so stemming agrees with
        the index), and each class is scored as ONE Lucene
        ``SynonymQuery``: per-doc tf = sum of member tfs (summed BEFORE
        BM25's saturation), idf from df = max member df.  With an empty
        mapping this is score-identical to ``search(mode='taat')``.

        ``synonyms`` maps a single term to its alternates (ES
        ``"a => b, c"`` contraction form, applied symmetrically to the
        query side only — index unchanged, the standard ES search-time
        synonym deployment since it needs no reindex)."""
        terms = self.normalizer.preprocess_query_list(query_text)
        if not terms or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        syn_map: dict[str, list[str]] = {}
        for key, alts in synonyms.items():
            kt = self.normalizer.preprocess_query_list(key)
            if len(kt) != 1:
                raise ValueError(
                    f"synonym key {key!r} must analyze to exactly one term "
                    f"(got {kt}); multi-word synonyms need positions and "
                    "are not supported"
                )
            members: list[str] = []
            for alt in alts:
                at = self.normalizer.preprocess_query_list(alt)
                if len(at) != 1:
                    raise ValueError(
                        f"synonym alternate {alt!r} must analyze to exactly "
                        f"one term (got {at}); multi-word synonyms need "
                        "positions and are not supported"
                    )
                members.append(at[0])
            # two surface keys may analyze to the same index term
            # ('Merge' / 'merge', or 'running' / 'runs' under stemming);
            # ES merges rules with the same LHS — union, don't overwrite
            syn_map.setdefault(kt[0], []).extend(members)
        groups = [
            list(dict.fromkeys([t] + syn_map.get(t, []))) for t in terms
        ]
        all_members = sorted({m for g in groups for m in g})
        dfs = self._global_dfs(all_members)
        # SynonymQuery idf from the MAX member df, via the one shared
        # scoring-critical idf helper (rank parity with the ranked path)
        group_idfs = [
            _dfshards_idf(self.doc_count, max(dfs[m] for m in g))
            for g in groups
        ]
        # union-of-members hit set -> same disjunctive df-bound routing as
        # plain ranked queries (dfs already in cache from the idf pass)
        route = self._route_disjunctive(all_members)
        if route == "empty":
            return {"query": query_text, "total_hits": 0, "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_synonyms(
                groups, group_idfs, size, self.scoring,
                self.k1, self.b, self.avgdl,
            )]
        else:
            parts = self._fanout(
                "search_synonyms", groups, group_idfs, size, self.scoring,
                self.k1, self.b, self.avgdl,
            )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        order = np.lexsort((ids, -scores))[:size]
        results = [
            {"doc_id": int(ids[i]), "score": float(scores[i])} for i in order
        ]
        return {"query": query_text, "total_hits": total,
                "results": results}

    @staticmethod
    def parse_phrases(
        query_text: str, normalizer
    ) -> tuple[list[list[str]], list[str], list[int]]:
        """Extract quoted phrase term-lists + residual free terms + per-phrase
        slops (Lucene proximity syntax ``"a b"~N``; bare quotes -> slop 0).

        A span whose raw text ends in ``*`` is a match_phrase_prefix (ES):
        the raw LAST word becomes the prefix term — lowercased but NOT
        analyzed (same rule as the wildcard surface; analyzing could drop or
        stem it away), trailing ``*`` kept so ``phrase_eval`` expands it
        against the segment dictionary.  The leading words analyze
        normally."""
        import re as _re

        from ..oracle.oracle import span_terms

        spans = _re.findall(r'"([^"]*)"(?:~(\d+))?', query_text)
        residual_text = _re.sub(r'"[^"]*"(?:~\d+)?', " ", query_text)
        phrases, slops = [], []
        for text, slop in spans:
            terms = span_terms(text, normalizer)
            if terms:
                phrases.append(terms)
                slops.append(int(slop) if slop else 0)
        residual = normalizer.preprocess_query_list(residual_text)
        return phrases, residual, slops

    def _search_phrase(self, query_text: str, size: int,
                       mode: str | None = None, from_: int = 0) -> dict:
        phrases, residual, slops = self.parse_phrases(query_text, self.normalizer)
        if not phrases:
            # no usable quoted span -> normal routing on the unquoted text,
            # honoring the caller's per-call mode
            stripped = query_text.replace('"', " ")
            if looks_boolean(stripped):
                return self._search_boolean(stripped, size, from_=from_)
            return self._search_ranked(stripped, size, mode or self.mode,
                                       from_=from_)
        fetch = from_ + size
        route = self._route_conjunctive(
            [t for ph in phrases for t in ph] + residual
        )
        if route == "empty":
            return {"query": query_text, "total_hits": 0, "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_phrase(
                phrases, residual, fetch, slops
            )]
        else:
            parts = self._fanout(
                "search_phrase", phrases, residual, fetch, slops
            )
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def search_span_near(self, query_text: str, slop: int = 0,
                         in_order: bool = False, size: int = 10,
                         from_: int = 0) -> dict:
        """ES ``span_near`` query over single-term clauses: the words of
        ``query_text`` (each analyzed to exactly one indexed term) must
        all occur within ``slop`` extra positions of each other —
        ``in_order=True`` requires index order (Lucene sloppy-phrase
        window, same engine path as ``"a b"~N``), ``in_order=False``
        admits any order (``max(p) - min(p) - (n-1) <= slop``).  Hits
        come back doc_id ascending with exact totals (span queries are
        constant-scored here, like the boolean family).  Duplicate
        clause terms are rejected: distinct-position assignment for
        repeated terms needs Lucene's per-doc span lattice, which the
        vectorized window scan intentionally trades away."""
        if not self.has_positions:
            raise ValueError(
                "span_near needs an index built with store_positions=True")
        if not (0 <= slop < (1 << 31)):
            # positions fit 32 bits: a window wider than 2^31 would cross
            # the slot<<32 composite-key boundary (cross-doc safety), and
            # ES rejects negative slop rather than coercing it
            raise ValueError("span_near slop must be in [0, 2^31)")
        words = query_text.split()
        if len(words) < 2:
            raise ValueError("span_near needs at least two clause terms")
        terms = []
        for w in words:
            toks = self.normalizer.preprocess_query_list(w)
            if len(toks) != 1:
                raise ValueError(
                    f"span_near clause {w!r} must analyze to exactly one "
                    f"term (got {toks!r})"
                )
            terms.append(toks[0])
        if len(set(terms)) != len(terms):
            raise ValueError("span_near clause terms must be distinct")
        fetch = from_ + size
        route = self._route_conjunctive(terms)
        if route == "empty":
            return {"query": query_text, "total_hits": 0, "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_span_near(
                terms, slop, in_order, fetch
            )]
        else:
            parts = self._fanout(
                "search_span_near", terms, slop, in_order, fetch
            )
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def search_span_not(self, include: str, exclude: str,
                        pre: int = 0, post: int = 0, size: int = 10,
                        from_: int = 0) -> dict:
        """ES ``span_not`` over single-term clauses: docs where the
        ``include`` term has at least one occurrence with no occurrence
        of ANY ``exclude`` word (a span_or of the exclude string's
        words) overlapping it or within ``pre`` positions before /
        ``post`` positions after.  Width-1 spans make pure overlap
        (pre=post=0) require an exclude term at the exact same analyzed
        position — impossible for distinct terms, matching Lucene,
        where span_not only bites via pre/post (or duplicated clause
        terms, rejected here like the rest of the span family).
        Constant-scored, doc_id ascending, exact totals."""
        if not self.has_positions:
            raise ValueError(
                "span_not needs an index built with store_positions=True")
        inc_toks = self.normalizer.preprocess_query_list(include)
        if len(inc_toks) != 1:
            raise ValueError(
                f"span_not include clause {include!r} must analyze to "
                f"exactly one term (got {inc_toks!r})"
            )
        exc_terms = []
        for w in exclude.split():
            toks = self.normalizer.preprocess_query_list(w)
            if len(toks) != 1:
                raise ValueError(
                    f"span_not exclude clause {w!r} must analyze to "
                    f"exactly one term (got {toks!r})"
                )
            exc_terms.append(toks[0])
        if not exc_terms:
            raise ValueError("span_not needs at least one exclude term")
        if inc_toks[0] in exc_terms:
            raise ValueError("span_not include must differ from excludes")
        if pre < 0 or post < 0:
            raise ValueError("span_not pre/post must be >= 0")
        if pre >= (1 << 31) or post >= (1 << 31):
            raise ValueError("span_not pre/post must be < 2^31")
        fetch = from_ + size
        route = self._route_conjunctive(inc_toks)
        if route == "empty":
            return {"query": include, "total_hits": 0, "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_span_not(
                inc_toks[0], exc_terms, pre, post, fetch
            )]
        else:
            parts = self._fanout(
                "search_span_not", inc_toks[0], exc_terms, pre, post,
                fetch,
            )
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": include,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def search_span_first(self, query_text: str, end: int | None = None,
                          size: int = 10, from_: int = 0) -> dict:
        """ES ``span_first`` wrapping a ``span_or`` of single-term
        clauses: the words of ``query_text`` are the alternatives (each
        must analyze to exactly one indexed term); a doc matches iff ANY
        alternative has an occurrence whose span end is <= ``end`` —
        Lucene's exclusive span end over 0-based analyzed positions, so
        a term at position ``p`` qualifies when ``p + 1 <= end``.
        ``end=None`` degenerates to the plain ``span_or`` union.  Like
        the rest of the span family, hits are constant-scored and come
        back doc_id ascending with exact totals."""
        if end is not None and not self.has_positions:
            raise ValueError(
                "span_first with a bounded end needs an index built "
                "with store_positions=True")
        words = query_text.split()
        if not words:
            raise ValueError("span_first needs at least one clause term")
        if end is not None and end < 1:
            raise ValueError("span_first end must be >= 1")
        terms = []
        for w in words:
            toks = self.normalizer.preprocess_query_list(w)
            if len(toks) != 1:
                raise ValueError(
                    f"span_first clause {w!r} must analyze to exactly "
                    f"one term (got {toks!r})"
                )
            terms.append(toks[0])
        fetch = from_ + size
        route = self._route_disjunctive(terms)
        if route == "empty":
            return {"query": query_text, "total_hits": 0, "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_span_first(
                terms, end, fetch
            )]
        else:
            parts = self._fanout("search_span_first", terms, end, fetch)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def _iv_compile(self, rule: dict) -> tuple:
        """ES intervals JSON -> internal rule tuples, analyzing leaf
        words through the index analyzer (each must map to exactly one
        indexed term — the span/intervals family's contract here)."""
        if not isinstance(rule, dict) or len(rule) != 1:
            raise ValueError(
                "intervals rule must be one of "
                "{'match': ...}, {'all_of': ...}, {'any_of': ...}")
        kind, body = next(iter(rule.items()))
        if kind == "match":
            words = body["query"].split()
            terms = []
            for w in words:
                toks = self.normalizer.preprocess_query_list(w)
                if len(toks) != 1:
                    raise ValueError(
                        f"intervals match word {w!r} must analyze to "
                        f"exactly one term (got {toks!r})")
                terms.append(toks[0])
            if not terms:
                raise ValueError("intervals match needs at least one word")
            if len(terms) == 1:
                base = ("term", terms[0])
            else:
                base = ("match", tuple(terms),
                        int(body.get("max_gaps", -1)),
                        bool(body.get("ordered", False)))
            return self._iv_wrap_filter(base, body)
        if kind == "all_of":
            children = tuple(self._iv_compile(c) for c in body["intervals"])
            if not children:
                raise ValueError("all_of needs at least one sub-rule")
            base = ("all_of", children, int(body.get("max_gaps", -1)),
                    bool(body.get("ordered", False)))
            return self._iv_wrap_filter(base, body)
        if kind == "any_of":
            children = tuple(self._iv_compile(c) for c in body["intervals"])
            if not children:
                raise ValueError("any_of needs at least one sub-rule")
            return self._iv_wrap_filter(("any_of", children), body)
        raise ValueError(f"unsupported intervals rule {kind!r}")

    def _iv_wrap_filter(self, base: tuple, body: dict) -> tuple:
        """Attach an ES intervals ``filter`` rule (``containing``,
        ``contained_by``, ``overlapping``, ``before``, ``after`` and the
        ``not_*`` complements) to a compiled rule.  The filter body is
        ``{kind: <intervals rule>}``; filters nest (a filter's inner
        rule may itself carry a filter)."""
        from elasticsearch_ray.stages.scoring import _IV_FILTER_KINDS

        flt = body.get("filter")
        if flt is None:
            return base
        if not isinstance(flt, dict) or len(flt) != 1:
            raise ValueError(
                "intervals filter must be {kind: rule} with exactly one "
                f"of {sorted(_IV_FILTER_KINDS)}")
        fkind, inner = next(iter(flt.items()))
        if fkind not in _IV_FILTER_KINDS:
            raise ValueError(
                f"unsupported intervals filter {fkind!r} (expected one "
                f"of {sorted(_IV_FILTER_KINDS)})")
        return ("filter", base, fkind, self._iv_compile(inner))

    def search_intervals(self, rule: dict, size: int = 10,
                         from_: int = 0) -> dict:
        """ES ``intervals`` query: Lucene's minimal-interval algebra over
        stored positions — ``match`` (ordered / max_gaps),
        ``all_of`` (positional conjunction with ordering and gap budget
        ACROSS sub-rules), ``any_of`` (positional union), arbitrarily
        nested.  ``rule`` takes the ES JSON shape, e.g.::

            {"all_of": {"ordered": True, "max_gaps": 2, "intervals": [
                {"match": {"query": "merge sort", "ordered": True}},
                {"any_of": {"intervals": [
                    {"match": {"query": "batch"}},
                    {"match": {"query": "stream"}}]}},
            ]}}

        Flat rules run the vectorized phrase/span_near kernels; nested
        rules run the per-doc minimal-interval algebra bounded by the
        rarest required clause's postings (Lucene's own per-doc lazy
        iterator design).  Constant-scored (like the boolean family),
        doc_id ascending, exact totals.  Needs store_positions=True."""
        if not self.has_positions:
            raise ValueError(
                "intervals needs an index built with store_positions=True")
        compiled = self._iv_compile(rule)
        fetch = from_ + size
        parts = self._fanout("search_intervals", compiled, fetch)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": repr(rule),
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def _span_containing_parts(self, big: str, little: str, slop: int,
                               fetch: int, label: str):
        if not self.has_positions:
            raise ValueError(
                f"{label} needs an index built with store_positions=True")
        if not (0 <= slop < (1 << 31)):
            raise ValueError(f"{label} slop must be in [0, 2^31)")
        words = big.split()
        if len(words) < 2:
            raise ValueError(f"{label} big clause needs at least two words")
        big_terms = []
        for w in words:
            toks = self.normalizer.preprocess_query_list(w)
            if len(toks) != 1:
                raise ValueError(
                    f"{label} big clause word {w!r} must analyze to "
                    f"exactly one term (got {toks!r})")
            big_terms.append(toks[0])
        if len(set(big_terms)) != len(big_terms):
            raise ValueError(f"{label} big clause terms must be distinct")
        ltoks = self.normalizer.preprocess_query_list(little)
        if len(ltoks) != 1:
            raise ValueError(
                f"{label} little clause {little!r} must analyze to "
                f"exactly one term (got {ltoks!r})")
        route = self._route_conjunctive(big_terms + ltoks)
        if route == "empty":
            return None
        if route == "local":
            return [self._local_allsegs().search_span_containing(
                big_terms, ltoks[0], slop, fetch)]
        return self._fanout(
            "search_span_containing", big_terms, ltoks[0], slop, fetch)

    def search_span_containing(self, big: str, little: str,
                               slop: int = 0, size: int = 10,
                               from_: int = 0) -> dict:
        """ES ``span_containing`` at doc granularity: docs where some
        enumerated span of ``span_near(big words, slop, in_order=True)``
        wholly contains an occurrence of ``little``.  Runs the
        vectorized per-anchor greedy-chain kernel
        (``span_containing_eval``) — Lucene's NearSpansOrdered
        per-start-minimal span enumeration, NOT the intervals query's
        global antichain (which would wrongly drop a containing span
        when a smaller non-containing one nests inside it).
        Constant-scored, doc_id ascending, exact totals.  Needs
        store_positions=True."""
        fetch = from_ + size
        label = f"span_containing(big={big!r}, little={little!r})"
        parts = self._span_containing_parts(
            big, little, slop, fetch, "span_containing")
        if parts is None:
            return {"query": label, "total_hits": 0, "results": []}
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": label,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def search_span_multi(self, clauses: list[str], slop: int = 0,
                          in_order: bool = False, size: int = 10,
                          from_: int = 0,
                          max_expansions: int | None = None) -> dict:
        """ES ``span_near`` over ``span_multi``/``span_term`` clauses —
        the full Lucene SpanMultiTermQueryWrapper family.  Each clause
        is one of (Lucene query-string syntax, multi-term patterns
        lowercased but NOT analyzed, ES behavior):

        - a plain word — analyzed to exactly one indexed term,
        - a wildcard pattern (``merg*``, ``ba?ch``),
        - a fuzzy term (``merge~``, ``merge~1`` — AUTO edits when bare),
        - a regexp (``/merg.*/`` — slash-delimited, anchored like ES),

        expanded per segment against the dictionary; a clause matches
        at the union of its expansions' positions.  A single clause
        degenerates to the bare span_multi (filter-context term
        expansion).  Constant-scored, doc_id ascending, exact totals.
        Needs store_positions=True."""
        if not self.has_positions:
            raise ValueError(
                "span_multi needs an index built with "
                "store_positions=True")
        if not clauses:
            raise ValueError("span_multi needs at least one clause")
        if not (0 <= slop < (1 << 31)):
            # the unordered window test spans slop + n - 1 composite-key
            # units; >= 2^31 would cross the slot<<32 doc boundary
            raise ValueError("span_multi slop must be in [0, 2^31)")
        compiled: list[tuple] = []
        for c in clauses:
            if len(c) > 2 and c.startswith("/") and c.endswith("/"):
                compiled.append(("regexp", c[1:-1].lower()))
                continue
            fz = _FUZZY_RE.match(c)
            if fz:
                t = fz.group(1).lower()
                edits = (int(fz.group(2)) if fz.group(2)
                         else fuzzy_auto_edits(t))
                compiled.append(("fuzzy", t, edits))
                continue
            if "*" in c or "?" in c:
                compiled.append(("wildcard", c.lower()))
                continue
            toks = self.normalizer.preprocess_query_list(c)
            if len(toks) != 1:
                raise ValueError(
                    f"span_multi literal clause {c!r} must analyze to "
                    f"exactly one term (got {toks!r})")
            compiled.append(("term", toks[0]))
        fetch = from_ + size
        parts = self._fanout(
            "search_span_multi", compiled, slop, in_order, fetch,
            max_expansions,
        )
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        label = f"span_multi({', '.join(map(str, clauses))}, " \
                f"slop={slop}, in_order={in_order})"
        return {
            "query": label,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def search_span_within(self, little: str, big: str,
                           slop: int = 0, size: int = 10,
                           from_: int = 0) -> dict:
        """ES ``span_within`` at doc granularity: docs where an
        occurrence of ``little`` lies wholly inside some enumerated span
        of ``span_near(big words, slop, in_order=True)``.  The same doc
        set as ``span_containing(big, little)`` — both assert existence
        of a big span containing a little occurrence; only the returned
        spans differ, invisible at doc ranking — so it shares the
        kernel.  Needs store_positions=True."""
        fetch = from_ + size
        label = f"span_within(little={little!r}, big={big!r})"
        parts = self._span_containing_parts(
            big, little, slop, fetch, "span_within")
        if parts is None:
            return {"query": label, "total_hits": 0, "results": []}
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": label,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def search_terms_set(self, terms: list[str], msm_field: str,
                         msm_script: tuple = ("field",),
                         size: int = 10) -> dict:
        """ES ``terms_set`` query: match docs containing at least N of
        the given terms, where N comes PER DOC from a numeric doc-value
        field (``minimum_should_match_field``) or one of the documented
        script idioms (``msm_script``, see ``_terms_set_required``).
        Matching docs score as the BM25 sum of their matching terms
        (Lucene CoveringQuery sums the matching clause scores), ties
        broken (-score, doc_id).  Terms are analyzed individually and
        must each survive as one indexed term."""
        analyzed: list[str] = []
        for t in terms:
            toks = self.normalizer.preprocess_query_list(t)
            if len(toks) != 1:
                raise ValueError(
                    f"terms_set term {t!r} must analyze to exactly one "
                    f"term (got {toks!r})"
                )
            analyzed.append(toks[0])
        if not analyzed or self.doc_count == 0:
            return {"query": " ".join(terms), "total_hits": 0,
                    "results": []}
        idfs = self._idfs(analyzed)
        route = self._route_disjunctive(analyzed)
        if route == "empty":
            return {"query": " ".join(terms), "total_hits": 0,
                    "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_terms_set(
                analyzed, idfs, size, self.scoring, self.k1, self.b,
                self.avgdl, msm_field, msm_script,
            )]
        else:
            parts = self._fanout(
                "search_terms_set", analyzed, idfs, size, self.scoring,
                self.k1, self.b, self.avgdl, msm_field, msm_script,
            )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        order = np.lexsort((ids, -scores))[:size]
        return {
            "query": " ".join(terms),
            "total_hits": total,
            "results": [{"doc_id": int(ids[i]), "score": float(scores[i])}
                        for i in order],
        }

    def search_match_bool_prefix(self, query_text: str, size: int = 10,
                                 max_expansions: int | None = None) -> dict:
        """ES ``match_bool_prefix``: the analyzed query's last token is a
        prefix clause, the rest are full term clauses, all OR'd in a bool
        should.  Full terms score BM25; the prefix clause adds a constant
        1.0 to docs containing any dictionary term with the prefix
        (Lucene constant-score rewrite).  The prefix is the ANALYZED last
        token — a stem under the 'reference' analyzer, matching the
        stored dictionary like ES matching its index terms."""
        analyzed = self.normalizer.preprocess_query_list(query_text)
        if not analyzed or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        terms, prefix = analyzed[:-1], analyzed[-1]
        idfs = self._idfs(terms) if terms else {}
        parts = self._fanout(
            "search_match_bool_prefix", terms, idfs, prefix, size,
            self.scoring, self.k1, self.b, self.avgdl, max_expansions,
        )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        order = np.lexsort((ids, -scores))[:size]
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(ids[i]), "score": float(scores[i])}
                        for i in order],
        }

    def search_pinned(self, pinned_ids: list[int], query_text: str,
                      size: int = 10) -> dict:
        """ES ``pinned`` query: the given doc ids rank first IN THE GIVEN
        ORDER (alive ones only), then the organic query's results with
        any pinned ids removed, until ``size``.  Pinned docs get the ES
        sentinel score 1.7014124e38 descending by position (ES pins via
        decreasing float boosts just below FLT_MAX); organic hits keep
        their BM25 scores.  total_hits counts the organic hit set plus
        pinned docs outside it, like ES counting the dis_max union."""
        organic = self.search(query_text, size=size + len(pinned_ids))
        want = list(dict.fromkeys(int(i) for i in pinned_ids))
        present = set(self.lookup_docvalues(want, []))  # one bounded read
        pin_alive = [d for d in want
                     if d in present and d not in self.tombstones]
        pinned_set = set(pin_alive)
        base = 1.7014124e38
        results = [
            {"doc_id": d, "score": base - 1e30 * i}
            for i, d in enumerate(pin_alive)
        ]
        results += [r for r in organic["results"]
                    if r["doc_id"] not in pinned_set]
        # exact union count: organic total + pinned docs the query does
        # NOT match.  Ranked route: one bounded _explain probe per pin
        # (the scoring-model membership the ranked total counts).
        # Boolean/wildcard/fuzzy routes: explain's bag-of-words model
        # would mis-count (e.g. 'a AND NOT b' vs a pin containing 'a'),
        # so membership comes from the agg layer's exact hit masks via
        # ids_match.  Quoted-phrase organics have neither probe — the
        # full hit set decides when it fits the retrieved window, else
        # the combination is rejected rather than silently mis-counted.
        if self._cursorable(query_text):
            extra = sum(
                1 for d in pin_alive
                if not self.explain(query_text, d)["matched"]
            )
        elif '"' in query_text and self.has_positions:
            if organic["total_hits"] <= len(organic["results"]):
                hit = {r["doc_id"] for r in organic["results"]}
                extra = sum(1 for d in pin_alive if d not in hit)
            else:
                raise ValueError(
                    "pinned with a quoted-phrase organic query whose hit "
                    "set exceeds the window has no exact membership "
                    "probe; raise size or use a ranked/boolean organic")
        else:
            kind, payload = self._agg_route(query_text)
            matched = set()
            for part in self._fanout("ids_match", kind, payload,
                                     pin_alive):
                matched.update(part)
            extra = sum(1 for d in pin_alive if d not in matched)
        total = organic["total_hits"] + extra
        return {"query": query_text, "total_hits": total,
                "results": results[:size]}

    def search_sampler(self, query_text: str, shard_size: int,
                       agg_field: str, diversify_field: str | None = None,
                       max_docs_per_value: int = 1) -> dict:
        """ES ``sampler`` / ``diversified_sampler`` aggregation: a terms
        sub-aggregation over only the top ``shard_size`` best-scoring
        hits.  Single-shard ES semantics (the sample is the GLOBAL
        top-N in deterministic (-score, doc_id) order — per-shard
        sampling would make results depend on shard count, which the
        deterministic twin forbids).  ``diversify_field`` keeps at most
        ``max_docs_per_value`` docs per distinct value of that field,
        walking the ranked order and skipping over-quota docs exactly
        like DiversifiedTopDocsCollector; the walk pages with
        ``search_after`` so no more than one page beyond the quota fill
        is ever fetched.  Buckets: (-count, key) order."""
        if shard_size < 1:
            raise ValueError("shard_size must be >= 1")
        sample: list[int] = []
        if diversify_field is None:
            hits = self.search(query_text, size=shard_size)
            sample = [r["doc_id"] for r in hits["results"]]
        else:
            per_value: dict = {}
            after = None
            page = max(shard_size, 100)
            while len(sample) < shard_size:
                res = self.search(query_text, size=page,
                                  search_after=after)
                rows = res["results"]
                if not rows:
                    break
                ids = [r["doc_id"] for r in rows]
                dvs = self.lookup_docvalues(ids, [diversify_field])
                for r in rows:
                    key = dvs.get(r["doc_id"], {}).get(diversify_field)
                    if per_value.get(key, 0) >= max_docs_per_value:
                        continue
                    per_value[key] = per_value.get(key, 0) + 1
                    sample.append(r["doc_id"])
                    if len(sample) >= shard_size:
                        break
                after = (rows[-1]["score"], rows[-1]["doc_id"])
        if not sample:
            return {"query": query_text, "sample_count": 0, "buckets": []}
        dv = self.lookup_docvalues(sample, [agg_field])
        counts: dict = {}
        for d in sample:
            v = dv[d][agg_field]
            counts[v] = counts.get(v, 0) + 1
        buckets = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return {
            "query": query_text,
            "sample_count": len(sample),
            "buckets": [{"key": k, "doc_count": n} for k, n in buckets],
        }

    def search_facets(self, query_text: str, field: str,
                      size: int = 10) -> dict:
        """ES terms aggregation: per-value doc counts over the FULL hit set
        of ``query_text`` (boolean / wildcard / free-text match semantics),
        using the docmap facet columns (build-time doc-values;
        ``BuildConfig.facet_columns``).  Buckets sorted (count desc, value
        asc), ES bucket shape.

        High-cardinality fields (> ``facet_exact_max`` distinct values
        across shards, probed once per field) route to
        :meth:`search_facets_sharded` automatically — the exact path
        ships full per-shard value dicts, which is O(cardinality)
        actor->driver traffic and must not be the default at scale."""
        if self._facet_cardinality(field) > self.facet_exact_max:
            return self.search_facets_sharded(query_text, field, size)
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("facet_counts", kind, payload, field)
        merged: dict[str, int] = {}
        for p in parts:
            for v, n in p.items():
                merged[v] = merged.get(v, 0) + n
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        return {
            "query": query_text,
            "field": field,
            "buckets": [
                {"key": v, "doc_count": n} for v, n in buckets[:size]
            ],
        }

    def search_facets_partition(self, query_text: str | None, field: str,
                                partition: int, num_partitions: int,
                                size: int = 10) -> dict:
        """ES terms aggregation with ``include: {partition,
        num_partitions}``: page through a high-cardinality field's
        value space — each call sees ONLY values whose md5-derived
        bucket (first 8 hex digits mod ``num_partitions``, the same
        convention as the corpus hash_split so the DuckDB twin is
        exact) equals ``partition``.  Shards filter values before
        shipping; bucket order is the default (count desc, value
        asc)."""
        if not (0 <= partition < num_partitions):
            raise ValueError("partition must be in [0, num_partitions)")
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "facet_counts_partition", kind, payload, field,
            partition, num_partitions,
        )
        merged: dict[str, int] = {}
        for p in parts:
            for v, n in p.items():
                merged[v] = merged.get(v, 0) + n
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        return {
            "query": query_text,
            "field": field,
            "partition": partition,
            "num_partitions": num_partitions,
            "buckets": [
                {"key": v, "doc_count": n} for v, n in buckets[:size]
            ],
        }

    def search_facets_filtered(self, query_text: str | None, field: str,
                               include: str | None = None,
                               exclude: str | None = None,
                               min_doc_count: int = 1,
                               missing: str | None = None,
                               size: int = 10) -> dict:
        """ES terms aggregation with the value-filtering knobs:
        ``include``/``exclude`` anchored regexes over the value string
        (Lucene RegExp semantics — whole-value match, applied per
        distinct dictionary value BEFORE shards ship anything),
        ``min_doc_count`` (buckets under it are dropped after the
        exact cross-shard merge, so there's no shard-truncation
        undercount), and ``missing`` (docs without the field count
        under this key; ES substitutes the missing value BEFORE key
        filtering, so the substituted key passes include/exclude like
        any other value).  Bucket order (count desc, value asc)."""
        if min_doc_count < 0:
            raise ValueError("min_doc_count must be >= 0")
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "facet_counts_filtered", kind, payload, field,
            include, exclude, missing is not None,
        )
        merged: dict[str, int] = {}
        miss_total = 0
        for p, miss in parts:
            for v, n in p.items():
                merged[v] = merged.get(v, 0) + n
            miss_total += miss
        if missing is not None and miss_total > 0:
            # ES substitutes the missing value at the values-source
            # level, so the substituted key passes through
            # include/exclude like any other value
            ok = True
            if include is not None and not re.fullmatch(include,
                                                        missing):
                ok = False
            if exclude is not None and re.fullmatch(exclude, missing):
                ok = False
            if ok:
                merged[missing] = merged.get(missing, 0) + miss_total
        buckets = sorted(
            ((v, n) for v, n in merged.items() if n >= min_doc_count),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return {
            "query": query_text,
            "field": field,
            "buckets": [
                {"key": v, "doc_count": n} for v, n in buckets[:size]
            ],
        }

    def search_facet_stats(self, query_text: str, field: str,
                           metric_field: str, size: int = 10,
                           order: tuple[str, str] | None = None) -> dict:
        """ES terms aggregation with an ``avg`` sub-aggregation: per-value
        doc counts AND the average of an integer doc-value over each
        bucket's hit subset (``terms { aggs: { avg } }``).  Default ES
        bucket order (count desc, value asc); ``order`` selects the ES
        ``"order": {...}`` forms instead — ``("_count", dir)``,
        ``("_key", dir)`` or ``("avg", dir)`` (order by the sub-agg
        metric; buckets with no metric values sort last like ES treats
        missing).  This engine merges EXACT per-value partials before
        ordering, so sub-agg ordering has none of ES's shard_size
        truncation error."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("facet_stats", kind, payload, field,
                             metric_field)
        merged: dict[str, list] = {}
        for p in parts:
            for v, (n, mc, ms) in p.items():
                acc = merged.setdefault(v, [0, 0, 0])
                acc[0] += n
                acc[1] += mc
                acc[2] += ms
        if order is None:
            keyf = lambda kv: (-kv[1][0], kv[0])  # noqa: E731
        else:
            what, dirn = order
            if dirn not in ("asc", "desc"):
                raise ValueError(f"order direction {dirn!r}")
            sign = -1 if dirn == "desc" else 1
            if what == "_count":
                keyf = lambda kv: (sign * kv[1][0], kv[0])  # noqa: E731
            elif what == "_key":
                # lexicographic key order; desc via a sort-then-reverse
                # would break the doc-count tie rule, so invert per char
                buckets = sorted(merged.items(), key=lambda kv: kv[0],
                                 reverse=(dirn == "desc"))
                keyf = None
            elif what == "avg":
                missing = float("inf")  # ES: buckets w/o values sort last

                def keyf(kv):  # noqa: E306
                    n, mc, ms = kv[1]
                    a = (ms / mc) if mc else missing * (1 if sign > 0 else -1)
                    return (sign * a, kv[0])
            else:
                raise ValueError(f"unknown order target {what!r}")
        if keyf is not None:
            buckets = sorted(merged.items(), key=keyf)
        return {
            "query": query_text,
            "field": field,
            "buckets": [
                {
                    "key": v,
                    "doc_count": n,
                    "metric_count": mc,
                    "metric_sum": ms,
                    "avg": (ms / mc) if mc else None,
                }
                for v, (n, mc, ms) in buckets[:size]
            ],
        }

    def search_missing(self, query_text: str | None, field: str,
                       field_type: str = "int") -> dict:
        """ES ``missing`` aggregation: count of hit docs (match-all when
        ``query_text`` is None) with no value for ``field``.
        ``field_type``: 'int' for numeric doc-values, 'str' for
        dictionary-encoded string doc-values."""
        if field_type not in ("int", "str"):
            raise ValueError(f"field_type {field_type!r} not in (int, str)")
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "missing_count", kind, payload, field, field_type == "str"
        )
        return {"field": field, "doc_count": int(sum(parts))}

    def search_global(self, query_text: str | None, field: str) -> dict:
        """ES ``global`` aggregation: a bucket spanning ALL live docs of
        the index, ignoring the search query — paired, as in a real ES
        request body, with the same stats sub-aggregation in query scope
        so both contexts come back from one call.  Two stats fanouts
        (query route + match-all route), O(shards) traffic each, no
        per-doc shipping."""
        def fold(parts):
            n = sum(p["count"] for p in parts)
            s = sum(p["sum"] for p in parts)
            return {"count": int(n), "sum": int(s),
                    "avg": (s / n) if n else None}

        kind, payload = self._agg_route(query_text)
        scoped_parts, glob_parts = self._fanout_many(
            "stats_agg",
            [(kind, payload, field), ("all", None, field)],
        )
        return {"query": query_text, "field": field,
                "scoped": fold(scoped_parts), "global": fold(glob_parts)}

    def search_template(self, template: str, params: dict,
                        size: int = 10, from_: int = 0) -> dict:
        """ES ``search_template``: render a mustache template against
        ``params`` and run the result through the query router (match /
        boolean / phrase / wildcard / fuzzy — the same routing as
        ``search``).  The supported mustache subset is ``{{var}}``
        substitution with HTML-escape-free semantics (``{{var}}`` and
        ``{{{var}}}`` are identical here — query strings aren't HTML);
        a placeholder with no matching param raises, like ES's render
        API does for missing required params."""
        rendered = render_template(template, params)
        out = self.search(rendered, size=size, from_=from_)
        out["template"] = template
        return out

    def search_filters_agg(self, filters: dict[str, str],
                           other_bucket: bool = False,
                           other_bucket_key: str | None = None) -> dict:
        """ES ``filters`` aggregation: one named bucket per filter query
        (match / boolean / wildcard semantics), each with its exact live
        hit count — no scoring, no fetch.  Bucket order preserves the
        caller's dict order (ES keyed-filters behavior).
        ``other_bucket=True`` adds ES's other bucket: live docs matching
        NONE of the filters, under ``other_bucket_key`` (default
        ``_other_``; setting the key alone IMPLIES other_bucket, like
        ES) — counted shard-side from a mask union, one fanout for the
        whole aggregation.  A filter named like the other bucket's key
        is rejected rather than silently overwritten."""
        if other_bucket_key is not None:
            other_bucket = True  # ES: the key alone enables the bucket
        key = other_bucket_key or "_other_"
        if other_bucket and key in filters:
            raise ValueError(
                f"filter name {key!r} collides with other_bucket_key")
        if other_bucket:
            specs = [self._agg_route(q) for q in filters.values()]
            parts = self._fanout("filters_counts_other", specs)
            counts = [0] * len(specs)
            other = 0
            for cs, o in parts:
                other += int(o)
                for i, c in enumerate(cs):
                    counts[i] += int(c)
            buckets = {
                name: {"doc_count": counts[i]}
                for i, name in enumerate(filters)
            }
            buckets[key] = {"doc_count": other}
            return {"buckets": buckets}
        buckets = {}
        for name, q in filters.items():
            kind, payload = self._agg_route(q)
            parts = self._fanout("count", kind, payload)
            buckets[name] = {"doc_count": int(sum(parts))}
        return {"buckets": buckets}

    def search_facets_sharded(self, query_text: str | None, field: str,
                              size: int = 10,
                              shard_size: int | None = None) -> dict:
        """ES terms aggregation with ``shard_size`` semantics — the
        bounded-traffic path for high-cardinality fields: each shard ships
        only its local top ``shard_size`` buckets, so results can
        undercount (never overcount) and ES's error accounting applies:

        - bucket ``doc_count_error_upper_bound`` = sum of the cutoffs of
          the shards that did NOT report the term (the most it could have
          missed),
        - top-level ``doc_count_error_upper_bound`` = sum of all shard
          cutoffs (worst case for any unreturned term),
        - ``sum_other_doc_count`` = docs with a value minus the returned
          buckets' reported counts.

        ``shard_size`` defaults to ES's ``size * 1.5 + 10`` and, like ES,
        is silently raised to ``size`` when smaller (ES resets
        ``shard_size < size`` to ``size``; it can never be < 1).  With
        ``shard_size`` >= every shard's distinct-value count the result is
        exact and all error bounds are 0 (== ``search_facets``)."""
        if shard_size is None:
            shard_size = int(size * 1.5 + 10)
        shard_size = max(1, size, shard_size)
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "facet_counts_topn", kind, payload, field, shard_size
        )
        shard_maps = [dict(p[0]) for p in parts]
        cutoffs = [p[1] for p in parts]
        total_with_value = sum(p[2] for p in parts)
        merged: dict[str, int] = {}
        for m in shard_maps:
            for v, n in m.items():
                merged[v] = merged.get(v, 0) + n
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        out = []
        for v, n in buckets[:size]:
            err = sum(
                c for m, c in zip(shard_maps, cutoffs) if v not in m
            )
            out.append(
                {"key": v, "doc_count": n,
                 "doc_count_error_upper_bound": int(err)}
            )
        return {
            "query": query_text or "",
            "field": field,
            "doc_count_error_upper_bound": int(sum(cutoffs)),
            "sum_other_doc_count": int(
                total_with_value - sum(b["doc_count"] for b in out)
            ),
            "buckets": out,
        }

    def search_random_sampler(self, query_text: str | None,
                              probability: float, field: str,
                              seed: int = 42) -> dict:
        """ES ``random_sampler`` aggregation: a seeded deterministic
        sample of the hit set (inclusion keyed on md5 of the doc id, so
        the sample is stable across runs, shards and retries — never
        position- or RNG-state-dependent), with a sum sub-aggregation
        over ``field`` on the sampled docs and the 1/p-scaled estimate
        of the full hit count.  Traffic is two ints per shard."""
        if not (0.0 < probability <= 1.0):
            raise ValueError("probability must be in (0, 1]")
        p_micro = int(round(probability * 1_000_000))
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "random_sampler_agg", kind, payload, int(seed), p_micro, field
        )
        n = sum(p[0] for p in parts)
        tot = sum(p[1] for p in parts)
        return {
            "query": query_text or "",
            "probability": probability,
            "seed": int(seed),
            "doc_count": int(n),
            "estimated_total": int(
                math.floor(n * 1_000_000 / p_micro + 0.5)),
            f"sum_{field}": int(tot),
        }

    def search_composite(self, query_text: str | None,
                         sources: list[tuple], size: int = 10,
                         after: dict | None = None) -> dict:
        """ES ``composite`` aggregation: ALL distinct combinations of the
        source values, paginated in ascending composite-key order with an
        ``after_key`` cursor — ES's scale path for full-bucket enumeration
        (constant traffic per page: every shard ships at most ``size``
        combos past the cursor, never its full cardinality, and counts
        for returned buckets are exact — no shard_size error bounds).

        ``sources``: list of (name, stype, field[, interval]) with stype
        'terms' (string or integer doc-value) or 'histogram' (integer
        doc-value, fixed interval).  ``after``: the ``after_key`` dict of
        the previous page.  Docs missing any source value are skipped
        (ES ``missing_bucket=false`` default)."""
        if not sources:
            raise ValueError("composite needs at least one source")
        spec, names = [], []
        for s in sources:
            name, stype, field = s[0], s[1], s[2]
            names.append(name)
            if stype == "histogram":
                iv = int(s[3])
                if iv <= 0:
                    raise ValueError("histogram interval must be >= 1")
                spec.append(("histogram", field, iv))
            elif stype == "terms":
                spec.append((
                    "terms_num" if self._field_is_numeric(field)
                    else "terms", field, None))
            else:
                raise ValueError(f"unknown composite source type {stype!r}")
        kind, payload = self._agg_route(query_text)
        after_t = tuple(after[n] for n in names) if after else None
        parts = self._fanout(
            "composite_agg", kind, payload, tuple(spec), size, after_t
        )
        merged: dict[tuple, int] = {}
        for keys, counts in parts:
            for k, c in zip(keys, counts):
                kt = tuple(k)
                merged[kt] = merged.get(kt, 0) + int(c)
        items = sorted(merged.items())[:size]
        buckets = [
            {"key": dict(zip(names, k)), "doc_count": c} for k, c in items
        ]
        out: dict = {"query": query_text or "", "buckets": buckets}
        if buckets:
            out["after_key"] = dict(zip(names, items[-1][0]))
        return out

    def search_weighted_avg(self, query_text: str | None, field: str,
                            weight_field: str) -> dict:
        """ES ``weighted_avg`` aggregation: sum(v*w)/sum(w) over the hit
        set of ``query_text`` (match-all when None); docs missing either
        doc-value are skipped.  Partials are exact python ints, so the
        merge is exact at any scale; the final division is the only
        float."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "weighted_avg_agg", kind, payload, field, weight_field
        )
        num = sum(p[0] for p in parts)
        den = sum(p[1] for p in parts)
        cnt = sum(p[2] for p in parts)
        return {
            "field": field,
            "weight": weight_field,
            "doc_count": int(cnt),
            "value": (num / den) if den else None,
        }

    def search_rare_terms(self, query_text: str | None, field: str,
                          max_doc_count: int = 1) -> dict:
        """ES ``rare_terms`` aggregation: values of a categorical doc-value
        field whose GLOBAL doc count over the hit set is <= max_doc_count,
        buckets ordered (doc_count asc, key asc) — the long-tail
        complement of the terms agg.  Exact: per-shard counts merge by
        value BEFORE thresholding (a value rare on one shard but common
        globally is correctly dropped), bounded by field cardinality like
        the terms agg (ES itself uses a CuckooFilter sketch here at the
        same merge point).

        Above ``facet_exact_max`` distinct values the single-pass merge
        (O(cardinality) traffic) swaps for an exact TWO-PHASE protocol:
        shards first ship only their LOCALLY rare values (a value common
        on any shard can't be globally rare, so the prune is lossless),
        then the driver asks every shard for exact counts of just that
        candidate union — traffic O(locally-rare values), the quantity
        the query is about."""
        kind, payload = self._agg_route(query_text)
        if self._facet_cardinality(field) > self.facet_exact_max:
            cand_parts = self._fanout(
                "facet_counts_rare", kind, payload, field, max_doc_count
            )
            candidates = sorted({v for p in cand_parts for v in p})
            merged = {}
            if candidates:
                cnt_parts = self._fanout(
                    "facet_counts_for", kind, payload, field, candidates
                )
                for p in cnt_parts:
                    for v, n in zip(candidates, p):
                        merged[v] = merged.get(v, 0) + n
        else:
            parts = self._fanout("facet_counts", kind, payload, field)
            merged = {}
            for p in parts:
                for v, n in p.items():
                    merged[v] = merged.get(v, 0) + n
        buckets = sorted(
            ((v, n) for v, n in merged.items() if n <= max_doc_count),
            key=lambda kv: (kv[1], kv[0]),
        )
        return {
            "field": field,
            "buckets": [
                {"key": v, "doc_count": n} for v, n in buckets
            ],
        }

    def search_adjacency_matrix(self, filters: dict[str, str]) -> dict:
        """ES ``adjacency_matrix`` aggregation: one bucket per named filter
        and per filter pair (key ``"a&b"``, ES's default separator) with
        the exact live intersection count; empty buckets omitted (ES
        behavior).  Bucket order: singles in caller order, then pairs in
        caller-order pairs."""
        names = list(filters)
        compiled = [self._agg_route(q) for q in filters.values()]
        parts = self._fanout("adjacency_counts", compiled)
        singles = [0] * len(names)
        pairs: dict[tuple[int, int], int] = {}
        for s, pr in parts:
            for i, c in enumerate(s):
                singles[i] += c
            for i, j, c in pr:
                pairs[(i, j)] = pairs.get((i, j), 0) + c
        buckets = []
        for i, name in enumerate(names):
            if singles[i]:
                buckets.append({"key": name, "doc_count": int(singles[i])})
        for (i, j), c in sorted(pairs.items()):
            buckets.append(
                {"key": f"{names[i]}&{names[j]}", "doc_count": int(c)}
            )
        return {"buckets": buckets}

    def search_boosting(self, positive_query: str, negative_query: str,
                        negative_boost: float = 0.5,
                        size: int = 10) -> dict:
        """ES ``boosting`` query: docs are ranked by the positive match
        query's relevance, multiplied by ``negative_boost`` (< 1) where the
        negative query (match / boolean / wildcard semantics) also matches.
        Exhaustive per-shard TAAT (demotion can promote docs from
        arbitrarily deep in the positive ranking), bounded k-per-shard
        merge.  Reference semantics: the ES query DSL the north-star's
        datastore serves (ES 7.x ``boosting`` query)."""
        terms = self.normalizer.preprocess_query_list(positive_query)
        if not terms or self.doc_count == 0:
            return {"query": positive_query, "total_hits": 0, "results": []}
        idfs = self._idfs(terms)
        neg_kind, neg_payload = self._agg_route(negative_query)
        parts = self._fanout(
            "search_boosting", terms, idfs, neg_kind, neg_payload,
            float(negative_boost), size, self.scoring, self.k1, self.b,
            self.avgdl,
        )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        order = np.lexsort((ids, -scores))[:size]
        return {
            "query": positive_query,
            "total_hits": total,
            "results": [
                {"doc_id": int(ids[i]), "score": float(scores[i])}
                for i in order
            ],
        }

    def search_constant_score(self, filter_query: str, boost: float = 1.0,
                              size: int = 10) -> dict:
        """ES ``constant_score`` query: every doc matching the filter gets
        exactly ``boost`` as its score (no relevance computation, filter
        cache friendly).  Hits in doc-id order (the stable ES order for
        equal scores), exact total."""
        kind, payload = self._agg_route(filter_query)
        parts = self._fanout("constant_score_ids", kind, payload, size)
        ids = np.concatenate([p[0] for p in parts])  # actor order == doc order
        total = int(sum(p[1] for p in parts))
        return {
            "query": filter_query,
            "total_hits": total,
            "results": [
                {"doc_id": int(d), "score": float(boost)}
                for d in ids[:size].tolist()
            ],
        }

    def search_range_agg(self, query_text: str | None, field: str,
                         ranges: list[dict]) -> dict:
        """ES ``range`` aggregation: one bucket per caller-supplied
        ``{"from": lo, "to": hi}`` range (either edge optional; from
        inclusive, to exclusive; buckets may overlap — each doc is counted
        in every range it falls in) over the full hit set of
        ``query_text`` (match-all when None).  Exact counts, ES bucket
        keys (``"lo-hi"``, ``"*-hi"``, ``"lo-*"``)."""
        edges = [(r.get("from"), r.get("to")) for r in ranges]
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("range_agg", kind, payload, field, edges)
        counts = [sum(p[i] for p in parts) for i in range(len(edges))]
        buckets = []
        for (lo, hi), n in zip(edges, counts):
            key = (
                f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            )
            b: dict = {"key": key, "doc_count": int(n)}
            if lo is not None:
                b["from"] = lo
            if hi is not None:
                b["to"] = hi
            buckets.append(b)
        return {"field": field, "buckets": buckets}

    def search_stats(self, query_text: str, field: str) -> dict:
        """ES stats aggregation: exact count/sum/min/max/avg of an integer
        doc-value field over the full hit set of ``query_text``."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("stats_agg", kind, payload, field)
        n = sum(p["count"] for p in parts)
        s = sum(p["sum"] for p in parts)
        mns = [p["min"] for p in parts if p["min"] is not None]
        mxs = [p["max"] for p in parts if p["max"] is not None]
        return {
            "query": query_text,
            "field": field,
            "count": n,
            "sum": s,
            "min": min(mns) if mns else None,
            "max": max(mxs) if mxs else None,
            "avg": (s / n) if n else None,
        }

    def search_extended_stats(self, query_text: str, field: str) -> dict:
        """ES extended_stats: stats plus sum_of_squares, population
        variance and std deviation — exact integer n/sum/sum2 merged
        across shards, variance = (sum2 - sum*sum/n)/n in float64 (the
        deterministic, SQL-twinnable expression shape)."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("stats_agg", kind, payload, field)
        n = sum(p["count"] for p in parts)
        s = sum(p["sum"] for p in parts)
        s2 = sum(p["sum2"] for p in parts)
        mns = [p["min"] for p in parts if p["min"] is not None]
        mxs = [p["max"] for p in parts if p["max"] is not None]
        var = ((s2 - s * s / n) / n) if n else None
        import math as _math

        return {
            "query": query_text,
            "field": field,
            "count": n,
            "sum": s,
            "sum_of_squares": s2,
            "min": min(mns) if mns else None,
            "max": max(mxs) if mxs else None,
            "avg": (s / n) if n else None,
            "variance": var,
            "std_deviation": _math.sqrt(var) if var is not None else None,
        }

    def search_multi_terms(self, query_text: str | None,
                           fields: list[str], size: int = 10,
                           shard_size: int | None = None) -> dict:
        """ES ``multi_terms`` aggregation: doc counts per COMPOUND key
        (one value from each of ``fields``), buckets ordered
        (doc_count desc, key asc), docs missing any key field dropped.

        Routing mirrors the terms agg: when the compound-key cardinality
        bound (product of per-field distinct-value bounds, one int per
        shard) is <= ``facet_exact_max`` the shards ship exact full maps
        (lossless merge, all error bounds 0); above it each shard ships
        only its top ``shard_size`` buckets with ES's
        doc_count_error_upper_bound accounting — actor->driver traffic
        never exceeds O(shard_size) on high-cardinality key tuples."""
        numerics = [self._field_is_numeric(f) for f in fields]
        kind, payload = self._agg_route(query_text)
        card = sum(self._fanout("multi_terms_cardinality", fields, numerics))
        if card <= self.facet_exact_max:
            parts = self._fanout(
                "multi_terms_agg", kind, payload, fields, numerics, 0
            )
            merged: dict[tuple, int] = {}
            for p in parts:
                for k, n in p.items():
                    merged[k] = merged.get(k, 0) + n
            buckets = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
            out = [
                {"key": list(k), "doc_count": n,
                 "doc_count_error_upper_bound": 0}
                for k, n in buckets[:size]
            ]
            return {
                "query": query_text or "", "fields": list(fields),
                "doc_count_error_upper_bound": 0,
                "sum_other_doc_count": int(
                    sum(merged.values())
                    - sum(b["doc_count"] for b in out)
                ),
                "buckets": out,
            }
        if shard_size is None:
            shard_size = int(size * 1.5 + 10)
        shard_size = max(1, size, shard_size)
        parts = self._fanout(
            "multi_terms_agg", kind, payload, fields, numerics, shard_size
        )
        shard_maps = [dict(p[0]) for p in parts]
        cutoffs = [p[1] for p in parts]
        total_with_value = sum(p[2] for p in parts)
        merged = {}
        for m in shard_maps:
            for k, n in m.items():
                merged[k] = merged.get(k, 0) + n
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        out = []
        for k, n in buckets[:size]:
            err = sum(
                c for m, c in zip(shard_maps, cutoffs) if k not in m
            )
            out.append({"key": list(k), "doc_count": n,
                        "doc_count_error_upper_bound": int(err)})
        return {
            "query": query_text or "", "fields": list(fields),
            "doc_count_error_upper_bound": int(sum(cutoffs)),
            "sum_other_doc_count": int(
                total_with_value - sum(b["doc_count"] for b in out)
            ),
            "buckets": out,
        }

    def search_string_stats(self, query_text: str | None,
                            field: str) -> dict:
        """ES ``string_stats`` aggregation over a keyword doc-value field:
        count (docs with a value), min/max/avg length, and Shannon entropy
        (base 2) over the CHARACTER distribution of all values — computed
        EXACTLY from the merged per-value doc counts (the same lossless
        merge primitive as the terms agg: a value seen c times contributes
        c copies of each of its characters), with the summation in sorted
        character order for cross-run determinism."""
        merged = self._merged_value_counts(query_text, field)
        count = sum(merged.values())
        if not count:
            return {"query": query_text or "", "field": field, "count": 0,
                    "min_length": None, "max_length": None,
                    "avg_length": None, "entropy": 0.0}
        lens = {v: len(v) for v in merged}
        total_len = sum(lens[v] * c for v, c in merged.items())
        char_counts: dict[str, int] = {}
        for v, c in merged.items():
            for ch in v:
                char_counts[ch] = char_counts.get(ch, 0) + c
        total_chars = sum(char_counts.values())
        ent = 0.0
        for ch in sorted(char_counts):
            p = char_counts[ch] / total_chars
            ent -= p * math.log2(p)
        return {
            "query": query_text or "", "field": field, "count": count,
            "min_length": min(lens.values()),
            "max_length": max(lens.values()),
            "avg_length": total_len / count,
            "entropy": ent,
        }

    def search_boxplot(self, query_text: str | None, field: str) -> dict:
        """ES ``boxplot`` aggregation over an integer doc-value field:
        min, max and the three quartiles — EXACT (discrete nearest-rank,
        SQL ``percentile_disc``, same convention as ``search_percentiles``)
        rather than ES's t-digest approximation; the per-searcher
        value-count maps merge losslessly."""
        merged = self._merged_value_counts(query_text, field)
        vals = np.array(sorted(merged), dtype=np.int64)
        cum = np.cumsum([merged[int(v)] for v in vals], dtype=np.int64)
        n = int(cum[-1]) if vals.size else 0
        if not n:
            return {"query": query_text or "", "field": field, "count": 0,
                    "min": None, "max": None, "q1": None, "q2": None,
                    "q3": None}
        def q(p: float) -> int:
            rank = max(1, math.ceil(p * n))
            return int(vals[np.searchsorted(cum, rank)])
        return {
            "query": query_text or "", "field": field, "count": n,
            "min": int(vals[0]), "max": int(vals[-1]),
            "q1": q(0.25), "q2": q(0.50), "q3": q(0.75),
        }

    def search_matrix_stats(self, query_text: str | None, fx: str,
                            fy: str) -> dict:
        """ES ``matrix_stats`` aggregation for a pair of numeric doc-value
        fields: count, mean, population variance, skewness and kurtosis
        per field plus covariance and Pearson correlation — derived from
        EXACT integer moment sums (sum, sum^2..sum^4, cross sum) merged
        losslessly across shards, so the result is deterministic and
        SQL-twinnable (ES itself streams running moments per shard and
        combines them; same quantities, fixed expression shape).  Docs
        missing either field are dropped (ES pairwise semantics).
        Moments use population (n) normalization; kurtosis is raw
        (NOT excess — ES reports the same un-subtracted quantity)."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("moments2_agg", kind, payload, fx, fy)
        tot = {k: sum(p[k] for p in parts) for k in parts[0]}
        n = tot["n"]
        if not n:
            return {"query": query_text or "", "fields": [fx, fy],
                    "count": 0}
        out = {"query": query_text or "", "fields": [fx, fy], "count": n}
        for name, s1, s2, s3, s4 in (
            (fx, tot["sx"], tot["sx2"], tot["sx3"], tot["sx4"]),
            (fy, tot["sy"], tot["sy2"], tot["sy3"], tot["sy4"]),
        ):
            # explicit multiplication chains (no **) so the float
            # expression shape is reproducible bit-for-bit by the SQL twin
            mean = s1 / n
            m2 = s2 / n - mean * mean
            m3 = s3 / n - 3 * mean * (s2 / n) + 2 * (mean * mean * mean)
            m4 = (s4 / n - 4 * mean * (s3 / n)
                  + 6 * (mean * mean) * (s2 / n)
                  - 3 * ((mean * mean) * (mean * mean)))
            out[name] = {
                "mean": mean,
                "variance": m2,
                "skewness": (m3 / (m2 * math.sqrt(m2))) if m2 > 0 else 0.0,
                "kurtosis": (m4 / (m2 * m2)) if m2 > 0 else 0.0,
            }
        mx, my = tot["sx"] / n, tot["sy"] / n
        cov = tot["sxy"] / n - mx * my
        vx = tot["sx2"] / n - mx * mx
        vy = tot["sy2"] / n - my * my
        out["covariance"] = cov
        out["correlation"] = (
            cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
        )
        return out

    def search_mad(self, query_text: str | None, field: str) -> dict:
        """ES ``median_absolute_deviation`` aggregation over an integer
        doc-value field — EXACT (both medians by discrete nearest-rank,
        SQL ``percentile_disc(0.5)``, same convention as
        ``search_percentiles``) rather than ES's t-digest approximation:
        median of |v - median(v)| over the hit set, from the lossless
        per-searcher value-count merge."""
        merged = self._merged_value_counts(query_text, field)
        n = sum(merged.values())
        if not n:
            return {"query": query_text or "", "field": field,
                    "count": 0, "median": None, "mad": None}
        def disc_median(counts: dict) -> int:
            vals = sorted(counts)
            rank = max(1, math.ceil(0.5 * n))
            cum = 0
            for v in vals:
                cum += counts[v]
                if cum >= rank:
                    return v
            return vals[-1]
        med = disc_median(merged)
        dev: dict[int, int] = {}
        for v, c in merged.items():
            d = abs(int(v) - med)
            dev[d] = dev.get(d, 0) + c
        return {"query": query_text or "", "field": field, "count": n,
                "median": med, "mad": disc_median(dev)}

    def search_t_test(self, query_a: str | None, query_b: str | None,
                      field: str) -> dict:
        """ES ``t_test`` aggregation (heteroscedastic / Welch, the ES
        default) between two queries' hit sets over an integer doc-value
        field.  The t statistic and Welch-Satterthwaite df derive from
        exact integer (n, sum, sum^2) merges with SAMPLE (n-1) variances
        — SQL-twinnable; the two-sided p-value additionally ships via the
        regularized incomplete beta I_{df/(df+t^2)}(df/2, 1/2) (standard
        continued-fraction evaluation — public Lentz/Numerical-Recipes
        form), which SQL lacks, so gate entries pin t and df exactly and
        the p-value is pinned by pytest against textbook critical
        values."""
        def moments(q):
            kind, payload = self._agg_route(q)
            parts = self._fanout("stats_agg", kind, payload, field)
            n = sum(p["count"] for p in parts)
            s = sum(p["sum"] for p in parts)
            s2 = sum(p["sum2"] for p in parts)
            return n, s, s2
        na, sa, sa2 = moments(query_a)
        nb, sb, sb2 = moments(query_b)
        if na < 2 or nb < 2:
            return {"query_a": query_a or "", "query_b": query_b or "",
                    "field": field, "n_a": na, "n_b": nb, "t": None,
                    "df": None, "p_value": None}
        ma, mb = sa / na, sb / nb
        va = (sa2 - sa * sa / na) / (na - 1)
        vb = (sb2 - sb * sb / nb) / (nb - 1)
        se2 = va / na + vb / nb
        if se2 <= 0:
            return {"query_a": query_a or "", "query_b": query_b or "",
                    "field": field, "n_a": na, "n_b": nb, "t": None,
                    "df": None, "p_value": None}
        t = (ma - mb) / math.sqrt(se2)
        df = (se2 * se2) / (
            (va / na) * (va / na) / (na - 1)
            + (vb / nb) * (vb / nb) / (nb - 1)
        )
        p = _t_sf_two_sided(t, df)
        return {"query_a": query_a or "", "query_b": query_b or "",
                "field": field, "n_a": na, "n_b": nb, "t": t, "df": df,
                "p_value": p}

    def search_top_metrics(self, query_text: str | None, sort_field: str,
                           metric_fields: list[str], size: int = 1,
                           asc: bool = False) -> dict:
        """ES ``top_metrics`` aggregation: the metric doc-values of the
        hit set's top ``size`` docs by ``sort_field`` (desc by default).
        Each shard ships only its local top ``size`` rows (sort value,
        doc_id tie-break asc, metrics) — O(size) traffic; missing metric
        values come back null (ES semantics)."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "top_metrics_agg", kind, payload, sort_field, bool(asc),
            list(metric_fields), size,
        )
        rows = [r for p in parts for r in p]
        rows.sort(key=lambda r: ((r[0] if asc else -r[0]), r[1]))
        sentinel = np.iinfo(np.int64).min
        top = [
            {
                "sort": r[0],
                "doc_id": r[1],
                "metrics": {
                    f: (None if v == sentinel else v)
                    for f, v in zip(metric_fields, r[2])
                },
            }
            for r in rows[:size]
        ]
        return {"query": query_text or "", "sort_field": sort_field,
                "top": top}

    def search_histogram(self, query_text: str, field: str, interval: int,
                         min_doc_count: int = 1,
                         extended_bounds: tuple[int, int] | None = None,
                         hard_bounds: tuple[int, int] | None = None,
                         ) -> dict:
        """ES histogram aggregation: fixed-interval buckets
        (key = floor(v / interval) * interval) with exact doc counts over
        the full hit set; ``min_doc_count=0`` fills empty buckets between
        the min and max populated keys (ES default shape).
        ``hard_bounds=(lo, hi)`` drops buckets whose KEY falls outside
        the raw bounds (ES compares the key itself, so a bucket
        starting below lo never survives); ``extended_bounds=(lo, hi)``
        (ES: meaningful with min_doc_count=0) widens the zero-filled
        range to cover the bounds even when no docs land there — but
        never past hard_bounds."""
        if interval <= 0:
            raise ValueError("interval must be > 0")
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("histogram_agg", kind, payload, field, interval)
        merged: dict[int, int] = {}
        for p in parts:
            for k_, n in p.items():
                merged[k_] = merged.get(k_, 0) + n
        if hard_bounds is not None:
            # ES compares the bucket KEY against the RAW bounds — a
            # bucket whose key falls below min survives in no case
            merged = {k_: v for k_, v in merged.items()
                      if hard_bounds[0] <= k_ <= hard_bounds[1]}
        if min_doc_count == 0:
            lo_k = min(merged) if merged else None
            hi_k = max(merged) if merged else None
            if extended_bounds is not None:
                # ES floors BOTH bounds to their containing bucket key
                # (the bucket holding the min bound is zero-filled too)
                elo = (extended_bounds[0] // interval) * interval
                ehi = (extended_bounds[1] // interval) * interval
                lo_k = elo if lo_k is None else min(lo_k, elo)
                hi_k = ehi if hi_k is None else max(hi_k, ehi)
            if lo_k is not None:
                for k_ in range(lo_k, hi_k + interval, interval):
                    # the zero-fill never resurrects keys hard_bounds
                    # excluded
                    if hard_bounds is not None and not (
                        hard_bounds[0] <= k_ <= hard_bounds[1]
                    ):
                        continue
                    merged.setdefault(k_, 0)
        buckets = [
            {"key": k_, "doc_count": merged[k_]}
            for k_ in sorted(merged)
            if merged[k_] >= min_doc_count or min_doc_count == 0
        ]
        return {"query": query_text, "field": field, "interval": interval,
                "buckets": buckets}

    def search_variable_width_histogram(
        self, query_text: str | None, field: str, buckets: int = 5,
    ) -> dict:
        """ES ``variable_width_histogram``, deterministic variant: at
        most ``buckets`` clusters of the hit set's integer doc-values,
        split at the ``buckets - 1`` LARGEST gaps between consecutive
        distinct values (ties broken toward the smaller left value) —
        the classic exact 1-D clustering, replacing ES's
        streaming-order-dependent nearest-cluster heuristic with a
        documented engine-independent rule.  Each bucket reports
        ES's shape: min, max, the doc count, and key = the bucket mean
        in floor'd micro-units.  Built on the same per-searcher
        value-count maps as the exact percentiles path (O(distinct
        values) traffic; the sketch route is the answer past that, as
        with percentiles_approx)."""
        if buckets < 1:
            raise ValueError("buckets must be >= 1")
        merged = self._merged_value_counts(query_text, field)
        vals = np.array(sorted(merged), dtype=np.int64)
        out = {"query": query_text, "field": field, "buckets": []}
        if not vals.size:
            return out
        cnts = np.array([merged[int(v)] for v in vals], dtype=np.int64)
        if vals.size > 1 and buckets > 1:
            gaps = vals[1:] - vals[:-1]
            nb = min(buckets - 1, gaps.size)
            # largest gaps, ties to the leftmost (smaller left value)
            cut = np.sort(np.lexsort((np.arange(gaps.size), -gaps))[:nb])
        else:
            cut = np.array([], dtype=np.int64)
        starts = np.concatenate([[0], cut + 1])
        ends = np.concatenate([cut + 1, [vals.size]])
        for s, e in zip(starts, ends):
            n = int(cnts[s:e].sum())
            mean_u = math.floor(
                int((vals[s:e] * cnts[s:e]).sum()) * 1_000_000.0 / n
            )
            out["buckets"].append({
                "min": int(vals[s]),
                "max": int(vals[e - 1]),
                "doc_count": n,
                "key_u": mean_u,
            })
        return out

    def _merged_value_counts(self, query_text: str, field: str):
        numeric = self._field_is_numeric(field)
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("value_counts_agg", kind, payload, field, numeric)
        merged: dict = {}
        for p in parts:
            for v, n in p.items():
                merged[v] = merged.get(v, 0) + n
        return merged

    def search_percentiles(
        self, query_text: str, field: str,
        percents: tuple = (25.0, 50.0, 75.0, 95.0, 99.0),
    ) -> dict:
        """ES percentiles aggregation over an integer doc-value field —
        EXACT (discrete nearest-rank, the value at cumulative rank
        ``ceil(p/100 * n)``, i.e. SQL ``percentile_disc``), not ES's
        t-digest approximation: per-searcher value-count maps merge
        losslessly, so exactness costs one small map per searcher."""
        merged = self._merged_value_counts(query_text, field)
        vals = np.array(sorted(merged), dtype=np.int64)
        cum = np.cumsum([merged[int(v)] for v in vals], dtype=np.int64)
        n = int(cum[-1]) if vals.size else 0
        out: dict[str, int | None] = {}
        for p in percents:
            if n == 0:
                out[f"p{p:g}"] = None
                continue
            rank = max(1, math.ceil(p / 100.0 * n))
            out[f"p{p:g}"] = int(vals[np.searchsorted(cum, rank)])
        return {"query": query_text, "field": field, "count": n,
                "values": out}

    def search_percentile_ranks(self, query_text: str, field: str,
                                values: tuple = ()) -> dict:
        """ES ``percentile_ranks`` aggregation (the inverse of
        percentiles): for each given value, the percent of field values
        <= it over the hit set.  EXACT (``100 * count(x <= v) / n``,
        the empirical CDF) rather than ES's t-digest interpolation —
        same exactness trade as ``search_percentiles``, and identical
        to the SQL twin ``100.0 * sum(x <= v) / count(*)``."""
        merged = self._merged_value_counts(query_text, field)
        vals = np.array(sorted(merged), dtype=np.int64)
        cum = np.cumsum([merged[int(v)] for v in vals], dtype=np.int64)
        n = int(cum[-1]) if vals.size else 0
        out: dict[str, float | None] = {}
        for v in values:
            if n == 0:
                out[f"{v:g}"] = None
                continue
            idx = np.searchsorted(vals, v, side="right")
            le = int(cum[idx - 1]) if idx > 0 else 0
            out[f"{v:g}"] = 100.0 * le / n
        return {"query": query_text, "field": field, "count": n,
                "values": out}

    def search_cardinality(self, query_text: str, field: str) -> dict:
        """ES cardinality aggregation — EXACT distinct count of the
        doc-value field over the full hit set (ES uses HyperLogLog++; the
        exact per-searcher value sets merge losslessly at doc-value
        cardinalities; a 100 TB unbounded field would swap an HLL sketch
        into the same merge)."""
        merged = self._merged_value_counts(query_text, field)
        return {"query": query_text, "field": field,
                "cardinality": len(merged)}

    def _docmap_schema(self):
        """Docmap schema, resolved once per engine: columns are fixed at
        build time (refresh/extend add ROWS, never columns), so the
        directory listing + parquet footer parse need not repeat on
        every sort/agg/lookup call."""
        sch = getattr(self, "_docmap_schema_c", None)
        if sch is None:
            import pyarrow.dataset as pads

            sch = pads.dataset(
                os.path.join(self.index_dir, "docmap"), format="parquet"
            ).schema
            self._docmap_schema_c = sch
        return sch

    def _field_is_numeric(self, field: str) -> bool:
        import pyarrow.types as pat

        ftype = self._docmap_schema().field(field).type
        return not (pat.is_string(ftype) or pat.is_large_string(ftype))

    def search_cardinality_approx(self, query_text: str, field: str) -> dict:
        """ES-faithful cardinality: HyperLogLog (ES uses HLL++) — each
        searcher ships a fixed 16 KB register array instead of its exact
        value set, so the merge cost is independent of field cardinality
        (the opt-in path for unbounded fields; standard error ~0.8%).
        Deterministic: the value hash is seedless splitmix64/blake2b."""
        from functools import reduce

        from ..functions.sketches import hll_estimate, hll_merge

        kind, payload = self._agg_route(query_text)
        parts = self._fanout(
            "hll_agg", kind, payload, field, self._field_is_numeric(field)
        )
        regs = reduce(hll_merge, parts)
        return {
            "query": query_text,
            "field": field,
            "cardinality": int(round(hll_estimate(regs))),
        }

    def search_percentiles_approx(
        self, query_text: str, field: str,
        percents: tuple = (25.0, 50.0, 75.0, 95.0, 99.0),
        k: int = 4096,
    ) -> dict:
        """ES-faithful percentiles: centroid digest (ES uses t-digest) —
        each searcher ships <= k (mean, weight) centroids instead of its
        exact value-count map, so rank error is bounded by ~n/k while the
        merge cost is independent of field cardinality (the opt-in path
        for unbounded fields).  Same result shape as the exact
        ``search_percentiles`` with float values."""
        from ..functions.sketches import centroid_percentile, centroids_merge

        kind, payload = self._agg_route(query_text)
        parts = self._fanout("centroid_agg", kind, payload, field, k)
        vals, wts = centroids_merge(list(parts), k)
        n = int(wts.sum()) if wts.size else 0
        out: dict[str, float | None] = {}
        for p in percents:
            out[f"p{p:g}"] = (
                centroid_percentile(vals, wts, p) if n else None
            )
        return {"query": query_text, "field": field, "count": n,
                "values": out}

    def search_range(self, query_text: str | None, field: str,
                     gte: int | None = None, lte: int | None = None,
                     size: int = 10) -> dict:
        """ES range query: docs whose integer doc-value ``field`` lies in
        [gte, lte] (inclusive, either bound optional), optionally
        intersected with the full hit set of ``query_text`` (match /
        boolean / wildcard semantics; None or blank = match_all).  Results
        doc_id-ascending with exact totals (ES filter-context shape:
        unscored)."""
        if query_text and query_text.strip():
            kind, payload = self._agg_route(query_text)
        else:
            kind, payload = "all", None
        parts = self._fanout("search_range", kind, payload, field, gte, lte,
                             size)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text or "",
            "field": field,
            "gte": gte,
            "lte": lte,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0} for d in ids[:size]],
        }

    def rank_eval(self, requests: list[dict], metric: str = "precision",
                  k: int = 10) -> dict:
        """ES ``_rank_eval`` API: run each request's query, score the
        ranked top-k against its rated relevant ids with the chosen
        metric, and return per-request details plus the mean
        (ES ``metric_score``).  ``requests`` is
        ``[{"id": name, "query": q, "relevant": [doc_id, ...]}]``
        (``id`` optional, defaults to the query string); ``metric`` is
        one of precision / recall / mrr / map / ndcg — the formulas in
        ``elasticsearch_ray.metrics``, including the reference's
        P@k retrieved-size quirk (`plot_d_functional_metrics.py:86-87`).
        Driver cost is one bounded top-k search per request."""
        from .. import metrics as M

        fns = {
            "precision": lambda r, rel: M.precision(r, rel, k),
            "recall": lambda r, rel: M.recall(r, rel, k),
            "mrr": lambda r, rel: M.reciprocal_rank(r[:k], rel),
            "map": lambda r, rel: M.average_precision(r[:k], rel),
            "ndcg": lambda r, rel: M.ndcg(r, rel, k),
        }
        if metric not in fns:
            raise ValueError(
                f"rank_eval metric {metric!r} not in {sorted(fns)}")
        details = {}
        total = 0.0
        for req in requests:
            name = req.get("id") or req["query"]
            if name in details:
                raise ValueError(
                    f"rank_eval request id {name!r} is not unique — give "
                    "duplicate queries distinct 'id's (ES keys details "
                    "by unique request id)")
            res = self.search(req["query"], size=k)
            hits = [r["doc_id"] for r in res["results"]]
            score = fns[metric](hits, list(req["relevant"]))
            details[name] = {"score": score, "hits": hits}
            total += score
        return {
            "metric": metric,
            "metric_score": (total / len(requests)) if requests else 0.0,
            "details": details,
        }

    def search_ids(self, doc_ids: list[int], size: int = 10) -> dict:
        """ES ``ids`` query: filter-context match of explicit ``_id``
        values — the live subset of ``doc_ids``, doc_id ascending,
        exact totals.  One row-group-pruned docmap predicate read (the
        _mget path), never a corpus fanout."""
        want = sorted({int(d) for d in doc_ids})
        found = sorted(
            d["doc_id"] for d in self.mget(want) if d["found"]
        )
        return {
            "query": f"ids({len(want)})",
            "total_hits": len(found),
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in found[:size]],
        }

    def search_terms_lookup(self, lookup_id: int, path: str,
                            size: int = 10) -> dict:
        """ES ``terms`` query with terms lookup: the value set comes
        from another document's field (ES ``index``/``id``/``path`` —
        same index here), then a filter-context terms match on the
        string doc-value ``path``.  Like ES, looked-up values are NOT
        analyzed.  One docmap point-read for the lookup doc + one
        fanout; traffic O(values + size) per shard."""
        label = f"terms_lookup(id={lookup_id}, path={path})"
        if self.tombstones and int(lookup_id) in self.tombstones:
            return {"query": label, "total_hits": 0, "results": []}
        import pyarrow.dataset as pads

        dset = pads.dataset(
            os.path.join(self.index_dir, "docmap"), format="parquet"
        )
        if path not in dset.schema.names:
            raise ValueError(
                f"terms lookup path {path!r} is not a doc-value column")
        t = dset.to_table(
            columns=[path],
            filter=pads.field("doc_id") == int(lookup_id),
        )
        vals = sorted({v for v in t.column(path).to_pylist()
                       if v is not None})
        if not vals:
            return {"query": label, "total_hits": 0, "results": []}
        parts = self._fanout("terms_docvalue_ids", path, vals, size)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": label,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[:size]],
        }

    def explain(self, query_text: str, doc_id: int) -> dict:
        """ES _explain API: the per-term BM25/TF-IDF score breakdown of one
        doc for a ranked query — (term, tf, df, idf, contribution) rows
        plus the total, reproducing ``stages/scoring.py`` exactly
        (repeated query terms contribute once per repetition, idf-0 terms
        contribute nothing).  One targeted shard probe, never a search."""
        terms = self.normalizer.preprocess_query_list(query_text)
        out = {"query": query_text, "doc_id": doc_id, "matched": False,
               "details": [], "score": 0.0}
        if not terms or self.doc_count == 0:
            return out
        dfs = self._global_dfs(sorted(set(terms)))
        idfs = self._idfs(terms)
        vec = next(
            (v for v in self._fanout("doc_termvec", terms, doc_id)
             if v is not None),
            None,
        )
        if vec is None:
            return out
        dl = vec["dl"]
        total = 0.0
        for t in dict.fromkeys(terms):
            tf = vec["tfs"].get(t, 0)
            idf = idfs.get(t, 0.0)
            if tf == 0 or idf == 0.0 or dl == 0:
                continue
            reps = terms.count(t)
            if self.scoring == "bm25":
                one = idf * (
                    tf * (self.k1 + 1)
                ) / (tf + self.k1 * (1 - self.b + self.b * dl / self.avgdl))
            else:  # tfidf — reference formula (selfindex_q_taat.py)
                one = (tf / dl) * idf
            contrib = one * reps
            total += contrib
            out["details"].append(
                {"term": t, "tf": tf, "df": dfs[t], "idf": idf,
                 "reps": reps, "score": contrib}
            )
        out["matched"] = bool(out["details"])
        out["score"] = total
        return out

    def analyze(self, text: str) -> dict:
        """ES _analyze API: run the index's analyzer over arbitrary text,
        returning the token stream with positions (the exact stream the
        index stores — stems under 'reference', raw lowercase words under
        'plain')."""
        toks = self.normalizer.tokenize(text or "")
        return {
            "tokens": [
                {"token": t, "position": i} for i, t in enumerate(toks)
            ]
        }

    def term_vectors(self, doc_id: int) -> dict:
        """ES _termvectors API: every analyzed term of one doc with its tf
        and global df (term_statistics=true).  Re-analyzes the stored
        ``_source`` (requires ``store_source=True``) — one bounded docmap
        read + one df lookup round, never a postings scan."""
        from collections import Counter

        doc = self.get_doc(doc_id)
        if doc is None or not doc.get("source"):
            return {"doc_id": doc_id, "found": False, "terms": {}}
        tf = Counter(self.normalizer.tokenize(doc["source"]))
        dfs = self._global_dfs(sorted(tf))
        return {
            "doc_id": doc_id,
            "found": True,
            "terms": {
                t: {"term_freq": int(f), "doc_freq": int(dfs[t])}
                for t, f in sorted(tf.items())
            },
        }

    def exists(self, field: str, size: int = 10) -> dict:
        """ES exists query: live docs that HAVE a value for a doc-value
        field (docmap gaps — e.g. lang-filtered rows — don't).  Filter-
        context shape: doc_id ascending, unscored, exact totals."""
        parts = self._fanout("exists_ids", field, size)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": f"exists:{field}",
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[:size]],
        }

    def more_like_this(self, doc_id: int, max_query_terms: int = 10,
                       size: int = 10, mode: str | None = None) -> dict:
        """ES more_like_this: select the seed doc's most interesting terms
        by tf*idf (deterministic (-tf*idf, term) tie-break, idf-0 terms
        excluded — same convention as scoring), then run them as a ranked
        should-query.  Requires ``store_source=True`` at build time; the
        seed doc itself is not excluded from the results (ES behavior —
        it typically ranks first).  Driver cost is one stored-source read
        + one ranked query; never touches the corpus."""
        from collections import Counter

        label = f"mlt:{doc_id}"
        doc = self.get_doc(doc_id)
        if doc is None or not doc.get("source"):
            return {"query": label, "total_hits": 0, "results": []}
        tf = Counter(self.normalizer.tokenize(doc["source"]))
        idfs = self._idfs(sorted(tf))
        cand = [
            (t, tf[t] * idfs[t]) for t in tf if idfs[t] != 0.0
        ]
        cand.sort(key=lambda kv: (-kv[1], kv[0]))
        terms = [t for t, _ in cand[:max_query_terms]]
        return self._ranked_terms(terms, label, size, mode or self.mode)

    def regexp(self, pattern: str, size: int = 10,
               max_expansions: int | None = None, from_: int = 0) -> dict:
        """ES regexp query: docs containing any dictionary term that FULLY
        matches the RE2 ``pattern`` (Lucene regexps are anchored).  The
        pattern is lowercased but NOT analyzed (same convention as the
        wildcard and fuzzy surfaces); filter-context result shape
        (doc_id ascending, unscored, exact totals)."""
        pattern = pattern.lower()
        fetch = from_ + size
        parts = self._fanout("search_regexp", pattern, fetch, max_expansions)
        ids = np.concatenate([p[0] for p in parts])  # actor order == doc order
        total = int(sum(p[1] for p in parts))
        return {
            "query": pattern,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def attach_embeddings(self, path: str, id_col: str = "vec_id",
                          col: str = "embedding") -> None:
        """Point the engine at a doc-aligned embeddings parquet (ids must
        match this index's doc_ids) — enables ``knn`` / ``rrf_hybrid``.
        Shards lazily load + cache only their doc range."""
        self._emb = (path, id_col, col)

    def knn(self, query_vec, k: int = 10,
            filter_query: str | None = None) -> dict:
        """ES knn search (exact): cosine top-k over the attached
        doc-aligned embeddings — one matvec per shard, shard top-k, driver
        merges shards*k rows with the (-cos, doc_id) tie-break.
        ``filter_query`` (match / boolean / wildcard string) applies
        ES's knn ``filter``: candidates are PRE-filtered to its hit set
        before ranking."""
        if not getattr(self, "_emb", None):
            raise ValueError("attach_embeddings(path) first")
        path, id_col, col = self._emb
        kind = payload = None
        if filter_query is not None:
            kind, payload = self._agg_route(filter_query)
        parts = self._fanout(
            "knn_local", path, id_col, col,
            [float(x) for x in query_vec], k, kind, payload,
        )
        ids = np.concatenate([p[0] for p in parts])
        cos = np.concatenate([p[1] for p in parts])
        order = np.lexsort((ids, -cos))[:k]
        return {
            "k": k,
            "results": [
                {"doc_id": int(ids[i]), "cos": float(cos[i])} for i in order
            ],
        }

    def rrf_hybrid(self, query_text: str, query_vec, size: int = 10,
                   window: int = 50, rank_k: int = 60) -> dict:
        """Hybrid lexical+vector retrieval with reciprocal rank fusion
        (the ES `rrf` retriever): rrf(doc) = sum over retrievers of
        1/(rank_k + rank) across the BM25 top-``window`` and the kNN
        top-``window``; ties (-rrf, doc_id).  Rank-based, so no score
        normalization is needed; driver work is O(window)."""
        lex = self.search(query_text, size=window)["results"]
        vec = self.knn(query_vec, k=window)["results"]
        rrf: dict[int, float] = {}
        for results in (lex, vec):
            for rank, r in enumerate(results, 1):
                d = r["doc_id"]
                rrf[d] = rrf.get(d, 0.0) + 1.0 / (rank_k + rank)
        top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
        return {
            "query": query_text,
            "results": [
                {"doc_id": d, "rrf": s} for d, s in top
            ],
        }

    def search_sort(self, query_text: str | None, field: str,
                    order: str = "desc", size: int = 10,
                    from_: int = 0, search_after=None) -> dict:
        """ES sort: the hit set of ``query_text`` (match / boolean /
        wildcard; None or blank = match_all) ordered by an integer or
        string doc-value ``field`` with the deterministic (value, doc_id
        asc) tie-break, instead of _score.  Each shard returns its local
        top from_+size rows; the driver merge touches
        shards*(from_+size) rows, never the corpus.

        ``search_after=(value, doc_id)`` — the cursor from the last row
        of the previous page — paginates arbitrarily deep at constant
        per-shard cost (rows strictly after the cursor are masked BEFORE
        the local top-k).  ES forbids combining it with ``from``."""
        import pyarrow.types as patypes

        if search_after is not None and from_:
            raise ValueError("search_after cannot be combined with from_")
        kind, payload = self._agg_route(query_text)
        numeric = patypes.is_integer(
            self._docmap_schema().field(field).type
        )
        desc = order == "desc"
        fetch = from_ + size
        parts = self._fanout("search_sort", kind, payload, field, desc,
                             fetch, numeric, search_after)
        rows = [
            (v, int(d))
            for p in parts
            for d, v in zip(p[0].tolist(), p[1])
        ]
        total = int(sum(p[2] for p in parts))
        # stable two-pass: doc_id asc tie-break under either value order
        rows.sort(key=lambda t: t[1])
        rows.sort(key=lambda t: t[0], reverse=desc)
        return {
            "query": query_text or "",
            "field": field,
            "order": order,
            "total_hits": total,
            "results": [
                {"doc_id": d, "sort": [v]} for v, d in rows[from_:fetch]
            ],
        }

    def rescore(self, query_text: str, rescore_query: str,
                size: int = 10, window_size: int = 50,
                query_weight: float = 1.0,
                rescore_weight: float = 1.0) -> dict:
        """ES rescore: re-rank the top ``window_size`` hits of the base
        query by ``query_weight * base + rescore_weight * rescore_score``
        (docs outside the rescore query's hit set contribute 0); hits
        below the window keep base order (ES semantics — only the window
        reorders).  Cost: the base search + ONE bounded scores_for round
        over the window ids."""
        base = self.search(query_text, size=window_size)
        window = base["results"]
        if window:
            terms = self.normalizer.preprocess_query_list(rescore_query)
            s2: dict[int, float] = {}
            if terms:
                idfs = self._idfs(terms)
                for part in self._fanout(
                    "scores_for", terms, idfs,
                    [r["doc_id"] for r in window], self.scoring,
                    self.k1, self.b, self.avgdl,
                ):
                    s2.update(part)
            rers = sorted(
                (
                    (-(query_weight * r["score"]
                       + rescore_weight * s2.get(r["doc_id"], 0.0)),
                     r["doc_id"])
                    for r in window
                ),
            )
            window = [
                {"doc_id": d, "score": -negs} for negs, d in rers
            ]
        return {
            "query": query_text,
            "rescore_query": rescore_query,
            "total_hits": base["total_hits"],
            "results": window[:size],
        }

    def search_function_score(self, query_text: str, field: str,
                              modifier: str = "ln1p",
                              size: int = 10) -> dict:
        """ES function_score with field_value_factor: BM25/TF-IDF relevance
        multiplied by ``modifier`` of an integer doc-value (``ln1p`` |
        ``ln`` | ``sqrt`` | ``none``), re-ranked by the boosted score with
        the (-score, doc_id) tie-break.  Shards return local top-k of the
        boosted order; the driver merge is bounded by shards*size."""
        terms = self.normalizer.preprocess_query_list(query_text)
        if not terms or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        idfs = self._idfs(terms)
        parts = self._fanout(
            "search_boosted", terms, idfs, field, modifier, size,
            self.scoring, self.k1, self.b, self.avgdl,
        )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        order = np.lexsort((ids, -scores))[:size]
        return {
            "query": query_text,
            "total_hits": total,
            "results": [
                {"doc_id": int(ids[i]), "score": float(scores[i])}
                for i in order
            ],
        }

    def search_rank_feature(self, query_text: str, field: str,
                            func: str = "saturation",
                            params: tuple = (), boost: float = 1.0,
                            size: int = 10) -> dict:
        """ES ``rank_feature`` (and ``distance_feature``) queries inside a
        bool-should: BM25/TF-IDF relevance of ``query_text`` PLUS
        ``boost * S(doc-value)`` — ``func``: ``saturation`` (params:
        pivot), ``log`` (scaling_factor), ``sigmoid`` (pivot, exponent),
        ``distance`` (pivot, origin).  The pivot must be explicit (ES
        defaults saturation's pivot to an index statistic; we pin it for
        determinism).  Re-ranked with the (-score, doc_id) tie-break;
        shards ship local top-k of the combined order."""
        terms = self.normalizer.preprocess_query_list(query_text)
        if not terms or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        if not params:
            raise ValueError(
                "rank_feature needs explicit function params "
                "(saturation: (pivot,), log: (scaling,), "
                "sigmoid: (pivot, exponent), distance: (pivot, origin))"
            )
        idfs = self._idfs(terms)
        parts = self._fanout(
            "search_rank_feature", terms, idfs, field, func,
            tuple(params), float(boost), size, self.scoring, self.k1,
            self.b, self.avgdl,
        )
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        total = int(sum(p[2] for p in parts))
        order = np.lexsort((ids, -scores))[:size]
        return {
            "query": query_text,
            "total_hits": total,
            "results": [
                {"doc_id": int(ids[i]), "score": float(scores[i])}
                for i in order
            ],
        }

    def search_collapse(self, query_text: str, field: str,
                        size: int = 10) -> dict:
        """ES field collapse (collapse.field): ranked results keep only
        the single best-scoring doc per value of a categorical doc-value
        field, groups ordered by their winner's (-score, doc_id).  Shards
        return one winner per touched group (bounded by the field's value
        cardinality); the driver reduce is over groups, not docs."""
        terms = self.normalizer.preprocess_query_list(query_text)
        if not terms or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        idfs = self._idfs(terms)
        parts = self._fanout(
            "search_collapse", terms, idfs, field, self.scoring, self.k1,
            self.b, self.avgdl,
        )
        best: dict[str, tuple[float, int]] = {}
        total = 0
        for vals, scores, ids, n in parts:
            total += n
            for v, s, d in zip(vals, scores, ids):
                cur = best.get(v)
                if cur is None or (-s, d) < (-cur[0], cur[1]):
                    best[v] = (s, d)
        top = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[1][1]))
        return {
            "query": query_text,
            "field": field,
            "total_hits": total,
            "results": [
                {"doc_id": d, "score": s, "fields": {field: v}}
                for v, (s, d) in top[:size]
            ],
        }

    def search_top_hits(self, query_text: str, field: str, n: int = 3,
                        size: int = 10) -> dict:
        """ES terms aggregation with a top_hits sub-aggregation: buckets of
        a categorical doc-value field over the FULL ranked hit set (count
        desc, value asc — same bucket order as ``search_facets``), each
        carrying its ``n`` best-scoring docs in (-score, doc_id) order.
        Shards return n rows + one count per touched bucket; the driver
        reduce is group-bounded."""
        terms = self.normalizer.preprocess_query_list(query_text)
        if not terms or self.doc_count == 0:
            return {"query": query_text, "field": field, "buckets": []}
        idfs = self._idfs(terms)
        parts = self._fanout(
            "search_top_hits", terms, idfs, field, n, self.scoring,
            self.k1, self.b, self.avgdl,
        )
        merged: dict[str, list[tuple[float, int]]] = {}
        counts: dict[str, int] = {}
        for best, cnts in parts:
            for v, lst in best.items():
                merged.setdefault(v, []).extend(lst)
            for v, c in cnts.items():
                counts[v] = counts.get(v, 0) + c
        buckets = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out = []
        for v, c in buckets[:size]:
            hits = sorted(merged[v], key=lambda sd: (-sd[0], sd[1]))[:n]
            out.append(
                {
                    "key": v,
                    "doc_count": c,
                    "hits": [
                        {"doc_id": d, "score": s} for s, d in hits
                    ],
                }
            )
        return {"query": query_text, "field": field, "buckets": out}

    def significant_terms(self, query_text: str, size: int = 10,
                          min_doc_count: int = 3,
                          background_filter: str | None = None) -> dict:
        """ES significant_terms aggregation (JLH): terms over-represented
        in the query's hit set vs the background — the whole index by
        default, or ``background_filter``'s hit set (ES's
        ``background_filter``: compare against a narrower context; fg
        should be a subset of it for sane rates, as ES's docs note).
        score = (fg_rate - bg_rate) * fg_rate / bg_rate with
        fg_rate = fg/hits, bg_rate = df/N; only terms with
        fg_rate > bg_rate and fg >= ``min_doc_count`` surface;
        (-score, term) deterministic order.  Exact counts (no
        shard-local cutoffs): shards return every term touched by the
        hit set; background dfs come from a SECOND fanout over the
        surfaced candidates, because a term's df contribution from
        readers/shards with zero foreground hits would otherwise be
        dropped (bg_rate too small, scores inflated)."""
        kind, payload = self._agg_route(query_text)
        parts = self._fanout("significant_terms_counts", kind, payload)
        fg: dict[str, int] = {}
        hits = 0
        for terms_, fgs, n in parts:
            hits += int(n)
            for t, f in zip(terms_, fgs):
                fg[t] = fg.get(t, 0) + int(f)
        buckets = []
        if hits:
            cands = sorted(t for t, f in fg.items() if f >= min_doc_count)
            df = {t: 0 for t in cands}
            if background_filter is not None:
                bkind, bpayload = self._agg_route(background_filter)
                bg_total = 0
                for dfs, btot in self._fanout(
                    "dfs_in_set", cands, bkind, bpayload
                ):
                    bg_total += int(btot)
                    for t, d in zip(cands, dfs):
                        df[t] += int(d)
                n_docs = float(bg_total) if bg_total else 1.0
            else:
                for dfs in self._fanout("dfs_live", cands):
                    for t, d in zip(cands, dfs):
                        df[t] += int(d)
                n_docs = float(self.doc_count)
            for t in cands:
                f = fg[t]
                if df[t] == 0:
                    # only reachable with a background_filter whose set
                    # misses fg docs (ES expects fg to be a subset of
                    # the background); no rate is defined — skip
                    continue
                fg_rate = f / hits
                bg_rate = df[t] / n_docs
                if fg_rate <= bg_rate:
                    continue
                score = (fg_rate - bg_rate) * (fg_rate / bg_rate)
                buckets.append((score, t, f, df[t]))
            buckets.sort(key=lambda b: (-b[0], b[1]))
        return {
            "query": query_text,
            "total_hits": hits,
            "buckets": [
                {"key": t, "doc_count": f, "bg_count": d, "score": s}
                for s, t, f, d in buckets[:size]
            ],
        }

    def significant_text(self, query_text: str, size: int = 10,
                         sample_size: int = 200, min_doc_count: int = 3,
                         filter_duplicate_text: bool = True) -> dict:
        """ES ``significant_text`` aggregation: like significant_terms
        (same JLH score against the index background) but re-analyzing
        the stored ``_source`` of only a SAMPLE — the top
        ``sample_size`` best-scoring hits — with ES's
        ``filter_duplicate_text`` dedup (copy/paste and boilerplate
        docs counted once, first occurrence in rank order wins).  Needs
        ``store_source=True``.  Work is bounded by the sample: one
        ranked search, one k-row docmap read, one df fanout over the
        surfaced candidates."""
        hits = self.search(query_text, size=sample_size)
        ids = [r["doc_id"] for r in hits["results"]]
        srcs = self._lookup_sources(ids)
        fg: dict[str, int] = {}
        seen_texts: set[int] = set()
        sampled = 0
        for d in ids:  # rank order — dedup keeps the best-scoring copy
            txt = srcs.get(d)
            if txt is None:
                continue
            if filter_duplicate_text:
                h = hash(txt)
                if h in seen_texts:
                    continue
                seen_texts.add(h)
            sampled += 1
            # tokenize() output is already fully analyzed (filtered +
            # stemmed) — re-applying map_token would silently drop any
            # indexed term whose stemmed form collides with a stopword
            # or the length/digit filter (e.g. 'owned' -> 'own', an
            # NLTK stopword), making vocabulary unreachable that
            # significant_terms on the same query can surface
            terms = set(self.normalizer.tokenize(txt))
            for t in terms:
                fg[t] = fg.get(t, 0) + 1
        buckets = []
        if sampled:
            cands = sorted(t for t, f in fg.items() if f >= min_doc_count)
            df = {t: 0 for t in cands}
            for dfs in self._fanout("dfs_live", cands):
                for t, x in zip(cands, dfs):
                    df[t] += int(x)
            n_docs = float(self.doc_count)
            for t in cands:
                f = fg[t]
                fg_rate = f / sampled
                bg_rate = df[t] / n_docs
                if bg_rate == 0.0 or fg_rate <= bg_rate:
                    continue
                score = (fg_rate - bg_rate) * (fg_rate / bg_rate)
                buckets.append((score, t, f, df[t]))
            buckets.sort(key=lambda b: (-b[0], b[1]))
        return {
            "query": query_text,
            "sample_count": sampled,
            "buckets": [
                {"key": t, "doc_count": f, "bg_count": d, "score": s}
                for s, t, f, d in buckets[:size]
            ],
        }

    def count(self, query_text: str | None = None) -> dict:
        """ES _count API: exact hit count of a match / boolean / wildcard
        query (None or blank = match_all, i.e. live doc count), no
        scoring, no fetch phase."""
        if query_text and query_text.strip():
            kind, payload = self._agg_route(query_text)
        else:
            kind, payload = "all", None
        parts = self._fanout("count", kind, payload)
        return {"query": query_text or "", "count": int(sum(parts))}

    def _agg_route(self, query_text: str | None):
        if query_text is None or not query_text.strip():
            return "all", None  # match_all
        q = query_text.strip()
        if _WILDCARD_RE.match(q):
            return "wildcard", q.lower()
        fz = _FUZZY_RE.match(q)
        if fz:
            t = fz.group(1).lower()
            return "fuzzy", (
                t, int(fz.group(2)) if fz.group(2) else fuzzy_auto_edits(t)
            )
        if looks_boolean(q):
            return "bool", to_rpn(
                preprocess_boolean_query(q, self.normalizer)
            )
        return "terms", self.normalizer.preprocess_query_list(q)

    def _search_wildcard(self, query_text: str, size: int,
                         max_expansions: int | None = None,
                         from_: int = 0) -> dict:
        """ES wildcard/prefix query (``merg*``, ``ba*ch``, ``slo?``): the
        pattern is lowercased but NOT analyzed (ES wildcard behavior —
        it matches stored dictionary terms, which are stems under the
        'reference' analyzer and raw words under 'plain')."""
        pattern = query_text.lower()
        fetch = from_ + size
        parts = self._fanout("search_wildcard", pattern, fetch, max_expansions)
        ids = np.concatenate([p[0] for p in parts])  # actor order == doc order
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def _search_fuzzy(self, query_text: str, size: int,
                      max_expansions: int | None = None,
                      from_: int = 0) -> dict:
        """ES fuzzy term query, Lucene syntax ``term~`` / ``term~1`` /
        ``term~2`` (bare ``~`` = fuzziness AUTO).  The term is lowercased
        but NOT analyzed (ES behavior); expansion runs against each
        segment's sorted dictionary with a vectorized Levenshtein DP."""
        m = _FUZZY_RE.match(query_text.strip())
        assert m is not None
        term = m.group(1).lower()
        edits = int(m.group(2)) if m.group(2) else fuzzy_auto_edits(term)
        fetch = from_ + size
        parts = self._fanout("search_fuzzy", term, edits, fetch,
                             max_expansions)
        ids = np.concatenate([p[0] for p in parts])  # actor order == doc order
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def complete(self, prefix: str, size: int = 5) -> dict:
        """ES completion suggester (search-as-you-type): the top dictionary
        terms extending ``prefix`` ordered by (global df desc, term asc).
        The prefix is lowercased but NOT analyzed (matches stored
        dictionary terms — stems under the 'reference' analyzer).  Driver
        merge is over shards*size candidates.

        NOTE: df here is the as-built doc frequency (tombstones decay it
        only at compaction) — the popularity signal ES's suggester weights
        capture, not a live count."""
        prefix = prefix.lower()
        merged: dict[str, int] = {}
        for terms, dfs in self._fanout("complete_prefix", prefix, size):
            for t, n in zip(terms, dfs):
                merged[t] = merged.get(t, 0) + n
        top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
        return {
            "prefix": prefix,
            "options": [{"text": t, "df": n} for t, n in top],
        }

    def suggest(self, text: str, size: int = 5,
                max_edits: int | None = None) -> dict:
        """ES term suggester (did-you-mean): for each whitespace token of
        ``text`` (lowercased, NOT analyzed — same convention as the fuzzy
        and wildcard surfaces), the top ``size`` dictionary terms within
        Levenshtein distance (fuzziness AUTO unless ``max_edits`` is given),
        the input term itself excluded, ordered by (distance asc, df desc,
        term asc).  ES orders suggestions by score then frequency; the df
        tie-break here is the deterministic, SQL-twinnable equivalent.
        df is the global live doc count, summed across shards/segments."""
        out = []
        lowered = [raw.lower() for raw in text.split()]
        all_parts = self._fanout_many("suggest_term", [
            (term,
             max_edits if max_edits is not None else fuzzy_auto_edits(term))
            for term in lowered
        ])  # one scatter-gather round for every token
        for term, word_parts in zip(lowered, all_parts):
            merged: dict[str, list[int]] = {}
            for terms, dists, dfs in word_parts:
                for t, d, f in zip(terms, dists, dfs):
                    cur = merged.get(t)
                    if cur is None:
                        merged[t] = [d, f]
                    else:
                        cur[1] += f
            opts = sorted(
                (d, -f, t) for t, (d, f) in merged.items() if d > 0
            )[:size]
            out.append(
                {
                    "text": term,
                    "options": [
                        {"text": t, "dist": d, "df": -nf}
                        for d, nf, t in opts
                    ],
                }
            )
        return {"suggest": out}

    def suggest_phrase(self, text: str, size: int = 5,
                       max_edits: int = 1, per_word: int = 3) -> dict:
        """ES phrase suggester (did-you-mean over the WHOLE phrase),
        deterministic variant: per whitespace token (lowercased, like
        the term suggester) the top ``per_word`` candidates — dictionary
        terms within ``max_edits`` Levenshtein, the input term itself
        at distance 0 when indexed — ordered (distance asc, df desc,
        term asc); candidate phrases are the per-word cross product,
        ranked by (total edit distance asc, sum of candidate dfs desc,
        phrase asc), top ``size``.  ES scores candidates with a smoothed
        bigram LM times an error model and prunes with a beam; the
        integer (distance, df-sum) surrogate keeps the ranking exact,
        engine-independent, and SQL-twinnable.  A word with no
        candidate at all stays as itself with df 0 (ES likewise emits
        the original term).  Fanout cost: one suggest_term round per
        word; the cross product is driver-side over
        ``per_word ** n_words`` tuples — keep phrases short, like ES's
        ``gram_size``/beam defaults do."""
        if per_word < 1:
            raise ValueError("per_word must be >= 1")
        words = [w.lower() for w in text.split()]
        if not words:
            return {"text": text, "options": []}
        if per_word ** len(words) > 100_000:
            raise ValueError("phrase too long for the cross product")
        per: list[list[tuple[str, int, int]]] = []  # (term, dist, df)
        all_parts = self._fanout_many(
            "suggest_term", [(term, max_edits) for term in words]
        )  # one scatter-gather round for the whole phrase
        for term, word_parts in zip(words, all_parts):
            merged: dict[str, list[int]] = {}
            for terms, dists, dfs in word_parts:
                for t, d, f in zip(terms, dists, dfs):
                    cur = merged.get(t)
                    if cur is None:
                        merged[t] = [d, f]
                    else:
                        cur[1] += f
            opts = sorted(
                (d, -f, t) for t, (d, f) in merged.items()
            )[:per_word]
            per.append(
                [(t, d, -nf) for d, nf, t in opts] or [(term, 0, 0)]
            )
        import itertools

        phrases = []
        for combo in itertools.product(*per):
            phrases.append((
                sum(c[1] for c in combo),
                -sum(c[2] for c in combo),
                " ".join(c[0] for c in combo),
            ))
        phrases.sort()
        return {
            "text": text,
            "options": [
                {"text": p, "total_dist": d, "df_sum": -nf}
                for d, nf, p in phrases[:size]
            ],
        }

    def _search_boolean(self, query_text: str, size: int,
                        from_: int = 0) -> dict:
        tokens = preprocess_boolean_query(query_text, self.normalizer)
        rpn = to_rpn(tokens)
        fetch = from_ + size
        # a pure-AND expression is conjunctive (min-df bound, like
        # phrases); a pure-OR expression is a union (sum-df bound, like
        # ranked queries — operands are literal term lookups, so the sum
        # is exact).  Only NOT, or mixed operators, lack a cheap bound.
        ops = {t for t in rpn if t in BOOLEAN_OPERATORS}
        operands = [t for t in rpn if t not in BOOLEAN_OPERATORS]
        if not ops or ops == {"AND"}:
            route = self._route_conjunctive(operands)
        elif ops == {"OR"}:
            route = self._route_disjunctive(operands)
        else:
            route = "fanout"
        if route == "empty":
            return {"query": query_text, "total_hits": 0, "results": []}
        if route == "local":
            parts = [self._local_allsegs().search_boolean(rpn, fetch)]
        else:
            parts = self._fanout("search_boolean", rpn, fetch)
        ids = np.concatenate([p[0] for p in parts])  # actor order == doc order
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def _search_boolean_phrases(self, query_text: str, size: int,
                                from_: int = 0) -> dict:
        """Boolean query with quoted-phrase operands (Lucene
        ``"a b"~N AND NOT c``): each quoted span becomes a placeholder
        operand in the RPN, resolved per segment through the positions
        machinery; the surrounding text analyzes through the normal
        boolean tokenizer, so implicit-AND insertion and NOT complements
        behave exactly as in plain boolean queries."""
        parts_re = re.compile(r'("[^"]*"(?:~\d+)?)')
        span_re = re.compile(r'^"([^"]*)"(?:~(\d+))?$')
        tokens: list[str] = []
        phrase_ops: dict[str, tuple[list[str], int]] = {}
        from ..oracle.oracle import (VANISHED, drop_vanished_operands,
                                     span_terms as span_terms_shared)

        for part in parts_re.split(query_text):
            m = span_re.match(part)
            if m:
                terms = span_terms_shared(m.group(1), self.normalizer)
                if not terms:
                    # null clause (Lucene drops these from the
                    # BooleanQuery WITH their operator): a bare vanish
                    # left a dangling operator whose RPN underflowed
                    # into defined-empty — '"x" OR dog' must mean dog
                    tokens.append(VANISHED)
                    continue
                key = f"\0PH{len(phrase_ops)}"
                phrase_ops[key] = (
                    terms, int(m.group(2)) if m.group(2) else 0
                )
                tokens.append(key)
            elif part.strip():
                tokens.extend(
                    preprocess_boolean_query(part, self.normalizer)
                )
        rpn = to_rpn(tuple(drop_vanished_operands(tokens)))
        fetch = from_ + size
        parts = self._fanout("search_boolean", rpn, fetch, phrase_ops)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    # ------------------------------------------------------------------
    # Lucene query_string / simple_query_string parsers
    # ------------------------------------------------------------------

    _QS_SCAN_RE = re.compile(
        # quoted phrase [occur-prefix]["..."][~slop][^boost]
        r'[+\-!]?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'
        r"|[+\-!]?/(?:[^/\\]|\\.)+/"               # /regexp/ operand
        r"|\(|\)"                                   # grouping
        r"|&&|\|\||!"                               # symbolic AND / OR / NOT
        r"|[^\s()]+"                                # bare operand or keyword
    )

    def _qs_operand(self, word: str, ops: dict, default_field: str,
                    strict: bool) -> list[str]:
        """Classify one query_string operand into RPN-ready tokens,
        registering multi-term operands (phrase / wildcard / fuzzy /
        regexp) as typed placeholders in ``ops``.

        Wildcard / fuzzy / regexp operands are lowercased but NOT
        analyzed (ES behavior — they match stored dictionary terms);
        plain words analyze through the index analyzer and may expand to
        an AND-group when the analyzer splits them."""
        m = re.fullmatch(r"(.+)\^\d+(?:\.\d+)?", word)
        if m:
            # boost is a scoring modifier; this surface is constant-score
            # (like the engine's boolean path), so ^n parses and drops
            word = m.group(1)
        if not word.startswith('"') and ":" in word:
            field, rest = word.split(":", 1)
            if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", field) and rest:
                if field != default_field:
                    if strict:
                        raise ValueError(
                            f"unknown field {field!r} (index default "
                            f"field is {default_field!r})")
                    return []  # simple_query_string: ignore invalid part
                word = rest
        if word.startswith('"'):
            m = re.fullmatch(r'"([^"]*)"(?:~(\d+))?', word)
            if m is None:  # unterminated quote
                if strict:
                    raise ValueError(f"unbalanced quote in {word!r}")
                word = word.strip('"')
                m = None
            else:
                terms = self.normalizer.preprocess_query_list(m.group(1))
                if not terms:
                    return []
                if len(terms) == 1:
                    return [terms[0]]  # one-word phrase == term query
                if not self.has_positions:
                    raise ValueError(
                        "phrase operand needs an index built with "
                        "store_positions=True")
                key = f"\0QS{len(ops)}"
                ops[key] = ("phrase", terms,
                            int(m.group(2)) if m.group(2) else 0)
                return [key]
        if len(word) > 2 and word.startswith("/") and word.endswith("/"):
            key = f"\0QS{len(ops)}"
            # lowercased like the wildcard/fuzzy operands and the
            # standalone regexp surface: dictionary terms are lowercase
            ops[key] = ("regexp", word[1:-1].lower())
            return [key]
        m = _FUZZY_RE.match(word)
        if m:
            t = m.group(1).lower()
            edits = int(m.group(2)) if m.group(2) else fuzzy_auto_edits(t)
            key = f"\0QS{len(ops)}"
            ops[key] = ("fuzzy", t, edits)
            return [key]
        if "*" in word or "?" in word:
            key = f"\0QS{len(ops)}"
            ops[key] = ("wildcard", word.lower())
            return [key]
        terms = self.normalizer.preprocess_query_list(word)
        if not terms:
            return []
        if len(terms) == 1:
            return [terms[0]]
        # analyzer split one operand into several terms ("data-base"):
        # conjunctive group, like ES's analyzed term sequence under AND
        out: list[str] = ["("]
        for i, t in enumerate(terms):
            if i:
                out.append("AND")
            out.append(t)
        out.append(")")
        return out

    def _qs_lower(self, query_text: str, default_operator: str,
                  default_field: str, strict: bool,
                  simple_ops: bool = False):
        """Lower a Lucene query string to (rpn, placeholder_ops).

        ``simple_ops=True`` switches the operator surface to
        simple_query_string's: ``+``=AND, ``|``=OR, ``-``=NOT; otherwise
        uppercase AND/OR/NOT plus ``&&``/``||``/``!`` and the ``+x``
        (must) / ``-x`` (must-not) clause prefixes.

        Documented deviation from Lucene's classic QueryParser: operator
        resolution uses the engine's RPN precedence (NOT > AND > OR, the
        reference's boolean engine) instead of Lucene's flat
        occur-flag rewrite, and ``+x`` lowers to an AND-joined operand —
        identical results for single-operator queries, well-defined (and
        documented) for mixed ones."""
        default_operator = default_operator.upper()
        if default_operator not in ("AND", "OR"):
            raise ValueError("default_operator must be 'AND' or 'OR'")
        out: list[str] = []
        ops: dict[str, tuple] = {}
        join_op: str | None = None   # explicit operator awaiting operand
        neg = False                  # pending NOT prefix
        must = False                 # '+' clause prefix forces AND join
        depth = 0

        def emit(tokens: list[str]) -> None:
            nonlocal join_op, neg, must
            if not tokens:
                join_op, neg, must = None, False, False
                return
            if out and out[-1] not in ("AND", "OR", "NOT", "("):
                op = join_op or ("AND" if (must or neg) else default_operator)
                out.append(op)
            if neg:
                out.append("NOT")
            out.extend(tokens)
            join_op, neg, must = None, False, False

        for raw in self._QS_SCAN_RE.findall(query_text):
            if raw == "(":
                if out and out[-1] not in ("AND", "OR", "NOT", "("):
                    out.append(
                        join_op
                        or ("AND" if (must or neg) else default_operator)
                    )
                if neg:
                    out.append("NOT")
                out.append("(")
                depth += 1
                join_op, neg, must = None, False, False
                continue
            if raw == ")":
                if depth == 0:
                    if strict:
                        raise ValueError("unbalanced ')' in query string")
                    continue
                out.append(")")
                depth -= 1
                continue
            if simple_ops:
                if raw == "|":
                    join_op = "OR"
                    continue
                if raw == "+":
                    join_op = "AND"
                    continue
            else:
                if raw in ("AND", "&&"):
                    join_op = "AND"
                    continue
                if raw in ("OR", "||"):
                    join_op = "OR"
                    continue
                if raw in ("NOT", "!"):
                    neg = True
                    continue
            if raw.startswith("+") and not simple_ops:
                must = True
                raw = raw[1:]
            elif raw.startswith("+") and simple_ops and len(raw) > 1:
                join_op = "AND"
                raw = raw[1:]
            if raw.startswith("!") and len(raw) > 1 and not simple_ops:
                neg = True
                must = True
                raw = raw[1:]
            if raw.startswith("-") and len(raw) > 1:
                neg = True
                must = True  # must_not joins conjunctively (excludes)
                raw = raw[1:]
            if not raw:
                continue
            emit(self._qs_operand(raw, ops, default_field, strict))
        if depth:
            if strict:
                raise ValueError("unbalanced '(' in query string")
            out.extend(")" * depth)
        # trailing dangling operator/NOT is dropped (tolerant) or the RPN
        # evaluator's malformed guard defines it as no-matches (strict)
        return to_rpn(tuple(out)), ops

    def query_string(self, query_text: str, size: int = 10,
                     default_operator: str = "OR",
                     default_field: str = "text",
                     from_: int = 0) -> dict:
        """ES ``query_string`` query (Lucene syntax): grouping parens,
        AND/OR/NOT (and ``&&``/``||``/``!``), ``+must`` / ``-must_not``
        clause prefixes, quoted phrases with slop (``"a b"~2``), wildcard
        (``ba*ch``), fuzzy (``term~1``), regexp (``/jo.n/``) operands,
        ``field:`` prefixes on the default field, and ``^boost`` (parsed,
        inert — this surface is constant-score like the engine's boolean
        path).  Each multi-term operand resolves per segment exactly like
        its standalone query (dictionary expansion for wildcard/fuzzy/
        regexp, positions machinery for phrases), then composes through
        the skip-accelerated RPN set engine.  Results are doc_id
        ascending, score 1.0, exact total — the boolean-path contract."""
        rpn, ops = self._qs_lower(query_text, default_operator,
                                  default_field, strict=True)
        return self._qs_execute(query_text, rpn, ops, size, from_)

    def simple_query_string(self, query_text: str, size: int = 10,
                            default_operator: str = "OR",
                            default_field: str = "text",
                            from_: int = 0) -> dict:
        """ES ``simple_query_string``: the forgiving surface — ``+``=AND,
        ``|``=OR, ``-``=NOT, quoted phrases (with ``~slop``), trailing-*
        prefix terms, ``term~N`` fuzziness, parens; syntax errors never
        raise (unbalanced quotes/parens and unknown fields are dropped,
        per ES docs), the rest of the query still runs."""
        rpn, ops = self._qs_lower(query_text, default_operator,
                                  default_field, strict=False,
                                  simple_ops=True)
        return self._qs_execute(query_text, rpn, ops, size, from_)

    def _qs_execute(self, query_text: str, rpn: tuple, ops: dict,
                    size: int, from_: int) -> dict:
        if not rpn:
            return {"query": query_text, "total_hits": 0, "results": []}
        fetch = from_ + size
        parts = self._fanout("search_boolean", rpn, fetch, ops or None)
        ids = np.concatenate([p[0] for p in parts])
        total = int(sum(p[1] for p in parts))
        return {
            "query": query_text,
            "total_hits": total,
            "results": [{"doc_id": int(d), "score": 1.0}
                        for d in ids[from_:fetch]],
        }

    def batch_search(self, queries: list[str], size: int = 10,
                     mode: str | None = None) -> list[dict]:
        """Pipelined multi-query execution (QPS harness path): round 1 (df
        gather) for all queries first, then all scoring rounds in flight."""
        all_terms = sorted(
            {
                t
                for q in queries
                if not looks_boolean(q)
                for t in self.normalizer.preprocess_query_list(q)
            }
        )
        self._global_dfs(all_terms)  # warm the cache in one round
        if self.embedded is not None:
            return [self.search(q, size=size, mode=mode) for q in queries]
        mode = mode or self.mode
        # one search_many RPC per searcher for ALL ranked/boolean queries —
        # per-query actor round-trips dominate small-corpus batch serving
        jobs: list[tuple] = []
        metas: list[tuple] = []
        inline: dict[int, dict] = {}
        for qi, q in enumerate(queries):
            if '"' in q and self.has_positions:
                metas.append(("done", q))
                inline[qi] = self.search(q, size=size, mode=mode)
            elif _WILDCARD_RE.match(q.strip()) or _FUZZY_RE.match(q.strip()):
                # same routing as search(): a wildcard/fuzzy string must
                # not silently degrade to a ranked query on the literal
                # pattern characters
                metas.append(("done", q))
                inline[qi] = self.search(q, size=size, mode=mode)
            elif looks_boolean(q):
                rpn = to_rpn(preprocess_boolean_query(q, self.normalizer))
                metas.append(("bool", q))
                jobs.append(("bool", rpn, size))
            else:
                terms = self.normalizer.preprocess_query_list(q)
                idfs = self._idfs(terms)
                metas.append(("ranked", q))
                jobs.append(
                    ("ranked", terms, idfs, size, self.scoring, self.k1,
                     self.b, self.avgdl, mode)
                )
        per_searcher = self._fanout("search_many", jobs) if jobs else []
        out = []
        ji = 0
        for qi, (kind, q) in enumerate(metas):
            if kind == "done":
                out.append(inline[qi])
                continue
            parts = [ps[ji] for ps in per_searcher]
            ji += 1
            if kind == "bool":
                ids = np.concatenate([p[0] for p in parts])
                total = int(sum(p[1] for p in parts))
                out.append(
                    {
                        "query": q,
                        "total_hits": total,
                        "results": [
                            {"doc_id": int(d), "score": 1.0} for d in ids[:size]
                        ],
                    }
                )
            else:
                ids = np.concatenate([p[0] for p in parts])
                scores = np.concatenate([p[1] for p in parts])
                totals = [p[2] for p in parts]
                total = -1 if any(t < 0 for t in totals) else int(sum(totals))
                order = np.lexsort((ids, -scores))[:size]
                out.append(
                    {
                        "query": q,
                        "total_hits": total,
                        "results": [
                            {"doc_id": int(ids[i]), "score": float(scores[i])}
                            for i in order
                        ],
                    }
                )
        return out

    # -- misc --------------------------------------------------------------

    def _route(self, terms: list[str], conjunctive: bool) -> str:
        """Routing decision shared by the conjunctive (phrase / pure-AND
        boolean: bound = MIN df over required terms) and disjunctive
        (ranked / synonym / pure-OR boolean unions: bound = SUM of dfs)
        paths.  ``'empty'`` when the bound is 0 (no doc can match —
        answered driver-side from the df shards, zero fanout), ``'local'``
        when the bound fits under ``local_route_df_max``, else
        ``'fanout'``.  All gates (routing enabled, index small enough,
        df shards present) are checked BEFORE the df probe: when the
        local route is impossible, a query must not pay a df lookup it
        never needed (on a pre-df-shard-layout index that lookup is
        itself a full actor fanout).

        Conjunctive prefix terms (``t*``) expand against the dictionary
        so they have no cheap df bound — they're excluded from the min
        (an upper bound stays an upper bound); a conjunctive query of
        ONLY prefix terms fans out.  Disjunctive callers never pass
        expanding terms (boolean OR operands are literal lookups)."""
        if (self.embedded is not None or not self._route_enabled
                or not self._df_shards
                or self.doc_count > self._local_route_docs_max):
            return "fanout"  # embedded already IS the local path
        if conjunctive:
            terms = [t for t in terms if not t.endswith("*")]
        if not terms:
            return "fanout"
        dfs = self._global_dfs(terms)
        bound = min(dfs.values()) if conjunctive else sum(dfs.values())
        if bound == 0:
            return "empty"
        if bound <= self.local_route_df_max:
            return "local"
        return "fanout"

    def _route_conjunctive(self, terms: list[str]) -> str:
        return self._route(terms, conjunctive=True)

    def _route_disjunctive(self, terms: list[str]) -> str:
        return self._route(terms, conjunctive=False)

    def _local_allsegs(self) -> Searcher:
        """Lazily-built in-process Searcher over ALL served segments for
        the cheap-query local route (mmap'd segments share page cache with
        the actor pool; gated by ``_local_route_docs_max`` in the router).
        Dropped on refresh() so it rebuilds over the new served set.
        When hybrid serving already holds shard 0 in this process, those
        readers (mmaps, tombstone-applied doc_lens, warm caches) are
        SHARED rather than opened a second time."""
        if self._cheap_local is None:
            tombs = sorted(self.tombstones)
            if self.local is not None:
                have = {r.seg_id: r for r in self.local.readers}
                s = Searcher(
                    self.index_dir,
                    sorted(self._served_seg_ids - set(have)), tombs,
                )
                s.readers = sorted(
                    s.readers + list(have.values()),
                    key=lambda r: r.doc_id_base,
                )
            else:
                s = Searcher(
                    self.index_dir, sorted(self._served_seg_ids), tombs
                )
            self._cheap_local = s
        return self._cheap_local

    def _cursorable(self, query_text: str) -> bool:
        """True when the query routes to the ranked-term path, the only
        one whose shard protocol honors a (score, doc_id) search_after
        cursor filter."""
        s = query_text.strip()
        return not (
            ('"' in query_text and self.has_positions)
            or _WILDCARD_RE.match(s)
            or _FUZZY_RE.match(s)
            or looks_boolean(query_text)
        )

    def scroll(self, query_text: str, batch: int = 100,
               mode: str | None = None):
        """ES scroll / point-in-time cursor: iterate the ENTIRE ranked
        hit set of ``query_text`` in strict (-score, doc_id) order,
        ``batch`` hits per yielded page, constant per-page transfer
        (search_after cursors under the hood — each shard ships at most
        ``batch`` rows per page at any depth, never offset-deep
        windows).  The point-in-time view is free: segments are
        immutable, so the hit set can't shift mid-scroll (only
        ``refresh()``/tombstones between pages could, as with an expired
        ES PIT — hold off refresh while scrolling).

        Phrase/boolean/wildcard/fuzzy queries have no cursor filter in
        their shard protocol, so those pages fall back to ``from_``
        deep pagination (still terminates; per-page cost grows with
        depth, as in ES without a PIT)."""
        if self._cursorable(query_text):
            after = None
            while True:
                res = self.search(
                    query_text, size=batch, mode=mode, search_after=after
                )
                hits = res["results"]
                if not hits:
                    return
                yield hits
                if len(hits) < batch:
                    return
                last = hits[-1]
                after = (last["score"], last["doc_id"])
        else:
            from_ = 0
            while True:
                res = self.search(
                    query_text, size=batch, mode=mode, from_=from_
                )
                hits = res["results"]
                if not hits:
                    return
                yield hits
                if len(hits) < batch:
                    return
                from_ += batch

    def lookup_urls(self, doc_ids: list[int]) -> dict[int, str]:
        import pyarrow.dataset as pads

        dset = pads.dataset(os.path.join(self.index_dir, "docmap"))
        t = dset.to_table(
            columns=["doc_id", "url"],
            filter=pads.field("doc_id").isin(list(doc_ids)),
        )
        return dict(zip(t.column("doc_id").to_pylist(), t.column("url").to_pylist()))

    def lookup_docvalues(
        self, doc_ids: list[int], fields: list[str]
    ) -> dict[int, dict]:
        """ES ``docvalue_fields``: fetch doc-value columns for a BOUNDED
        id set (one k-row predicate read of the docmap, same pattern as
        ``lookup_urls`` — never a scan).  Use with top-k results:
        ``eng.lookup_docvalues([r['doc_id'] for r in hits], ['source'])``.
        Unknown fields raise (ES: unmapped docvalue fields are an
        error)."""
        import pyarrow.dataset as pads

        dset = pads.dataset(os.path.join(self.index_dir, "docmap"))
        missing = [f for f in fields if f not in dset.schema.names]
        if missing:
            raise ValueError(
                f"docvalue fields {missing} not in docmap "
                f"(built facet/metadata columns: {dset.schema.names})"
            )
        t = dset.to_table(
            columns=["doc_id", *fields],
            filter=pads.field("doc_id").isin(list(doc_ids)),
        )
        ids = t.column("doc_id").to_pylist()
        cols = {f: t.column(f).to_pylist() for f in fields}
        return {
            d: {f: cols[f][i] for f in fields} for i, d in enumerate(ids)
        }

    def _lookup_sources(self, doc_ids: list[int]) -> dict[int, str]:
        """Stored ``_source`` text for a bounded id set (k-row filtered
        docmap read, same pattern as ``lookup_urls``).  Requires the index
        to have been built with ``BuildConfig.store_source=True``."""
        import pyarrow.dataset as pads

        dset = pads.dataset(os.path.join(self.index_dir, "docmap"))
        if "source_text" not in dset.schema.names:
            raise ValueError(
                "index was built without store_source=True; no _source"
            )
        t = dset.to_table(
            columns=["doc_id", "source_text"],
            filter=pads.field("doc_id").isin(list(doc_ids)),
        )
        return dict(
            zip(t.column("doc_id").to_pylist(),
                t.column("source_text").to_pylist())
        )

    def get_doc(self, doc_id: int) -> dict | None:
        """ES GET /index/_doc/{id}: url + stored source for one doc (None
        if absent or tombstoned).  One row-group-pruned docmap read."""
        import pyarrow.dataset as pads

        if self.tombstones and doc_id in self.tombstones:
            return None
        dset = pads.dataset(os.path.join(self.index_dir, "docmap"))
        cols = ["doc_id", "url"]
        if "source_text" in dset.schema.names:
            cols.append("source_text")
        t = dset.to_table(
            columns=cols, filter=pads.field("doc_id") == doc_id
        )
        if t.num_rows == 0:
            return None
        row = t.to_pylist()[0]
        return {
            "doc_id": doc_id,
            "url": row.get("url"),
            "source": row.get("source_text"),
        }

    def validate_query(self, query_text: str) -> dict:
        """ES _validate/query: run the query through the router's parse
        path (analyzer + boolean shunting-yard RPN when it looks
        boolean) WITHOUT executing it.  Returns {'valid': bool,
        'explanation': str} — the explanation names the route a valid
        query would take, or carries the parser's error."""
        try:
            q = (query_text or "").strip()
            if not q:
                return {"valid": False,
                        "explanation": "empty query string"}
            if looks_boolean(q):
                rpn = to_rpn(preprocess_boolean_query(q, self.normalizer))
                # the reference's shunting-yard is lax — structurally
                # check the RPN: parens must be consumed and the stack
                # must evaluate to exactly one operand
                depth = 0
                for t in rpn:
                    if t in ("(", ")"):
                        return {"valid": False,
                                "explanation": "unbalanced parentheses"}
                    if t == "NOT":
                        if depth < 1:
                            return {"valid": False,
                                    "explanation": "dangling NOT"}
                    elif t in BOOLEAN_OPERATORS:
                        if depth < 2:
                            return {"valid": False,
                                    "explanation":
                                        f"operator {t} missing operand"}
                        depth -= 1
                    else:
                        depth += 1
                if depth != 1:
                    return {"valid": False,
                            "explanation": "malformed boolean expression"}
                ops = sum(1 for t in rpn if t in BOOLEAN_OPERATORS)
                return {"valid": True,
                        "explanation":
                            f"boolean query ({ops} operators)"}
            terms = self.normalizer.preprocess_query_list(q)
            if not terms and '"' not in q and "*" not in q \
                    and "~" not in q:
                return {"valid": False,
                        "explanation":
                            "no indexable terms after analysis"}
            return {"valid": True,
                    "explanation": f"ranked query ({len(terms)} terms)"}
        except ValueError as e:
            return {"valid": False, "explanation": str(e)}

    def field_caps(self) -> dict:
        """ES _field_caps: every docmap doc-value column with its Arrow
        type and whether the numeric aggregation paths accept it — one
        schema read, no data scan."""
        import pyarrow.dataset as pads
        import pyarrow.types as patypes

        dset = pads.dataset(os.path.join(self.index_dir, "docmap"))
        out = {}
        for fld in dset.schema:
            if fld.name == "doc_id":
                continue
            t = fld.type
            out[fld.name] = {
                "type": str(t),
                "aggregatable": True,
                "numeric": patypes.is_integer(t),
                "searchable": fld.name == "source_text",
            }
        return {"fields": out}

    def mget(self, doc_ids: list[int]) -> list[dict]:
        """ES _mget: every requested doc in ONE row-group-pruned docmap
        predicate read (vs one read per id with repeated
        :meth:`get_doc`).  Result order follows ``doc_ids``; absent or
        tombstoned ids come back {'doc_id': id, 'found': False}, like
        ES's per-doc found flag."""
        import pyarrow.dataset as pads

        want = [int(d) for d in doc_ids]
        live = [d for d in want
                if not (self.tombstones and d in self.tombstones)]
        by_id: dict[int, dict] = {}
        if live:
            dset = pads.dataset(os.path.join(self.index_dir, "docmap"))
            cols = ["doc_id", "url"]
            if "source_text" in dset.schema.names:
                cols.append("source_text")
            t = dset.to_table(
                columns=cols,
                filter=pads.field("doc_id").isin(live),
            )
            for row in t.to_pylist():
                by_id[int(row["doc_id"])] = {
                    "doc_id": int(row["doc_id"]),
                    "found": True,
                    "url": row.get("url"),
                    "source": row.get("source_text"),
                }
        return [
            by_id.get(d, {"doc_id": d, "found": False}) for d in want
        ]

    def highlight(self, query_text: str, size: int = 10,
                  before: int = 3, after: int = 3) -> dict:
        """ES highlight: for each top hit and each analyzed query term
        PRESENT in the doc, the raw-token window around the term's FIRST
        occurrence with the match wrapped in ``<em>``/``</em>``.

        Matching is analyzer-aware: each raw whitespace token of the stored
        source matches a query term iff its analyzed form equals the term
        (so 'running' highlights for the stemmed query term 'run' under the
        'reference' analyzer).  Driver-side cost is O(k hit docs) — the
        bounded top-k, never the corpus."""
        res = self.search(query_text, size=size)
        hits = res["results"]
        terms = self.normalizer.preprocess_query_list(
            re.sub(r'["~*?()]|\bAND\b|\bOR\b|\bNOT\b', " ", query_text)
        )
        srcs = self._lookup_sources([r["doc_id"] for r in hits]) if hits else {}
        memo: dict[str, str | None] = {}

        def norm_one(tok: str) -> str | None:
            got = memo.get(tok)
            if got is None and tok not in memo:
                lst = self.normalizer.preprocess_query_list(tok)
                got = lst[0] if lst else None
                memo[tok] = got
            return got

        out = []
        for r in hits:
            text = srcs.get(r["doc_id"])
            frags = []
            if text:
                toks = text.split()
                norm = [norm_one(t) for t in toks]
                for term in terms:
                    try:
                        p = norm.index(term)
                    except ValueError:
                        continue
                    window = toks[max(0, p - before): p + after + 1]
                    window[min(p, before)] = f"<em>{toks[p]}</em>"
                    frags.append(
                        {"term": term, "pos": p, "fragment": " ".join(window)}
                    )
            out.append({"doc_id": r["doc_id"], "score": r["score"],
                        "highlight": frags})
        return {"query": query_text, "total_hits": res["total_hits"],
                "results": out}

    def get_stats(self) -> dict:
        return {
            "identifier": self.stats.get("identifier"),
            "doc_count": self.doc_count,
            "avg_doc_length": self.avgdl,
            "num_segments": self.stats.get("num_segments"),
            "num_searchers": len(self.searchers) + (
                1 if self.local is not None else 0
            ),
            "hybrid_local": self.local is not None,
            "scoring": self.scoring,
            "mode": self.mode,
        }

    def close(self) -> None:
        for s in self.searchers:
            ray.kill(s)
        self.searchers = []
        self.embedded = None
        self.local = None
        self._cheap_local = None
