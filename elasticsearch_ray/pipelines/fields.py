"""Field-boosted multi-field retrieval — the reference ES baseline's
``multi_match`` semantics (``elasticsearch_indexer.py:122-140``: fields
``["title^2", "text"]``, type ``best_fields``).

One index per field (per-field postings AND per-field collection stats —
df, N, avgdl — matching Lucene's per-field statistics); a query scores each
field independently and a document's final score is
``max_f(boost_f * score_f)`` ("best fields").

Exactness of the merge: if a doc's final score beats the global k-th best,
then the field realizing its max beats it too, so the doc is inside that
field's boosted top-k — the union of per-field top-k therefore contains the
global top-k.
"""

from __future__ import annotations

import math

from .query import QueryEngine


class MultiFieldEngine:
    """best_fields scorer over per-field indexes built by
    :func:`build_field_indexes` (or any ``build_index`` outputs)."""

    def __init__(
        self,
        field_dirs: dict[str, str],
        boosts: dict[str, float] | None = None,
        num_searchers: int | None = 0,
        scoring: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
        mode: str = "taat",
    ):
        boosts = boosts or {}
        self.engines = {
            f: QueryEngine(
                d, num_searchers=num_searchers, scoring=scoring, k1=k1, b=b,
                mode=mode,
            )
            for f, d in field_dirs.items()
        }
        self.boosts = {f: float(boosts.get(f, 1.0)) for f in field_dirs}

    def search(self, query_text: str, size: int = 10,
               mode: str | None = None) -> dict:
        per_doc: dict[int, float] = {}
        for f, eng in self.engines.items():
            res = eng.search(query_text, size=size, mode=mode)
            boost = self.boosts[f]
            for r in res["results"]:
                s = boost * r["score"]
                if s > per_doc.get(r["doc_id"], float("-inf")):
                    per_doc[r["doc_id"]] = s
        ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
        return {
            "query": query_text,
            "total_hits": -1,  # best-fields doesn't visit every candidate
            "results": [
                {"doc_id": int(d), "score": float(s)} for d, s in ranked
            ],
        }

    def close(self) -> None:
        for eng in self.engines.values():
            eng.close()


def build_field_indexes(
    field_sources: dict[str, tuple[str, str]],
    out_base: str,
    analyzer: str = "reference",
    **config_kwargs,
) -> dict[str, str]:
    """Build one index per field.  ``field_sources`` maps field name ->
    (parquet path, text column).  Returns field -> index dir."""
    import os

    from .build import BuildConfig, build_index

    dirs: dict[str, str] = {}
    for field, (src, col) in field_sources.items():
        idx = os.path.join(out_base, f"field_{field}")
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            build_index(
                src,
                idx,
                BuildConfig(
                    text_column=col, analyzer=analyzer, url_column=None,
                    lang_column=None, **config_kwargs,
                ),
            )
        dirs[field] = idx
    return dirs


# ---------------------------------------------------------------------------
# Cross-field scoring with a tie_breaker (ES dis_max / multi_match
# most_fields).  best_fields (tie_breaker=0) admits the union-of-top-k merge
# above; any tie_breaker > 0 makes a doc's final score depend on its score
# in EVERY field, so the per-field-top-k containment argument breaks.  ES
# solves this by construction — all fields of a document live in the same
# shard — and so do we: a CrossFieldSearcher owns, for ONE contiguous doc
# range, the segments of EVERY field overlapping that range.  Combination
# is shard-local (one vectorized unique+searchsorted alignment) and only
# top-k rows leave the actor.


class _FieldMeta:
    """Collection stats + df lookup for one field's index WITHOUT loading
    its postings: doc_count/avgdl/analyzer from stats.json, per-segment doc
    ranges from the per-seg manifests, df from the range-sharded df_global
    parquet (one predicate read per touched shard — same path as
    QueryEngine._dfs_from_shards)."""

    def __init__(self, index_dir: str):
        import json
        import os

        from ..normalizer import make_normalizer

        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            st = json.load(f)
        self.doc_count = int(st["doc_count"])
        self.avgdl = float(st["avg_doc_length"])
        cfg = st.get("config", {})
        self.analyzer = cfg.get("analyzer", "reference")
        self.normalizer = make_normalizer(self.analyzer)
        with open(os.path.join(index_dir, "manifest.json")) as f:
            man = json.load(f)
        seg_ids = sorted(int(s) for s in man["segments"])
        # manifest tombstones: deleted-but-not-compacted docs must be
        # hidden immediately, exactly like QueryEngine's readers
        self.tombstones: list[int] = sorted(man.get("tombstones", []))
        self.segs: list[tuple[int, int, int]] = []  # (seg_id, lo, hi)
        for s in seg_ids:
            with open(
                os.path.join(index_dir, "manifests", f"seg-{s:05d}.json")
            ) as f:
                m = json.load(f)
            lo = int(m["doc_id_base"])
            # num_docs, NOT kept_docs: doc ids live in slot space —
            # kept_docs shrinks under lang filters / compacted deletes,
            # which mis-assigned segments to doc-range shards and made
            # live docs beyond sum(kept) unreachable
            self.segs.append((s, lo, lo + int(m["num_docs"])))
        self.id_space = max((hi for _, _, hi in self.segs), default=0)
        from ..state.dfshards import load_df_shards

        self._df_shards = load_df_shards(index_dir)
        self._shard_los = [s[0] for s in self._df_shards]
        self._readers = None  # pre-shard-layout fallback only

    def segs_overlapping(self, lo: int, hi: int) -> list[int]:
        return [s for s, slo, shi in self.segs if slo < hi and shi > lo]

    def dfs(self, terms: list[str]) -> dict[str, int]:
        from ..state.dfshards import dfs_from_shards

        if not self._df_shards:
            # legacy layout without df_global: open readers once (driver
            # process, df probes only)
            if self._readers is None:
                from ..state.segment import SegmentReader

                self._readers = [
                    SegmentReader(self.index_dir, s, self.tombstones)
                    for s, _, _ in self.segs
                ]
            return {
                t: sum(r.df(t) for r in self._readers) for t in terms
            }
        return dfs_from_shards(self._df_shards, self._shard_los, terms)

    def idfs(self, terms: list[str]) -> dict[str, float]:
        from ..state.dfshards import idf

        return {
            t: idf(self.doc_count, df) for t, df in self.dfs(terms).items()
        }


class CrossFieldSearcher:
    """All fields of one contiguous doc range [doc_lo, doc_hi) pinned in
    one process.  Candidates outside the range are masked out (a segment
    may straddle a range boundary), so ranges partition the corpus exactly
    and per-shard candidate totals sum to the true total."""

    def __init__(self, field_specs: dict[str, tuple],
                 doc_lo: int, doc_hi: int):
        from ..state.segment import SegmentReader

        self.lo = doc_lo
        self.hi = doc_hi
        self.readers = {
            f: sorted(
                (SegmentReader(spec[0], s,
                               spec[2] if len(spec) > 2 else None)
                 for s in spec[1]),
                key=lambda r: r.doc_id_base,
            )
            for f, spec in field_specs.items()
        }
        self._dead_cache = None

    def ready(self) -> int:
        return sum(
            r.num_terms for rs in self.readers.values() for r in rs
        )

    def dismax(self, field_terms: dict[str, list[str]],
               field_idfs: dict[str, dict[str, float]],
               field_avgdl: dict[str, float],
               field_boosts: dict[str, float], tie_breaker: float, k: int,
               scoring: str, k1: float, b: float):
        """Local top-k of ``best + tie_breaker * (sum - best)`` over boosted
        per-field BM25 (exhaustive TAAT per field — any tie_breaker > 0
        reorders docs below the per-field top-k).  tie_breaker=0 is ES
        best_fields, 1.0 is most_fields (sum)."""
        import numpy as np

        from ..stages import scoring as sc

        per_field: list[tuple[np.ndarray, np.ndarray]] = []
        for f, readers in self.readers.items():
            idfs = field_idfs[f]
            boost = field_boosts.get(f, 1.0)
            parts_i: list[np.ndarray] = []
            parts_s: list[np.ndarray] = []
            for r in readers:
                slots, scores = sc.taat_candidates(
                    r, field_terms[f], idfs, scoring, k1, b,
                    field_avgdl[f],
                )
                if not slots.size:
                    continue
                g = slots + r.doc_id_base
                m = (g >= self.lo) & (g < self.hi)
                g, scores = g[m], scores[m]
                if g.size:
                    parts_i.append(g)
                    parts_s.append(scores * boost)
            if parts_i:
                # readers ascend by doc_id_base with disjoint ranges, so
                # the concatenation is already sorted
                per_field.append(
                    (np.concatenate(parts_i), np.concatenate(parts_s))
                )
        if not per_field:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), 0
        uniq = np.unique(np.concatenate([i for i, _ in per_field]))
        mat = np.zeros((len(per_field), uniq.size), dtype=np.float64)
        for row, (fi, fs) in enumerate(per_field):
            mat[row, np.searchsorted(uniq, fi)] = fs
        best = mat.max(axis=0)
        combined = best + tie_breaker * (mat.sum(axis=0) - best)
        ids, scores = sc._topk_by_score(uniq, combined, k)
        return ids, scores, int(uniq.size)


    # -------------------------------------------------- combined_fields

    def _combined_dl(self, weights: tuple) -> "np.ndarray":
        """Combined document length dl_c(d) = sum_f w_f * len_f(d) over
        this shard's doc range, built once and cached (the range is
        N / num_shards wide, so this is a bounded float array, not a
        corpus-sized one).  Tombstoned docs contribute -inf so they can
        never surface as candidates."""
        import numpy as np

        cached = getattr(self, "_dlc_cache", None)
        if cached is not None and cached[0] == weights:
            return cached[1]
        dlc = np.zeros(self.hi - self.lo, dtype=np.float64)
        dead = np.zeros(self.hi - self.lo, dtype=bool)
        wmap = dict(weights)
        for f, readers in self.readers.items():
            w = wmap.get(f, 1.0)
            for r in readers:
                s = max(self.lo, r.doc_id_base)
                e = min(self.hi, r.doc_id_base + r.doc_lens.size)
                if s >= e:
                    continue
                seg = r.doc_lens[s - r.doc_id_base:e - r.doc_id_base]
                dlc[s - self.lo:e - self.lo] += w * np.maximum(seg, 0)
                dead[s - self.lo:e - self.lo] |= seg < 0
        dlc[dead] = -np.inf
        self._dlc_cache = (weights, dlc)
        self._dead_cache = dead
        return dlc

    def _dead_mask(self) -> "np.ndarray":
        """OR of per-field dead flags over this shard's range — the ONE
        liveness definition shared by candidate gathering (via
        _combined_dl's -inf) and combined_dfs, so df_c can never count a
        doc that combined_topk would refuse to return."""
        import numpy as np

        if self._dead_cache is None:
            dead = np.zeros(self.hi - self.lo, dtype=bool)
            for readers in self.readers.values():
                for r in readers:
                    s = max(self.lo, r.doc_id_base)
                    e = min(self.hi, r.doc_id_base + r.doc_lens.size)
                    if s >= e:
                        continue
                    seg = r.doc_lens[s - r.doc_id_base:e - r.doc_id_base]
                    dead[s - self.lo:e - self.lo] |= seg < 0
            self._dead_cache = dead
        return self._dead_cache

    def combined_dfs(self, terms: list[str]) -> list[int]:
        """Per term: how many docs of this shard's range contain it in
        ANY field (the combined-field document frequency).  Shard ranges
        partition the corpus, so the driver's sum is the exact global
        df_c."""
        import numpy as np

        dead = self._dead_mask()
        out = []
        for t in terms:
            acc = []
            for readers in self.readers.values():
                for r in readers:
                    res = r.postings_slots(t)
                    if res is None:
                        continue
                    g = res[0] + r.doc_id_base
                    g = g[(g >= self.lo) & (g < self.hi)]
                    # the COMBINED liveness mask (dead in ANY field =
                    # never a candidate), not this reader's own doc_lens
                    # — otherwise df_c counts docs combined_topk refuses
                    # to return and deflates every other doc's idf
                    acc.append(g[~dead[g - self.lo]])
            out.append(
                int(np.unique(np.concatenate(acc)).size) if acc else 0
            )
        return out

    def combined_topk(self, terms: list[str], idfs: dict[str, float],
                      weights: tuple, avgdl_c: float, k: int,
                      k1: float, b: float):
        """ES ``combined_fields`` shard scoring (BM25F as ES simplifies
        it, combined_fields docs): per term the COMBINED term frequency
        tf_c = sum_f w_f * tf_f, per doc the combined length dl_c and the
        corpus-level combined avgdl, fed through plain BM25 with the
        combined df.  All-field candidate gather is one concatenate +
        lexsort + run-length sum per term; no per-doc python."""
        import numpy as np

        from ..stages import scoring as sc

        dlc = self._combined_dl(weights)
        wmap = dict(weights)
        cand_ids: list[np.ndarray] = []
        cand_sc: list[np.ndarray] = []
        for t in terms:
            idf = idfs.get(t, 0.0)
            if idf == 0.0:
                continue
            gids, tfs = [], []
            for f, readers in self.readers.items():
                w = wmap.get(f, 1.0)
                for r in readers:
                    res = r.postings_slots(t)
                    if res is None:
                        continue
                    slots, tf = res
                    g = slots + r.doc_id_base
                    m = (g >= self.lo) & (g < self.hi)
                    if m.any():
                        gids.append(g[m])
                        tfs.append(w * tf[m].astype(np.float64))
            if not gids:
                continue
            ids = np.concatenate(gids)
            tfc = np.concatenate(tfs)
            order = np.argsort(ids, kind="stable")
            ids, tfc = ids[order], tfc[order]
            bnd = np.flatnonzero(np.diff(ids)) + 1
            uids = ids[np.r_[0, bnd]]
            sums = np.add.reduceat(tfc, np.r_[0, bnd])
            dl = dlc[uids - self.lo]
            live = dl >= 0  # -inf marks tombstones
            uids, sums, dl = uids[live], sums[live], dl[live]
            denom = sums + k1 * (1.0 - b + b * dl / avgdl_c)
            cand_ids.append(uids)
            cand_sc.append(idf * sums * (k1 + 1.0) / denom)
        if not cand_ids:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), 0
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_sc)
        order = np.argsort(ids, kind="stable")
        ids, scores = ids[order], scores[order]
        bnd = np.flatnonzero(np.diff(ids)) + 1
        uids = ids[np.r_[0, bnd]]
        total = np.add.reduceat(scores, np.r_[0, bnd])
        tids, tsc = sc._topk_by_score(uids, total, k)
        return tids, tsc, int(uids.size)


def _merge_shard_parts(query_text: str, parts, size: int) -> dict:
    """Driver-side merge shared by the dismax and combined paths: the
    bounded per-shard (ids, scores, total) parts, ordered (-score,
    doc_id)."""
    import numpy as np

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


class CrossFieldEngine:
    """ES ``multi_match`` with a tie_breaker (``dis_max``) / ``most_fields``
    over per-field indexes that index the SAME corpus (equal doc_counts,
    shared doc_ids).  Doc-range sharding: the corpus is split into
    contiguous ranges, one CrossFieldSearcher per range holding every
    field's overlapping segments.  num_shards=0 -> embedded (in-process)."""

    def __init__(self, field_dirs: dict[str, str],
                 boosts: dict[str, float] | None = None,
                 num_shards: int | None = None,
                 scoring: str = "bm25", k1: float = 1.2, b: float = 0.75):
        import ray

        self.meta = {f: _FieldMeta(d) for f, d in field_dirs.items()}
        counts = {m.doc_count for m in self.meta.values()}
        if len(counts) != 1:
            raise ValueError(
                f"cross-field indexes disagree on doc_count: "
                f"{ {f: m.doc_count for f, m in self.meta.items()} }"
            )
        self.doc_count = counts.pop()
        # the doc-ID SPACE (max doc_id_base + num_docs over fields) —
        # ranges must cover every slot, not just the live doc count
        self.id_space = max(m.id_space for m in self.meta.values())
        self.boosts = {
            f: float((boosts or {}).get(f, 1.0)) for f in field_dirs
        }
        self.scoring = scoring
        self.k1 = k1
        self.b = b
        if num_shards is None:
            # same sizing rule as QueryEngine: ~25k docs amortize one
            # actor RTT, but never more shards than cluster CPUs — a
            # 10M-doc corpus must widen each doc range, not spawn ~400
            # actors that each open every field's overlapping segments.
            num_shards = min(
                max(1, int(ray.cluster_resources().get("CPU", 4))),
                max(1, -(-self.doc_count // 25_000)),
            )
            if num_shards == 1:
                num_shards = 0
        self.embedded: CrossFieldSearcher | None = None
        self.searchers: list = []
        if num_shards == 0:
            self.embedded = CrossFieldSearcher(
                {
                    f: (m.index_dir, [s for s, _, _ in m.segs],
                        m.tombstones)
                    for f, m in self.meta.items()
                },
                0, self.id_space,
            )
            return
        edges = self._range_edges(num_shards)
        remote_cls = ray.remote(CrossFieldSearcher)
        for lo, hi in edges:
            spec = {
                f: (m.index_dir, m.segs_overlapping(lo, hi),
                    m.tombstones)
                for f, m in self.meta.items()
            }
            self.searchers.append(remote_cls.remote(spec, lo, hi))
        ray.get([s.ready.remote() for s in self.searchers])

    def _range_edges(self, n: int) -> list[tuple[int, int]]:
        step = -(-self.id_space // n)
        return [
            (i * step, min((i + 1) * step, self.id_space))
            for i in range(n)
            if i * step < self.id_space
        ]

    def search(self, query_text: str, size: int = 10,
               tie_breaker: float = 0.0) -> dict:
        import numpy as np
        import ray

        field_terms = {
            f: m.normalizer.preprocess_query_list(query_text)
            for f, m in self.meta.items()
        }
        if all(not t for t in field_terms.values()) or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        field_idfs = {f: m.idfs(field_terms[f]) for f, m in self.meta.items()}
        field_avgdl = {f: m.avgdl for f, m in self.meta.items()}
        args = (field_terms, field_idfs, field_avgdl, self.boosts,
                float(tie_breaker), size, self.scoring, self.k1, self.b)
        if self.embedded is not None:
            parts = [self.embedded.dismax(*args)]
        else:
            parts = ray.get(
                [s.dismax.remote(*args) for s in self.searchers]
            )
        return _merge_shard_parts(query_text, parts, size)

    def search_combined(self, query_text: str, size: int = 10) -> dict:
        """ES ``combined_fields`` query: all fields scored as ONE
        pseudo-field (the principled BM25F-style alternative to
        cross_fields — ES combined_fields docs): per doc and term the
        combined tf_c = sum_f w_f * tf_f(t,d), combined length
        dl_c = sum_f w_f * len_f(d), corpus combined
        avgdl_c = sum_f w_f * total_len_f / N, and the combined
        df_c(t) = |{d : t in any field}|, fed through plain BM25 with
        idf = ln((N+1)/(df_c+1)) (engine convention).

        Two actor rounds, like ranked search: (1) exact global df_c per
        term (shard ranges partition the corpus, so per-shard unions sum
        exactly), (2) shard-local top-k.  Requires all fields to share
        an analyzer (ES requirement too)."""
        import numpy as np
        import ray

        if self.scoring != "bm25":
            # ES combined_fields is BM25-only; silently scoring BM25
            # under scoring='tfidf' would mislead the caller
            raise ValueError(
                "combined_fields supports scoring='bm25' only "
                f"(engine has {self.scoring!r})")
        analyzers = {m.analyzer for m in self.meta.values()}
        if len(analyzers) != 1:
            # ES rejects combined_fields over mixed-analyzer fields —
            # analyzing with one field's chain would silently miss
            # every match in the others
            raise ValueError(
                f"combined_fields requires one shared analyzer, got "
                f"{sorted(analyzers)}")
        meta0 = next(iter(self.meta.values()))
        analyzed = meta0.normalizer.preprocess_query_list(query_text)
        terms = list(dict.fromkeys(analyzed))  # df round dedups; scoring
        # re-weights duplicates below
        if not terms or self.doc_count == 0:
            return {"query": query_text, "total_hits": 0, "results": []}
        counts: dict[str, int] = dict.fromkeys(terms, 0)
        weights = tuple(sorted(self.boosts.items()))
        if self.embedded is not None:
            df_parts = [self.embedded.combined_dfs(terms)]
        else:
            df_parts = ray.get(
                [s.combined_dfs.remote(terms) for s in self.searchers]
            )
        for part in df_parts:
            for t, n in zip(terms, part):
                counts[t] += int(n)
        from ..state.dfshards import idf as _idf

        n_docs = self.doc_count
        # duplicate query terms score once per occurrence (BM25 bag of
        # words): fold multiplicity into idf — reusing the ONE analyzed
        # token list (no second analysis pass) and the engine's shared
        # idf convention.  NOTE the raw-formula fallback when df_c is 0:
        # dfshards.idf returns 0.0 there, but combined df_c == 0 with a
        # candidate present can't happen (df round covers all shards)
        mult: dict[str, int] = {}
        for t in analyzed:
            mult[t] = mult.get(t, 0) + 1
        idfs = {t: mult[t] * _idf(n_docs, counts[t]) for t in terms}
        avgdl_c = sum(
            self.boosts[f] * m.avgdl for f, m in self.meta.items()
        )
        args = (terms, idfs, weights, avgdl_c, size, self.k1, self.b)
        if self.embedded is not None:
            parts = [self.embedded.combined_topk(*args)]
        else:
            parts = ray.get(
                [s.combined_topk.remote(*args) for s in self.searchers]
            )
        return _merge_shard_parts(query_text, parts, size)

    def close(self) -> None:
        import ray

        for s in self.searchers:
            ray.kill(s)
        self.searchers = []
        self.embedded = None
