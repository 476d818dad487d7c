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
