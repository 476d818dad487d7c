"""NRT refresh: a live engine picks up extend_index segments and new
tombstones without rebuilding — results identical to a freshly loaded
engine."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.pipelines.build import (
    BuildConfig,
    add_tombstones,
    build_index,
    extend_index,
    merge_segments,
)
from elasticsearch_ray.pipelines.query import QueryEngine

VOCAB = ["merge", "hash", "scan", "join", "other", "words", "table"]
QUERIES = ["merge hash", "scan join table", "merge AND hash",
           "words OR (scan AND NOT join)"]


def _write(path, rows):
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(path),
    )


def _snap(eng):
    out = {}
    for q in QUERIES:
        r = eng.search(q, size=300)
        out[q] = (
            r["total_hits"],
            [(h["doc_id"], round(h["score"], 10)) for h in r["results"]],
        )
    return out


@pytest.mark.parametrize("num_searchers", [2, 0])
def test_refresh_sees_extends_and_deletes(tmp_path, num_searchers):
    rng = random.Random(71)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(80)
    ]
    more = [
        {"doc_id": 80 + i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(50)
    ]
    src = tmp_path / f"src{num_searchers}"; src.mkdir()
    _write(src / "a.parquet", rows)
    _write(src / "b.parquet", more)
    idx = str(tmp_path / f"idx{num_searchers}")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=25, target_partition_rows=20),
    )
    live = QueryEngine(idx, num_searchers=num_searchers)
    try:
        base = _snap(live)

        extend_index(idx, [str(src / "b.parquet")])
        # unrefreshed engine still serves the old view
        assert _snap(live) == base
        res = live.refresh()
        assert res["segments_added"] >= 1

        fresh = QueryEngine(idx, num_searchers=2)
        try:
            assert _snap(live) == _snap(fresh)
            assert live.doc_count == 130
        finally:
            fresh.close()

        # delete path: tombstones become visible on refresh
        victim = _snap(live)["merge hash"][1][0][0]
        add_tombstones(idx, [victim])
        live.refresh()
        got = _snap(live)
        assert all(
            victim not in [d for d, _ in v[1]] for v in got.values()
        )
        fresh = QueryEngine(idx, num_searchers=2)
        try:
            assert got == _snap(fresh)
        finally:
            fresh.close()

        # merged-away segments can't refresh into a live engine
        merge_segments(idx, target_docs=10_000)
        with pytest.raises(ValueError, match="merged/removed"):
            live.refresh()
    finally:
        live.close()


def test_refresh_embedded_invalidates_docvalue_caches(tmp_path):
    """Regression (round-4 ADVICE): embedded refresh() must drop the
    Searcher's per-reader doc-value caches (facet codes, numeric values,
    embedding matrices).  Before the fix, a facet/stats/filter/sort query
    issued BEFORE extend_index left cached lists shorter than
    self.readers — zip consumers silently skipped the new segments and
    the filter path raised IndexError."""
    rng = random.Random(97)

    def mk(lo, n):
        return [
            {"doc_id": lo + i,
             "text": " ".join(rng.choice(VOCAB)
                              for _ in range(rng.randint(3, 9))),
             "source": f"s{rng.randint(0, 2)}",
             "n_chars": rng.randint(50, 500)}
            for i in range(n)
        ]

    rows, more = mk(0, 80), mk(80, 50)
    src = tmp_path / "src"; src.mkdir()
    _write(src / "a.parquet", rows)
    _write(src / "b.parquet", more)
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars"),
                    docs_per_segment=25, target_partition_rows=20),
    )
    live = QueryEngine(idx, num_searchers=0)
    try:
        def agg_snap(eng):
            return (
                [(b["key"], b["doc_count"])
                 for b in eng.search_facets("merge hash", "source",
                                            size=10)["buckets"]],
                eng.search_stats("merge hash", "n_chars"),
                eng.search("merge hash", size=300,
                           filter={"range": {"n_chars": {"gte": 100,
                                                         "lte": 400}}}),
                eng.search_sort(None, "n_chars", order="desc", size=300),
            )

        agg_snap(live)  # warm every per-reader doc-value cache
        extend_index(idx, [str(src / "b.parquet")])
        live.refresh()

        fresh = QueryEngine(idx, num_searchers=0)
        try:
            got, exp = agg_snap(live), agg_snap(fresh)
            assert got == exp
            # sanity: the aggregates really do see the new segments
            assert got[1]["count"] > 0
            assert got[3]["total_hits"] == 130
        finally:
            fresh.close()
    finally:
        live.close()
