"""Edge cases: empty corpus, all-empty texts, unicode, stopword-only docs,
weird queries."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _build(tmp_path, texts, name, **cfg_kwargs):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    src = str(tmp_path / f"{name}.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src, row_group_size=10
    )
    idx = str(tmp_path / f"idx_{name}")
    m = build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=10,
            docs_per_segment=20,
            url_column=None,
            lang_column=None,
            **cfg_kwargs,
        ),
    )
    return idx, m


def test_all_empty_texts(tmp_path):
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx, m = _build(tmp_path, ["", "   ", "the and of", "!!!"], "empty")
    assert m["doc_count"] == 4
    assert m["total_tokens"] == 0
    eng = QueryEngine(idx, num_searchers=0)
    try:
        assert eng.search("anything")["total_hits"] == 0
        # NOT over an index with only token-less docs: universe = all 4 docs
        res = eng.search("foo OR NOT foo")
        assert res["total_hits"] == 4
    finally:
        eng.close()


def test_unicode_and_noise(tmp_path):
    from elasticsearch_ray.oracle import OracleIndex
    from elasticsearch_ray.pipelines.query import QueryEngine

    texts = [
        "café naïve résumé TOKYO 東京 deadbeef",
        "ça va très bien deadbeef émigré",
        "ASCII only document here deadbeef",
    ]
    idx, m = _build(tmp_path, texts, "uni")
    o = OracleIndex()
    o.build(list(enumerate(texts)))
    eng = QueryEngine(idx, num_searchers=0)
    try:
        for q in ["deadbeef", "caf document", "va AND bien"]:
            got = eng.search(q)
            exp = o.query(q)
            assert got["total_hits"] == exp["total_hits"], q
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], q
    finally:
        eng.close()


def test_single_doc_corpus(tmp_path):
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx, m = _build(tmp_path, ["lonely document text"], "single")
    assert m["doc_count"] == 1
    eng = QueryEngine(idx, num_searchers=0)
    try:
        # every term has df == N -> idf 0 -> reference semantics: no hits
        assert eng.search("lonely")["total_hits"] == 0
        assert eng.search("lonely AND text")["total_hits"] == 1
    finally:
        eng.close()


def test_weird_queries(tiny_engine, tiny_oracle):
    for q in [
        "", "   ", "AND", "NOT", "(", ")", "(()", "a AND",
        "AND AND OR", "(news", "news)", "42 7", "x",
        "news AND AND sky",
    ]:
        got = tiny_engine.search(q)
        exp = tiny_oracle.query(q)
        assert got["total_hits"] == exp["total_hits"], repr(q)
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], repr(q)


def test_extreme_skew_hot_term(tmp_path):
    """One term in EVERY doc with high tf (df == N): the sort shuffle splits
    its postings into many runs, the merge reassembles them exactly, and both
    scoring semantics (idf=0 skip for df==N) and boolean retrieval hold."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.state.segment import SegmentReader

    texts = [("hotword " * 30) + f"unique{i} filler{i % 7}" for i in range(400)]
    src = str(tmp_path / "skew.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src, row_group_size=20
    )
    idx = str(tmp_path / "idx_skew")
    m = build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=20,
            docs_per_segment=200,
            shuffle="sort",
            url_column=None,
            lang_column=None,
        ),
    )
    assert m["doc_count"] == 400
    for seg in range(m["num_segments"]):
        r = SegmentReader(idx, seg)
        ids, tfs = r.postings("hotword")
        assert ids.size == r.num_docs  # df == local N
        assert (tfs == 30).all()
        assert (np.diff(ids) > 0).all()
    eng = QueryEngine(idx, num_searchers=0)
    try:
        # df == N -> idf == 0 -> ranked skips the term (reference semantics)
        assert eng.search("hotword")["total_hits"] == 0
        # boolean still finds everything
        assert eng.search("hotword AND unique5")["total_hits"] == 1
        res = eng.search("unique7 hotword")
        assert res["results"][0]["doc_id"] == 7
    finally:
        eng.close()


def test_include_urls(tiny_engine):
    res = tiny_engine.search("news sky connection", include_urls=True)
    if res["results"]:
        assert all(r["url"].startswith("https://site") for r in res["results"])


def test_prefix_columns_title_concat(tmp_path):
    """Reference M3: full_text = f'{title}. {text}' (preprocess_data.py:84)."""
    from elasticsearch_ray.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    titles = ["Alpha Title", "Beta Heading", "Gamma"]
    bodies = ["body words here", "other body text", "alpha appears in body"]
    src = str(tmp_path / "titled.parquet")
    pq.write_table(
        pa.table(
            {
                "title": pa.array(titles, pa.string()),
                "text": pa.array(bodies, pa.string()),
            }
        ),
        src,
    )
    idx = str(tmp_path / "idx_titled")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=2,
            docs_per_segment=3,
            url_column=None,
            lang_column=None,
            prefix_columns=("title",),
        ),
    )
    o = OracleIndex()
    o.build([(i, f"{t}. {b}") for i, (t, b) in enumerate(zip(titles, bodies))])
    eng = QueryEngine(idx, num_searchers=0)
    try:
        for q in ["alpha", "beta AND body", "title OR heading"]:
            got = eng.search(q)
            exp = o.query(q)
            assert got["total_hits"] == exp["total_hits"], q
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], q
    finally:
        eng.close()
