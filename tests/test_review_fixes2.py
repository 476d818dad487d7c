"""Regression tests for the continuation-session review findings:
query_string regexp case-folding, significant_text double-analysis,
histogram extended_bounds lower-bound rounding, batch_search
wildcard/fuzzy routing, weighted_avg weight-sum overflow guard,
search() constraint-drop guard, and pinned totals under boolean
organic queries."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _build(tmp_path, rows, analyzer="plain", positions=False,
           facet_columns=(), store_source=False):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    arrays = {}
    for k, vals in cols.items():
        if isinstance(vals[0], int):
            arrays[k] = pa.array(vals, pa.int64())
        else:
            arrays[k] = pa.array(vals, pa.string())
    pq.write_table(pa.table(arrays), str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer=analyzer, url_column=None, lang_column=None,
                    facet_columns=tuple(facet_columns),
                    store_positions=positions,
                    store_source=store_source,
                    docs_per_segment=30, target_partition_rows=20),
    )
    return QueryEngine(idx, num_searchers=2)


def test_query_string_regexp_case_folded(tmp_path):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["john meets joan", "jane here", "nothing else"])]
    eng = _build(tmp_path, rows)
    try:
        up = eng.query_string("/Jo.n/", size=10)
        lo = eng.query_string("/jo.n/", size=10)
        assert [r["doc_id"] for r in up["results"]] \
            == [r["doc_id"] for r in lo["results"]] == [0]
    finally:
        eng.close()


def test_significant_text_reaches_stemmed_stopword_collisions(tmp_path):
    # 'owned' stems to 'own', an NLTK stopword: the foreground count
    # must still see the indexed term 'own' (single analysis, no
    # re-mapping of already-analyzed tokens)
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["crawler owned homes fast", "crawler owned parks fast",
         "crawler owned homes fast", "unrelated text here",
         "crawler owned parks fast", "other words entirely"])]
    eng = _build(tmp_path, rows, analyzer="reference",
                 store_source=True)
    try:
        res = eng.significant_text("crawler", size=10,
                                          min_doc_count=2)
        keys = {b["key"] for b in res["buckets"]}
        assert "own" in keys
    finally:
        eng.close()


def test_histogram_extended_bounds_floor_lower(tmp_path):
    rows = [{"doc_id": i, "text": "data row", "n": 30 + i}
            for i in range(5)]
    eng = _build(tmp_path, rows, facet_columns=("n",))
    try:
        res = eng.search_histogram(None, "n", interval=10,
                                   min_doc_count=0,
                                   extended_bounds=(5, 25))
        keys = [b["key"] for b in res["buckets"]]
        # ES fills from the bucket CONTAINING the lower bound (key 0)
        assert keys[0] == 0 and 10 in keys and 20 in keys
        neg = eng.search_histogram(None, "n", interval=10,
                                   min_doc_count=0,
                                   extended_bounds=(-15, 5))
        assert neg["buckets"][0]["key"] == -20
    finally:
        eng.close()


def test_batch_search_routes_wildcard_fuzzy_like_search(tmp_path):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["merge here", "merged there", "merger third", "other doc"])]
    eng = _build(tmp_path, rows)
    try:
        qs = ["merg*", "merge~1", "merge here"]
        batched = eng.batch_search(qs, size=10)
        for q, got in zip(qs, batched):
            want = eng.search(q, size=10)
            assert [r["doc_id"] for r in got["results"]] \
                == [r["doc_id"] for r in want["results"]], q
            assert got["total_hits"] == want["total_hits"], q
    finally:
        eng.close()


def test_weighted_avg_weight_sum_overflow_guard(tmp_path):
    big = 2 ** 61
    rows = [{"doc_id": i, "text": "data row", "v": 0, "w": big}
            for i in range(4)]
    eng = _build(tmp_path, rows, facet_columns=("v", "w"))
    try:
        res = eng.search_weighted_avg(None, "v", "w")
        # all values 0 -> exact weighted average 0; the weight sum is
        # 2^63 which overflows int64 — the object-dtype path must run
        assert res["value"] == 0.0
    finally:
        eng.close()


def test_search_rejects_dropped_constraints(tmp_path):
    rows = [{"doc_id": i, "text": t, "n": i} for i, t in enumerate(
        ["alpha beta", "beta gamma", "alpha gamma"])]
    eng = _build(tmp_path, rows, positions=True, facet_columns=("n",))
    try:
        with pytest.raises(ValueError, match="only supported"):
            eng.search("alpha AND beta",
                       filter={"range": {"n": {"gte": 1}}})
        with pytest.raises(ValueError, match="only supported"):
            eng.search('"alpha beta"', minimum_should_match=2)
        # ranked route still accepts them
        res = eng.search("alpha beta",
                         filter={"range": {"n": {"gte": 1}}})
        assert all(r["doc_id"] >= 1 for r in res["results"])
    finally:
        eng.close()


def test_pinned_total_boolean_organic(tmp_path):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["data spark row", "data clean row", "data spark other",
         "nothing here", "data fine too"])]
    eng = _build(tmp_path, rows)
    try:
        # organic 'data AND NOT spark' matches docs 1, 4.
        # pin doc 0 (contains data AND spark -> NOT an organic match)
        # and doc 1 (an organic match):
        res = eng.search_pinned([0, 1], "data AND NOT spark", size=10)
        assert res["total_hits"] == 3  # organic {1,4} + extra pin {0}
        assert [r["doc_id"] for r in res["results"]][:2] == [0, 1]
    finally:
        eng.close()


def _write_docs(path, texts, row_group_size=20):
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), str(path),
        row_group_size=row_group_size,
    )


def test_finalize_ignores_stale_df_parts(tmp_path):
    """Rebuilding a SMALLER corpus into an index_dir holding df parts
    from a prior larger build must not double-count global df (idf
    corruption)."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    cfg = dict(analyzer="plain", url_column=None, lang_column=None,
               target_partition_rows=10, docs_per_segment=10)
    big = tmp_path / "big.parquet"
    _write_docs(big, ["alpha beta"] * 40, row_group_size=10)
    idx = str(tmp_path / "idx")
    build_index(str(big), idx, BuildConfig(**cfg))
    import glob
    assert len(glob.glob(idx + "/df/*.parquet")) == 4

    small = tmp_path / "small.parquet"
    _write_docs(small, ["alpha gamma"] * 10 + ["beta delta"] * 10,
                row_group_size=10)
    build_index(str(small), idx, BuildConfig(**cfg), resume=False)
    eng = QueryEngine(idx, num_searchers=0)
    try:
        # df must reflect ONLY the new 20-doc corpus: alpha df=10 of 20
        import math
        res = eng.search("alpha", size=5)
        want_idf = math.log((20 + 1) / (10 + 1))
        assert res["results"], "alpha must match"
        # idf>0 proves no stale-part inflation pushed df toward N
        exp = eng.explain("alpha", res["results"][0]["doc_id"])
        assert exp["details"][0]["df"] == 10
        assert exp["details"][0]["idf"] == pytest.approx(want_idf)
    finally:
        eng.close()


def test_resume_rejects_changed_lineage(tmp_path):
    """A finished segment is only reused on resume when its recorded
    lineage matches the current plan — swapping the input file forces a
    rebuild instead of serving the old documents."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    cfg = dict(analyzer="plain", url_column=None, lang_column=None,
               target_partition_rows=10, docs_per_segment=20)
    a = tmp_path / "a.parquet"
    _write_docs(a, ["oldword here"] * 20, row_group_size=10)
    idx = str(tmp_path / "idx")
    build_index(str(a), idx, BuildConfig(**cfg))

    b = tmp_path / "b.parquet"
    _write_docs(b, ["newword there"] * 10 + ["filler doc"] * 10,
                row_group_size=10)
    m = build_index(str(b), idx, BuildConfig(**cfg), resume=True)
    assert m.get("segments_skipped_resume", 0) == 0
    eng = QueryEngine(idx, num_searchers=0)
    try:
        assert eng.search("newword")["total_hits"] == 10
        assert eng.search("oldword")["total_hits"] == 0
        # unchanged input IS reused
        m2 = build_index(str(b), idx, BuildConfig(**cfg), resume=True)
        assert m2.get("segments_skipped_resume", 0) == 1
    finally:
        eng.close()


def test_unknown_shuffle_mode_rejected(tmp_path):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    src = tmp_path / "s.parquet"
    _write_docs(src, ["alpha"] * 5)
    with pytest.raises(ValueError, match="unknown shuffle"):
        build_index(str(src), str(tmp_path / "idx"),
                    BuildConfig(analyzer="plain", url_column=None,
                                lang_column=None, shuffle="comine"))


def test_dup_clusters_distributed_long_chain():
    """A chain component longer than pure edge-propagation could resolve
    in max_rounds must still converge (pointer jumping) and match the
    exact driver tier."""
    import ray.data
    from elasticsearch_ray.ops.dedup import dup_clusters

    n = 16
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(list(range(n - 1)), pa.int64()),
        "b": pa.array(list(range(1, n)), pa.int64()),
    }))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
    }))
    # distributed tier (forced): a 15-hop chain at max_rounds=8 only
    # converges with the pointer-jumping shortcut (pure edge
    # propagation needs 15 rounds); every node must collapse to 0
    out = dup_clusters(docs, edges=edges, driver_edge_limit=0,
                       max_rounds=8, num_partitions=2).take_all()
    assert {r["cluster"] for r in out} == {0}
    assert len(out) == n
    # driver tier agrees
    out2 = dup_clusters(docs, edges=edges,
                        driver_edge_limit=10**9).take_all()
    assert sorted((r["doc_id"], r["cluster"]) for r in out) \
        == sorted((r["doc_id"], r["cluster"]) for r in out2)


def test_tokenizer_misconfig_rejected(tmp_path):
    """Misconfigurations fail loudly instead of silently building a
    wrong/empty index: lang_filter without the column, facet names
    colliding with core docmap columns, positions on the triples
    shuffle, unknown fault mode."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.stages.tokenizer import TokenizePartition

    src = tmp_path / "s.parquet"
    _write_docs(src, ["alpha beta"] * 8)  # NO lang column
    with pytest.raises(Exception, match="lang"):
        build_index(str(src), str(tmp_path / "i1"),
                    BuildConfig(analyzer="plain", url_column=None,
                                lang_column="lang", lang_filter="en"))
    with pytest.raises(ValueError, match="collide"):
        TokenizePartition(str(tmp_path), facet_columns=["doc_len"])
    with pytest.raises(ValueError, match="triples"):
        TokenizePartition(str(tmp_path), emit="triples",
                          store_positions=True)
    with pytest.raises(ValueError, match="fault_inject_mode"):
        TokenizePartition(str(tmp_path), fault_inject_mode="rasie")


def test_wildcard_prefix_range_unicode_edge(tmp_path):
    """A term containing U+10FFFF right after the prefix must be found
    by wildcard expansion (the old sentinel-based upper bound silently
    excluded it)."""
    weird = "foo\U0010FFFFx"
    rows = [{"doc_id": 0, "text": f"foo {weird} fool"},
            {"doc_id": 1, "text": "other doc"}]
    eng = _build(tmp_path, rows)
    try:
        res = eng.search("foo*", size=10)
        assert [r["doc_id"] for r in res["results"]] == [0]
        # all three foo-prefixed terms expand (df probe via analyze of
        # the wildcard route's total): doc 0 matched via any of them
        assert res["total_hits"] == 1
    finally:
        eng.close()


def test_date_histograms_null_safe():
    """Null timestamps are dropped (ES: docs missing the date field)
    and null values count in the bucket but contribute 0 to the sum
    (ES sum sub-aggs skip missing) — previously NaN leaked through
    int64 casts into INT64_MIN-scale garbage."""
    import datetime as dt

    import ray.data
    from elasticsearch_ray.ops.events import (
        auto_date_histogram, date_histogram, date_histogram_fixed)

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "ts": pa.array([t0, t0 + dt.timedelta(hours=1), None, t0],
                       pa.timestamp("us")),
        "value": pa.array([1.0, None, 5.0, 2.0], pa.float64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = sorted(date_histogram_fixed(ds, 24 * 3600 * 1_000_000)
                 .take_all(), key=lambda r: r["bucket_us"])
    assert len(out) == 1
    assert out[0]["n"] == 3          # null-ts row dropped
    assert out[0]["sum_cents"] == 300  # 1.0 + 0 + 2.0 in cents
    assert isinstance(out[0]["bucket_us"], int)
    out2 = date_histogram(ds, "day").take_all()
    assert out2[0]["n"] == 3 and out2[0]["sum_cents"] == 300
    out3 = auto_date_histogram(ds, target_buckets=10).take_all()
    assert sum(r["n"] for r in out3) == 3
    assert sum(r["sum_cents"] for r in out3) == 300


def test_crossfield_tombstones_and_ranges(tmp_path):
    """CrossFieldEngine must hide tombstoned docs immediately (like
    QueryEngine) and shard by the doc-ID SPACE, not kept_docs — a
    deleted doc previously stayed searchable cross-field and shrank the
    range cover."""
    from elasticsearch_ray.pipelines.build import (BuildConfig,
                                                   add_tombstones,
                                                   build_index)
    from elasticsearch_ray.pipelines.fields import CrossFieldEngine

    rows = [{"doc_id": i,
             "title": ("target phrase" if i in (0, 41) else "other head"),
             "text": ("body words here" if i % 2 else "target body")}
            for i in range(42)]
    src = tmp_path / "src.parquet"
    pq.write_table(
        pa.table({
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
        }), str(src))
    dirs = {}
    for fld in ("title", "text"):
        idx = str(tmp_path / f"idx_{fld}")
        build_index(str(src), idx,
                    BuildConfig(analyzer="plain", text_column=fld,
                                url_column=None, lang_column=None,
                                docs_per_segment=20,
                                target_partition_rows=10))
        dirs[fld] = idx

    for shards in (0, 3):
        eng = CrossFieldEngine(dict(dirs), num_shards=shards)
        try:
            got = [r["doc_id"] for r in
                   eng.search("target", size=50)["results"]]
            # doc 41 (last doc, tail of the id space) must be reachable
            assert 41 in got and 0 in got
        finally:
            eng.close()

    # tombstone doc 0 in BOTH field indexes: cross-field must hide it
    for idx in dirs.values():
        add_tombstones(idx, [0])
    for shards in (0, 3):
        eng = CrossFieldEngine(dict(dirs), num_shards=shards)
        try:
            res = eng.search("target", size=50)
            got = [r["doc_id"] for r in res["results"]]
            assert 0 not in got and 41 in got
            resc = eng.search_combined("target", size=50)
            gotc = [r["doc_id"] for r in resc["results"]]
            assert 0 not in gotc and 41 in gotc
        finally:
            eng.close()


def test_normalizer_batch_scalar_agree_on_control_chars():
    """RE2 (batch/index) and Python re (scalar/query) token streams must
    agree on the ASCII control chars where \\s definitions diverge, and
    html tag bodies must skip quoted attribute values."""
    from elasticsearch_ray.normalizer.tokenize import (
        HtmlStripNormalizer, Normalizer, PlainNormalizer, html_strip,
        preprocess_boolean_query, tokenize_rows_flat)

    n = Normalizer()
    cases = ["see www.example.com\x0bhello there",
             "a@b\x1cnext words", "normal text rows", "café menu"]
    td, codes, terms = tokenize_rows_flat(n, n.clean_batch(cases))
    flat = [[terms[c] for c, d in zip(codes, td) if d == i]
            for i in range(len(cases))]
    for t, got in zip(cases, flat):
        assert got == n.tokenize(t), t

    assert html_strip('<a href="x>y">link</a>') == "link"
    h = HtmlStripNormalizer(PlainNormalizer())
    t = "a<script>x</script\x0b> b important tail"
    assert h.clean_batch([t]) == [h.base.normalize_text(html_strip(t))] \
        or h.clean_batch([t])[0].split() == h.tokenize(t)
    assert preprocess_boolean_query("cats AND <b>dogs</b>", h) \
        == ("cats", "AND", "dogs")


def test_segment_shuffle_sorted_dictionary(tmp_path):
    """shuffle='segment' must write a term-SORTED dictionary — the
    reader's prefix/wildcard bisection assumes it (hash order silently
    broke every wildcard/prefix/regexp query on such indexes)."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.state.segment import SegmentReader

    texts = ["merge merged merger alpha", "beta mercy", "alpha beta",
             "merge once more"]
    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}),
                   str(src))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildConfig(analyzer="plain", shuffle="segment",
                            target_partition_rows=2, docs_per_segment=4,
                            url_column=None, lang_column=None))
    r = SegmentReader(idx, 0)
    assert r._term_list == sorted(r._term_list)
    eng = QueryEngine(idx, num_searchers=0)
    try:
        res = eng.search("merg*", size=10)
        assert sorted(x["doc_id"] for x in res["results"]) == [0, 3]
        res2 = eng.search("me*", size=10)
        assert sorted(x["doc_id"] for x in res2["results"]) == [0, 1, 3]
    finally:
        eng.close()


def test_boolean_phrase_null_clauses_and_prefix(tmp_path):
    """Lucene null-clause semantics for quoted spans that analyze to
    zero terms (dropped WITH their operator, both routes agree), plus
    match_phrase_prefix spans keeping their semantics inside boolean
    expressions; 'NOT NOT a' parses as nested negation."""
    from elasticsearch_ray.oracle.oracle import OracleIndex, to_rpn
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    assert to_rpn(("NOT", "NOT", "a")) == ("a", "NOT", "NOT")
    texts = ["neural network training deep", "neural nets are fun",
             "deep dives only", "dog runs deep"]
    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}),
                   str(src))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx,
                BuildConfig(analyzer="reference", target_partition_rows=2,
                            docs_per_segment=4, url_column=None,
                            lang_column=None, store_positions=True))
    eng = QueryEngine(idx, num_searchers=2)
    o = OracleIndex(store_positions=True)
    o.build(list(enumerate(texts)))
    try:
        for q, want in (
            ('"x" OR dog', [3]),          # null span drops with its OR
            ('"x" AND dog', [3]),         # Lucene drops the null must
            ('dog AND NOT "x"', [3]),
            ('"neural net*" AND deep', [0]),
            ('deep AND NOT "neural net*"', [2, 3]),
        ):
            eids = sorted(r["doc_id"]
                          for r in eng.search(q, size=10)["results"])
            oids = sorted(r["doc_id"]
                          for r in o.query_phrase(q, size=10)["results"])
            assert eids == oids == want, (q, eids, oids)
        with pytest.raises(ValueError, match="duplicate doc_id"):
            OracleIndex().build([(1, "a b"), (1, "c")])
    finally:
        eng.close()
