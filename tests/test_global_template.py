"""ES global aggregation (all-docs bucket alongside query-scoped stats)
and search_template (mustache {{var}} rendering into the query router):
oracle comparisons against plain-python recomputation, embedded and
distributed, plus render_template unit semantics."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _build(tmp_path):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    rng = random.Random(11)
    vocab = ["merge", "hash", "scan", "join", "sort"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "n_chars": rng.randint(10, 200),
        }
        for i in range(90)
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_chars",),
                    docs_per_segment=40, target_partition_rows=20),
    )
    return rows, idx


def test_search_global(tmp_path):
    from elasticsearch_ray.pipelines.query import QueryEngine

    rows, idx = _build(tmp_path)
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for q, pred in (
                ("merge", lambda t: "merge" in t.split()),
                ("merge AND hash",
                 lambda t: "merge" in t.split() and "hash" in t.split()),
                (None, lambda t: True),
            ):
                res = eng.search_global(q, "n_chars")
                hit = [r for r in rows if pred(r["text"])]
                assert res["scoped"]["count"] == len(hit)
                assert res["scoped"]["sum"] == sum(
                    r["n_chars"] for r in hit)
                assert res["global"]["count"] == len(rows)
                assert res["global"]["sum"] == sum(
                    r["n_chars"] for r in rows)
                if hit:
                    assert res["scoped"]["avg"] == pytest.approx(
                        sum(r["n_chars"] for r in hit) / len(hit))
        finally:
            eng.close()


def test_render_template():
    from elasticsearch_ray.pipelines.query import render_template

    assert render_template("{{a}} AND {{b}}", {"a": "x", "b": "y"}) \
        == "x AND y"
    assert render_template("{{ a }} OR {{{b}}}", {"a": "x", "b": "y"}) \
        == "x OR y"
    assert render_template("n={{n}} f={{flag}}", {"n": 3, "flag": True}) \
        == "n=3 f=true"
    assert render_template("no placeholders", {}) == "no placeholders"
    with pytest.raises(ValueError, match="missing"):
        render_template("{{a}} {{missing_one}}", {"a": "x"})


def test_search_template_routes(tmp_path):
    from elasticsearch_ray.pipelines.query import QueryEngine

    rows, idx = _build(tmp_path)
    eng = QueryEngine(idx, num_searchers=2)
    try:
        # boolean template == the rendered boolean query, verbatim
        tpl = eng.search_template("{{a}} AND {{b}}",
                                  {"a": "merge", "b": "hash"}, size=50)
        direct = eng.search("merge AND hash", size=50)
        assert [r["doc_id"] for r in tpl["results"]] \
            == [r["doc_id"] for r in direct["results"]]
        assert tpl["total_hits"] == direct["total_hits"]
        assert tpl["template"] == "{{a}} AND {{b}}"
        # wildcard route
        tplw = eng.search_template("{{w}}*", {"w": "mer"}, size=50)
        dw = eng.search("mer*", size=50)
        assert [r["doc_id"] for r in tplw["results"]] \
            == [r["doc_id"] for r in dw["results"]]
        # ranked match route: scores identical
        tplm = eng.search_template("{{q}}", {"q": "merge sort"}, size=10)
        dm = eng.search("merge sort", size=10)
        assert [(r["doc_id"], r["score"]) for r in tplm["results"]] \
            == [(r["doc_id"], r["score"]) for r in dm["results"]]
        with pytest.raises(ValueError, match="missing"):
            eng.search_template("{{nope}}", {})
    finally:
        eng.close()


def test_ids_and_terms_lookup(tmp_path):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(3)
    vocab = ["merge", "hash", "scan"]
    srcs = ["web", "wiki", "book"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(5)),
         "source": srcs[i % 3]}
        for i in range(60)
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",),
                    docs_per_segment=25, target_partition_rows=20),
    )
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            # ids query: live subset, ascending, absent ids dropped
            res = eng.search_ids([7, 3, 999999, 3, 41], size=10)
            assert [r["doc_id"] for r in res["results"]] == [3, 7, 41]
            assert res["total_hits"] == 3
            # terms lookup: docs sharing doc 4's source value
            res = eng.search_terms_lookup(4, "source", size=100)
            want = [r["doc_id"] for r in rows
                    if r["source"] == rows[4]["source"]]
            assert [r["doc_id"] for r in res["results"]] == want
            assert res["total_hits"] == len(want)
            # absent lookup doc -> empty
            assert eng.search_terms_lookup(999999, "source")[
                "total_hits"] == 0
            with pytest.raises(ValueError, match="doc-value column"):
                eng.search_terms_lookup(4, "bogus_field")
        finally:
            eng.close()


def test_rank_eval(tmp_path):
    from elasticsearch_ray import metrics as M
    from elasticsearch_ray.pipelines.query import QueryEngine

    rows, idx = _build(tmp_path)
    eng = QueryEngine(idx, num_searchers=2)
    try:
        rel = [r["doc_id"] for r in rows if r["doc_id"] % 3 == 0]
        reqs = [{"id": "q1", "query": "merge hash", "relevant": rel},
                {"query": "scan", "relevant": rel[:5]}]
        for metric, fn in (
            ("precision", lambda h, r: M.precision(h, r, 10)),
            ("recall", lambda h, r: M.recall(h, r, 10)),
            ("mrr", lambda h, r: M.reciprocal_rank(h[:10], r)),
            ("map", lambda h, r: M.average_precision(h[:10], r)),
            ("ndcg", lambda h, r: M.ndcg(h, r, 10)),
        ):
            res = eng.rank_eval(reqs, metric=metric, k=10)
            want = []
            for req in reqs:
                hits = [x["doc_id"]
                        for x in eng.search(req["query"], size=10)["results"]]
                want.append(fn(hits, req["relevant"]))
            assert res["details"]["q1"]["score"] == pytest.approx(want[0])
            assert res["details"]["scan"]["score"] == pytest.approx(want[1])
            assert res["metric_score"] == pytest.approx(sum(want) / 2)
        with pytest.raises(ValueError, match="metric"):
            eng.rank_eval(reqs, metric="bogus")
        assert eng.rank_eval([], metric="mrr")["metric_score"] == 0.0
    finally:
        eng.close()


def test_rank_eval_duplicate_ids_rejected(tmp_path):
    from elasticsearch_ray.pipelines.query import QueryEngine

    rows, idx = _build(tmp_path)
    eng = QueryEngine(idx, num_searchers=0)
    try:
        with pytest.raises(ValueError, match="not unique"):
            eng.rank_eval([
                {"query": "merge", "relevant": [1]},
                {"query": "merge", "relevant": [2]},
            ])
        # distinct ids make the same queries fine
        res = eng.rank_eval([
            {"id": "a", "query": "merge", "relevant": [1]},
            {"id": "b", "query": "merge", "relevant": [2]},
        ])
        assert set(res["details"]) == {"a", "b"}
    finally:
        eng.close()
