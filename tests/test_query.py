"""Golden query tests: the distributed engine must be rank-identical AND
score-identical to the in-repo oracle (SURVEY.md §5.2), for ranked (TAAT /
DAAT / block-max WAND) and boolean queries, including the reference's own
100-query conformance set."""

import json
import os
import random

import pytest

from elasticsearch_ray.oracle.oracle import looks_boolean
from elasticsearch_ray.sources.synthetic import VOCAB

REFERENCE_QUERYSET = "/root/reference/queryset.json"


def fixture_queries():
    qs = [
        "run", "running studies", "news sky connection",
        "generalization oscillators", "the and of", "xyzzy notaterm",
        "maximize argument trouble happy", "dying lying tying news",
        "run AND studi", "(run OR news) AND NOT sky",
        "trouble NOT (argue OR maximize)", "run AND (studi OR news)",
        "NOT zitiri", "news OR sky OR trouble",
    ]
    rng = random.Random(7)
    qs += [" ".join(rng.sample(VOCAB[:300], rng.randint(1, 4))) for _ in range(25)]
    qs += [
        f"{rng.choice(VOCAB[:100])} AND {rng.choice(VOCAB[:100])}" for _ in range(8)
    ]
    qs += [
        f"({rng.choice(VOCAB[:200])} OR {rng.choice(VOCAB[:200])}) "
        f"AND NOT {rng.choice(VOCAB[:50])}"
        for _ in range(8)
    ]
    return qs


def assert_result_match(got, exp, check_total=True, rel_tol=1e-12):
    if check_total:
        assert got["total_hits"] == exp["total_hits"], (got, exp)
    g_ids = [r["doc_id"] for r in got["results"]]
    e_ids = [r["doc_id"] for r in exp["results"]]
    assert g_ids == e_ids, (got["query"], g_ids, e_ids)
    for a, b in zip(got["results"], exp["results"]):
        assert abs(a["score"] - b["score"]) <= rel_tol * max(1.0, abs(b["score"]))


def test_fixture_queries_taat_and_boolean(tiny_engine, tiny_oracle):
    for q in fixture_queries():
        assert_result_match(tiny_engine.search(q), tiny_oracle.query(q))


def test_fixture_queries_wand(tiny_engine, tiny_oracle):
    for q in fixture_queries():
        if looks_boolean(q):
            continue
        got = tiny_engine.search(q, mode="wand")
        exp = tiny_oracle.query_taat(q)
        assert_result_match(got, exp, check_total=False, rel_tol=1e-9)


def test_fixture_queries_engine_daat(tiny_engine, tiny_oracle):
    """Engine cursor-DAAT is rank-, score- and total-identical to the
    oracle on the fixture query set."""
    for q in fixture_queries():
        if looks_boolean(q):
            continue
        got = tiny_engine.search(q, mode="daat")
        exp = tiny_oracle.query_taat(q)
        assert_result_match(got, exp, rel_tol=1e-9)


def test_fixture_queries_daat_oracle_agreement(tiny_engine, tiny_oracle):
    """Oracle DAAT == oracle TAAT == engine (reference Q1/Q2 equivalence)."""
    for q in fixture_queries()[:10]:
        if looks_boolean(q):
            continue
        taat = tiny_oracle.query_taat(q)
        daat = tiny_oracle.query_daat(q)
        assert [r["doc_id"] for r in taat["results"]] == [
            r["doc_id"] for r in daat["results"]
        ]


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_QUERYSET), reason="reference queryset not present"
)
def test_reference_queryset_conformance(tiny_engine, tiny_oracle):
    """All 100 reference queries (``queryset.json:76-177``) run identically
    on engine and oracle over the synthetic corpus (most have 0 hits here —
    the strata still exercise routing, RPN, and scoring paths)."""
    with open(REFERENCE_QUERYSET) as f:
        data = json.load(f)
    queries = data["queries"] if isinstance(data, dict) else data
    assert len(queries) >= 50
    for q in queries:
        assert_result_match(tiny_engine.search(q), tiny_oracle.query(q))


def test_tfidf_scoring_mode(tiny_index_dir, tiny_oracle):
    from elasticsearch_ray.pipelines.query import QueryEngine

    eng = QueryEngine(tiny_index_dir, num_searchers=2, scoring="tfidf")
    try:
        for q in ["news sky connection", "maximize argument trouble"]:
            assert_result_match(eng.search(q), tiny_oracle.query_taat(q, scoring="tfidf"))
    finally:
        eng.close()


def test_batch_search_matches_single(tiny_engine):
    qs = fixture_queries()[:12]
    batch = tiny_engine.batch_search(qs)
    for q, r in zip(qs, batch):
        single = tiny_engine.search(q)
        assert r == single


def test_bm25_hand_computed(tiny_engine, tiny_oracle):
    """BM25 formula spot-check against a hand computation (F6)."""
    import math

    q = "news"
    res = tiny_engine.search(q)
    if not res["results"]:
        pytest.skip("no hits for term in fixture")
    top = res["results"][0]
    d = top["doc_id"]
    tf = tiny_oracle.doc_tf[d].get("news", 0)
    dl = tiny_oracle.doc_len[d]
    N = tiny_oracle.doc_count
    df = tiny_oracle.term_doc_freq["news"]
    idf = math.log((N + 1) / (df + 1))
    k1, b = 1.2, 0.75
    expect = idf * (tf * (k1 + 1)) / (
        tf + k1 * (1 - b + b * (dl / tiny_oracle.avg_doc_length))
    )
    assert abs(top["score"] - expect) < 1e-12


def test_stats_and_urls(tiny_engine):
    st = tiny_engine.get_stats()
    assert st["doc_count"] == 200
    res = tiny_engine.search("news sky connection")
    if res["results"]:
        ids = [r["doc_id"] for r in res["results"][:3]]
        urls = tiny_engine.lookup_urls(ids)
        assert set(urls) == set(ids)
        assert all(u.startswith("https://site") for u in urls.values())


def test_wildcard_query(tmp_path):
    """ES wildcard/prefix term query: sorted-dictionary range scan + regex
    + postings OR, vs a pure-python scan of the corpus."""
    import fnmatch
    import re

    import ray

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    texts = [
        "merge merging merged batch batching slow slot window",
        "shadow meadow merge spark scan",
        "batch slip slap slot merge nothing",
        "unrelated words entirely here",
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(src / "part.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "part.parquet")],
        idx,
        BuildConfig(
            analyzer="plain", url_column=None, lang_column=None,
            docs_per_segment=2, target_partition_rows=2,
        ),
    )
    eng = QueryEngine(idx, num_searchers=0)  # embedded
    try:
        for pat in ("merg*", "sl*t", "s?an", "*dow", "batch*", "zz*"):
            rx = re.compile(fnmatch.translate(pat))
            exp = sorted(
                i
                for i, t in enumerate(texts)
                if any(rx.match(w) for w in t.split())
            )
            res = eng.search(pat, size=10)
            got = [r["doc_id"] for r in res["results"]]
            assert got == exp, (pat, got, exp)
            assert res["total_hits"] == len(exp)
    finally:
        eng.close()


def test_fuzzy_query(tmp_path):
    """ES fuzzy term query (Lucene term~ / term~1 / term~2, bare ~ = AUTO):
    vectorized Levenshtein dictionary expansion + postings OR, vs a
    pure-python edit-distance scan of the corpus (transpositions=false)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine, fuzzy_auto_edits

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = [
        "merge merging merged batch batching slow slot window",
        "shadow meadow merge spark scan",
        "batch slip slap slot merge nothing",
        "unrelated words entirely here",
        "me ma do xx",
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(src / "part.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "part.parquet")],
        idx,
        BuildConfig(
            analyzer="plain", url_column=None, lang_column=None,
            docs_per_segment=2, target_partition_rows=2,
        ),
    )
    eng = QueryEngine(idx, num_searchers=0)  # embedded
    try:
        cases = ["merje~1", "slpt~1", "batc~", "shadw~2", "me~", "zzzz~2",
                 "windoq~", "slo~1"]
        for q in cases:
            term, _, suf = q.partition("~")
            edits = int(suf) if suf else fuzzy_auto_edits(term)
            exp = sorted(
                i
                for i, t in enumerate(texts)
                if any(lev(term, w) <= edits for w in t.split())
            )
            res = eng.search(q, size=10)
            got = [r["doc_id"] for r in res["results"]]
            assert got == exp, (q, edits, got, exp)
            assert res["total_hits"] == len(exp)
        # AUTO thresholds: <=2 chars exact, 3-5 one edit, 6+ two edits
        assert fuzzy_auto_edits("ab") == 0
        assert fuzzy_auto_edits("abcde") == 1
        assert fuzzy_auto_edits("abcdef") == 2
        # max_expansions caps the dictionary expansion (first rows win)
        full = eng.search("merje~2", size=10)
        capped = eng._search_fuzzy("merje~2", 10, max_expansions=1)
        assert capped["total_hits"] <= full["total_hits"]
    finally:
        eng.close()


def test_term_suggester(tmp_path):
    """ES term suggester: per misspelled token, dictionary candidates within
    AUTO edit distance ordered (dist, df desc, term), input term excluded —
    vs a pure-python Levenshtein scan with python-computed dfs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine, fuzzy_auto_edits

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = [
        "merge slow slot window shadow",
        "slow slot merge spark scan",
        "batch slip slap slot merge",
        "window shadow meadow slow",
    ]
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(src / "part.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "part.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=2, target_partition_rows=2),
    )
    vocab: dict[str, set[int]] = {}
    for i, t in enumerate(texts):
        for w in t.split():
            vocab.setdefault(w, set()).add(i)
    eng = QueryEngine(idx, num_searchers=0)
    try:
        for probe in ["slo", "windoq", "shadw", "merje", "slxp", "zzz"]:
            edits = fuzzy_auto_edits(probe)
            exp = sorted(
                (lev(probe, w), -len(ids), w)
                for w, ids in vocab.items()
                if 0 < lev(probe, w) <= edits
            )[:5]
            got = eng.suggest(probe, size=5)["suggest"][0]["options"]
            assert [(o["dist"], -o["df"], o["text"]) for o in got] == exp, (
                probe, got, exp)
    finally:
        eng.close()


def test_facet_counts(tmp_path):
    """ES terms aggregation over build-time docmap doc-values: counts of
    the FULL hit set per facet value, vs a pure-python scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(4)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "source": f"s{rng.randint(0, 3)}",
        }
        for i in range(120)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=50,
                    target_partition_rows=25),
    )
    eng = QueryEngine(idx, num_searchers=0)
    try:
        for q, pred in (
            ("merge", lambda t: "merge" in t.split()),
            ("merge AND hash",
             lambda t: "merge" in t.split() and "hash" in t.split()),
            ("merg*", lambda t: any(w.startswith("merg") for w in t.split())),
        ):
            exp: dict = {}
            for r in rows:
                if pred(r["text"]):
                    exp[r["source"]] = exp.get(r["source"], 0) + 1
            expected = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
            got = [
                (b["key"], b["doc_count"])
                for b in eng.search_facets(q, "source", size=10)["buckets"]
            ]
            assert got == expected, (q, got, expected)
    finally:
        eng.close()


def test_filtered_ranked_query(tmp_path):
    """ES bool filter context: BM25 ranking restricted to docs passing a
    doc-value predicate (range over an integer field / term over a
    categorical one); scores identical to the unfiltered query (filter
    context is non-scoring), hits + totals match the oracle over the
    predicate's doc set — distributed (2 searchers) and embedded agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(11)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "table"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12))),
            "source": f"s{rng.randint(0, 3)}",
            "n_chars": rng.randint(50, 500),
        }
        for i in range(150)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars"), docs_per_segment=40,
                    target_partition_rows=30),
    )
    oracle = OracleIndex()
    oracle.normalizer = QueryEngine(idx, num_searchers=0).normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    filters = [
        ({"range": {"n_chars": {"gte": 100, "lte": 300}}},
         {r["doc_id"] for r in rows if 100 <= r["n_chars"] <= 300}),
        ({"range": {"n_chars": {"gte": 250}}},
         {r["doc_id"] for r in rows if r["n_chars"] >= 250}),
        ({"term": {"source": "s2"}},
         {r["doc_id"] for r in rows if r["source"] == "s2"}),
        ({"term": {"source": "nope"}}, set()),
    ]
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q in ("merge hash", "scan join table"):
                unf = {
                    r["doc_id"]: r["score"]
                    for r in eng.search(q, size=200)["results"]
                }
                for fdict, allowed in filters:
                    got = eng.search(q, size=200, filter=fdict)
                    exp = oracle.query_taat(q, size=200, doc_filter=allowed)
                    assert got["total_hits"] == exp["total_hits"], (q, fdict)
                    assert [
                        (r["doc_id"], round(r["score"], 9))
                        for r in got["results"]
                    ] == [
                        (r["doc_id"], round(r["score"], 9))
                        for r in exp["results"]
                    ], (q, fdict)
                    for r in got["results"]:  # non-scoring filter context
                        assert r["doc_id"] in allowed
                        assert r["score"] == unf[r["doc_id"]]
            # search_after honors filter/msm (round-4 ADVICE: the cursor
            # branch used to silently drop both, so page 2+ of a filtered
            # deep scan disagreed with page 0)
            for kw in ({"filter": filters[0][0]},
                       {"minimum_should_match": 2},
                       {"filter": filters[2][0], "minimum_should_match": 2}):
                full = eng.search("merge hash", size=200, **kw)["results"]
                walked = eng.search("merge hash", size=7, **kw)["results"]
                while walked:
                    last = walked[-1]
                    page = eng.search(
                        "merge hash", size=7,
                        search_after=(last["score"], last["doc_id"]), **kw
                    )
                    assert page["total_hits"] == len(full), kw
                    if not page["results"]:
                        break
                    walked.extend(page["results"])
                assert [(r["doc_id"], round(r["score"], 9)) for r in walked] \
                    == [(r["doc_id"], round(r["score"], 9)) for r in full], kw
        finally:
            eng.close()


def test_sort_by_field_and_count(tmp_path):
    """ES sort-by-doc-value + _count API vs a pure-python scan: hit set of
    match/boolean/wildcard/match_all queries ordered by (n_chars, doc_id)
    both directions, pagination offsets, and exact counts — distributed
    and embedded engines agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(7)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
            "n_chars": rng.randint(10, 99),
        }
        for i in range(130)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_chars",), docs_per_segment=40,
                    target_partition_rows=30),
    )
    preds = {
        None: lambda t: True,
        "merge": lambda t: "merge" in t.split(),
        "merge AND hash":
            lambda t: "merge" in t.split() and "hash" in t.split(),
        "merg*": lambda t: any(w.startswith("merg") for w in t.split()),
    }
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q, pred in preds.items():
                hits = [r for r in rows if pred(r["text"])]
                cnt = eng.count(q)
                assert cnt["count"] == len(hits), q
                for order in ("desc", "asc"):
                    sgn = -1 if order == "desc" else 1
                    exp = sorted(
                        hits, key=lambda r: (sgn * r["n_chars"], r["doc_id"])
                    )
                    got = eng.search_sort(q, "n_chars", order=order, size=15)
                    assert got["total_hits"] == len(hits), (q, order)
                    assert [
                        (r["doc_id"], r["sort"][0]) for r in got["results"]
                    ] == [
                        (r["doc_id"], r["n_chars"]) for r in exp[:15]
                    ], (q, order)
                    page2 = eng.search_sort(
                        q, "n_chars", order=order, size=5, from_=15
                    )
                    assert [
                        (r["doc_id"], r["sort"][0]) for r in page2["results"]
                    ] == [
                        (r["doc_id"], r["n_chars"]) for r in exp[15:20]
                    ], (q, order)
        finally:
            eng.close()


def test_date_histogram_over_timestamp_docvalue(tmp_path):
    """ES date_histogram == histogram over a timestamp doc-value: the
    warc_ts column (timestamp[us]) as a facet column, fixed_interval=1d
    buckets (floor to the day in epoch-us), exact counts vs a python
    scan."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.sources.synthetic import write_webtext

    src = str(tmp_path / "src")
    paths = write_webtext(src, 200, avg_len=40, rows_per_file=100,
                          row_group_size=50)
    idx = str(tmp_path / "idx")
    build_index(
        paths, idx,
        BuildConfig(docs_per_segment=80, target_partition_rows=50,
                    facet_columns=("warc_ts",)),
    )
    day_us = 86_400 * 1_000_000
    ts = []
    for p in paths:
        ts.extend(
            pq.read_table(p, columns=["warc_ts"])
            .column("warc_ts").cast("int64").to_pylist()
        )
    exp: dict = {}
    for v in ts:
        k = (v // day_us) * day_us
        exp[k] = exp.get(k, 0) + 1
    eng = QueryEngine(idx, num_searchers=2)
    try:
        res = eng.search_histogram(None, "warc_ts", day_us)
        got = {b["key"]: b["doc_count"] for b in res["buckets"]}
        assert got == exp
        assert sum(got.values()) == 200
    finally:
        eng.close()


def test_ranked_surface_edge_cases(tiny_engine):
    """Degenerate inputs across the round-3 surfaces: msm above the term
    count, filters/sorts on unmatched values, rescore with an
    out-of-vocabulary rescore query."""
    # msm larger than the distinct-term count -> no doc can qualify
    assert tiny_engine.search(
        "news sky", size=10, minimum_should_match=5
    )["total_hits"] == 0
    # rescore query with no corpus terms -> pure base order preserved
    base = tiny_engine.search("news sky", size=10)
    got = tiny_engine.rescore("news sky", "zzzqqq", size=10,
                              window_size=10)
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in base["results"]
    ]
    # more_like_this on a doc id that doesn't exist
    mlt = tiny_engine.more_like_this(10_000_000)
    assert mlt["total_hits"] == 0 and mlt["results"] == []
    # explain on an out-of-range doc
    ex = tiny_engine.explain("news sky", 10_000_000)
    assert not ex["matched"] and ex["score"] == 0.0


def test_knn_and_rrf_hybrid(tmp_path):
    """Engine-integrated kNN (exact cosine over attached doc-aligned
    embeddings) vs numpy brute force, and RRF hybrid vs a python fusion of
    the oracle BM25 list + the numpy kNN list."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(83)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9)))}
        for i in range(120)
    ]
    nprng = np.random.default_rng(83)
    vecs = nprng.normal(size=(120, 12)).astype(np.float64)
    vecs[7] = 0.0  # a doc with a zero vector never ranks
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    emb = tmp_path / "emb.parquet"
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }),
        str(emb),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    oracle = OracleIndex()
    n = vecs / np.where(
        np.linalg.norm(vecs, axis=1, keepdims=True) == 0, 1.0,
        np.linalg.norm(vecs, axis=1, keepdims=True),
    )
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            oracle.normalizer = eng.normalizer
            if not oracle.doc_count:
                oracle.build([(r["doc_id"], r["text"]) for r in rows])
            eng.attach_embeddings(str(emb))
            for qi in (0, 3, 11):
                q = vecs[qi] / np.linalg.norm(vecs[qi])
                sims = n @ q
                exp = np.lexsort((np.arange(120), -sims))[:8]
                got = eng.knn(vecs[qi], k=8)
                assert [r["doc_id"] for r in got["results"]] == exp.tolist()
                for r, e in zip(got["results"], exp):
                    assert abs(r["cos"] - sims[e]) < 1e-12
            # hybrid: python RRF over oracle-bm25 + numpy-knn windows
            qtext, qi = "merge hash", 3
            lex = oracle.query_taat(qtext, size=20)["results"]
            q = vecs[qi] / np.linalg.norm(vecs[qi])
            sims = n @ q
            vec_rank = np.lexsort((np.arange(120), -sims))[:20]
            rrf: dict = {}
            for rank, r in enumerate(lex, 1):
                rrf[r["doc_id"]] = rrf.get(r["doc_id"], 0.0) + 1 / (60 + rank)
            for rank, d in enumerate(vec_rank.tolist(), 1):
                rrf[d] = rrf.get(d, 0.0) + 1 / (60 + rank)
            exp_top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            got = eng.rrf_hybrid(qtext, vecs[qi], size=10, window=20)
            assert [
                (r["doc_id"], round(r["rrf"], 12)) for r in got["results"]
            ] == [(d, round(s, 12)) for d, s in exp_top]
        finally:
            eng.close()


def test_completion_suggester(tmp_path):
    """ES completion suggester: top dictionary terms extending a prefix by
    (global df desc, term asc) — vs a python scan; cross-shard df sums
    are exact (no local top-k cut)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(53)
    vocab = ["merge", "merger", "merged", "mesh", "metric", "scan", "scanner",
             "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9))),
        }
        for i in range(140)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    df: dict = {}
    for r in rows:
        for t in set(r["text"].split()):
            df[t] = df.get(t, 0) + 1
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for prefix, size in (("me", 3), ("merg", 10), ("sca", 2),
                                 ("zz", 5)):
                exp = sorted(
                    ((t, n) for t, n in df.items() if t.startswith(prefix)),
                    key=lambda kv: (-kv[1], kv[0]),
                )[:size]
                got = eng.complete(prefix, size=size)
                assert [
                    (o["text"], o["df"]) for o in got["options"]
                ] == exp, prefix
        finally:
            eng.close()


def test_msm_filter_composition(tmp_path):
    """minimum_should_match and bool filter context compose in one
    exhaustive pass — randomized corpus vs the oracle with both
    constraints applied."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(47)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "table"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))),
            "n_chars": rng.randint(0, 99),
        }
        for i in range(160)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_chars",), docs_per_segment=50,
                    target_partition_rows=40),
    )
    oracle = OracleIndex()
    eng = QueryEngine(idx, num_searchers=2)
    oracle.normalizer = eng.normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    try:
        for _ in range(8):
            terms = rng.sample(vocab, rng.randint(2, 4))
            q = " ".join(terms)
            lo = rng.randint(0, 60)
            hi = lo + rng.randint(5, 40)
            msm = rng.randint(2, len(terms))
            allowed = {
                r["doc_id"] for r in rows if lo <= r["n_chars"] <= hi
            }
            exp = oracle.query_taat(
                q, size=300, minimum_should_match=msm, doc_filter=allowed
            )
            got = eng.search(
                q, size=300, minimum_should_match=msm,
                filter={"range": {"n_chars": {"gte": lo, "lte": hi}}},
            )
            assert got["total_hits"] == exp["total_hits"], (q, lo, hi, msm)
            assert [
                (r["doc_id"], round(r["score"], 9)) for r in got["results"]
            ] == [
                (r["doc_id"], round(r["score"], 9)) for r in exp["results"]
            ], (q, lo, hi, msm)
    finally:
        eng.close()


def test_rescore(tiny_engine, tiny_oracle):
    """ES rescore: window re-ranked by qw*base + rw*rescore_score —
    vs the oracle's two full rankings combined in python."""
    for q, rq in (("news sky", "home family"), ("work new", "news")):
        base = tiny_oracle.query_taat(q, size=30)
        r2 = {
            r["doc_id"]: r["score"]
            for r in tiny_oracle.query_taat(rq, size=100_000)["results"]
        }
        for qw, rw in ((1.0, 1.0), (0.5, 2.0)):
            exp = sorted(
                (
                    (-(qw * r["score"] + rw * r2.get(r["doc_id"], 0.0)),
                     r["doc_id"])
                    for r in base["results"]
                ),
            )[:10]
            got = tiny_engine.rescore(
                q, rq, size=10, window_size=30,
                query_weight=qw, rescore_weight=rw,
            )
            assert got["total_hits"] == base["total_hits"], (q, rq)
            assert [
                (r["doc_id"], round(r["score"], 9)) for r in got["results"]
            ] == [(d, round(-negs, 9)) for negs, d in exp], (q, rq, qw, rw)


def test_term_vectors_and_exists(tmp_path):
    """ES _termvectors (tf + global df per analyzed term of one doc, from
    stored _source) and the exists query over doc-values with NULL gaps."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(41)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 8))),
            "n_chars": (None if i % 5 == 0 else rng.randint(10, 99)),
            "source": (None if i % 7 == 0 else f"s{rng.randint(0, 2)}"),
        }
        for i in range(105)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars"),
                    docs_per_segment=40, target_partition_rows=30,
                    store_source=True),
    )
    # corpus-wide python dfs
    df: dict = {}
    for r in rows:
        for t in set(r["text"].split()):
            df[t] = df.get(t, 0) + 1
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for seed in (0, 7, 33):
                tv = eng.term_vectors(seed)
                assert tv["found"]
                exp_tf = Counter(rows[seed]["text"].split())
                assert {
                    t: (v["term_freq"], v["doc_freq"])
                    for t, v in tv["terms"].items()
                } == {t: (f, df[t]) for t, f in exp_tf.items()}, seed
            for field, key in (("n_chars", "n_chars"), ("source", "source")):
                exp_ids = [r["doc_id"] for r in rows if r[key] is not None]
                got = eng.exists(field, size=300)
                assert got["total_hits"] == len(exp_ids), field
                assert [r["doc_id"] for r in got["results"]] == exp_ids, field
        finally:
            eng.close()


def test_significant_terms(tmp_path):
    """ES significant_terms (JLH) vs a pure-python scan: exact fg/df
    counts and scores over match + boolean hit sets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(37)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "table",
             "batch", "spark"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9))),
        }
        for i in range(160)
    ]
    # sparse tail: two whole segments that contain surfaced terms but can
    # never match the queries (no 'merge') — their df contribution to the
    # background count must still be accumulated (round-4 ADVICE: the old
    # per-reader 'n_fg == 0: continue' guard dropped it, inflating scores)
    tail_vocab = ["batch", "spark", "table", "words"]
    rows += [
        {
            "doc_id": 160 + i,
            "text": " ".join(rng.choice(tail_vocab)
                             for _ in range(rng.randint(3, 9))),
        }
        for i in range(80)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    preds = {
        "merge": lambda t: "merge" in t.split(),
        "merge AND hash":
            lambda t: "merge" in t.split() and "hash" in t.split(),
    }
    n_docs = len(rows)
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q, pred in preds.items():
                hit_rows = [r for r in rows if pred(r["text"])]
                hits = len(hit_rows)
                exp = []
                for t in sorted(set(w for r in rows for w in r["text"].split())):
                    f = sum(1 for r in hit_rows if t in r["text"].split())
                    d = sum(1 for r in rows if t in r["text"].split())
                    if f < 3:
                        continue
                    fg_rate, bg_rate = f / hits, d / n_docs
                    if fg_rate <= bg_rate:
                        continue
                    exp.append(
                        ((fg_rate - bg_rate) * fg_rate / bg_rate, t, f, d)
                    )
                exp.sort(key=lambda b: (-b[0], b[1]))
                got = eng.significant_terms(q, size=10)
                assert got["total_hits"] == hits, q
                assert [
                    (b["key"], b["doc_count"], b["bg_count"],
                     round(b["score"], 12))
                    for b in got["buckets"]
                ] == [
                    (t, f, d, round(s, 12)) for s, t, f, d in exp[:10]
                ], q
        finally:
            eng.close()


def test_top_hits_agg(tmp_path):
    """ES terms agg + top_hits: bucket counts match the facet scan; each
    bucket's hits are the oracle's best-N docs of that group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(31)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9))),
            "source": f"s{rng.randint(0, 4)}",
        }
        for i in range(150)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=40,
                    target_partition_rows=30),
    )
    oracle = OracleIndex()
    oracle.normalizer = QueryEngine(idx, num_searchers=0).normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    src_of = {r["doc_id"]: r["source"] for r in rows}
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q in ("merge hash", "scan join"):
                full = oracle.query_taat(q, size=10_000)
                groups: dict[str, list] = {}
                for r in full["results"]:  # (-score, doc_id) order
                    groups.setdefault(src_of[r["doc_id"]], []).append(r)
                exp_buckets = sorted(
                    groups.items(), key=lambda kv: (-len(kv[1]), kv[0])
                )
                got = eng.search_top_hits(q, "source", n=3, size=10)
                assert [
                    (b["key"], b["doc_count"]) for b in got["buckets"]
                ] == [(v, len(g)) for v, g in exp_buckets], q
                for b, (v, g) in zip(got["buckets"], exp_buckets):
                    assert [
                        (h["doc_id"], round(h["score"], 9))
                        for h in b["hits"]
                    ] == [
                        (r["doc_id"], round(r["score"], 9)) for r in g[:3]
                    ], (q, v)
        finally:
            eng.close()


def test_function_score_field_value_factor(tmp_path):
    """ES function_score field_value_factor: boosted score = relevance *
    modifier(doc-value), re-ranked — vs the oracle's full ranking boosted
    in python; embedded + distributed agree."""
    import math as _math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(29)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9))),
            "n_chars": rng.randint(1, 400),
        }
        for i in range(130)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_chars",), docs_per_segment=40,
                    target_partition_rows=30),
    )
    oracle = OracleIndex()
    oracle.normalizer = QueryEngine(idx, num_searchers=0).normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    nv = {r["doc_id"]: r["n_chars"] for r in rows}
    mods = {
        "ln1p": lambda v: _math.log(1.0 + v),
        "sqrt": lambda v: _math.sqrt(v),
        "none": lambda v: float(v),
    }
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q in ("merge hash", "scan join"):
                full = oracle.query_taat(q, size=10_000)
                for mod, fn in mods.items():
                    exp = sorted(
                        (
                            (-r["score"] * fn(nv[r["doc_id"]]),
                             r["doc_id"])
                            for r in full["results"]
                        ),
                    )[:12]
                    got = eng.search_function_score(
                        q, "n_chars", modifier=mod, size=12
                    )
                    assert got["total_hits"] == full["total_hits"], (q, mod)
                    assert [
                        (r["doc_id"], round(r["score"], 9))
                        for r in got["results"]
                    ] == [
                        (d, round(-negs, 9)) for negs, d in exp
                    ], (q, mod)
        finally:
            eng.close()


def test_multi_index_search(tmp_path):
    """ES multi-index (alias) search: two indexes holding disjoint halves
    of a corpus, searched through MultiIndexEngine with summed N/df and
    token-weighted avgdl — hits and scores EXACTLY equal a single index
    over the union (oracle), with the (-score, global doc_id) order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import (
        MultiIndexEngine,
        QueryEngine,
    )

    import random
    rng = random.Random(23)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "table"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 11))),
        }
        for i in range(140)
    ]
    half = len(rows) // 2
    engines = {}
    for name, part in (("a", rows[:half]), ("b", rows[half:])):
        src = tmp_path / f"src_{name}"; src.mkdir()
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r["doc_id"] for r in part]),
                "text": pa.array([r["text"] for r in part]),
            }),
            str(src / "p.parquet"),
        )
        idx = str(tmp_path / f"idx_{name}")
        build_index(
            [str(src / "p.parquet")], idx,
            BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                        docs_per_segment=30, target_partition_rows=25),
        )
        engines[name] = QueryEngine(idx, num_searchers=2)
    multi = MultiIndexEngine(engines)
    oracle = OracleIndex()
    oracle.normalizer = multi.normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    offset = {"a": 0, "b": half}
    try:
        assert multi.doc_count == len(rows)
        for q in ("merge hash", "scan join table", "words"):
            got = multi.search(q, size=25)
            exp = oracle.query_taat(q, size=25)
            assert got["total_hits"] == exp["total_hits"], q
            assert [
                (r["doc_id"] + offset[r["index"]], round(r["score"], 9))
                for r in got["results"]
            ] == [
                (r["doc_id"], round(r["score"], 9)) for r in exp["results"]
            ], q
    finally:
        for e in engines.values():
            e.close()


def test_explain(tiny_engine, tiny_oracle):
    """ES _explain: per-term breakdown sums to the doc's exact search
    score for every hit (including repeated query terms), and reports
    matched=False for docs outside the hit set."""
    for q in ("news sky", "news news sky", "home new sky family"):
        res = tiny_engine.search(q, size=100_000)  # full hit set
        hit_ids = {r["doc_id"] for r in res["results"]}
        for r in res["results"][:10]:
            ex = tiny_engine.explain(q, r["doc_id"])
            assert ex["matched"], (q, r)
            assert abs(ex["score"] - r["score"]) < 1e-12, (q, r)
            assert ex["details"]
            assert abs(
                sum(d["score"] for d in ex["details"]) - ex["score"]
            ) < 1e-12
        # a doc with none of the terms: matched=False, score 0
        non_hit = next(
            d for d in range(tiny_engine.doc_count) if d not in hit_ids
        )
        ex = tiny_engine.explain(q, non_hit)
        assert not ex["matched"] and ex["score"] == 0.0


def test_more_like_this(tmp_path):
    """ES more_like_this: seed doc's top tf*idf terms re-run as a ranked
    query — term selection + ranking vs the oracle; the seed doc itself
    ranks (ES keeps it); embedded + distributed agree."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(19)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "table",
             "batch", "window", "filter"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 14))),
        }
        for i in range(130)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30,
                    store_source=True),
    )
    oracle = OracleIndex()
    oracle.normalizer = QueryEngine(idx, num_searchers=0).normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for seed in (0, 5, 11):
                tf = Counter(oracle.normalizer.tokenize(rows[seed]["text"]))
                cand = [
                    (t, tf[t] * oracle.idf_cache.get(t, 0.0))
                    for t in tf if oracle.idf_cache.get(t, 0.0) != 0.0
                ]
                cand.sort(key=lambda kv: (-kv[1], kv[0]))
                terms = [t for t, _ in cand[:5]]
                exp = oracle.query_taat(" ".join(terms), size=15)
                got = eng.more_like_this(seed, max_query_terms=5, size=15)
                assert got["total_hits"] == exp["total_hits"], seed
                assert [
                    (r["doc_id"], round(r["score"], 9))
                    for r in got["results"]
                ] == [
                    (r["doc_id"], round(r["score"], 9))
                    for r in exp["results"]
                ], seed
                assert got["results"], seed  # seed doc guarantees >=1 hit
        finally:
            eng.close()


def test_regexp_query(tmp_path):
    """ES regexp query: anchored RE2 over the term dictionary, boolean-OR
    doc set — vs python re over the source rows; embedded + distributed."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(5)
    vocab = ["merge", "merg", "hash", "scan", "join", "jorn", "other",
             "mash", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
        }
        for i in range(120)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    patterns = ["merg.*", ".*ash", "(scan|join)", "jo.n", "merge?"]
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for pat in patterns:
                rx = re.compile(f"^(?:{pat})$")
                exp = sorted(
                    r["doc_id"] for r in rows
                    if any(rx.match(w) for w in r["text"].split())
                )
                got = eng.regexp(pat, size=200)
                assert got["total_hits"] == len(exp), pat
                assert [r["doc_id"] for r in got["results"]] == exp, pat
        finally:
            eng.close()


def test_field_collapse(tmp_path):
    """ES field collapse: best-scoring doc per doc-value group, groups
    ordered by winner (-score, doc_id) — vs the oracle's full ranking
    reduced per group in python; distributed and embedded engines agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(13)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "table"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))),
            "source": f"s{rng.randint(0, 5)}",
        }
        for i in range(140)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=40,
                    target_partition_rows=30),
    )
    oracle = OracleIndex()
    oracle.normalizer = QueryEngine(idx, num_searchers=0).normalizer
    oracle.build([(r["doc_id"], r["text"]) for r in rows])
    src_of = {r["doc_id"]: r["source"] for r in rows}
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q in ("merge hash", "scan join table", "words"):
                full = oracle.query_taat(q, size=10_000)
                best: dict[str, tuple] = {}
                for r in full["results"]:  # already (-score, doc_id) order
                    g = src_of[r["doc_id"]]
                    if g not in best:
                        best[g] = (r["score"], r["doc_id"], g)
                exp = sorted(best.values(), key=lambda t: (-t[0], t[1]))
                got = eng.search_collapse(q, "source", size=10)
                assert got["total_hits"] == full["total_hits"], q
                assert [
                    (round(r["score"], 9), r["doc_id"], r["fields"]["source"])
                    for r in got["results"]
                ] == [(round(s, 9), d, g) for s, d, g in exp[:10]], q
        finally:
            eng.close()


def test_minimum_should_match(tiny_engine, tiny_oracle):
    """ES minimum_should_match: docs must match >= N distinct query terms;
    engine (distributed, exhaustive TAAT + count accumulator) vs the
    oracle's per-doc count — identical hits, scores, and totals."""
    for q in ("news sky work", "home new sky family", "news sky"):
        base = tiny_engine.search(q, size=200)
        for m in (2, 3):
            got = tiny_engine.search(q, size=200, minimum_should_match=m)
            exp = tiny_oracle.query_taat(q, size=200, minimum_should_match=m)
            assert got["total_hits"] == exp["total_hits"], (q, m)
            assert [
                (r["doc_id"], round(r["score"], 9)) for r in got["results"]
            ] == [
                (r["doc_id"], round(r["score"], 9)) for r in exp["results"]
            ], (q, m)
            # msm result set shrinks (or holds) as m grows
            assert got["total_hits"] <= base["total_hits"], (q, m)


def test_highlight_and_get_doc(tmp_path):
    """ES _source surface: store_source=True keeps the analyzed text in the
    docmap; get_doc retrieves it (and respects tombstones); highlight wraps
    the first analyzer-aware match per query term (stemmed query 'running'
    highlights the raw token 'runs')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import (
        BuildConfig, add_tombstones, build_index,
    )
    from elasticsearch_ray.pipelines.query import QueryEngine

    texts = [
        "the dog runs fast over the green hill every day",
        "cats sleep all day long on the warm mat",
        "a runner running beside the dog barked loudly",
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"text": pa.array(texts)}), src)
    idx = str(tmp_path / "idx")
    build_index(
        src, idx,
        BuildConfig(target_partition_rows=2, docs_per_segment=2,
                    url_column=None, lang_column=None, store_source=True),
    )
    eng = QueryEngine(idx, num_searchers=2)
    try:
        # GET by id returns the stored source
        assert eng.get_doc(1)["source"] == texts[1]
        assert eng.get_doc(99) is None
        # stemmed matching: query 'running' -> term 'run' -> raw 'runs'
        res = eng.highlight("running dog", size=10)
        by_doc = {r["doc_id"]: r["highlight"] for r in res["results"]}
        f0 = {f["term"]: f for f in by_doc[0]}
        assert f0["run"]["fragment"] == "the dog <em>runs</em> fast over the"
        assert f0["run"]["pos"] == 2
        assert f0["dog"]["fragment"] == "the <em>dog</em> runs fast over"
        # doc 2: first analyzed 'run' match is 'running' (Porter keeps
        # 'runner' as-is); window clipped at the start of the doc
        f2 = {f["term"]: f for f in by_doc[2]}
        assert f2["run"]["fragment"] == "a runner <em>running</em> beside the dog"
        assert f2["run"]["pos"] == 2
    finally:
        eng.close()
    add_tombstones(idx, [1])
    eng = QueryEngine(idx, num_searchers=0)
    try:
        assert eng.get_doc(1) is None  # tombstoned
        assert eng.get_doc(0)["source"] == texts[0]
    finally:
        eng.close()


def test_pagination_from_and_search_after(tiny_engine, tiny_oracle):
    """ES pagination: ``from_`` slices the merged ranking identically to the
    oracle's full list; ``search_after`` walks the whole ranking page by
    page through the (score, doc_id) cursor with no overlap or gap."""
    q = "news sky work"
    full = tiny_oracle.query(q, size=200)["results"]
    assert len(full) > 15, "fixture query too narrow"
    # from_/size pages tile the oracle ranking
    for frm, size in [(0, 5), (5, 5), (10, 7), (3, 50), (190, 20)]:
        got = tiny_engine.search(q, size=size, from_=frm)["results"]
        exp = full[frm:frm + size]
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
            (r["doc_id"], round(r["score"], 9)) for r in exp
        ], (frm, size)
    # search_after cursor walk reconstructs the full ranking exactly
    for mode in ("taat", "daat", "wand"):
        walked = tiny_engine.search(q, size=7, mode=mode)["results"]
        while True:
            last = walked[-1]
            page = tiny_engine.search(
                q, size=7, mode=mode,
                search_after=(last["score"], last["doc_id"]),
            )["results"]
            if not page:
                break
            walked.extend(page)
        assert [r["doc_id"] for r in walked] == [r["doc_id"] for r in full], mode
    # doc_id-ordered kinds: from_ slices the ascending hit list
    for bq in ("news AND sky", "new*"):
        all_ids = [
            r["doc_id"] for r in tiny_engine.search(bq, size=100)["results"]
        ]
        if len(all_ids) < 4:
            continue
        page = tiny_engine.search(bq, size=2, from_=2)["results"]
        assert [r["doc_id"] for r in page] == all_ids[2:4], bq


def test_histogram_percentiles_cardinality(tmp_path):
    """ES histogram / percentiles / cardinality aggregations over docmap
    doc-values vs pure-python scans (percentiles: nearest-rank
    ceil(p/100*n) == SQL percentile_disc); distributed (2 searchers) to
    exercise the shard merge."""
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(11)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "source": f"s{rng.randint(0, 5)}",
            "n_bytes": rng.randint(-50, 999),  # negatives: floor semantics
        }
        for i in range(200)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_bytes"), docs_per_segment=50,
                    target_partition_rows=25),
    )
    eng = QueryEngine(idx, num_searchers=2)
    preds = {
        "merge": lambda t: "merge" in t.split(),
        "merge AND hash":
            lambda t: "merge" in t.split() and "hash" in t.split(),
        "merg*": lambda t: any(w.startswith("merg") for w in t.split()),
    }
    try:
        for q, pred in preds.items():
            hits = [r for r in rows if pred(r["text"])]
            # histogram (interval 100, floor semantics incl. negatives)
            exp_h: dict = {}
            for r in hits:
                k = math.floor(r["n_bytes"] / 100) * 100
                exp_h[k] = exp_h.get(k, 0) + 1
            got = eng.search_histogram(q, "n_bytes", 100)["buckets"]
            assert [(b["key"], b["doc_count"]) for b in got] == sorted(
                exp_h.items()
            ), q
            # min_doc_count=0 fills gaps
            got0 = eng.search_histogram(q, "n_bytes", 100, min_doc_count=0)
            keys0 = [b["key"] for b in got0["buckets"]]
            assert keys0 == list(range(min(exp_h), max(exp_h) + 100, 100)), q
            # percentiles (nearest-rank)
            vals = sorted(r["n_bytes"] for r in hits)
            res = eng.search_percentiles(q, "n_bytes")
            assert res["count"] == len(vals), q
            for p in (25.0, 50.0, 75.0, 95.0, 99.0):
                exp_v = vals[max(1, math.ceil(p / 100 * len(vals))) - 1]
                assert res["values"][f"p{p:g}"] == exp_v, (q, p)
            # cardinality: string and integer fields
            assert eng.search_cardinality(q, "source")["cardinality"] == len(
                {r["source"] for r in hits}
            ), q
            assert eng.search_cardinality(q, "n_bytes")["cardinality"] == len(
                {r["n_bytes"] for r in hits}
            ), q
    finally:
        eng.close()


def test_range_query(tmp_path):
    """ES range query over an integer doc-value: standalone (match_all)
    and intersected with match/bool/wildcard hit sets, vs a pure-python
    scan — doc_id ascending, exact totals."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(7)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "n_bytes": rng.randint(0, 999),
        }
        for i in range(150)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_bytes",), docs_per_segment=60,
                    target_partition_rows=25),
    )
    eng = QueryEngine(idx, num_searchers=0)
    try:
        cases = [
            (None, 200, 700, lambda t: True),
            ("merge", 300, None, lambda t: "merge" in t.split()),
            ("merge AND hash", None, 500,
             lambda t: "merge" in t.split() and "hash" in t.split()),
            ("merg*", 100, 900,
             lambda t: any(w.startswith("merg") for w in t.split())),
        ]
        for q, gte, lte, pred in cases:
            exp = [
                r["doc_id"] for r in rows
                if pred(r["text"])
                and (gte is None or r["n_bytes"] >= gte)
                and (lte is None or r["n_bytes"] <= lte)
            ]
            res = eng.search_range(q, "n_bytes", gte=gte, lte=lte, size=15)
            got = [r["doc_id"] for r in res["results"]]
            assert got == exp[:15], (q, got, exp[:15])
            assert res["total_hits"] == len(exp), (q, res["total_hits"])
    finally:
        eng.close()


def test_regexp_prefix_narrowing_fuzz(tmp_path):
    """Randomized regexp patterns vs python re over the segment
    dictionary: the literal-prefix range narrowing must never drop a
    matching term (quantifiers can unbind the prefix's last literal)."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.state.segment import SegmentReader

    import random
    rng = random.Random(61)
    words = sorted({
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 6)))
        for _ in range(120)
    })
    rows = [{"doc_id": i, "text": " ".join(rng.sample(words, 8))}
            for i in range(60)]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for r in rows[:1]
                  for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=100, target_partition_rows=60),
    )
    r = SegmentReader(idx, 0)
    dictionary = r._term_list
    frags = ["a", "b", "ab", "abc", "cd", ".", "[ab]", "(a|b)", "c?", "d*",
             "a+", ".*", "b{1,2}"]
    pats = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 4)))
            for _ in range(80)]
    # top-level alternation: the first branch's literal prefix must NOT
    # narrow the scan range (regression: 'abc|xyz' dropped the xyz branch)
    pats += ["".join(rng.choice(frags) for _ in range(rng.randint(1, 2)))
             + "|"
             + "".join(rng.choice(frags) for _ in range(rng.randint(1, 2)))
             for _ in range(40)]
    pats += [dictionary[0] + "|" + dictionary[-1],
             dictionary[-1] + "|" + dictionary[0],
             "ab|cd.*", r"a\|b", "[a|b]c*"]
    for pat in pats:
        try:
            rx = re.compile(f"^(?:{pat})$")
        except re.error:
            continue
        exp = [i for i, t in enumerate(dictionary) if rx.match(t)]
        got = r.term_rows_regexp(pat)
        assert got == exp, pat


def test_extended_stats(tmp_path):
    """extended_stats variance/std vs numpy population stats."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(89)
    rows = [
        {"doc_id": i, "text": "merge" if i % 2 else "hash",
         "n_chars": rng.randint(5, 500)}
        for i in range(101)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_chars",), docs_per_segment=40,
                    target_partition_rows=30),
    )
    eng = QueryEngine(idx, num_searchers=2)
    try:
        for q, pred in (("merge", 1), ("hash", 0)):
            v = np.array([r["n_chars"] for r in rows if r["doc_id"] % 2 == pred])
            got = eng.search_extended_stats(q, "n_chars")
            assert got["count"] == v.size
            assert got["sum"] == int(v.sum())
            assert got["sum_of_squares"] == int((v.astype(object) ** 2).sum())
            assert abs(got["variance"] - float(np.var(v))) < 1e-9
            assert abs(got["std_deviation"] - float(np.std(v))) < 1e-9
    finally:
        eng.close()


def test_sort_by_string_field(tmp_path):
    """ES sort over a categorical (string) doc-value: lexicographic with
    doc_id tie-break, both directions, vs a python scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(97)
    vocab = ["merge", "hash", "scan", "join"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(5)),
         "source": rng.choice(["alpha", "beta", "gamma", "delta", "zz"])}
        for i in range(130)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=40,
                    target_partition_rows=30),
    )
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q, pred in ((None, lambda t: True),
                            ("merge", lambda t: "merge" in t.split())):
                hits = [r for r in rows if pred(r["text"])]
                for order in ("asc", "desc"):
                    exp = sorted(hits, key=lambda r: r["doc_id"])
                    exp = sorted(exp, key=lambda r: r["source"],
                                 reverse=(order == "desc"))
                    got = eng.search_sort(q, "source", order=order, size=25)
                    assert got["total_hits"] == len(hits), (q, order)
                    assert [
                        (r["sort"][0], r["doc_id"]) for r in got["results"]
                    ] == [
                        (r["source"], r["doc_id"]) for r in exp[:25]
                    ], (q, order)
        finally:
            eng.close()


def test_term_boost_syntax(tiny_engine, tiny_oracle):
    """Lucene query-string term boosts (term^2): clause scores scale by
    the boost (folded into idf), ranking re-orders accordingly — vs the
    oracle's per-term scores scaled in python; every mode agrees."""
    cases = [
        ("news^2 sky", {"news": 2.0}),
        ("news sky^0.5", {"sky": 0.5}),
        ("news^3 sky^0.25", {"news": 3.0, "sky": 0.25}),
    ]
    for q, boosts in cases:
        plain_terms = [w.split("^")[0] for w in q.split()]
        scores: dict = {}
        for t in plain_terms:
            b = boosts.get(t, 1.0)
            for d in tiny_oracle.inverted_index.get(t, []):
                scores[d] = scores.get(d, 0.0) + tiny_oracle._score(
                    t, d, "bm25"
                ) * b
        exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
        for mode in ("taat", "daat", "wand"):
            got = tiny_engine.search(q, size=15, mode=mode)
            assert [
                (r["doc_id"], round(r["score"], 9)) for r in got["results"]
            ] == [(d, round(s, 9)) for d, s in exp], (q, mode)
    # boost == 1 is a no-op vs the plain query
    a = tiny_engine.search("news^1 sky", size=10)
    b = tiny_engine.search("news sky", size=10)
    assert a["results"] == b["results"]


def test_postings_cache_eviction_correctness(tmp_path):
    """Decoded-postings LRU under a tiny budget: entries evict (budget
    respected) and re-decoded postings stay identical; cached arrays are
    read-only."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.state.segment import SegmentReader

    import random
    rng = random.Random(3)
    vocab = [f"w{i:03d}" for i in range(200)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab) for _ in range(30))}
            for i in range(400)]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=400, target_partition_rows=200),
    )
    r = SegmentReader(idx, 0)
    baseline = {
        row: tuple(a.copy() for a in r.postings_slots_by_row(row))
        for row in range(r.num_terms)
    }
    r._POST_CACHE_BUDGET = 64  # force heavy eviction
    r._post_cache.clear(); r._post_cache_vals = 0
    for sweep in range(3):
        for row in range(r.num_terms):
            s, t = r.postings_slots_by_row(row)
            assert np.array_equal(s, baseline[row][0]), row
            assert np.array_equal(t, baseline[row][1]), row
            assert r._post_cache_vals <= max(64, s.size + t.size)
    with _pytest.raises((ValueError, RuntimeError)):
        r.postings_slots_by_row(0)[0][0] = 99  # read-only


def test_wildcard_literal_bracket_and_fuzzy_empty(tmp_path):
    """ES wildcard treats only * and ? as special (a literal '[' must not
    open an fnmatch class), and the fuzzy path must return an empty
    (rows, dists) pair — not a bare list — when the length prefilter
    leaves no candidates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.state.segment import SegmentReader

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["ab[cd]x here", "abcx here", "zzz"]),
            }
        ),
        str(src / "a.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None),
    )
    r = SegmentReader(idx, 0)
    got = [r._term_list[row] for row in r.term_rows_matching("ab[cd]*")]
    assert got == ["ab[cd]x"]  # literal bracket, not an fnmatch class
    rows, dists = r.term_rows_fuzzy(
        "averyveryverylongtoken", 1, with_dist=True
    )
    assert rows == [] and dists == []


def test_facet_stats_and_filters_agg(tmp_path):
    """ES terms agg with an avg sub-aggregation + filters agg, vs a
    pure-python scan; distributed (2 searchers) and embedded agree, and a
    null metric doc-value counts toward doc_count but not the metric."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(9)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "source": f"s{rng.randint(0, 3)}",
            "n_chars": (rng.randint(10, 500) if i % 7 else None),
        }
        for i in range(120)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars"),
                    docs_per_segment=50, target_partition_rows=25),
    )
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for q, pred in (
                ("merge", lambda t: "merge" in t.split()),
                ("merge AND hash",
                 lambda t: "merge" in t.split() and "hash" in t.split()),
                ("merg*",
                 lambda t: any(w.startswith("merg") for w in t.split())),
            ):
                exp: dict = {}
                for r in rows:
                    if pred(r["text"]):
                        acc = exp.setdefault(r["source"], [0, 0, 0])
                        acc[0] += 1
                        if r["n_chars"] is not None:
                            acc[1] += 1
                            acc[2] += r["n_chars"]
                expected = [
                    (k, n, mc, ms)
                    for k, (n, mc, ms) in sorted(
                        exp.items(), key=lambda kv: (-kv[1][0], kv[0])
                    )
                ]
                got = [
                    (b["key"], b["doc_count"], b["metric_count"],
                     b["metric_sum"])
                    for b in eng.search_facet_stats(
                        q, "source", "n_chars", size=10
                    )["buckets"]
                ]
                assert got == expected, (n_searchers, q)
                # avg = sum / count of present metrics
                for b in eng.search_facet_stats(
                    q, "source", "n_chars", size=10
                )["buckets"]:
                    if b["metric_count"]:
                        assert b["avg"] == pytest.approx(
                            b["metric_sum"] / b["metric_count"]
                        )
            # filters agg: named buckets == _count of each filter
            flt = {"m": "merge", "mh": "merge AND hash", "w": "merg*"}
            res = eng.search_filters_agg(flt)
            assert list(res["buckets"]) == list(flt)  # caller order kept
            for name, q in flt.items():
                assert (res["buckets"][name]["doc_count"]
                        == eng.count(q)["count"])
        finally:
            eng.close()


def test_search_synonyms_lucene_semantics(tmp_path):
    """Query-time synonyms: (a) empty mapping is score-identical to plain
    TAAT, (b) synonym groups score per Lucene SynonymQuery (member tfs sum
    BEFORE BM25 saturation, idf from max member df) vs a pure-python
    reference, (c) embedded and distributed (2 searchers) agree."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(17)
    vocab = ["merge", "join", "hash", "scan", "union", "probe", "other"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
        for _ in range(90)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=20),
    )

    # pure-python SynonymQuery reference
    toks = [d.split() for d in docs]
    n_docs = len(docs)
    avgdl = sum(len(t) for t in toks) / n_docs

    def py_synonyms(query, syn, k=10):
        groups = []
        for t in query.split():
            groups.append(list(dict.fromkeys([t] + syn.get(t, []))))
        scores: dict[int, float] = {}
        for g in groups:
            df = max(
                sum(1 for t in toks if m in t) for m in g
            )
            idf = math.log((n_docs + 1) / (df + 1)) if df > 0 else 0.0
            if idf == 0.0:
                continue
            for did, t in enumerate(toks):
                tf = sum(t.count(m) for m in set(g))
                if tf == 0:
                    continue
                dl = len(t)
                s = idf * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
                scores[did] = scores.get(did, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    cases = [
        ("merge join", {"merge": ["union"], "join": ["hash"]}),
        ("scan", {"scan": ["probe", "merge"]}),
        ("hash probe", {}),
        ("union", {"union": ["union"]}),      # self-synonym is a no-op
        ("merge", {"merge": ["zzz_absent"]}),  # absent member ignored
    ]
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for q, syn in cases:
                got = [
                    (r["doc_id"], r["score"])
                    for r in eng.search_synonyms(q, syn, size=10)["results"]
                ]
                exp = py_synonyms(q, syn)
                assert [d for d, _ in got] == [d for d, _ in exp], (
                    n_searchers, q)
                for (_, gs), (_, es) in zip(got, exp):
                    assert gs == pytest.approx(es, rel=1e-12), (
                        n_searchers, q)
            # empty mapping == plain TAAT search, score-identical
            for q in ("merge join", "scan hash union"):
                a = eng.search_synonyms(q, {}, size=10)["results"]
                b = eng.search(q, size=10, mode="taat")["results"]
                assert [(r["doc_id"], r["score"]) for r in a] == [
                    (r["doc_id"], r["score"]) for r in b
                ], (n_searchers, q)
            # multi-token synonym key is rejected
            with pytest.raises(ValueError):
                eng.search_synonyms("merge", {"merge join": ["hash"]})
            # two surface keys analyzing to one index term merge their
            # member lists (ES merges rules with the same LHS)
            merged = eng.search_synonyms(
                "merge", {"merge": ["union"], "Merge": ["hash"]}, size=10
            )["results"]
            expect = eng.search_synonyms(
                "merge", {"merge": ["union", "hash"]}, size=10
            )["results"]
            assert [(r["doc_id"], r["score"]) for r in merged] == [
                (r["doc_id"], r["score"]) for r in expect
            ], n_searchers
        finally:
            eng.close()


def test_search_missing_agg(tmp_path):
    """ES missing aggregation over string and numeric doc-values, under a
    match-all and a filtered query, embedded and distributed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(5)
    vocab = ["merge", "hash", "scan", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
            "source": (f"s{i % 3}" if i % 4 else None),
            "n_chars": (rng.randint(10, 99) if i % 5 else None),
        }
        for i in range(100)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars"),
                    docs_per_segment=40, target_partition_rows=20),
    )
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for q, pred in (
                (None, lambda t: True),
                ("merge", lambda t: "merge" in t.split()),
                ("merge AND hash",
                 lambda t: "merge" in t.split() and "hash" in t.split()),
            ):
                hit = [r for r in rows if pred(r["text"])]
                exp_str = sum(1 for r in hit if r["source"] is None)
                exp_int = sum(1 for r in hit if r["n_chars"] is None)
                got_s = eng.search_missing(q, "source", field_type="str")
                got_i = eng.search_missing(q, "n_chars", field_type="int")
                assert got_s["doc_count"] == exp_str, (n_searchers, q)
                assert got_i["doc_count"] == exp_int, (n_searchers, q)
            with pytest.raises(ValueError):
                eng.search_missing(None, "source", field_type="bogus")
        finally:
            eng.close()


def test_boosting_constant_score_range_agg(tmp_path):
    """ES boosting / constant_score queries and the range aggregation, vs
    pure-python oracles; embedded (0) and distributed (2 searchers) agree.

    boosting is checked against the engine's own exhaustive ranked scores
    (search with size >= candidate count) demoted in python — validating
    the demotion mask + bounded merge without re-deriving BM25."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(31)
    vocab = ["merge", "hash", "scan", "join", "other", "words", "spark"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "n_chars": rng.randint(10, 700),
        }
        for i in range(150)
    ]
    src = tmp_path / "src"; src.mkdir()
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
                    docs_per_segment=60, target_partition_rows=30),
    )
    ranges = [{"to": 200}, {"from": 200, "to": 500}, {"from": 500},
              {"from": 100, "to": 650}]  # overlapping on purpose
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            # --- boosting ---
            for q in ("scan join", "hash words"):
                base = eng.search(q, size=len(rows))["results"]
                neg = {r["doc_id"] for r in rows
                       if "spark" in r["text"].split()}
                exp = sorted(
                    ((r["score"] * (0.5 if r["doc_id"] in neg else 1.0)),
                     r["doc_id"])
                    for r in base
                )
                exp = [(d, s) for s, d in
                       sorted(exp, key=lambda sd: (-sd[0], sd[1]))][:10]
                got = eng.search_boosting(q, "spark", negative_boost=0.5,
                                          size=10)
                assert [(r["doc_id"], pytest.approx(r["score"]))
                        for r in got["results"]] == [
                    (d, pytest.approx(s)) for d, s in exp
                ], (n_searchers, q)
                assert got["total_hits"] == len(base)
            # --- constant_score ---
            for q, pred in (
                ("merge", lambda t: "merge" in t.split()),
                ("merge AND hash",
                 lambda t: "merge" in t.split() and "hash" in t.split()),
            ):
                hit = sorted(r["doc_id"] for r in rows if pred(r["text"]))
                res = eng.search_constant_score(q, boost=1.2, size=10)
                assert [r["doc_id"] for r in res["results"]] == hit[:10]
                assert all(r["score"] == 1.2 for r in res["results"])
                assert res["total_hits"] == len(hit)
            # --- range aggregation ---
            for q, pred in (
                (None, lambda t: True),
                ("merge", lambda t: "merge" in t.split()),
            ):
                hit = [r for r in rows if pred(r["text"])]
                res = eng.search_range_agg(q, "n_chars", ranges)
                assert len(res["buckets"]) == len(ranges)
                for spec, b in zip(ranges, res["buckets"]):
                    lo, hi = spec.get("from"), spec.get("to")
                    exp_n = sum(
                        1 for r in hit
                        if (lo is None or r["n_chars"] >= lo)
                        and (hi is None or r["n_chars"] < hi)
                    )
                    assert b["doc_count"] == exp_n, (n_searchers, q, spec)
                    key = (f"{'*' if lo is None else lo}-"
                           f"{'*' if hi is None else hi}")
                    assert b["key"] == key
        finally:
            eng.close()


def test_weighted_avg_rare_terms_adjacency(tmp_path):
    """ES weighted_avg / rare_terms / adjacency_matrix aggregations vs
    pure-python oracles; embedded and distributed agree; weighted_avg
    skips docs missing either doc-value; rare_terms thresholds AFTER the
    cross-shard merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(17)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
            "source": f"s{rng.randint(0, 9)}",
            "n_chars": (rng.randint(10, 500) if i % 5 else None),
            "w": (rng.randint(1, 9) if i % 7 else None),
        }
        for i in range(140)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            "w": pa.array([r["w"] for r in rows], pa.int64()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars", "w"),
                    docs_per_segment=50, target_partition_rows=25),
    )
    preds = {
        None: lambda t: True,
        "merge": lambda t: "merge" in t.split(),
        "merge AND hash":
            lambda t: "merge" in t.split() and "hash" in t.split(),
    }
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for q, pred in preds.items():
                hit = [r for r in rows if pred(r["text"])]
                # weighted_avg: docs missing n_chars OR w skipped
                both = [r for r in hit
                        if r["n_chars"] is not None and r["w"] is not None]
                res = eng.search_weighted_avg(q, "n_chars", "w")
                assert res["doc_count"] == len(both)
                exp = (sum(r["n_chars"] * r["w"] for r in both)
                       / sum(r["w"] for r in both))
                assert res["value"] == pytest.approx(exp, rel=1e-12)
                # rare_terms: global threshold after merge
                counts: dict[str, int] = {}
                for r in hit:
                    counts[r["source"]] = counts.get(r["source"], 0) + 1
                for mdc in (1, 3, 8):
                    exp_b = sorted(
                        ((n, k) for k, n in counts.items() if n <= mdc)
                    )
                    got = eng.search_rare_terms(q, "source",
                                                max_doc_count=mdc)
                    assert [(b["doc_count"], b["key"])
                            for b in got["buckets"]] == exp_b, (
                        n_searchers, q, mdc)
            # adjacency_matrix
            flt = {"m": "merge", "h": "hash", "s": "scan"}
            sets = {
                name: {r["doc_id"] for r in rows
                       if q in r["text"].split()}
                for name, q in flt.items()
            }
            exp_buckets = []
            for name in flt:
                if sets[name]:
                    exp_buckets.append((name, len(sets[name])))
            names = list(flt)
            for i, a in enumerate(names):
                for b in names[i + 1:]:
                    c = len(sets[a] & sets[b])
                    if c:
                        exp_buckets.append((f"{a}&{b}", c))
            got = eng.search_adjacency_matrix(flt)
            assert [(b["key"], b["doc_count"])
                    for b in got["buckets"]] == exp_buckets, n_searchers
        finally:
            eng.close()


def test_sort_search_after_pagination(tmp_path):
    """ES search_after over field sorts: walking pages of 7 via the
    (value, doc_id) cursor reproduces the full sorted hit list exactly —
    numeric and string fields, both orders, embedded and distributed;
    duplicate values forced so the tie-break leg of the cursor is
    exercised; from_ + search_after rejected."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(23)
    vocab = ["merge", "hash", "scan", "join", "other"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
            "source": f"s{rng.randint(0, 4)}",          # heavy duplicates
            "n_chars": rng.choice([10, 20, 20, 30, 40]),  # forced ties
        }
        for i in range(130)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source", "n_chars"),
                    docs_per_segment=40, target_partition_rows=20),
    )
    for n_searchers in (0, 2):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for field, key in (("n_chars", lambda r: r["n_chars"]),
                               ("source", lambda r: r["source"])):
                for q, pred in (
                    (None, lambda t: True),
                    ("merge", lambda t: "merge" in t.split()),
                ):
                    hit = [r for r in rows if pred(r["text"])]
                    for order in ("desc", "asc"):
                        exp = sorted(
                            ((key(r), r["doc_id"]) for r in hit),
                            key=lambda t: (t[0], -t[1]),
                            reverse=(order == "desc"),
                        )
                        if order == "desc":
                            # re-fix tie-break: doc_id asc under desc value
                            exp = sorted(hit, key=lambda r: r["doc_id"])
                            exp = sorted(exp, key=key, reverse=True)
                            exp = [(key(r), r["doc_id"]) for r in exp]
                        else:
                            exp = sorted(hit, key=lambda r: r["doc_id"])
                            exp = sorted(exp, key=key)
                            exp = [(key(r), r["doc_id"]) for r in exp]
                        walked = []
                        cursor = None
                        while True:
                            res = eng.search_sort(
                                q, field, order=order, size=7,
                                search_after=cursor,
                            )
                            page = [
                                (r["sort"][0], r["doc_id"])
                                for r in res["results"]
                            ]
                            if not page:
                                break
                            walked.extend(page)
                            assert res["total_hits"] == len(hit)
                            cursor = page[-1]
                        assert walked == exp, (n_searchers, field, q, order)
            with pytest.raises(ValueError):
                eng.search_sort(None, "n_chars", size=5, from_=5,
                                search_after=(10, 3))
        finally:
            eng.close()


def test_terms_agg_shard_size_error_bounds(tmp_path):
    """ES sharded terms agg: with shard_size >= per-shard cardinality the
    result equals the exact terms agg with all error bounds 0; with a
    tiny shard_size, reported counts never overcount, each bucket's
    undercount is within its doc_count_error_upper_bound, and
    sum_other_doc_count accounts for every doc with a value."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(41)
    # skewed per-region values so per-shard tops disagree
    rows = []
    for i in range(240):
        region = i // 60  # 4 doc ranges -> different shard tops
        v = f"v{rng.choice([region * 3, region * 3 + 1, rng.randint(0, 11)])}"
        rows.append({"doc_id": i, "text": "merge words", "source": v})
    src = tmp_path / "src"; src.mkdir()
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
                    docs_per_segment=60, target_partition_rows=30),
    )
    exact: dict[str, int] = {}
    for r in rows:
        exact[r["source"]] = exact.get(r["source"], 0) + 1
    exact_buckets = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    for n_searchers in (0, 4):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            # big shard_size == exact path
            res = eng.search_facets_sharded("merge", "source", size=12,
                                            shard_size=1000)
            assert [(b["key"], b["doc_count"]) for b in res["buckets"]] \
                == exact_buckets[:12]
            assert all(b["doc_count_error_upper_bound"] == 0
                       for b in res["buckets"])
            assert res["doc_count_error_upper_bound"] == 0
            assert res["sum_other_doc_count"] == len(rows) - sum(
                n for _, n in exact_buckets[:12]
            )
            # tiny shard_size: bounded undercount, never overcount
            res = eng.search_facets_sharded("merge", "source", size=6,
                                            shard_size=2)
            for b in res["buckets"]:
                true_n = exact[b["key"]]
                assert b["doc_count"] <= true_n
                assert true_n - b["doc_count"] \
                    <= b["doc_count_error_upper_bound"]
            assert res["sum_other_doc_count"] == len(rows) - sum(
                b["doc_count"] for b in res["buckets"]
            )
            if n_searchers == 0:
                # one shard -> shard top-shard_size is globally exact on
                # what it returns
                assert all(
                    exact[b["key"]] == b["doc_count"]
                    for b in res["buckets"]
                )
        finally:
            eng.close()


def test_variable_width_histogram(tmp_path):
    """variable_width_histogram (largest-gap deterministic clustering)
    vs a pure-python oracle; distributed to exercise the shard merge."""
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(23)
    vocab = ["merge", "hash", "scan", "join", "other"]
    # three obvious value clusters + duplicates + a tie-gap pair
    pools = [list(range(0, 20)), list(range(500, 520)),
             list(range(1000, 1005)), [2000, 2600, 3200]]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
            "n_bytes": rng.choice(rng.choice(pools)),
        }
        for i in range(180)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_bytes",), docs_per_segment=50,
                    target_partition_rows=25),
    )

    def brute(values, buckets):
        vals = sorted(set(values))
        gaps = [(vals[i + 1] - vals[i], i) for i in range(len(vals) - 1)]
        cuts = sorted(i for _, i in
                      sorted(gaps, key=lambda g: (-g[0], g[1]))
                      [:max(0, buckets - 1)])
        out, s = [], 0
        for c in cuts + [len(vals) - 1]:
            seg = set(vals[s:c + 1])
            sel = [v for v in values if v in seg]
            out.append({
                "min": min(sel), "max": max(sel), "doc_count": len(sel),
                "key_u": math.floor(sum(sel) * 1_000_000.0 / len(sel)),
            })
            s = c + 1
        return out

    eng = QueryEngine(idx, num_searchers=2)
    try:
        for q, pred in ((None, lambda t: True),
                        ("merge", lambda t: "merge" in t.split())):
            values = [r["n_bytes"] for r in rows if pred(r["text"])]
            for nb in (1, 2, 4, 7, 100):
                got = eng.search_variable_width_histogram(
                    q, "n_bytes", buckets=nb
                )["buckets"]
                assert got == brute(values, nb), (q, nb)
        with pytest.raises(ValueError):
            eng.search_variable_width_histogram(None, "n_bytes", buckets=0)
    finally:
        eng.close()


def test_explain_matches_search_scores(tmp_path):
    """_explain on a built index: per-term breakdown sums exactly to the
    ranked-search score for every top-k hit, distributed AND embedded;
    unmatched/missing docs explain as such."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(41)
    vocab = ["merge", "hash", "scan", "join", "table", "x"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(8))}
        for i in range(150)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    for n_searchers in (2, 0):
        eng = QueryEngine(idx, num_searchers=n_searchers)
        try:
            for q in ("merge hash", "scan", "merge merge hash"):
                res = eng.search(q, size=10)
                for h in res["results"]:
                    ex = eng.explain(q, h["doc_id"])
                    assert ex["matched"]
                    assert ex["score"] == pytest.approx(h["score"],
                                                        abs=1e-12)
                    assert ex["score"] == pytest.approx(
                        sum(d["score"] for d in ex["details"]))
                    for d in ex["details"]:
                        toks = rows[h["doc_id"]]["text"].split()
                        assert d["tf"] == toks.count(d["term"])
            # doc that doesn't contain the term
            no_scan = next(r["doc_id"] for r in rows
                           if "scan" not in r["text"].split())
            ex = eng.explain("scan", no_scan)
            assert not ex["matched"] and ex["score"] == 0.0
            # doc outside the corpus
            ex = eng.explain("scan", 10_000)
            assert not ex["matched"] and ex["details"] == []
        finally:
            eng.close()


def test_suggest_phrase(tmp_path):
    """Phrase suggester vs a pure-python oracle (per-word candidate
    top-k by (dist, df desc, term), cross product ranked by total dist
    / df sum / phrase)."""
    import itertools
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(17)
    vocab = ["table", "tables", "cable", "scan", "scon" * 0 or "span",
             "merge", "merges", "value", "vale", "hash"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(6))}
        for i in range(120)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    df = {}
    for r in rows:
        for t in set(r["text"].split()):
            df[t] = df.get(t, 0) + 1

    def brute(text, size, max_edits, per_word):
        per = []
        for w in text.lower().split():
            cands = sorted(
                (lev(t, w), -f, t) for t, f in df.items()
                if lev(t, w) <= max_edits
            )[:per_word]
            per.append([(t, d, -nf) for d, nf, t in cands]
                       or [(w, 0, 0)])
        phrases = sorted(
            (sum(c[1] for c in combo), -sum(c[2] for c in combo),
             " ".join(c[0] for c in combo))
            for combo in itertools.product(*per)
        )
        return [{"text": p, "total_dist": d, "df_sum": -nf}
                for d, nf, p in phrases[:size]]

    eng = QueryEngine(idx, num_searchers=2)
    try:
        for text, me, pw in (("tble scon", 1, 3), ("table merg", 1, 2),
                             ("vale hash", 1, 3), ("zzzz", 1, 3),
                             ("tble merge span", 2, 2)):
            got = eng.suggest_phrase(text, size=5, max_edits=me,
                                     per_word=pw)
            assert got["options"] == brute(text, 5, me, pw), (text, me, pw)
        with pytest.raises(ValueError):
            eng.suggest_phrase("a", per_word=0)
    finally:
        eng.close()




def test_knn_filtered(tmp_path):
    """ES knn with filter: candidates PRE-filtered to the filter query's
    hit set before ranking (never filter-after-rank) — vs numpy brute
    force over the filtered subset; distributed and embedded agree."""
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(97)
    vocab = ["merge", "hash", "scan", "join", "other"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(3, 9)))}
        for i in range(100)
    ]
    nprng = np.random.default_rng(97)
    vecs = nprng.normal(size=(100, 8)).astype(np.float64)
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    emb = tmp_path / "emb.parquet"
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }),
        str(emb),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=30, target_partition_rows=20),
    )
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            eng.attach_embeddings(str(emb))
            for fq, pred in (
                ("merge", lambda t: "merge" in t.split()),
                ("merge AND hash",
                 lambda t: {"merge", "hash"} <= set(t.split())),
                ("mer*", lambda t: any(w.startswith("mer")
                                       for w in t.split())),
            ):
                allowed = np.array(
                    [i for i, r in enumerate(rows) if pred(r["text"])])
                q = vecs[5] / np.linalg.norm(vecs[5])
                sims = n[allowed] @ q
                exp = allowed[np.lexsort((allowed, -sims))][:7]
                got = eng.knn(vecs[5], k=7, filter_query=fq)
                assert [r["doc_id"] for r in got["results"]] == \
                    exp.tolist(), fq
                for r in got["results"]:  # every hit satisfies the filter
                    assert pred(rows[r["doc_id"]]["text"])
            # unfiltered path unchanged
            sims = n @ (vecs[5] / np.linalg.norm(vecs[5]))
            exp = np.lexsort((np.arange(100), -sims))[:7]
            got = eng.knn(vecs[5], k=7)
            assert [r["doc_id"] for r in got["results"]] == exp.tolist()
        finally:
            eng.close()


def test_facets_partition(tmp_path):
    """terms agg with include partitions: every value lands in exactly
    one partition (md5 bucket), partition counts match the plain terms
    agg, and the union over partitions is complete."""
    import hashlib
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(53)
    vocab = ["merge", "hash", "scan"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(5)),
         "source": f"s{rng.randint(0, 19)}"}
        for i in range(200)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=50,
                    target_partition_rows=40),
    )
    eng = QueryEngine(idx, num_searchers=2)
    try:
        for q in (None, "merge"):
            full = {
                b["key"]: b["doc_count"]
                for b in eng.search_facets(q or "", "source",
                                           size=1000)["buckets"]
            }
            n_part = 4
            union: dict = {}
            for p in range(n_part):
                res = eng.search_facets_partition(q, "source", p, n_part,
                                                  size=1000)
                for b in res["buckets"]:
                    v = b["key"]
                    assert v not in union, "value in two partitions"
                    union[v] = b["doc_count"]
                    h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
                    assert h % n_part == p
            assert union == full
        with pytest.raises(ValueError):
            eng.search_facets_partition(None, "source", 4, 4)
    finally:
        eng.close()


def test_facets_filtered(tmp_path):
    """terms agg include/exclude regex + min_doc_count + missing bucket
    vs a python oracle (anchored whole-value regex, nulls counted under
    the missing key)."""
    import random
    import re as _re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(29)
    vocab = ["merge", "hash", "scan"]
    sources = ["s1", "s2", "s10", "t1", None]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(5)),
         "source": rng.choice(sources)}
        for i in range(150)
    ]
    src = tmp_path / "src"; src.mkdir()
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
                    facet_columns=("source",), docs_per_segment=40,
                    target_partition_rows=30),
    )

    def brute(q_term, include, exclude, min_dc, missing):
        hits = [r for r in rows
                if q_term is None or q_term in r["text"].split()]
        counts: dict = {}
        miss = 0
        for r in hits:
            v = r["source"]
            if v is None:
                miss += 1
                continue
            if include and not _re.fullmatch(include, v):
                continue
            if exclude and _re.fullmatch(exclude, v):
                continue
            counts[v] = counts.get(v, 0) + 1
        if missing is not None and miss:
            ok = (include is None or _re.fullmatch(include, missing)) \
                and not (exclude and _re.fullmatch(exclude, missing))
            if ok:
                counts[missing] = counts.get(missing, 0) + miss
        return [
            {"key": v, "doc_count": n}
            for v, n in sorted(counts.items(),
                               key=lambda kv: (-kv[1], kv[0]))
            if n >= min_dc
        ]

    eng = QueryEngine(idx, num_searchers=2)
    try:
        cases = [
            ("merge", r"s\d+", None, 1, None),
            ("merge", None, r"s1", 1, None),     # excludes s1, not s10
            (None, r"s1.*", None, 1, None),      # s1 and s10
            ("merge", None, None, 10, None),
            ("merge", None, None, 1, "__missing__"),
            (None, r"t.*", None, 1, "NA"),   # NA fails include -> dropped
            (None, r"(t.*|NA)", None, 1, "NA"),  # NA passes include
        ]
        for q, inc, exc, mdc, miss in cases:
            got = eng.search_facets_filtered(
                q, "source", include=inc, exclude=exc,
                min_doc_count=mdc, missing=miss, size=100,
            )["buckets"]
            assert got == brute(q, inc, exc, mdc, miss), \
                (q, inc, exc, mdc, miss)
        with pytest.raises(ValueError):
            eng.search_facets_filtered(None, "source", min_doc_count=-1)
    finally:
        eng.close()


def test_histogram_bounds(tmp_path):
    """histogram hard_bounds (buckets outside dropped) and
    extended_bounds (zero-fill widened to the bounds) vs a python
    oracle, including negative keys."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(19)
    rows = [
        {"doc_id": i, "text": "merge",
         "n_bytes": rng.randint(-250, 750)}
        for i in range(120)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("n_bytes",), docs_per_segment=40,
                    target_partition_rows=30),
    )

    def brute(mdc, ext, hard):
        iv = 100
        counts: dict = {}
        for r in rows:
            k = (r["n_bytes"] // iv) * iv
            counts[k] = counts.get(k, 0) + 1
        if hard:
            counts = {k: v for k, v in counts.items()
                      if hard[0] <= k <= hard[1]}
        if mdc == 0 and (counts or ext):
            lo = min(counts) if counts else None
            hi = max(counts) if counts else None
            if ext:
                elo = -((-ext[0]) // iv) * iv
                ehi = (ext[1] // iv) * iv
                lo = elo if lo is None else min(lo, elo)
                hi = ehi if hi is None else max(hi, ehi)
            for k in range(lo, hi + iv, iv):
                if hard and not (hard[0] <= k <= hard[1]):
                    continue
                counts.setdefault(k, 0)
        return [{"key": k, "doc_count": counts[k]}
                for k in sorted(counts)
                if counts[k] >= mdc or mdc == 0]

    eng = QueryEngine(idx, num_searchers=2)
    try:
        for mdc, ext, hard in (
            (1, None, (0, 399)),
            (0, (-500, 1000), None),
            (0, (-500, 1000), (0, 399)),
            (1, None, None),
            (0, None, (10_000, 20_000)),  # everything dropped
            (1, None, (250, 650)),        # raw bounds, not multiples
            (0, (-500, 1000), (150, 449)),
        ):
            got = eng.search_histogram(
                "merge", "n_bytes", 100, min_doc_count=mdc,
                extended_bounds=ext, hard_bounds=hard,
            )["buckets"]
            assert got == brute(mdc, ext, hard), (mdc, ext, hard)
    finally:
        eng.close()


def test_significant_terms_background_filter(tmp_path):
    """significant_terms with background_filter: JLH rates computed
    against the filter's hit set (counts and totals) vs a python
    oracle; default path unchanged."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(67)
    vocab = ["merge", "hash", "scan", "join", "tablex", "rowy"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(4, 9)))}
        for i in range(160)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )

    def brute(fg_q, bg_q, min_dc):
        toks = {r["doc_id"]: set(r["text"].split()) for r in rows}
        fg_ids = [d for d, t in toks.items() if fg_q in t]
        bg_ids = [d for d, t in toks.items()
                  if bg_q is None or bg_q in t]
        hits = len(fg_ids)
        n = len(bg_ids) if bg_q is not None else len(rows)
        cands = sorted({w for d in fg_ids for w in toks[d]})
        out = []
        for t in cands:
            f = sum(1 for d in fg_ids if t in toks[d])
            if f < min_dc:
                continue
            d_ = sum(1 for d in bg_ids if t in toks[d])
            if d_ == 0:
                continue
            fr, br = f / hits, d_ / n
            if fr <= br:
                continue
            out.append(((fr - br) * (fr / br), t, f, d_))
        out.sort(key=lambda b: (-b[0], b[1]))
        return [(t, f, d_, round(s, 12)) for s, t, f, d_ in out]

    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for fg_q, bg_q in (("merge", "hash"), ("merge", None),
                               ("tablex", "rowy")):
                got = eng.significant_terms(
                    fg_q, size=50, min_doc_count=2,
                    background_filter=bg_q,
                )["buckets"]
                assert [(b["key"], b["doc_count"], b["bg_count"],
                         round(b["score"], 12)) for b in got] == \
                    brute(fg_q, bg_q, 2), (fg_q, bg_q)
        finally:
            eng.close()


def test_filters_agg_other_bucket(tmp_path):
    """filters agg other_bucket: docs matching NO named filter, counted
    shard-side; named counts identical to the per-filter path."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(13)
    vocab = ["merge", "hash", "scan", "join", "zzz"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(2, 6)))}
        for i in range(140)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    filters = {"m": "merge", "mh": "merge AND hash", "pre": "sc*"}
    toks = [set(r["text"].split()) for r in rows]
    want = {
        "m": sum(1 for t in toks if "merge" in t),
        "mh": sum(1 for t in toks if {"merge", "hash"} <= t),
        "pre": sum(1 for t in toks
                   if any(w.startswith("sc") for w in t)),
    }
    other = sum(
        1 for t in toks
        if "merge" not in t and not {"merge", "hash"} <= t
        and not any(w.startswith("sc") for w in t)
    )
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            res = eng.search_filters_agg(filters, other_bucket=True)
            got = {k: v["doc_count"] for k, v in res["buckets"].items()}
            assert got == {**want, "_other_": other}
            # per-filter path agrees on the named buckets
            plain = eng.search_filters_agg(filters)
            assert {k: v["doc_count"]
                    for k, v in plain["buckets"].items()} == want
        finally:
            eng.close()


def test_filters_agg_other_bucket_key_semantics(tmp_path):
    """other_bucket_key alone implies other_bucket (ES behavior); a
    filter name colliding with the key raises instead of silently
    dropping a bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"text": pa.array(
        ["merge hash", "scan", "zzz"])}), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, BuildConfig(analyzer="plain", url_column=None,
                                      lang_column=None))
    eng = QueryEngine(idx, num_searchers=0)
    try:
        res = eng.search_filters_agg({"m": "merge"},
                                     other_bucket_key="rest")
        assert res["buckets"]["rest"]["doc_count"] == 2
        assert res["buckets"]["m"]["doc_count"] == 1
        with pytest.raises(ValueError, match="collides"):
            eng.search_filters_agg({"rest": "merge"},
                                   other_bucket_key="rest")
    finally:
        eng.close()


def test_terms_agg_paths_agree(tmp_path):
    """Internal consistency fuzz: the four terms-agg paths (exact,
    sharded with generous shard_size, partition union, filtered with no
    filters) produce identical buckets for random queries."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(101)
    vocab = ["merge", "hash", "scan", "join", "table"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(2, 8))),
         "source": f"s{rng.randint(0, 11)}"}
        for i in range(180)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=50,
                    target_partition_rows=40),
    )
    eng = QueryEngine(idx, num_searchers=2)
    try:
        queries = ["merge", "merge AND hash", "mer*", "scan OR join",
                   "hash~", ""]
        for q in queries:
            exact = eng.search_facets(q, "source", size=1000)["buckets"]
            sharded = eng.search_facets_sharded(
                q or None, "source", size=1000, shard_size=1000
            )["buckets"]
            assert [(b["key"], b["doc_count"]) for b in exact] == \
                [(b["key"], b["doc_count"]) for b in sharded], q
            filt = eng.search_facets_filtered(
                q or None, "source", size=1000
            )["buckets"]
            assert exact == filt, q
            union: dict = {}
            for p in range(3):
                for b in eng.search_facets_partition(
                    q or None, "source", p, 3, size=1000
                )["buckets"]:
                    union[b["key"]] = b["doc_count"]
            assert union == {b["key"]: b["doc_count"] for b in exact}, q
    finally:
        eng.close()


def test_validate_query_robustness_fuzz(tmp_path):
    """Router hardening: validate_query never raises on arbitrary query
    strings, and any query it declares valid must execute without an
    exception."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"text": pa.array(
        ["merge hash scan", "scan join", "table merge"])}), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, BuildConfig(analyzer="plain", url_column=None,
                                      lang_column=None))
    rng = random.Random(7)
    pieces = ["merge", "hash", "scan", "AND", "OR", "NOT", "(", ")",
              "mer*", "hash~", "zz", ""]
    eng = QueryEngine(idx, num_searchers=0)
    try:
        for _ in range(300):
            q = " ".join(rng.choice(pieces)
                         for _ in range(rng.randint(1, 7)))
            v = eng.validate_query(q)  # must never raise
            assert set(v) == {"valid", "explanation"}
            if v["valid"]:
                res = eng.search(q, size=5)  # declared valid -> runs
                assert "results" in res
    finally:
        eng.close()
