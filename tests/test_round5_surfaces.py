"""Round-5 query/agg surfaces: terms_set, match_bool_prefix, pinned,
sampler/diversified_sampler, percentile_ranks, normalize + sibling
pipeline aggs, auto_date_histogram — brute-force python oracles over a
multi-segment corpus."""

import math
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def surf_engine(tmp_path_factory):
    """160 docs over 4 segments, plain analyzer, facet doc-values."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(55)
    vocab = ["merge", "hash", "scan", "join", "sort", "scanner", "score",
             "other", "filter"]
    rows = []
    for i in range(160):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 14)))
        rows.append({
            "doc_id": i,
            "text": text,
            "source": f"s{rng.randint(0, 4)}",
            "lang": ("en", "de", "fr")[rng.randint(0, 2)],
            "n_chars": len(text),
        })
    src = tmp_path_factory.mktemp("surf_src")
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path_factory.mktemp("surf_idx")) + "/idx"
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column="lang",
                    facet_columns=("source", "lang", "n_chars"),
                    docs_per_segment=45, target_partition_rows=25),
    )
    eng = QueryEngine(idx, num_searchers=2)
    yield eng, rows
    eng.close()


def _bm25_brute(rows, terms):
    """Per-doc BM25 sum over the matching query terms (plain analyzer,
    k1=1.2 b=0.75, idf=ln((N+1)/(df+1)), idf-0 terms score nothing)."""
    docs = [r["text"].split() for r in rows]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    for t in dict.fromkeys(terms):
        df = sum(1 for d in docs if t in d)
        idf = math.log((n + 1) / (df + 1)) if df else 0.0
        if idf == 0.0:
            continue
        for i, d in enumerate(docs):
            tf = d.count(t)
            if tf:
                dl = len(d)
                out[i] = out.get(i, 0.0) + idf * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
    return out


def test_terms_set_vs_brute(surf_engine):
    eng, rows = surf_engine
    terms = ["merge", "hash", "scan"]
    res = eng.search_terms_set(terms, "doc_id", ("mod_plus1", 3), size=500)
    scores = _bm25_brute(rows, terms)
    expect = {}
    for r in rows:
        d = r["text"].split()
        nmatch = sum(1 for t in terms if t in d)
        if nmatch >= 1 + r["doc_id"] % 3:
            expect[r["doc_id"]] = scores.get(r["doc_id"], 0.0)
    assert res["total_hits"] == len(expect)
    got = {h["doc_id"]: h["score"] for h in res["results"]}
    assert got.keys() == expect.keys()
    for d, s in got.items():
        assert s == pytest.approx(expect[d], rel=1e-12)
    # order: (-score, doc_id)
    ds = [(h["doc_id"], h["score"]) for h in res["results"]]
    assert ds == sorted(ds, key=lambda x: (-x[1], x[0]))
    # raw-field spec: required = doc's n_chars (never matched, too big)
    res2 = eng.search_terms_set(terms, "n_chars", ("field",), size=10)
    assert res2["total_hits"] == 0
    # min_terms clamp: required = min(num_terms, n_chars) = 3 -> pure AND
    res3 = eng.search_terms_set(terms, "n_chars", ("min_terms",), size=500)
    want_and = {r["doc_id"] for r in rows
                if all(t in r["text"].split() for t in terms)}
    assert {h["doc_id"] for h in res3["results"]} == want_and


def test_match_bool_prefix_vs_brute(surf_engine):
    eng, rows = surf_engine
    res = eng.search_match_bool_prefix("merge sc", size=500)
    bm = _bm25_brute(rows, ["merge"])
    expect = {}
    for r in rows:
        toks = r["text"].split()
        s = bm.get(r["doc_id"], 0.0) if "merge" in toks else 0.0
        pre = any(t.startswith("sc") for t in toks)
        if "merge" in toks or pre:
            expect[r["doc_id"]] = s + (1.0 if pre else 0.0)
    assert res["total_hits"] == len(expect)
    got = {h["doc_id"]: h["score"] for h in res["results"]}
    assert got.keys() == expect.keys()
    for d, s in got.items():
        assert s == pytest.approx(expect[d], rel=1e-12)


def test_pinned_vs_brute(surf_engine):
    eng, rows = surf_engine
    pins = [9, 3, 10**9, 9]  # dup + missing id are dropped
    res = eng.search_pinned(pins, "merge hash", size=8)
    organic = eng.search("merge hash", size=20)
    # pins first in given order with the ES sentinel boosts
    assert [r["doc_id"] for r in res["results"][:2]] == [9, 3]
    assert res["results"][0]["score"] > res["results"][1]["score"] > 1e30
    tail = [r["doc_id"] for r in res["results"][2:]]
    assert tail == [r["doc_id"] for r in organic["results"]
                    if r["doc_id"] not in (9, 3)][:6]
    # exact union total
    hit_set = {d for d, s in _bm25_brute(rows, ["merge", "hash"]).items()
               if s != 0.0}
    matched = {r["doc_id"] for r in rows
               if {"merge", "hash"} & set(r["text"].split())}
    assert res["total_hits"] == len(matched | {9, 3})
    assert hit_set == matched  # sanity on the brute model


def test_sampler_vs_brute(surf_engine):
    eng, rows = surf_engine
    scores = _bm25_brute(rows, ["merge", "hash"])
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    by_id = {r["doc_id"]: r for r in rows}
    # plain sampler: terms agg over the global top-25
    res = eng.search_sampler("merge hash", 25, "source")
    want = {}
    for d, _ in ranked[:25]:
        k = by_id[d]["source"]
        want[k] = want.get(k, 0) + 1
    assert res["sample_count"] == 25
    assert {b["key"]: b["doc_count"] for b in res["buckets"]} == want
    bl = [(b["doc_count"], b["key"]) for b in res["buckets"]]
    assert bl == sorted(bl, key=lambda x: (-x[0], x[1]))
    # diversified: <= 2 docs per lang, walked in rank order
    res2 = eng.search_sampler("merge hash", 12, "source",
                              diversify_field="lang", max_docs_per_value=2)
    picked, per_lang = [], {}
    for d, _ in ranked:
        lang = by_id[d]["lang"]
        if per_lang.get(lang, 0) >= 2:
            continue
        per_lang[lang] = per_lang.get(lang, 0) + 1
        picked.append(d)
        if len(picked) == 12:
            break
    want2 = {}
    for d in picked:
        k = by_id[d]["source"]
        want2[k] = want2.get(k, 0) + 1
    assert res2["sample_count"] == len(picked)
    assert {b["key"]: b["doc_count"] for b in res2["buckets"]} == want2
    with pytest.raises(ValueError):
        eng.search_sampler("merge", 0, "source")


def test_percentile_ranks_vs_brute(surf_engine):
    eng, rows = surf_engine
    hits = [r for r in rows if "merge" in r["text"].split()]
    vals = sorted(r["n_chars"] for r in hits)
    res = eng.search_percentile_ranks(
        "merge", "n_chars", values=(0, 40, 60, 10_000))
    assert res["count"] == len(vals)
    for v in (0, 40, 60, 10_000):
        le = sum(1 for x in vals if x <= v)
        assert res["values"][f"{v:g}"] == pytest.approx(
            100.0 * le / len(vals))
    # empty hit set -> None ranks
    res0 = eng.search_percentile_ranks("zzznope", "n_chars", values=(5,))
    assert res0["count"] == 0 and res0["values"]["5"] is None


def test_normalize_and_sibling_aggs():
    from elasticsearch_ray.ops.pipeline_aggs import (
        extremum_bucket,
        normalize,
    )

    b = pa.table({
        "key": pa.array([0, 1, 2, 3], pa.int64()),
        "m": pa.array([2.0, 6.0, 2.0, 10.0], pa.float64()),
    })
    pct = normalize(b, "m", "percent_of_sum", out_col="v")
    assert pct.column("v").to_pylist() == [0.1, 0.3, 0.1, 0.5]
    r01 = normalize(b, "m", "rescale_0_1", out_col="v")
    assert r01.column("v").to_pylist() == [0.0, 0.5, 0.0, 1.0]
    r100 = normalize(b, "m", "rescale_0_100", out_col="v")
    assert r100.column("v").to_pylist() == [0.0, 50.0, 0.0, 100.0]
    mean = normalize(b, "m", "mean", out_col="v")
    assert mean.column("v").to_pylist() == [-3.0, 1.0, -3.0, 5.0]
    z = normalize(b, "m", "z-score", out_col="v").column("v").to_pylist()
    m = np.array([2.0, 6.0, 2.0, 10.0])
    assert z == pytest.approx(((m - m.mean()) / m.std()).tolist())
    sm = normalize(b, "m", "softmax", out_col="v").column("v").to_pylist()
    e = np.exp(m)
    assert sm == pytest.approx((e / e.sum()).tolist())
    # degenerate spans -> all null
    flat = pa.table({"m": pa.array([4.0, 4.0], pa.float64())})
    for method in ("rescale_0_1", "z-score"):
        out = normalize(flat, "m", method, out_col="v")
        assert out.column("v").to_pylist() == [None, None]
    zero = pa.table({"m": pa.array([0.0, 0.0], pa.float64())})
    assert normalize(zero, "m", "percent_of_sum", out_col="v") \
        .column("v").to_pylist() == [None, None]
    with pytest.raises(ValueError):
        normalize(b, "m", "nope")
    # extremum with tie keys
    mx = extremum_bucket(b, "m", "key", "max")
    assert mx == {"value": 10.0, "keys": [3]}
    mn = extremum_bucket(b, "m", "key", "min")
    assert mn["value"] == 2.0 and mn["keys"] == [0, 2]
    empty = pa.table({"key": pa.array([], pa.int64()),
                      "m": pa.array([], pa.float64())})
    assert extremum_bucket(empty, "m", "key")["keys"] == []
    assert normalize(empty, "m", "percent_of_sum").num_rows == 0


def test_auto_date_histogram_rungs(tmp_path):
    """Rung choice spans seconds -> calendar month; buckets agree with a
    brute floor over the raw timestamps."""
    import ray.data as rd

    from elasticsearch_ray.ops.events import auto_date_histogram

    def mk(ts_us):
        return rd.from_arrow(pa.table({
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "value": pa.array([1.0] * len(ts_us), pa.float64()),
        }))

    # 100 seconds of data
    sec = [i * 1_000_000 + 137 for i in range(100)]
    t = auto_date_histogram(mk(sec), target_buckets=25).to_pandas()
    assert t["interval"].iloc[0] == "5s"
    assert len(t) == 20 and t["n"].sum() == 100
    # ~40 days -> 7d at target 10, 1d at target 50
    day = [i * 86_400_000_000 + 999 for i in range(40)]
    assert auto_date_histogram(mk(day), target_buckets=10) \
        .to_pandas()["interval"].iloc[0] == "7d"
    assert auto_date_histogram(mk(day), target_buckets=50) \
        .to_pandas()["interval"].iloc[0] == "1d"
    # 3 years of weekly points -> calendar month at target 40
    wk = [i * 7 * 86_400_000_000 for i in range(156)]
    t3 = auto_date_histogram(mk(wk), target_buckets=40).to_pandas()
    assert t3["interval"].iloc[0] == "1M"
    assert t3["n"].sum() == 156
    # brute month floor agrees
    import datetime as dt
    months = {
        dt.datetime.fromtimestamp(u / 1e6, dt.timezone.utc)
        .replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        for u in wk
    }
    assert len(t3) == len(months)
    # quarter + year rungs
    assert auto_date_histogram(mk(wk), target_buckets=13) \
        .to_pandas()["interval"].iloc[0] == "3M"
    assert auto_date_histogram(mk(wk), target_buckets=3) \
        .to_pandas()["interval"].iloc[0] == "1y"
    with pytest.raises(ValueError):
        auto_date_histogram(mk(wk), target_buckets=0)
    # empty input -> empty dataset with the declared schema
    empty = auto_date_histogram(mk([]), target_buckets=5)
    assert empty.count() == 0
    assert sorted(empty.schema().names) == ["bucket_us", "interval", "n",
                                            "sum_cents"]


def test_dup_ngram_spans_vs_brute():
    """Randomized corpus with planted shared passages: engine counts ==
    brute python union-of-intervals over string grams."""
    import ray.data as rd

    from elasticsearch_ray.ops.dedup import dup_ngram_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = [rng.choice(vocab) for _ in range(12)]  # planted passage
    docs = []
    for i in range(60):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        if i % 4 == 0:  # a quarter of docs embed the shared passage
            at = rng.randint(0, len(toks))
            toks = toks[:at] + shared + toks[at:]
        docs.append(" ".join(toks))
    n = 5
    # brute: string grams, >= 2 distinct docs, union of [p, p+n-1]
    grams = {}
    for d, text in enumerate(docs):
        toks = text.split()
        for p in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[p:p + n]), set()).add(d)
    dup = {g for g, ds_ in grams.items() if len(ds_) >= 2}
    want = {}
    for d, text in enumerate(docs):
        toks = text.split()
        covered = set()
        for p in range(len(toks) - n + 1):
            if tuple(toks[p:p + n]) in dup:
                covered.update(range(p, p + n))
        if covered:
            want[d] = len(covered)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    got = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_ngram_spans(ds, n=n, num_partitions=8).take_all()
    }
    assert got == want
    assert want  # the planted passage must actually produce spans
    with pytest.raises(ValueError):
        dup_ngram_spans(ds, n=1)


def test_scripted_metric_fold():
    """Map/combine/reduce contract: randomized value column, variance
    matches numpy; empty dataset hits init_state; fold order covered by
    multi-block input."""
    import ray.data as rd

    from elasticsearch_ray.ops.scripted_metric import scripted_metric

    rng = random.Random(11)
    vals = [rng.randint(0, 500) for _ in range(400)]
    ds = rd.from_arrow(
        pa.table({"x": pa.array(vals, pa.int64())})
    ).repartition(7)

    def map_script(batch):
        import pyarrow.compute as pc
        col = batch.column("x")
        return {"n": batch.num_rows,
                "sum": int(pc.sum(col).as_py() or 0),
                "sumsq": int(pc.sum(pc.multiply(col, col)).as_py() or 0)}

    def combine(a, b):
        return {k: a[k] + b[k] for k in ("n", "sum", "sumsq")}

    def var(st):
        if not st.get("n"):
            return None
        return (st["sumsq"] - st["sum"] ** 2 / st["n"]) / st["n"]

    got = scripted_metric(ds, map_script, combine, var)
    assert got == pytest.approx(np.var(np.array(vals, dtype=np.float64)))
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert scripted_metric(empty, map_script, combine, var,
                           init_state={"n": 0, "sum": 0, "sumsq": 0}) is None


def test_cumulative_cardinality_vs_brute():
    import datetime as dt

    import ray.data as rd

    from elasticsearch_ray.ops.events import cumulative_cardinality

    rng = random.Random(13)
    base = int(dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc).timestamp()
               * 1e6)
    ts, users = [], []
    for _ in range(2000):
        day = rng.randint(0, 14)
        ts.append(base + day * 86_400_000_000 + rng.randint(0, 86_399) * 10**6)
        users.append(rng.randint(0, 120))
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
    })).repartition(5)
    got = cumulative_cardinality(ds, "day").to_pandas() \
        .sort_values("bucket_us").reset_index(drop=True)
    # brute
    per_day = {}
    for t, u in zip(ts, users):
        d = (t // 86_400_000_000) * 86_400_000_000
        per_day.setdefault(d, set()).add(u)
    seen, want = set(), []
    for d in sorted(per_day):
        new = per_day[d] - seen
        seen |= per_day[d]
        want.append((d, len(new), len(seen)))
    assert list(map(tuple, got.itertuples(index=False))) == want
    with pytest.raises(ValueError):
        cumulative_cardinality(ds, "fortnight")


def test_composite_pagination_vs_brute(surf_engine):
    """composite agg: full after_key pagination over (terms, terms,
    histogram) equals the brute GROUP BY in composite-key order, counts
    exact on every page, no lost/duplicated buckets across cursors."""
    eng, rows = surf_engine
    want: dict = {}
    for r in rows:
        key = (r["lang"], r["source"], (r["n_chars"] // 10) * 10)
        want[key] = want.get(key, 0) + 1
    want_items = sorted(want.items())

    got, after, pages = [], None, 0
    while True:
        res = eng.search_composite(
            None,
            [("lang", "terms", "lang"), ("src", "terms", "source"),
             ("nc", "histogram", "n_chars", 10)],
            size=5, after=after,
        )
        for b in res["buckets"]:
            got.append(((b["key"]["lang"], b["key"]["src"], b["key"]["nc"]),
                        b["doc_count"]))
        pages += 1
        if len(res["buckets"]) < 5:
            break
        after = res["after_key"]
    assert got == want_items
    assert pages == -(-len(want_items) // 5)

    # filtered hit set + numeric terms source
    res = eng.search_composite(
        "merge AND scan", [("nc", "terms", "n_chars")], size=1000)
    want2: dict = {}
    for r in rows:
        toks = r["text"].split()
        if "merge" in toks and "scan" in toks:
            want2[r["n_chars"]] = want2.get(r["n_chars"], 0) + 1
    assert [(b["key"]["nc"], b["doc_count"]) for b in res["buckets"]] == \
        sorted(want2.items())

    # validation surface
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.search_composite(None, [])
    with _pytest.raises(ValueError):
        eng.search_composite(None, [("x", "histogram", "n_chars", 0)])


def test_combined_fields_vs_brute(tmp_path):
    """combined_fields (BM25F): engine's two-round distributed scoring ==
    the naive all-docs pseudo-field BM25, including duplicate query
    terms (idf multiplicity) and the tombstone guard."""
    import math
    from collections import Counter

    from elasticsearch_ray.pipelines.fields import (
        CrossFieldEngine,
        build_field_indexes,
    )

    rng = random.Random(77)
    vocab = ["merge", "hash", "scan", "join", "sort", "filter", "spark"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
             for _ in range(90)]
    titles = [" ".join(t.split()[:2]) for t in texts]
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(90), pa.int64()),
            "title": pa.array(titles, pa.string()),
            "text": pa.array(texts, pa.string()),
        }), str(src))
    dirs = build_field_indexes(
        {"title": (str(src), "title"), "text": (str(src), "text")},
        str(tmp_path / "fidx"), analyzer="plain",
        target_partition_rows=20, docs_per_segment=30,
    )
    eng = CrossFieldEngine(dirs, boosts={"title": 2.0}, num_shards=2)

    N = len(texts)
    wt, wx = 2.0, 1.0
    tis = [t.split() for t in titles]
    txs = [t.split() for t in texts]
    dlc = [wt * len(a) + wx * len(b) for a, b in zip(tis, txs)]
    avgdl = sum(dlc) / N

    def brute(q, k=10):
        terms = q.split()
        scores: Counter = Counter()
        for t in set(terms):
            dfc = sum(1 for a, b in zip(tis, txs) if t in a or t in b)
            idf = terms.count(t) * math.log((N + 1) / (dfc + 1))
            if idf == 0:
                continue
            for d in range(N):
                tfc = wt * tis[d].count(t) + wx * txs[d].count(t)
                if tfc:
                    scores[d] += idf * tfc * 2.2 / (
                        tfc + 1.2 * (1 - 0.75 + 0.75 * dlc[d] / avgdl))
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    try:
        for q in ["merge hash", "scan", "join join filter", "spark sort merge"]:
            got = [(r["doc_id"], round(r["score"], 9))
                   for r in eng.search_combined(q, size=10)["results"]]
            want = [(d, round(s, 9)) for d, s in brute(q)]
            assert got == want, q
        assert eng.search_combined("zzz")["results"] == []
    finally:
        eng.close()


def test_random_sampler_deterministic(surf_engine):
    """random_sampler: seeded md5 inclusion — identical across calls,
    different seeds give different samples, p=1.0 is the full hit set."""
    eng, rows = surf_engine
    a = eng.search_random_sampler(None, 0.3, "n_chars", seed=42)
    b = eng.search_random_sampler(None, 0.3, "n_chars", seed=42)
    assert a == b
    c = eng.search_random_sampler(None, 0.3, "n_chars", seed=7)
    assert c["doc_count"] != a["doc_count"] or \
        c["sum_n_chars"] != a["sum_n_chars"]
    full = eng.search_random_sampler(None, 1.0, "n_chars")
    assert full["doc_count"] == len(rows)
    assert full["sum_n_chars"] == sum(r["n_chars"] for r in rows)
    assert full["estimated_total"] == len(rows)
    # brute twin of the md5 predicate
    import hashlib
    want = [r for r in rows if int(hashlib.md5(
        f"42:{r['doc_id']}".encode()).hexdigest()[:8], 16) % 1_000_000
        < 300_000]
    assert a["doc_count"] == len(want)
    assert a["sum_n_chars"] == sum(r["n_chars"] for r in want)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.search_random_sampler(None, 0.0, "n_chars")
