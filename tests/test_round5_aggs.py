"""Round-5 aggregations: multi_terms (exact + bounded sharded route),
string_stats, boxplot, matrix_stats — brute-force oracles over a
multi-segment corpus, plus the routing guarantee that high-cardinality
compound keys never ship full per-shard maps."""

import math
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def agg_engine(tmp_path_factory):
    """150 docs over 4 segments: 'source' x 'lang' is a small compound
    domain (5 x 3), 'tag' is near-unique (for the sharded route), and
    n_chars is a skewed numeric doc-value."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(5)
    vocab = ["merge", "hash", "scan", "join", "sort", "other"]
    rows = []
    for i in range(150):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
        rows.append({
            "doc_id": i,
            "text": text,
            "source": f"s{rng.randint(0, 4)}",
            "lang": ("en", "de", "fr")[rng.randint(0, 2)],
            "tag": f"t{i:04d}" if i % 10 else "tdup",
            "n_chars": len(text),
        })
    src = tmp_path_factory.mktemp("agg_src")
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path_factory.mktemp("agg_idx")) + "/idx"
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column="lang",
                    facet_columns=("source", "lang", "tag", "n_chars"),
                    docs_per_segment=40, target_partition_rows=25),
    )
    eng = QueryEngine(idx, num_searchers=2)
    yield eng, rows
    eng.close()


def _hits(rows, term):
    return [r for r in rows if term in r["text"].split()]


def test_multi_terms_exact_vs_brute(agg_engine):
    eng, rows = agg_engine
    for q, hit in (("merge", _hits(rows, "merge")), (None, rows)):
        res = eng.search_multi_terms(q, ["source", "lang"], size=8)
        cnt = {}
        for r in hit:
            k = (r["source"], r["lang"])
            cnt[k] = cnt.get(k, 0) + 1
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        got = [(tuple(b["key"]), b["doc_count"]) for b in res["buckets"]]
        assert got == want
        assert all(b["doc_count_error_upper_bound"] == 0
                   for b in res["buckets"])
        assert res["sum_other_doc_count"] == (
            sum(cnt.values()) - sum(n for _k, n in want)
        )


def test_multi_terms_numeric_key(agg_engine):
    """A numeric field is a valid multi_terms key (ES allows any
    doc-value field); keys come back as ints."""
    eng, rows = agg_engine
    res = eng.search_multi_terms(None, ["lang", "n_chars"], size=5)
    cnt = {}
    for r in rows:
        k = (r["lang"], r["n_chars"])
        cnt[k] = cnt.get(k, 0) + 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(tuple(b["key"]), b["doc_count"]) for b in res["buckets"]] == want


def test_multi_terms_high_cardinality_routes_sharded(agg_engine):
    """Compound cardinality above facet_exact_max must use the
    O(shard_size) top-n ship, never the exact full-map ship — and on this
    corpus (every shard ships its full local top anyway) the counts stay
    exact."""
    eng, rows = agg_engine
    old = eng.facet_exact_max
    eng.facet_exact_max = 20  # source x tag bound is ~150+
    calls = []
    orig = eng._fanout

    def spy(method, *args):
        calls.append((method, args))
        return orig(method, *args)

    eng._fanout = spy
    try:
        res = eng.search_multi_terms(None, ["source", "tag"], size=5,
                                     shard_size=500)
    finally:
        eng._fanout = orig
        eng.facet_exact_max = old
    shipped = [a for m, a in calls if m == "multi_terms_agg"]
    assert shipped and all(a[-1] > 0 for a in shipped), \
        "exact full-map ship crossed the wire on a high-cardinality key"
    cnt = {}
    for r in rows:
        k = (r["source"], r["tag"])
        cnt[k] = cnt.get(k, 0) + 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(tuple(b["key"]), b["doc_count"]) for b in res["buckets"]] == want


def test_string_stats_vs_brute(agg_engine):
    eng, rows = agg_engine
    for q, hit in (("hash", _hits(rows, "hash")), (None, rows)):
        res = eng.search_string_stats(q, "source")
        vals = [r["source"] for r in hit]
        assert res["count"] == len(vals)
        assert res["min_length"] == min(len(v) for v in vals)
        assert res["max_length"] == max(len(v) for v in vals)
        assert res["avg_length"] == pytest.approx(
            sum(len(v) for v in vals) / len(vals))
        chars = {}
        for v in vals:
            for ch in v:
                chars[ch] = chars.get(ch, 0) + 1
        tot = sum(chars.values())
        ent = -sum(c / tot * math.log2(c / tot) for c in chars.values())
        assert res["entropy"] == pytest.approx(ent)


def test_boxplot_vs_brute(agg_engine):
    eng, rows = agg_engine
    for q, hit in (("scan", _hits(rows, "scan")), (None, rows)):
        res = eng.search_boxplot(q, "n_chars")
        vals = sorted(r["n_chars"] for r in hit)
        n = len(vals)
        assert res["count"] == n
        assert res["min"] == vals[0] and res["max"] == vals[-1]
        for key, p in (("q1", 0.25), ("q2", 0.50), ("q3", 0.75)):
            assert res[key] == vals[max(1, math.ceil(p * n)) - 1]


def test_matrix_stats_vs_numpy(agg_engine):
    import numpy as np

    eng, rows = agg_engine
    for q, hit in (("join", _hits(rows, "join")), (None, rows)):
        res = eng.search_matrix_stats(q, "n_chars", "doc_len")
        x = np.array([r["n_chars"] for r in hit], dtype=np.float64)
        y = np.array([len(r["text"].split()) for r in hit],
                     dtype=np.float64)
        assert res["count"] == x.size
        for fld, v in (("n_chars", x), ("doc_len", y)):
            s = res[fld]
            assert s["mean"] == pytest.approx(v.mean())
            assert s["variance"] == pytest.approx(v.var())
            d = v - v.mean()
            assert s["skewness"] == pytest.approx(
                (d ** 3).mean() / v.var() ** 1.5)
            assert s["kurtosis"] == pytest.approx(
                (d ** 4).mean() / v.var() ** 2)
        assert res["covariance"] == pytest.approx(
            np.cov(x, y, bias=True)[0, 1])
        assert res["correlation"] == pytest.approx(
            np.corrcoef(x, y)[0, 1])


def test_matrix_stats_empty_hit_set(agg_engine):
    eng, _rows = agg_engine
    res = eng.search_matrix_stats("zzznope", "n_chars", "doc_len")
    assert res["count"] == 0


def test_mad_vs_brute(agg_engine):
    eng, rows = agg_engine
    for q, hit in (("merge", _hits(rows, "merge")), (None, rows)):
        res = eng.search_mad(q, "n_chars")
        vals = sorted(r["n_chars"] for r in hit)
        n = len(vals)
        med = vals[max(1, math.ceil(0.5 * n)) - 1]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[max(1, math.ceil(0.5 * n)) - 1]
        assert res["count"] == n
        assert res["median"] == med and res["mad"] == mad


def test_t_test_vs_brute(agg_engine):
    eng, rows = agg_engine
    a = [r["n_chars"] for r in _hits(rows, "merge")]
    b = [r["n_chars"] for r in _hits(rows, "scan")]
    res = eng.search_t_test("merge", "scan", "n_chars")
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert res["n_a"] == na and res["n_b"] == nb
    assert res["t"] == pytest.approx(t)
    assert res["df"] == pytest.approx(df)
    assert 0.0 <= res["p_value"] <= 1.0


def test_t_p_value_textbook_criticals():
    """The two-sided p-value implementation pinned against published
    t-distribution critical values (two-sided alpha at the quoted df)."""
    from elasticsearch_ray.pipelines.query import _t_sf_two_sided

    for t, df, want in ((2.228, 10, 0.05), (1.812, 10, 0.10),
                        (2.086, 20, 0.05), (12.706, 1, 0.05),
                        (2.576, 100000, 0.01)):
        assert _t_sf_two_sided(t, df) == pytest.approx(want, abs=2e-3)
    assert _t_sf_two_sided(0.0, 7) == pytest.approx(1.0)
    assert _t_sf_two_sided(50.0, 30) < 1e-10


def test_top_metrics_vs_brute(agg_engine):
    eng, rows = agg_engine
    for q, hit in (("sort", _hits(rows, "sort")), (None, rows)):
        for asc in (False, True):
            res = eng.search_top_metrics(
                q, "n_chars", ["doc_len"], size=4, asc=asc)
            want = sorted(
                hit, key=lambda r: (
                    r["n_chars"] if asc else -r["n_chars"], r["doc_id"])
            )[:4]
            got = [(t["sort"], t["doc_id"], t["metrics"]["doc_len"])
                   for t in res["top"]]
            assert got == [
                (r["n_chars"], r["doc_id"], len(r["text"].split()))
                for r in want
            ]


def _bm25_brute(rows, terms):
    """Engine-formula BM25 (k1=1.2, b=0.75, idf=ln((N+1)/(df+1)), zero-idf
    terms skipped) over the plain-analyzer token lists."""
    docs = {r["doc_id"]: r["text"].split() for r in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for term in dict.fromkeys(terms):
        df = sum(1 for t in docs.values() if term in t)
        idf = math.log((n + 1.0) / (df + 1.0))
        if idf == 0.0 or df == 0:
            continue
        for d, toks in docs.items():
            tf = toks.count(term)
            if not tf:
                continue
            s = idf * (tf * 2.2) / (
                tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    return scores


def test_rank_feature_vs_brute(agg_engine):
    eng, rows = agg_engine
    nc = {r["doc_id"]: r["n_chars"] for r in rows}
    funcs = {
        "saturation": ((40.0,), lambda v: v / (v + 40.0)),
        "log": ((0.5,), lambda v: math.log(1.0 + 0.5 * v)),
        "sigmoid": ((30.0, 2.0), lambda v: v**2 / (v**2 + 30.0**2)),
        "distance": ((10.0, 35.0), lambda v: 10.0 / (10.0 + abs(v - 35.0))),
    }
    for q in ("merge hash", "scan join sort"):
        base = _bm25_brute(rows, q.split())
        for func, (params, f) in funcs.items():
            res = eng.search_rank_feature(q, "n_chars", func=func,
                                          params=params, boost=2.0, size=10)
            want = sorted(
                ((s + 2.0 * f(nc[d]), d) for d, s in base.items()),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            got = [(r["score"], r["doc_id"]) for r in res["results"]]
            assert [d for _s, d in got] == [d for _s, d in want]
            for (gs, _), (ws, _) in zip(got, want):
                assert gs == pytest.approx(ws)
            assert res["total_hits"] == len(base)


def test_rank_feature_requires_params(agg_engine):
    eng, _rows = agg_engine
    with pytest.raises(ValueError, match="params"):
        eng.search_rank_feature("merge", "n_chars", func="saturation")
