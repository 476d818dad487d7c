"""ES ``intervals`` query — minimal-interval algebra over stored
positions (match / all_of / any_of with ordered + max_gaps, nested).

Ground truth is an independent naive per-doc implementation of the same
algebra over raw token lists (exhaustive combination enumeration for the
unordered combinator, list scans instead of composite-key vector walks),
fuzz-compared doc-for-doc against the engine's segmented evaluation."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

VOCAB = ["merge", "sort", "batch", "scan", "filter", "join", "hash",
         "customer", "order", "group"]

_UNL = 1 << 30


# --------------------------------------------------- naive reference

def _prune(ivs):
    ivs = sorted(set(ivs))
    dd = []
    for s, e in ivs:
        if dd and dd[-1][0] == s:
            continue
        dd.append((s, e))
    out, min_end = [], None
    for s, e in reversed(dd):
        if min_end is None or e < min_end:
            out.append((s, e))
            min_end = e
    out.reverse()
    return out


def _combine(childs, ordered, max_gaps):
    if any(not c for c in childs):
        return []
    cand = []
    if ordered:
        for s0, e0 in childs[0]:
            cur, cov, ok = e0, e0 - s0 + 1, True
            for c in childs[1:]:
                nxt = [iv for iv in c if iv[0] > cur]
                if not nxt:
                    ok = False
                    break
                cs, ce = nxt[0]
                cov += ce - cs + 1
                cur = ce
            if ok:
                cand.append((s0, cur, cov))
    else:
        import itertools

        for combo in itertools.product(*childs):
            s = min(c[0] for c in combo)
            e = max(c[1] for c in combo)
            cand.append((s, e, sum(c[1] - c[0] + 1 for c in combo)))
    dense = {}
    for s, e, cov in cand:
        if (s, e) not in dense or cov > dense[(s, e)]:
            dense[(s, e)] = cov
    return [
        (s, e) for s, e in _prune([(s, e) for s, e, _ in cand])
        if (e - s + 1) - dense[(s, e)] <= max_gaps
    ]


_FILTER_KINDS = ["containing", "contained_by", "overlapping", "before",
                 "after", "not_containing", "not_contained_by",
                 "not_overlapping"]


def _eval(rule, toks):
    kind = rule[0]
    if kind == "term":
        return [(i, i) for i, w in enumerate(toks) if w == rule[1]]
    if kind == "filter":
        _, src_rule, fk, flt_rule = rule
        src = _eval(src_rule, toks)
        flt = _eval(flt_rule, toks)
        neg = fk.startswith("not_")
        base = fk[4:] if neg else fk
        out = []
        for s, e in src:
            if base == "containing":
                hit = any(s <= fs and fe <= e for fs, fe in flt)
            elif base == "contained_by":
                hit = any(fs <= s and e <= fe for fs, fe in flt)
            elif base == "overlapping":
                hit = any(fs <= e and s <= fe for fs, fe in flt)
            elif base == "before":
                hit = any(e < fs for fs, _ in flt)
            else:
                hit = any(s > fe for _, fe in flt)
            if hit != neg:
                out.append((s, e))
        return out
    if kind in ("match", "all_of"):
        _, ch_, mg, ordered = rule
        childs = (
            [[(i, i) for i, w in enumerate(toks) if w == t] for t in ch_]
            if kind == "match" else [_eval(c, toks) for c in ch_]
        )
        if len(childs) == 1:
            return childs[0]
        return _combine(childs, ordered, mg if mg >= 0 else _UNL)
    out = []
    for c in rule[1]:
        out.extend(_eval(c, toks))
    return _prune(out)


def _compile(rule):
    kind, body = next(iter(rule.items()))
    if kind == "match":
        ts = tuple(body["query"].split())
        base = (("term", ts[0]) if len(ts) == 1 else
                ("match", ts, body.get("max_gaps", -1),
                 body.get("ordered", False)))
    else:
        ch = tuple(_compile(c) for c in body["intervals"])
        base = (("any_of", ch) if kind == "any_of" else
                ("all_of", ch, body.get("max_gaps", -1),
                 body.get("ordered", False)))
    flt = body.get("filter")
    if flt:
        fk, inner = next(iter(flt.items()))
        return ("filter", base, fk, _compile(inner))
    return base


def _rand_rule(rng, depth, filters=False):
    kind = rng.choice(
        ["match", "match", "all_of", "any_of"] if depth > 0 else ["match"])
    if kind == "match":
        n = rng.randint(1, 3)
        rule = {"match": {"query": " ".join(rng.sample(VOCAB, n)),
                          "max_gaps": rng.choice([-1, 0, 1, 2, 5, 64]),
                          "ordered": rng.random() < 0.5}}
    else:
        ch = [_rand_rule(rng, depth - 1, filters)
              for _ in range(rng.randint(2, 3))]
        if kind == "any_of":
            rule = {"any_of": {"intervals": ch}}
        else:
            rule = {"all_of": {"intervals": ch,
                               "max_gaps": rng.choice([-1, 0, 2, 4, 8]),
                               "ordered": rng.random() < 0.5}}
    if filters and depth > 0 and rng.random() < 0.5:
        body = next(iter(rule.values()))
        body["filter"] = {
            rng.choice(_FILTER_KINDS): _rand_rule(rng, depth - 1, filters)
        }
    return rule


# ---------------------------------------------------------- fixture

@pytest.fixture(scope="module")
def iv_setup(tmp_path_factory):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(7)
    texts = [" ".join(rng.choices(VOCAB, k=rng.randint(3, 15)))
             for _ in range(150)]
    d = tmp_path_factory.mktemp("iv")
    src = str(d / "docs.parquet")
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}), src,
                   row_group_size=25)
    idx = str(d / "idx")
    build_index(src, idx, BuildConfig(
        analyzer="plain", url_column=None, lang_column=None,
        target_partition_rows=30, docs_per_segment=50,
        store_positions=True))
    eng = QueryEngine(idx, num_searchers=2)
    docs = {i: t.split() for i, t in enumerate(texts)}
    yield eng, docs
    eng.close()


def _got(eng, rule):
    res = eng.search_intervals(rule, size=10_000)
    return sorted(r["doc_id"] for r in res["results"])


def _want(docs, rule):
    nr = _compile(rule)
    return sorted(d for d, t in docs.items() if _eval(nr, t))


# ------------------------------------------------------------ tests

def test_ordered_match_is_sloppy_phrase_window(iv_setup):
    eng, docs = iv_setup
    rule = {"match": {"query": "merge sort", "ordered": True, "max_gaps": 1}}
    assert _got(eng, rule) == _want(docs, rule)


def test_unlimited_ordered_chain(iv_setup):
    eng, docs = iv_setup
    rule = {"match": {"query": "customer batch order", "ordered": True,
                      "max_gaps": -1}}
    assert _got(eng, rule) == _want(docs, rule)


def test_large_finite_gap_budget_per_doc_path(iv_setup):
    eng, docs = iv_setup
    # max_gaps 64 > the vectorized DP cutoff: exercises the per-doc path
    rule = {"match": {"query": "merge filter", "ordered": True,
                      "max_gaps": 64}}
    assert _got(eng, rule) == _want(docs, rule)


def test_nested_all_of_ordered(iv_setup):
    eng, docs = iv_setup
    rule = {"all_of": {"ordered": True, "max_gaps": 3, "intervals": [
        {"match": {"query": "merge sort", "ordered": True, "max_gaps": 0}},
        {"any_of": {"intervals": [
            {"match": {"query": "batch"}},
            {"match": {"query": "scan"}}]}},
    ]}}
    assert _got(eng, rule) == _want(docs, rule)


def test_validation(iv_setup):
    eng, _ = iv_setup
    with pytest.raises(ValueError):
        eng.search_intervals({"match": {"query": ""}})
    with pytest.raises(ValueError):
        eng.search_intervals({"bogus": {}})
    with pytest.raises(ValueError):
        eng.search_intervals({"all_of": {"intervals": []}})


def test_intervals_fuzz(iv_setup):
    eng, docs = iv_setup
    rng = random.Random(99)
    for _ in range(60):
        rule = _rand_rule(rng, 2)
        assert _got(eng, rule) == _want(docs, rule), rule


def test_intervals_filter_fuzz(iv_setup):
    """Nested filter fuzz: filters attached to match/all_of/any_of at
    any depth, filter rules themselves nested (filter-in-filter),
    against the independent naive algebra + loop-based relation
    checks."""
    eng, docs = iv_setup
    rng = random.Random(1234)
    n_with_filter = 0
    for _ in range(80):
        rule = _rand_rule(rng, 2, filters=True)
        if "filter" in repr(rule):
            n_with_filter += 1
        assert _got(eng, rule) == _want(docs, rule), rule
    assert n_with_filter >= 30  # the fuzz actually exercises filters
