"""span_containing / span_within (Lucene per-start-minimal span
enumeration) and the intervals query's filter rules (containing /
contained_by / overlapping / before / after and not_* complements over
minimal interval sets): independent brute-force oracles + randomized
fuzz, plus the discriminating corpus where span semantics and
minimal-interval semantics legitimately disagree."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _build(texts, tmp, seg=4, part=3):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src,
        row_group_size=part,
    )
    idx = str(tmp / "idx")
    build_index(
        src, idx,
        BuildConfig(analyzer="plain", target_partition_rows=part,
                    docs_per_segment=seg, url_column=None,
                    lang_column=None, store_positions=True),
    )
    return QueryEngine(idx, num_searchers=2)


# ---------------------------------------------------------------- brutes


def _greedy_spans(toks, big_terms, slop):
    """Lucene NearSpansOrdered enumeration for single-term clauses:
    for each occurrence of the first term, chain greedily to the next
    strictly-later occurrence of each following term; keep chains with
    total in-order slack <= slop.  Returns [(s, e)] inclusive."""
    pos = {w: [i for i, x in enumerate(toks) if x == w] for w in big_terms}
    spans = []
    for s in pos[big_terms[0]]:
        cur = s
        ok = True
        for w in big_terms[1:]:
            nxt = [p for p in pos[w] if p > cur]
            if not nxt:
                ok = False
                break
            cur = nxt[0]
        if ok and (cur - s) - (len(big_terms) - 1) <= slop:
            spans.append((s, cur))
    return spans


def _brute_containing(texts, big_terms, little, slop):
    out = []
    for doc_id, t in enumerate(texts):
        toks = t.split()
        lpos = [i for i, x in enumerate(toks) if x == little]
        if any(s <= p <= e
               for s, e in _greedy_spans(toks, big_terms, slop)
               for p in lpos):
            out.append(doc_id)
    return out


def _minimal_pairs(toks, t1, t2, max_gaps):
    """Minimal-interval set of the ordered 2-term match (t1, t2):
    all ordered pairs, pruned to the antichain, THEN gap-filtered
    (Lucene applies max_gaps to the already-minimal source)."""
    p1 = [i for i, x in enumerate(toks) if x == t1]
    p2 = [i for i, x in enumerate(toks) if x == t2]
    pairs = [(a, b) for a in p1 for b in p2 if b > a]
    minimal = [
        (s, e) for s, e in pairs
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e))
                   for s2, e2 in pairs)
    ]
    if max_gaps >= 0:
        minimal = [(s, e) for s, e in minimal if (e - s - 1) <= max_gaps]
    return minimal


def _brute_iv_filter(texts, src_pair, fkind, flt_term, max_gaps=-1):
    """Doc oracle for {match: src with filter {fkind: term}} where src
    is an ordered 2-term match and the filter rule is a single term."""
    out = []
    neg = fkind.startswith("not_")
    base = fkind[4:] if neg else fkind
    for doc_id, t in enumerate(texts):
        toks = t.split()
        src = _minimal_pairs(toks, *src_pair, max_gaps)
        flt = [(i, i) for i, x in enumerate(toks) if x == flt_term]

        def rel(s, e):
            if base == "containing":
                return any(s <= fs and fe <= e for fs, fe in flt)
            if base == "contained_by":
                return any(fs <= s and e <= fe for fs, fe in flt)
            if base == "overlapping":
                return any(fs <= e and s <= fe for fs, fe in flt)
            if base == "before":
                return any(e < fs for fs, _ in flt)
            return any(s > fe for _, fe in flt)  # after

        if any(rel(s, e) != neg for s, e in src):
            out.append(doc_id)
    return out


# ---------------------------------------------------------------- tests


def test_span_vs_interval_semantics_disagree(tmp_path):
    # "a c a b": greedy spans of (a,b) = {(0,3),(2,3)} -> (0,3) contains
    # c, so span_containing matches; minimal intervals prune (0,3) in
    # favor of (2,3), so the intervals containing-filter does NOT.
    texts = ["alpha gamma alpha beta", "alpha beta gamma"]
    eng = _build(texts, tmp_path)
    try:
        res = eng.search_span_containing("alpha beta", "gamma",
                                         slop=10, size=10)
        assert [r["doc_id"] for r in res["results"]] == [0]
        rule = {"match": {"query": "alpha beta", "ordered": True,
                          "max_gaps": 10,
                          "filter": {"containing": {
                              "match": {"query": "gamma"}}}}}
        res2 = eng.search_intervals(rule, size=10)
        assert [r["doc_id"] for r in res2["results"]] == []
    finally:
        eng.close()


def test_span_containing_brute(tmp_path):
    texts = [
        "alpha beta gamma",            # no: gamma after span
        "alpha gamma beta",            # yes at slop>=1
        "alpha gamma gamma beta",      # yes at slop>=2
        "gamma alpha beta",            # no: gamma before span
        "alpha beta",                  # no gamma
        "beta gamma alpha",            # no ordered span
        "alpha gamma beta alpha beta",  # yes (first span)
    ]
    eng = _build(texts, tmp_path)
    try:
        for slop in (0, 1, 2, 5):
            res = eng.search_span_containing("alpha beta", "gamma",
                                             slop=slop, size=50)
            got = [r["doc_id"] for r in res["results"]]
            want = _brute_containing(texts, ["alpha", "beta"], "gamma",
                                     slop)
            assert got == want, slop
            assert res["total_hits"] == len(want)
            # span_within: identical doc set from the little side
            res_w = eng.search_span_within("gamma", "alpha beta",
                                           slop=slop, size=50)
            assert [r["doc_id"] for r in res_w["results"]] == want
    finally:
        eng.close()


def test_span_containing_fuzz(tmp_path):
    rng = random.Random(77)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
        for _ in range(60)
    ]
    eng = _build(texts, tmp_path, seg=7, part=5)
    try:
        for big, little in (
            (["alpha", "beta"], "gamma"),
            (["beta", "gamma"], "alpha"),
            (["alpha", "beta", "gamma"], "delta"),
            (["alpha", "beta"], "alpha"),   # little == a big term
        ):
            for slop in (0, 1, 3, 8):
                res = eng.search_span_containing(
                    " ".join(big), little, slop=slop, size=100)
                got = [r["doc_id"] for r in res["results"]]
                want = _brute_containing(texts, big, little, slop)
                assert got == want, (big, little, slop)
    finally:
        eng.close()


def test_interval_filters_brute(tmp_path):
    rng = random.Random(99)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        for _ in range(50)
    ]
    eng = _build(texts, tmp_path, seg=9, part=6)
    try:
        for fkind in ("containing", "not_containing", "contained_by",
                      "not_contained_by", "overlapping",
                      "not_overlapping", "before", "after"):
            for mg in (-1, 0, 2):
                rule = {"match": {
                    "query": "alpha beta", "ordered": True,
                    "max_gaps": mg,
                    "filter": {fkind: {"match": {"query": "gamma"}}}}}
                res = eng.search_intervals(rule, size=100)
                got = [r["doc_id"] for r in res["results"]]
                want = _brute_iv_filter(
                    texts, ("alpha", "beta"), fkind, "gamma", mg)
                assert got == want, (fkind, mg)
    finally:
        eng.close()


def test_contained_by_term_in_window(tmp_path):
    # term source contained_by a 2-term window: the common "word inside
    # a phrase window" shape (= span_within through the raw algebra)
    texts = [
        "alpha gamma beta",
        "gamma alpha beta",
        "alpha beta gamma",
        "alpha gamma gamma beta",
    ]
    eng = _build(texts, tmp_path)
    try:
        rule = {"match": {
            "query": "gamma",
            "filter": {"contained_by": {"match": {
                "query": "alpha beta", "ordered": True,
                "max_gaps": 4}}}}}
        res = eng.search_intervals(rule, size=10)
        assert [r["doc_id"] for r in res["results"]] == [0, 3]
    finally:
        eng.close()


def test_filter_validation(tmp_path):
    eng = _build(["alpha beta gamma"], tmp_path)
    try:
        with pytest.raises(ValueError, match="unsupported intervals filter"):
            eng.search_intervals(
                {"match": {"query": "alpha beta",
                           "filter": {"bogus": {"match":
                                                {"query": "gamma"}}}}})
        with pytest.raises(ValueError, match="exactly one"):
            eng.search_intervals(
                {"match": {"query": "alpha",
                           "filter": {}}})
        with pytest.raises(ValueError, match="at least two"):
            eng.search_span_containing("alpha", "gamma")
        with pytest.raises(ValueError, match="must be distinct"):
            eng.search_span_containing("alpha alpha", "gamma")
    finally:
        eng.close()


def _brute_span_multi(texts, clauses, slop, in_order):
    import fnmatch
    import itertools

    out = []
    n = len(clauses)
    for doc_id, t in enumerate(texts):
        toks = t.split()
        pos = []
        for c in clauses:
            if "*" in c or "?" in c:
                p = [i for i, x in enumerate(toks)
                     if fnmatch.fnmatchcase(x, c)]
            else:
                p = [i for i, x in enumerate(toks) if x == c]
            pos.append(p)
        if any(not p for p in pos):
            continue
        hit = False
        for combo in itertools.product(*pos):
            if in_order:
                if any(combo[i + 1] <= combo[i] for i in range(n - 1)):
                    continue
            if max(combo) - min(combo) - (n - 1) <= slop:
                hit = True
                break
        if hit:
            out.append(doc_id)
    return out


def test_span_multi_brute(tmp_path):
    texts = [
        "alpha beta gamma",
        "alphax beta",
        "beta alphax",
        "alpy gamma beta",
        "gamma delta",
        "alpha gamma gamma beta",
    ]
    eng = _build(texts, tmp_path)
    try:
        for clauses, slop, ino in (
            (["alp*", "beta"], 0, True),
            (["alp*", "beta"], 2, True),
            (["alp*", "beta"], 0, False),
            (["alp*", "beta"], 2, False),
            (["*a", "beta"], 1, False),
            (["alpha"], 0, True),          # single clause = wildcard/term
            (["al?ha", "gamma", "beta"], 3, True),
        ):
            res = eng.search_span_multi(clauses, slop=slop, in_order=ino,
                                        size=50)
            got = [r["doc_id"] for r in res["results"]]
            want = _brute_span_multi(texts, clauses, slop, ino)
            assert got == want, (clauses, slop, ino)
            assert res["total_hits"] == len(want)
    finally:
        eng.close()


def test_span_multi_fuzz(tmp_path):
    rng = random.Random(4242)
    vocab = ["alpha", "alpine", "albeit", "beta", "betray", "gamma"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        for _ in range(60)
    ]
    eng = _build(texts, tmp_path, seg=8, part=5)
    try:
        pools = ["al*", "bet*", "gamma", "a*a", "*ta", "alpha", "be?a"]
        for _ in range(25):
            n = rng.randint(1, 3)
            clauses = rng.sample(pools, n)
            slop = rng.choice([0, 1, 3, 9])
            ino = rng.random() < 0.5
            res = eng.search_span_multi(clauses, slop=slop, in_order=ino,
                                        size=100)
            got = [r["doc_id"] for r in res["results"]]
            want = _brute_span_multi(texts, clauses, slop, ino)
            assert got == want, (clauses, slop, ino)
    finally:
        eng.close()


def test_span_multi_validation(tmp_path):
    eng = _build(["alpha beta"], tmp_path)
    try:
        with pytest.raises(ValueError, match="at least one clause"):
            eng.search_span_multi([])
        with pytest.raises(ValueError, match="slop must be"):
            eng.search_span_multi(["alpha"], slop=-1)
        with pytest.raises(ValueError, match="exactly one"):
            eng.search_span_multi(["alpha beta"])
    finally:
        eng.close()


def _lev(a, b, maxd):
    if abs(len(a) - len(b)) > maxd:
        return maxd + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _clause_positions(toks, c):
    import fnmatch
    import re as _re

    if len(c) > 2 and c.startswith("/") and c.endswith("/"):
        rx = _re.compile(c[1:-1])
        return [i for i, x in enumerate(toks) if rx.fullmatch(x)]
    m = _re.match(r"^([A-Za-z0-9]+)~([0-2]?)$", c)
    if m:
        t = m.group(1)
        if m.group(2):
            d = int(m.group(2))
        else:
            d = 0 if len(t) <= 2 else (1 if len(t) <= 5 else 2)
        return [i for i, x in enumerate(toks) if _lev(t, x, d) <= d]
    if "*" in c or "?" in c:
        return [i for i, x in enumerate(toks)
                if fnmatch.fnmatchcase(x, c)]
    return [i for i, x in enumerate(toks) if x == c]


def _brute_span_multi2(texts, clauses, slop, in_order):
    import itertools

    out = []
    n = len(clauses)
    for doc_id, t in enumerate(texts):
        toks = t.split()
        pos = [_clause_positions(toks, c) for c in clauses]
        if any(not p for p in pos):
            continue
        for combo in itertools.product(*pos):
            if in_order and any(
                combo[i + 1] <= combo[i] for i in range(n - 1)
            ):
                continue
            if max(combo) - min(combo) - (n - 1) <= slop:
                out.append(doc_id)
                break
    return out


def test_span_multi_fuzzy_regexp(tmp_path):
    texts = [
        "merge sorted alpha",
        "merze sorted beta",      # merze ~1 of merge
        "marge alpha sorted",
        "sorted merge",
        "merge alpha beta sorted",
        "mxrze sorted",           # 2 edits from merge
    ]
    eng = _build(texts, tmp_path)
    try:
        for clauses, slop, ino in (
            (["merge~1", "sorted"], 0, True),
            (["merge~", "sorted"], 1, True),     # AUTO = 2 edits
            (["merge~1", "sorted"], 2, False),
            (["/m.rge/", "sorted"], 1, True),
            (["/m.+e/", "alpha"], 3, False),
            (["merge~0"], 0, True),              # exact via fuzzy 0
        ):
            res = eng.search_span_multi(clauses, slop=slop, in_order=ino,
                                        size=50)
            got = [r["doc_id"] for r in res["results"]]
            want = _brute_span_multi2(texts, clauses, slop, ino)
            assert got == want, (clauses, slop, ino)
    finally:
        eng.close()


def test_new_surfaces_embedded_vs_distributed(tmp_path):
    """Bit-identity across num_searchers for every surface added in the
    continuation session (span_containing/within, span_multi with all
    clause kinds, interval filters)."""
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(2024)
    vocab = ["merge", "merze", "sorted", "alpha", "beta", "gamma"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
        for _ in range(80)
    ]
    eng2 = _build(texts, tmp_path, seg=10, part=7)
    idx = eng2.index_dir
    eng0 = QueryEngine(idx, num_searchers=0)
    try:
        def both(fn):
            a, b = fn(eng0), fn(eng2)
            assert a == b
            return a

        both(lambda e: e.search_span_containing(
            "merge sorted", "alpha", slop=6, size=100))
        both(lambda e: e.search_span_within(
            "alpha", "merge sorted", slop=6, size=100))
        both(lambda e: e.search_span_multi(
            ["mer*", "sorted"], slop=2, in_order=True, size=100))
        both(lambda e: e.search_span_multi(
            ["merge~1", "/s.rted/"], slop=3, in_order=False, size=100))
        for fk in ("containing", "not_containing", "before", "after"):
            both(lambda e, fk=fk: e.search_intervals(
                {"match": {"query": "merge sorted", "ordered": True,
                           "max_gaps": 5,
                           "filter": {fk: {"match": {"query": "beta"}}}}},
                size=100))
    finally:
        eng0.close()
        eng2.close()


def test_new_surfaces_reject_garbage_cleanly(tmp_path):
    """Property: malformed inputs to the new surfaces raise ValueError
    (or KeyError for missing rule keys) — never crash the actor pool or
    return garbage silently."""
    eng = _build(["alpha beta gamma", "beta gamma"], tmp_path)
    try:
        bad_calls = [
            lambda: eng.search_span_multi(["alpha beta"]),      # 2 terms
            lambda: eng.search_span_multi([""]),                # empty
            lambda: eng.search_span_multi(["a*"], slop=-2),
            lambda: eng.search_span_containing("alpha", "beta"),
            lambda: eng.search_span_containing("alpha alpha", "beta"),
            lambda: eng.search_span_within("x y", "alpha beta"),
            lambda: eng.search_intervals({"match": {
                "query": "alpha", "filter": {"inside": {
                    "match": {"query": "beta"}}}}}),
            lambda: eng.search_intervals({"match": {
                "query": "alpha",
                "filter": {"containing": {"bogus": {}}}}}),
            lambda: eng.search_template("{{missing}}", {}),
            lambda: eng.rank_eval([{"query": "a", "relevant": []}],
                                  metric="f2"),
            lambda: eng.search_terms_lookup(0, "no_such_col"),
        ]
        for fn in bad_calls:
            with pytest.raises((ValueError, KeyError)):
                fn()
        # and the engine still serves fine afterwards (2-doc corpus so
        # the query term's idf is nonzero)
        assert eng.search("alpha")["total_hits"] == 1
    finally:
        eng.close()
