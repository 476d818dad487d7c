"""span_near queries (unordered/ordered proximity over stored positions):
brute-force positional oracle + randomized fuzz on dense co-occurrence
corpora (the corpus shape that catches window-boundary bugs)."""

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


def _brute(texts, terms, slop, in_order):
    out = []
    for doc_id, t in enumerate(texts):
        toks = t.split()
        pos = {w: [i for i, x in enumerate(toks) if x == w] for w in terms}
        if any(not pos[w] for w in terms):
            continue
        hit = False
        import itertools
        for combo in itertools.product(*(pos[w] for w in terms)):
            if in_order and any(
                combo[i + 1] <= combo[i] for i in range(len(combo) - 1)
            ):
                continue
            if max(combo) - min(combo) - (len(terms) - 1) <= slop:
                hit = True
                break
        if hit:
            out.append(doc_id)
    return out


def test_span_near_brute(tmp_path):
    texts = [
        "alpha beta gamma",
        "beta alpha gamma",
        "alpha x x beta",
        "beta x x alpha",
        "alpha x x x beta",
        "gamma only here",
        "alpha beta alpha beta",
    ]
    eng = _build(texts, tmp_path)
    try:
        for terms, slop, ino in (
            (["alpha", "beta"], 0, False), (["alpha", "beta"], 0, True),
            (["alpha", "beta"], 2, False), (["alpha", "beta"], 2, True),
            (["alpha", "beta", "gamma"], 0, False),
            (["alpha", "beta", "gamma"], 1, True),
        ):
            res = eng.search_span_near(" ".join(terms), slop=slop,
                                       in_order=ino, size=50)
            got = [r["doc_id"] for r in res["results"]]
            want = _brute(texts, terms, slop, ino)
            assert got == want, (terms, slop, ino)
            assert res["total_hits"] == len(want)
    finally:
        eng.close()


def test_span_near_fuzz(tmp_path):
    rng = random.Random(17)
    vocab = ["a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20)))
        for _ in range(60)
    ]
    eng = _build(texts, tmp_path, seg=16, part=10)
    try:
        for _ in range(40):
            k = rng.randint(2, 3)
            terms = rng.sample(vocab, k)
            slop = rng.randint(0, 4)
            ino = rng.random() < 0.5
            res = eng.search_span_near(" ".join(terms), slop=slop,
                                       in_order=ino, size=100)
            got = [r["doc_id"] for r in res["results"]]
            assert got == _brute(texts, terms, slop, ino), \
                (terms, slop, ino)
    finally:
        eng.close()


def test_span_near_rejects_bad_clauses(tmp_path):
    eng = _build(["x y z", "y x z"], tmp_path)
    try:
        with pytest.raises(ValueError, match="at least two"):
            eng.search_span_near("x", slop=1)
        with pytest.raises(ValueError, match="distinct"):
            eng.search_span_near("x x", slop=1)
    finally:
        eng.close()


def _brute_first(texts, alts, end):
    out = []
    for doc_id, t in enumerate(texts):
        toks = t.split()
        if any(w in alts and (end is None or i + 1 <= end)
               for i, w in enumerate(toks)):
            out.append(doc_id)
    return out


def test_span_first_brute(tmp_path):
    texts = [
        "alpha beta gamma",        # alpha@0, beta@1
        "x alpha beta",            # alpha@1
        "x x alpha",               # alpha@2
        "beta x alpha",            # beta@0
        "x x x x alpha",           # alpha@4
        "gamma only here",         # no alt
    ]
    eng = _build(texts, tmp_path)
    try:
        for alts, end in (
            (["alpha"], 1), (["alpha"], 2), (["alpha"], 3),
            (["alpha", "beta"], 1), (["alpha", "beta"], 2),
            (["alpha", "beta"], None), (["alpha"], None),
        ):
            r = eng.search_span_first(" ".join(alts), end=end, size=50)
            got = [h["doc_id"] for h in r["results"]]
            want = _brute_first(texts, set(alts), end)
            assert got == want, (alts, end, got, want)
            assert r["total_hits"] == len(want)
        with pytest.raises(ValueError):
            eng.search_span_first("alpha", end=0)
        with pytest.raises(ValueError):
            eng.search_span_first("")
    finally:
        eng.close()


def test_span_first_fuzz(tmp_path):
    rng = random.Random(71)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
             for _ in range(40)]
    eng = _build(texts, tmp_path, seg=7, part=5)
    try:
        for _ in range(30):
            alts = rng.sample(vocab, rng.randint(1, 3))
            end = rng.choice([None, 1, 2, 3, 5])
            r = eng.search_span_first(" ".join(alts), end=end, size=100)
            got = [h["doc_id"] for h in r["results"]]
            assert got == _brute_first(texts, set(alts), end), (alts, end)
    finally:
        eng.close()


def _brute_not(texts, inc, excs, pre, post):
    out = []
    for doc_id, t in enumerate(texts):
        toks = t.split()
        ipos = [i for i, w in enumerate(toks) if w == inc]
        epos = [i for i, w in enumerate(toks) if w in excs]
        if any(all(not (p - pre <= q <= p + post) for q in epos)
               for p in ipos):
            out.append(doc_id)
    return out


def test_span_not_brute(tmp_path):
    texts = [
        "alpha beta gamma",     # beta right after alpha
        "beta alpha gamma",     # beta right before alpha
        "alpha x x beta",
        "alpha x gamma",
        "x alpha",
        "beta gamma only",
    ]
    eng = _build(texts, tmp_path)
    try:
        for pre, post in ((0, 0), (0, 1), (1, 0), (1, 1), (0, 3), (5, 5)):
            r = eng.search_span_not("alpha", "beta", pre=pre, post=post,
                                    size=50)
            got = [h["doc_id"] for h in r["results"]]
            want = _brute_not(texts, "alpha", {"beta"}, pre, post)
            assert got == want, (pre, post, got, want)
            assert r["total_hits"] == len(want)
        # span_or excludes
        r = eng.search_span_not("alpha", "beta gamma", pre=1, post=1,
                                size=50)
        assert [h["doc_id"] for h in r["results"]] == \
            _brute_not(texts, "alpha", {"beta", "gamma"}, 1, 1)
        with pytest.raises(ValueError):
            eng.search_span_not("alpha", "alpha")
        with pytest.raises(ValueError):
            eng.search_span_not("alpha", "")
        with pytest.raises(ValueError):
            eng.search_span_not("alpha", "beta", pre=-1)
    finally:
        eng.close()


def test_span_not_fuzz(tmp_path):
    rng = random.Random(5)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
             for _ in range(40)]
    eng = _build(texts, tmp_path, seg=7, part=5)
    try:
        for _ in range(30):
            inc = rng.choice(vocab)
            excs = rng.sample([v for v in vocab if v != inc],
                              rng.randint(1, 2))
            pre, post = rng.randint(0, 3), rng.randint(0, 3)
            r = eng.search_span_not(inc, " ".join(excs), pre=pre,
                                    post=post, size=100)
            got = [h["doc_id"] for h in r["results"]]
            assert got == _brute_not(texts, inc, set(excs), pre, post), \
                (inc, excs, pre, post)
    finally:
        eng.close()


def test_span_queries_require_positions(tmp_path):
    """Clear ValueError (not an actor TypeError) when the index lacks
    stored positions; span_first without an end bound still works."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"text": pa.array(["alpha beta", "beta"])}),
                   src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, BuildConfig(analyzer="plain", url_column=None,
                                      lang_column=None))  # no positions
    eng = QueryEngine(idx, num_searchers=0)
    try:
        with pytest.raises(ValueError, match="store_positions"):
            eng.search_span_near("alpha beta", slop=1)
        with pytest.raises(ValueError, match="store_positions"):
            eng.search_span_not("alpha", "beta")
        with pytest.raises(ValueError, match="store_positions"):
            eng.search_span_first("alpha", end=2)
        r = eng.search_span_first("alpha beta")  # span_or union: fine
        assert r["total_hits"] == 2
    finally:
        eng.close()


def test_span_not_window_bound(tmp_path):
    eng = _build(["alpha beta"], tmp_path)
    try:
        with pytest.raises(ValueError, match="2\\^31"):
            eng.search_span_not("alpha", "beta", pre=1 << 31)
    finally:
        eng.close()


def test_span_family_degenerate_equivalences(tmp_path):
    """Internal consistency: span_near with a huge slop equals boolean
    AND; span_first with a huge end equals the span_or union (boolean
    OR); span_not with huge pre/post keeps only docs where the include
    term appears but NO exclude term does."""
    rng = random.Random(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
             for _ in range(50)]
    eng = _build(texts, tmp_path, seg=9, part=6)
    try:
        for a, b in (("aa", "bb"), ("cc", "dd"), ("aa", "dd")):
            near = eng.search_span_near(f"{a} {b}", slop=10_000, size=200)
            land = eng.search(f"{a} AND {b}", size=200)
            assert [h["doc_id"] for h in near["results"]] == \
                [h["doc_id"] for h in land["results"]], (a, b)
            first = eng.search_span_first(f"{a} {b}", end=10_000,
                                          size=200)
            lor = eng.search(f"{a} OR {b}", size=200)
            assert [h["doc_id"] for h in first["results"]] == \
                [h["doc_id"] for h in lor["results"]], (a, b)
            noti = eng.search_span_not(a, b, pre=10_000, post=10_000,
                                       size=200)
            lnot = eng.search(f"{a} AND NOT {b}", size=200)
            assert [h["doc_id"] for h in noti["results"]] == \
                [h["doc_id"] for h in lnot["results"]], (a, b)
    finally:
        eng.close()
