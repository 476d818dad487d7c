"""query_string / simple_query_string parsers (ES/Lucene query syntax
lowered onto the RPN set engine with typed multi-term placeholder
operands — phrase / wildcard / fuzzy / regexp resolved per segment).

Ground truth is an independent set-algebra evaluator over the raw token
lists: random query ASTs are rendered to Lucene syntax (fully
parenthesized, so precedence can't mask a parser bug) and evaluated
directly — the engine must match doc-for-doc."""

import random
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

VOCAB = [
    "merge", "sort", "batch", "batches", "scan", "filter", "filters",
    "join", "hash", "window", "group", "order", "customer", "spark",
]


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def _has_phrase(toks, terms, slop=0):
    import itertools

    idx = [[i for i, x in enumerate(toks) if x == t] for t in terms]
    if any(not p for p in idx):
        return False
    for combo in itertools.product(*idx):
        if all(combo[i + 1] > combo[i] for i in range(len(terms) - 1)) and \
                combo[-1] - combo[0] <= len(terms) - 1 + slop:
            return True
    return False


@pytest.fixture(scope="module")
def qs_setup(tmp_path_factory):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(421)
    texts = [
        " ".join(rng.choices(VOCAB, k=rng.randint(3, 14)))
        for _ in range(120)
    ]
    d = tmp_path_factory.mktemp("qs")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src,
        row_group_size=20,
    )
    idx = str(d / "idx")
    build_index(
        src, idx,
        BuildConfig(
            target_partition_rows=25, docs_per_segment=40,
            url_column=None, lang_column=None, analyzer="plain",
            store_positions=True,
        ),
    )
    eng = QueryEngine(idx, num_searchers=2)
    docs = {i: t.split() for i, t in enumerate(texts)}
    yield eng, docs
    eng.close()


def _truth(docs, pred):
    return sorted(d for d, t in docs.items() if pred(t))


def _got(eng, q, method="query_string", **kw):
    res = getattr(eng, method)(q, size=10_000, **kw)
    return sorted(r["doc_id"] for r in res["results"])


# ---------------------------------------------------------------- fixed

def test_wildcard_operand_in_boolean(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, "(merge OR sort) AND batch*")
    want = _truth(docs, lambda t: ("merge" in t or "sort" in t)
                  and any(w.startswith("batch") for w in t))
    assert got == want


def test_must_not_phrase(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, 'customer -"hash join"')
    want = _truth(docs, lambda t: "customer" in t
                  and not _has_phrase(t, ["hash", "join"]))
    assert got == want


def test_fuzzy_operand_symbolic_and(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, "windoq~1 && scan")
    want = _truth(docs, lambda t: any(_lev(w, "windoq") <= 1 for w in t)
                  and "scan" in t)
    assert got == want


def test_must_and_must_not_prefixes(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, "+filter -merg*")
    want = _truth(docs, lambda t: "filter" in t
                  and not any(w.startswith("merg") for w in t))
    assert got == want


def test_regexp_operand_and_field_prefix(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, "text:join AND /jo.n/")
    want = _truth(docs, lambda t: "join" in t
                  and any(re.fullmatch("jo.n", w) for w in t))
    assert got == want


def test_bang_not_and_boost_is_inert(qs_setup):
    eng, docs = qs_setup
    assert _got(eng, "!scan AND filter") == _truth(
        docs, lambda t: "scan" not in t and "filter" in t)
    assert _got(eng, "merge^2 AND sort") == _got(eng, "merge AND sort")


def test_default_operator(qs_setup):
    eng, docs = qs_setup
    got_or = _got(eng, "merge sort", default_operator="OR")
    got_and = _got(eng, "merge sort", default_operator="AND")
    assert got_or == _truth(docs, lambda t: "merge" in t or "sort" in t)
    assert got_and == _truth(docs, lambda t: "merge" in t and "sort" in t)


def test_phrase_slop_operand(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, '"order group"~2 OR spark')
    want = _truth(docs, lambda t: _has_phrase(t, ["order", "group"], 2)
                  or "spark" in t)
    assert got == want


def test_strict_errors(qs_setup):
    eng, _ = qs_setup
    with pytest.raises(ValueError):
        eng.query_string("(merge AND sort")   # unbalanced paren
    with pytest.raises(ValueError):
        eng.query_string('"dangling scan')    # unbalanced quote
    with pytest.raises(ValueError):
        eng.query_string("title:merge")       # unknown field


def test_simple_query_string_is_tolerant(qs_setup):
    eng, docs = qs_setup
    # unbalanced parens/quote and an unknown field: no exception, the
    # valid remainder still runs
    got = _got(eng, 'zzz(( title:x quote" scan',
               method="simple_query_string")
    want = _truth(docs, lambda t: "scan" in t or "zzz" in t
                  or 'quote"' in t)
    assert got == want


def test_simple_query_string_operators(qs_setup):
    eng, docs = qs_setup
    got = _got(eng, 'merge + batch* | "hash join"',
               method="simple_query_string")
    want = _truth(
        docs,
        lambda t: ("merge" in t and any(w.startswith("batch") for w in t))
        or _has_phrase(t, ["hash", "join"]),
    )
    assert got == want
    got = _got(eng, "scan -filt*", method="simple_query_string")
    assert got == _truth(docs, lambda t: "scan" in t
                         and not any(w.startswith("filt") for w in t))


# ------------------------------------------------------------ fuzz

def _rand_ast(rng, depth):
    kind = rng.choice(
        ["term", "term", "wild", "fuzzy", "phrase", "and", "or", "not"]
        if depth > 0 else ["term", "term", "wild", "fuzzy", "phrase"]
    )
    if kind == "term":
        return ("term", rng.choice(VOCAB))
    if kind == "wild":
        w = rng.choice(VOCAB)
        return ("wild", w[: rng.randint(1, max(1, len(w) - 1))])
    if kind == "fuzzy":
        w = rng.choice(VOCAB)
        i = rng.randrange(len(w))
        return ("fuzzy", w[:i] + "q" + w[i + 1:], rng.randint(1, 2))
    if kind == "phrase":
        return ("phrase", rng.choice(VOCAB), rng.choice(VOCAB),
                rng.randint(0, 2))
    if kind == "not":
        return ("not", _rand_ast(rng, depth - 1))
    return (kind, _rand_ast(rng, depth - 1), _rand_ast(rng, depth - 1))


def _render(ast):
    k = ast[0]
    if k == "term":
        return ast[1]
    if k == "wild":
        return ast[1] + "*"
    if k == "fuzzy":
        return f"{ast[1]}~{ast[2]}"
    if k == "phrase":
        return f'"{ast[1]} {ast[2]}"~{ast[3]}'
    if k == "not":
        return f"(NOT {_render(ast[1])})"
    return f"({_render(ast[1])} {k.upper()} {_render(ast[2])})"


def _eval(ast, toks):
    k = ast[0]
    if k == "term":
        return ast[1] in toks
    if k == "wild":
        return any(w.startswith(ast[1]) for w in toks)
    if k == "fuzzy":
        return any(_lev(w, ast[1]) <= ast[2] for w in toks)
    if k == "phrase":
        return _has_phrase(toks, [ast[1], ast[2]], ast[3])
    if k == "not":
        return not _eval(ast[1], toks)
    if k == "and":
        return _eval(ast[1], toks) and _eval(ast[2], toks)
    return _eval(ast[1], toks) or _eval(ast[2], toks)


def test_query_string_fuzz(qs_setup):
    eng, docs = qs_setup
    rng = random.Random(2026)
    for _ in range(40):
        ast = _rand_ast(rng, 3)
        q = _render(ast)
        got = _got(eng, q)
        want = _truth(docs, lambda t: _eval(ast, t))
        assert got == want, q
