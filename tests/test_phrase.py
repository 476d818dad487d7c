"""Quoted-phrase queries over stored positions (beyond the reference: its
PHRASE grammar was documented but never implemented — positions were built
then discarded, ``selfindex_z1_simple_compression.py:141,162-165``)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.oracle import OracleIndex

TEXTS = [
    "machine learning models train on big data",
    "learning machine is reversed here",
    "big data processing with machine learning pipelines",
    "data big reversed order",
    "the machine learning of machines that learn machine learning",
    "unrelated document about cooking recipes",
    "machine separated by stuff from learning",
]


@pytest.fixture(scope="module")
def phrase_setup(tmp_path_factory):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    d = tmp_path_factory.mktemp("phrase")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(TEXTS, pa.string())}), src, row_group_size=3
    )
    idx = str(d / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=3,
            docs_per_segment=4,
            url_column=None,
            lang_column=None,
            store_positions=True,
        ),
    )
    eng = QueryEngine(idx, num_searchers=2)
    o = OracleIndex(store_positions=True)
    o.build(list(enumerate(TEXTS)))
    yield eng, o
    eng.close()


QUERIES = [
    '"machine learning"',
    '"learning machine"',
    '"big data"',
    '"machine learning" data',
    '"machine learning" "big data"',
    '"machine learning pipelines"',
    '"nonexistent phrase"',
    '"machine"',  # single-word phrase == term presence
    '"" machine',  # empty phrase -> fallback to ranked
    '"the machine"',  # stopword dropped -> phrase becomes just [machin]
]


def test_phrase_matches_oracle(phrase_setup):
    eng, o = phrase_setup
    for q in QUERIES:
        got = eng.search(q)
        exp = o.query(q)
        assert got["total_hits"] == exp["total_hits"], q
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], q


def test_phrase_semantics(phrase_setup):
    eng, _ = phrase_setup
    r = eng.search('"machine learning"')
    # docs 0, 2, 4 contain adjacent "machine learning"; 1, 6 do not
    assert [x["doc_id"] for x in r["results"]] == [0, 2, 4]
    assert eng.search('"learning machine"')["results"][0]["doc_id"] == 1
    r = eng.search('"machine learning" "big data"')
    assert [x["doc_id"] for x in r["results"]] == [0, 2]


def test_positions_disabled_falls_back(tiny_engine, tiny_oracle):
    # tiny index stores no positions: quoted query behaves like the
    # reference (quotes stripped by the normalizer -> ranked free text)
    q = '"news sky"'
    got = tiny_engine.search(q)
    exp = tiny_oracle.query(q)  # oracle built without positions
    assert got["total_hits"] == exp["total_hits"]
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in exp["results"]
    ]


def test_phrase_after_tombstone_and_compact(phrase_setup, tmp_path):
    """Deletion lifecycle on a positions-enabled index: tombstone hides a
    phrase match immediately; compaction rewrites the positions column."""

    from elasticsearch_ray.pipelines.build import (
        BuildConfig,
        add_tombstones,
        build_index,
        compact_index,
    )
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(TEXTS, pa.string())}), src, row_group_size=3
    )
    idx = str(tmp_path / "idx2")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=3,
            docs_per_segment=4,
            url_column=None,
            lang_column=None,
            store_positions=True,
        ),
    )
    add_tombstones(idx, [0])
    eng = QueryEngine(idx, num_searchers=0)
    try:
        assert [r["doc_id"] for r in eng.search('"machine learning"')["results"]] == [2, 4]
    finally:
        eng.close()
    compact_index(idx)
    eng = QueryEngine(idx, num_searchers=0)
    try:
        assert [r["doc_id"] for r in eng.search('"machine learning"')["results"]] == [2, 4]
        o = OracleIndex(store_positions=True)
        o.build([(i, t) for i, t in enumerate(TEXTS) if i != 0])
        for q in ['"big data"', '"machine learning" data', "machine learning"]:
            got = eng.search(q)
            exp = o.query(q)
            assert got["total_hits"] == exp["total_hits"], q
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], q
    finally:
        eng.close()


def test_batch_search_routes_phrases(phrase_setup):
    eng, o = phrase_setup
    qs = ['"machine learning"', "big data", "machine AND learning"]
    batch = eng.batch_search(qs)
    for q, r in zip(qs, batch):
        assert r == eng.search(q), q


def test_phrase_slop_semantics(phrase_setup):
    """Lucene proximity syntax ``"a b"~N``: in-order match with total slack
    (p_n - p_1) - (n - 1) <= N over PROCESSED positions (stopwords removed
    before position assignment)."""
    eng, _ = phrase_setup
    # doc 6 "machine separated by stuff from learning" -> processed stream
    # [machin, separ, stuff, learn]: machin..learn slack = 2
    assert [r["doc_id"] for r in eng.search('"machine learning"~1')["results"]] == [0, 2, 4]
    assert [r["doc_id"] for r in eng.search('"machine learning"~2')["results"]] == [0, 2, 4, 6]
    # in-order only: doc 1 has learn BEFORE machin -> never matches
    assert 1 not in [r["doc_id"] for r in eng.search('"machine learning"~9')["results"]]
    # slop composes with residual terms and multiple phrases
    r = eng.search('"machine learning"~2 reversed')
    assert [x["doc_id"] for x in r["results"]] == []
    r = eng.search('"machine learning"~2 "big data"')
    assert [x["doc_id"] for x in r["results"]] == [0, 2]
    # 3-term sloppy phrase: doc 0 [machin, learn, model, train, big, data]
    # machin..model slack 0; machin..train needs 1
    assert [r["doc_id"] for r in eng.search('"machine learning train"~1')["results"]] == [0]
    assert eng.search('"machine learning train"')["total_hits"] == 0


def test_phrase_slop_matches_oracle(phrase_setup):
    eng, o = phrase_setup
    for q in [
        '"machine learning"~1',
        '"machine learning"~2',
        '"machine data"~3',
        '"machine learning data"~2',
        '"big data" "machine learning"~2',
        '"machine"~5',
    ]:
        got = eng.search(q)
        exp = o.query(q)
        assert got["total_hits"] == exp["total_hits"], q
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], q


def test_phrase_prefix_semantics(phrase_setup):
    """ES match_phrase_prefix: trailing ``*`` in the quoted span makes the
    last analyzed token a dictionary-prefix term, expanded per segment."""
    eng, _ = phrase_setup
    # "lear*" expands to the stemmed dictionary term "learn"
    assert [r["doc_id"] for r in eng.search('"machine lear*"')["results"]] == [0, 2, 4]
    assert [r["doc_id"] for r in eng.search('"machine l*"')["results"]] == [0, 2, 4]
    # doc 0 "machine learning models": machin..model needs slop 1
    assert eng.search('"machine mo*"')["total_hits"] == 0
    assert [r["doc_id"] for r in eng.search('"machine mo*"~1')["results"]] == [0]
    # no dictionary term matches -> no hits
    assert eng.search('"machine zz*"')["total_hits"] == 0


def test_phrase_prefix_matches_oracle(phrase_setup):
    eng, o = phrase_setup
    for q in [
        '"machine lear*"',
        '"big d*"',
        '"machine le*"~2',
        '"learning ma*"',
        '"machine lear*" data',
    ]:
        got = eng.search(q)
        exp = o.query(q)
        assert got["total_hits"] == exp["total_hits"], q
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], q


def test_phrase_slop_randomized_conformance(tmp_path_factory):
    """Random corpus / random sloppy queries: engine DP vs the oracle's
    brute-force frontier DP must agree exactly (hits AND totals)."""
    import random

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(4242)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
        for _ in range(48)
    ]
    d = tmp_path_factory.mktemp("phrase_slop_rand")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src, row_group_size=16
    )
    idx = str(d / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=16,
            docs_per_segment=20,
            url_column=None,
            lang_column=None,
            store_positions=True,
        ),
    )
    o = OracleIndex(store_positions=True)
    o.build(list(enumerate(texts)))
    eng = QueryEngine(idx, num_searchers=2)
    try:
        for _ in range(60):
            n = rng.randint(2, 4)
            words = [rng.choice(vocab) for _ in range(n)]
            if rng.random() < 0.4:  # match_phrase_prefix variant
                words[-1] = words[-1][: rng.randint(1, 3)] + "*"
            phrase = " ".join(words)
            slop = rng.randint(0, 4)
            q = f'"{phrase}"~{slop}' if slop else f'"{phrase}"'
            got = eng.search(q, size=50)
            exp = o.query(q, size=50)
            assert got["total_hits"] == exp["total_hits"], q
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], q
    finally:
        eng.close()


BOOL_PHRASE_QUERIES = [
    '"machine learning" AND data',
    '"machine learning" OR "big data"',
    '"machine learning" AND NOT "big data"',
    '"learning machine" OR (data AND NOT cooking)',
    '"machine learning"~2 AND NOT pipelines',
    'recipes OR "machine separated"~9',
    '"machine learning" AND "nonexistent phrase"',
    '("machine learning" OR recipes) AND NOT "data processing"',
]


def test_boolean_with_phrase_operands(phrase_setup):
    """Boolean expressions whose operands are quoted phrases (optionally
    sloppy): engine RPN + per-segment positions vs the oracle's set
    algebra over the same phrase doc-sets — ids and totals identical."""
    eng, o = phrase_setup
    for q in BOOL_PHRASE_QUERIES:
        got = eng.search(q, size=50)
        exp = o.query_phrase(q, size=50)
        assert got["total_hits"] == exp["total_hits"], q
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], q
    # hand-derived: docs 0,2,4 contain "machine learning"; 0 and 2 also
    # contain "big data", so only 4 survives the NOT
    got = eng.search('"machine learning" AND NOT "big data"', size=50)
    assert [r["doc_id"] for r in got["results"]] == [4]
    # doc 3 is "data big reversed order" — out of order, no phrase match
    got = eng.search('"machine learning" OR "big data"', size=50)
    assert [r["doc_id"] for r in got["results"]] == [0, 2, 4]


def test_adjacent_docs_pair_cache(tmp_path_factory):
    """The segment-level phrase-filter cache (adjacent_docs_by_rows) must
    mask cross-doc false positives: doc0 ends with 'x' at position p and
    doc1's 'x' sits at flat-stream position p+1, which a naive diff==1 over
    the concatenated stream would match.  Also pins single-occurrence
    exclusion and LRU-hit identity."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.state.segment import SegmentReader

    texts = [
        "zebra",                    # pos 0 (single occurrence, no self-pair)
        "yak zebra zebra",          # zebra at 1,2 -> self-pair; flat [0,1,2]
        "zebra yak zebra",          # zebra at 0,2 -> no self-pair
        "quip zebra zebra zebra",   # run of three
    ]
    d = tmp_path_factory.mktemp("adjpair")
    src = str(d / "docs.parquet")
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}), src)
    idx = str(d / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=16,
            docs_per_segment=16,  # ONE segment: boundary adjacency in-flat
            url_column=None,
            lang_column=None,
            store_positions=True,
        ),
    )
    r = SegmentReader(idx, 0)
    rx = r.term_row("zebra")
    ry = r.term_row("yak")
    self_docs = r.adjacent_docs_by_rows(rx, rx)
    # doc0's lone x (pos 0) + doc1's first x (flat neighbor at +1) must NOT
    # produce doc0 or mis-attribute; only docs 1 and 3 self-pair
    assert sorted(self_docs.tolist()) == [1, 3]
    assert r.adjacent_docs_by_rows(rx, rx) is self_docs  # LRU hit
    xy = r.adjacent_docs_by_rows(rx, ry)
    yx = r.adjacent_docs_by_rows(ry, rx)
    assert sorted(xy.tolist()) == [2]       # "zebra yak" only in doc2
    assert sorted(yx.tolist()) == [1, 2]    # "yak zebra" in docs 1 and 2

    # end-to-end: engine phrase results agree with the oracle on the same
    # corpus (covers the pair-cache routing inside phrase_eval)
    o = OracleIndex(store_positions=True)
    o.build(list(enumerate(texts)))
    eng = QueryEngine(idx, num_searchers=1)
    try:
        for q in ['"zebra zebra"', '"zebra yak"', '"yak zebra"',
                  '"zebra zebra zebra"', '"quip zebra"']:
            got = eng.search(q, size=10)
            exp = o.query(q, size=10)
            assert got["total_hits"] == exp["total_hits"], q
            assert [h["doc_id"] for h in got["results"]] == [
                h["doc_id"] for h in exp["results"]
            ], q
    finally:
        eng.close()
