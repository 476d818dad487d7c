"""Round-2 regressions: create_index overwrite semantics, manifest-driven
segment discovery, true cursor DAAT, df-cache bound, zlib overflow guard."""

import json
import random
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.api import RayBM25Index
from elasticsearch_ray.pipelines.build import BuildConfig, build_index
from elasticsearch_ray.pipelines.query import QueryEngine

DOCS_A = [
    ("a-1", "apple banana cherry"),
    ("a-2", "banana durian"),
    ("a-3", "cherry elderberry apple"),
]
DOCS_B = [
    ("b-1", "zebra yak xylophone"),
    ("b-2", "yak walrus"),
]


def test_create_index_overwrites_existing(tmp_path):
    """IndexBase contract: create_index on an existing id must index the NEW
    files, not resume-skip into serving the stale index."""
    ix = RayBM25Index(
        base_dir=str(tmp_path),
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("t1", DOCS_A)
    assert json.loads(ix.query("apple"))["total_hits"] == 2

    ix.create_index("t1", DOCS_B)
    # 'yak' has df == N -> idf 0 -> skipped (reference semantics); use terms
    # unique to one of the NEW docs
    assert json.loads(ix.query("zebra"))["total_hits"] == 1
    assert json.loads(ix.query("walrus"))["total_hits"] == 1
    assert json.loads(ix.query("apple"))["total_hits"] == 0
    assert sorted(ix.list_indexed_files("t1")) == ["b-1", "b-2"]
    assert ix.get_stats()["doc_count"] == len(DOCS_B)
    ix.delete_index("t1")


def test_list_indexed_files_excludes_removed(tmp_path):
    ix = RayBM25Index(
        base_dir=str(tmp_path),
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("t", DOCS_A)
    ix.update_index("t", remove_files=["a-1"])
    assert "a-1" not in ix.list_indexed_files("t")  # tombstoned
    ix.compact("t")
    assert sorted(ix.list_indexed_files("t")) == ["a-2", "a-3"]  # physical
    ix.delete_index("t")


def test_create_index_pairs_ignores_lang_filter(tmp_path):
    """Pair inputs carry no lang metadata; a configured lang_filter must not
    silently produce an empty index."""
    ix = RayBM25Index(
        base_dir=str(tmp_path),
        config=BuildConfig(
            target_partition_rows=2, docs_per_segment=3,
            lang_column="lang", lang_filter="en",
        ),
    )
    ix.create_index("t", DOCS_A)
    assert ix.get_stats()["doc_count"] == len(DOCS_A)
    assert json.loads(ix.query("apple"))["total_hits"] == 2
    ix.delete_index("t")


def test_query_engine_serves_only_manifest_segments(tmp_path):
    """Leftover segment files (crashed extend / prior larger build) must not
    be globbed in: only manifest['segments'] is served."""
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array([t for _, t in DOCS_A], pa.string())}),
        src,
        row_group_size=2,
    )
    idx = str(tmp_path / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=2, docs_per_segment=2,
            url_column=None, lang_column=None,
        ),
    )
    # fake a leftover (never-finalized) segment with phantom docs
    seg_dir = f"{idx}/segments"
    shutil.copy(f"{seg_dir}/seg-00000.arrow", f"{seg_dir}/seg-00099.arrow")
    shutil.copy(
        f"{seg_dir}/seg-00000.doclen.arrow", f"{seg_dir}/seg-00099.doclen.arrow"
    )
    eng = QueryEngine(idx, num_searchers=0)
    res = eng.search("apple")
    assert res["total_hits"] == 2  # phantom copy would double-count
    eng.close()


@pytest.fixture(scope="module")
def dense_engine(tmp_path_factory):
    rng = random.Random(11)
    texts = []
    for _ in range(1500):
        words = []
        if rng.random() < 0.8:
            words += ["aaa"] * rng.randint(1, 6)
        if rng.random() < 0.8:
            words += ["bbb"] * rng.randint(1, 6)
        if rng.random() < 0.3:
            words += ["ccc"] * rng.randint(1, 4)
        words += [f"filler{rng.randint(0, 40)}" for _ in range(rng.randint(5, 25))]
        rng.shuffle(words)
        texts.append(" ".join(words))
    d = tmp_path_factory.mktemp("daatfuzz")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src, row_group_size=250
    )
    idx = str(d / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=250,
            docs_per_segment=400,  # multiple segments
            url_column=None,
            lang_column=None,
        ),
    )
    eng = QueryEngine(idx, num_searchers=0)
    yield eng
    eng.close()


def test_daat_matches_taat(dense_engine):
    """Cursor DAAT is a different algorithm, same answers: rank-, score- and
    total_hits-identical to TAAT on a dense co-occurrence corpus."""
    for q in [
        "aaa", "aaa bbb", "aaa bbb ccc", "bbb ccc filler1",
        "filler2 filler3", "aaa aaa bbb", "missingterm", "aaa missingterm",
    ]:
        for k in (1, 5, 10, 25):
            a = dense_engine.search(q, size=k, mode="taat")
            b = dense_engine.search(q, size=k, mode="daat")
            assert a["total_hits"] == b["total_hits"], (q, k)
            assert [r["doc_id"] for r in a["results"]] == [
                r["doc_id"] for r in b["results"]
            ], (q, k)
            for x, y in zip(a["results"], b["results"]):
                assert abs(x["score"] - y["score"]) <= 1e-9, (q, k)


def test_df_cache_is_bounded(dense_engine):
    dense_engine._df_cache.clear()
    dense_engine._df_cache_cap = 20
    for i in range(45):
        dense_engine.search(f"filler{i % 41} aaa", size=3)
    assert len(dense_engine._df_cache) <= 20
    # still correct after eviction
    res = dense_engine.search("aaa bbb", size=5, mode="taat")
    assert res["results"]
    dense_engine._df_cache_cap = 1_000_000


def test_multifield_best_fields_boost(tmp_path):
    """multi_match best_fields semantics: score = max(2*title_bm25,
    text_bm25); a title hit outranks the same-tf text hit."""
    from elasticsearch_ray.pipelines.fields import (
        MultiFieldEngine,
        build_field_indexes,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "title": pa.array(
                ["alpha news", "daily news", "gamma post", "delta post"]
            ),
            "text": pa.array(
                [
                    "body words here",
                    "alpha body words",
                    "alpha alpha body words",
                    "other words entirely",
                ]
            ),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src, row_group_size=2)
    dirs = build_field_indexes(
        {"title": (src, "title"), "text": (src, "text")},
        str(tmp_path / "fidx"),
        analyzer="plain",
        target_partition_rows=2,
        docs_per_segment=4,
    )
    eng = MultiFieldEngine(dirs, boosts={"title": 2.0})
    res = eng.search("alpha", size=4)
    got = [r["doc_id"] for r in res["results"]]
    # doc 0: title hit (boost 2); docs 1, 2: text hits only
    assert got[0] == 0
    assert set(got) == {0, 1, 2}
    # scores really are max-boosted: title engine alone reproduces doc 0
    t_only = eng.engines["title"].search("alpha")["results"][0]
    assert abs(res["results"][0]["score"] - 2.0 * t_only["score"]) < 1e-12
    eng.close()


def test_size_zero_query(dense_engine):
    """size=0 is a legal count-only call in every mode (reference
    heapq.nlargest(0) returns empty but total_hits still counts)."""
    for mode in ("taat", "daat", "wand"):
        res = dense_engine.search("aaa bbb", size=0, mode=mode)
        assert res["results"] == []
        if mode != "wand":
            assert res["total_hits"] > 0


def test_encode_runs_block_th_collision():
    """Two terms with the SAME 64-bit hash in one sorted block must emit
    separate, correctly-labeled runs (the string-change split), not one
    merged run under the first term."""
    from elasticsearch_ray.stages.postings import encode_runs_block

    # rows sorted by (th, doc_id): terms interleave under one hash
    batch = pa.table(
        {
            "seg": pa.array([0, 0, 0, 0], pa.int32()),
            "th": pa.array([7, 7, 7, 7], pa.int64()),
            "term": pa.array(["aaa", "bbb", "aaa", "bbb"]),
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "tf": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    runs = encode_runs_block(batch, seg_bases=np.zeros(1, dtype=np.int64))
    assert runs.num_rows == 4  # split at every term change
    assert runs.column("term").to_pylist() == ["aaa", "bbb", "aaa", "bbb"]
    assert runs.column("df").to_pylist() == [1, 1, 1, 1]
    assert runs.column("first_doc").to_pylist() == [0, 1, 2, 3]


def test_zlib_overflow_raises():
    from elasticsearch_ray.functions.vbyte import zlib_encode_postings

    with pytest.raises(OverflowError):
        zlib_encode_postings(np.array([0, 2**32 + 5], dtype=np.int64))


def test_crossfield_dismax_tie_breaker(tmp_path):
    """CrossFieldEngine: dis_max with a tie_breaker over doc-range shards
    holding every field's overlapping segments.  Pinned against the
    per-field engines combined in pure python (exhaustive), at
    tie_breaker 0 (== MultiFieldEngine best_fields), 0.3 and 1.0
    (most_fields sum); embedded and 2-shard distributed agree."""
    import random

    from elasticsearch_ray.pipelines.fields import (
        CrossFieldEngine,
        MultiFieldEngine,
        build_field_indexes,
    )

    rng = random.Random(7)
    vocab = ["alpha", "beta", "news", "post", "body", "words", "daily"]
    n = 90
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "title": pa.array(
                [" ".join(rng.choice(vocab) for _ in range(3))
                 for _ in range(n)]
            ),
            "text": pa.array(
                [" ".join(rng.choice(vocab) for _ in range(12))
                 for _ in range(n)]
            ),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src, row_group_size=20)
    dirs = build_field_indexes(
        {"title": (src, "title"), "text": (src, "text")},
        str(tmp_path / "fidx"),
        analyzer="plain",
        target_partition_rows=20,
        docs_per_segment=30,  # 3 segments per field
    )
    boosts = {"title": 2.0}
    mfe = MultiFieldEngine(dirs, boosts=boosts)
    queries = ["alpha news", "daily post body", "beta"]
    # exhaustive per-field boosted scores from the per-field engines
    per_field: dict[str, dict[str, dict[int, float]]] = {}
    for f, eng in mfe.engines.items():
        per_field[f] = {}
        for q in queries:
            per_field[f][q] = {
                r["doc_id"]: r["score"] * boosts.get(f, 1.0)
                for r in eng.search(q, size=n)["results"]
            }
    for num_shards in (0, 2):
        xf = CrossFieldEngine(dirs, boosts=boosts, num_shards=num_shards)
        try:
            for tb in (0.0, 0.3, 1.0):
                for q in queries:
                    cand: dict[int, list[float]] = {}
                    for f in dirs:
                        for d, s in per_field[f][q].items():
                            cand.setdefault(d, []).append(s)
                    exp = sorted(
                        (
                            (-(max(ss) + tb * (sum(ss) - max(ss))), d)
                            for d, ss in cand.items()
                        )
                    )[:10]
                    got = xf.search(q, size=10, tie_breaker=tb)
                    assert got["total_hits"] == len(cand), (num_shards, tb, q)
                    assert [r["doc_id"] for r in got["results"]] == [
                        d for _, d in exp
                    ], (num_shards, tb, q)
                    for r, (neg_s, _) in zip(got["results"], exp):
                        assert r["score"] == pytest.approx(-neg_s)
                    if tb == 0.0:
                        mf = mfe.search(q, size=10)
                        assert [r["doc_id"] for r in mf["results"]] == [
                            r["doc_id"] for r in got["results"]
                        ]
        finally:
            xf.close()
    mfe.close()
