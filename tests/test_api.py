"""Public API facade (IndexBase 7-method parity) + incremental update +
tombstone tests."""

import json

import pytest

from elasticsearch_ray.api import RayBM25Index
from elasticsearch_ray.oracle import OracleIndex
from elasticsearch_ray.pipelines.build import BuildConfig


DOCS = [
    ("doc-a", "apple banana cherry apple"),
    ("doc-b", "banana cherry durian"),
    ("doc-c", "cherry durian elderberry fig"),
    ("doc-d", "apple fig grape"),
    ("doc-e", "grape honeydew apple banana"),
]

ADD_DOCS = [
    ("doc-f", "kiwi lemon apple"),
    ("doc-g", "lemon mango banana cherry"),
]


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("api_indices"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("t1", DOCS)
    yield ix
    ix.delete_index("t1")


def oracle_for(pairs):
    o = OracleIndex()
    o.build([(i, text) for i, (_, text) in enumerate(pairs)])
    return o


def test_query_json_shape_matches_reference(idx):
    res = json.loads(idx.query("apple banana"))
    assert set(res) == {"query", "total_hits", "results"}
    assert res["results"] and set(res["results"][0]) == {"doc_id", "score"}


def test_query_matches_oracle(idx):
    o = oracle_for(DOCS)
    for q in ["apple", "banana cherry", "apple AND fig", "durian OR grape",
              "cherry NOT apple"]:
        got = json.loads(idx.query(q))
        exp = o.query(q)
        assert got["total_hits"] == exp["total_hits"], q
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], q


def test_list_apis(idx):
    assert "t1" in idx.list_indices()
    assert sorted(idx.list_indexed_files("t1")) == sorted(d for d, _ in DOCS)
    st = idx.get_stats()
    assert st["doc_count"] == len(DOCS)


def test_update_add_and_remove(idx):
    # add two docs as a new segment
    idx.update_index("t1", add_files=ADD_DOCS)
    o = oracle_for(DOCS + ADD_DOCS)
    got = json.loads(idx.query("lemon"))
    exp = o.query("lemon")
    assert got["total_hits"] == exp["total_hits"] == 2
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in exp["results"]
    ]
    assert len(idx.list_indexed_files("t1")) == 7

    # tombstone doc-a: it disappears from ranked + boolean results
    idx.update_index("t1", remove_files=["doc-a"])
    got = json.loads(idx.query("apple"))
    assert 0 not in [r["doc_id"] for r in got["results"]]
    got_b = json.loads(idx.query("apple AND fig"))
    assert [r["doc_id"] for r in got_b["results"]] == [3]
    got_n = json.loads(idx.query("NOT apple"))
    assert 0 not in [r["doc_id"] for r in got_n["results"]]


def test_identifier_string():
    cfg = BuildConfig()
    assert cfg.identifier.startswith("RaySelfIndex-v1.")


def test_compact_makes_deletes_physical(tmp_path_factory):
    import json

    base = str(tmp_path_factory.mktemp("compact_idx"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("c1", DOCS)
    ix.update_index("c1", remove_files=["doc-a", "doc-c"])
    # tombstoned: hidden but stats unchanged
    assert ix.get_stats()["doc_count"] == len(DOCS)
    assert 0 not in [r["doc_id"] for r in json.loads(ix.query("apple"))["results"]]

    ix.compact("c1")
    st = ix.get_stats()
    assert st["doc_count"] == len(DOCS) - 2
    # scores now reflect post-delete df/N: compare against an oracle built
    # WITHOUT the removed docs (remaining ids preserved)
    remaining = [(i, t) for i, (d, t) in enumerate(DOCS) if d not in ("doc-a", "doc-c")]
    o = OracleIndex()
    o.build(remaining)
    for q in ["apple", "banana cherry", "grape OR fig"]:
        got = json.loads(ix.query(q))
        exp = o.query(q)
        assert got["total_hits"] == exp["total_hits"], q
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ], q
        for a, b in zip(got["results"], exp["results"]):
            assert abs(a["score"] - b["score"]) < 1e-9, q
    ix.delete_index("c1")


def test_delete_by_query(tmp_path_factory):
    """ES _delete_by_query: tombstone the full hit set of a match /
    boolean / wildcard query; results exclude them immediately; repeat
    deletion is a no-op (already-tombstoned docs don't match)."""
    import json

    base = str(tmp_path_factory.mktemp("dbq_idx"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("d1", DOCS)
    ix.load_index("d1")
    # 'apple' matches doc-a(0), doc-d(3), doc-e(4)
    res = ix.delete_by_query("d1", "apple")
    assert res["deleted"] == 3
    got = json.loads(ix.query("banana"))
    assert sorted(r["doc_id"] for r in got["results"]) == [1]
    # repeat: nothing live matches any more
    assert ix.delete_by_query("d1", "apple")["deleted"] == 0
    # boolean deletion over the remainder: 'cherry NOT banana' -> doc-c(2)
    assert ix.delete_by_query("d1", "cherry NOT banana")["deleted"] == 1
    got = json.loads(ix.query("cherry"))
    assert sorted(r["doc_id"] for r in got["results"]) == [1]
    ix.delete_index("d1")


def test_alias_multi_index_search(tmp_path_factory):
    """ES alias: two indices searched as one corpus — scores identical to
    a single index holding both doc sets (cross-index N/df/avgdl)."""
    base = str(tmp_path_factory.mktemp("alias_idx"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("h1", DOCS)
    ix.create_index("h2", ADD_DOCS)
    ix.put_alias("all", ["h1", "h2"])
    o = oracle_for(DOCS + ADD_DOCS)
    for q in ["apple", "banana cherry", "lemon apple"]:
        got = ix.search_alias("all", q, size=20)
        exp = o.query_taat(q, size=20)
        offset = {"h1": 0, "h2": len(DOCS)}
        assert got["total_hits"] == exp["total_hits"], q
        assert [
            (r["doc_id"] + offset[r["index"]], round(r["score"], 9))
            for r in got["results"]
        ] == [
            (r["doc_id"], round(r["score"], 9)) for r in exp["results"]
        ], q
    ix.delete_index("h1"); ix.delete_index("h2")


def test_reindex_changes_analyzer(tmp_path_factory):
    """ES _reindex: rebuild from stored _source with a different analyzer;
    results identical to building the new analyzer directly on the
    original docs (same doc ids, same scores)."""
    import dataclasses
    import json as _json

    base = str(tmp_path_factory.mktemp("reindex"))
    cfg = BuildConfig(target_partition_rows=2, docs_per_segment=3,
                      analyzer="plain", store_source=True)
    ix = RayBM25Index(base_dir=base, config=cfg)
    ix.create_index("srcix", DOCS)
    ix.reindex("srcix", "dstix",
               config=dataclasses.replace(cfg, analyzer="reference",
                                          store_source=False))
    ix2 = RayBM25Index(
        base_dir=base,
        config=dataclasses.replace(cfg, analyzer="reference",
                                   store_source=False),
    )
    ix2.create_index("directix", DOCS)
    ix.load_index("dstix")
    ix2.load_index("directix")
    for q in ["apple banana", "cherry durian", "apple AND fig",
              "grape OR lemon"]:
        got = _json.loads(ix.query(q))
        exp = _json.loads(ix2.query(q))
        assert got == exp, q
    # deletes must compact before reindex
    ix.update_index("srcix", remove_files=["doc-a"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="compact"):
        ix.reindex("srcix", "dst2")
    ix.delete_index("srcix"); ix.delete_index("dstix")
    ix2.delete_index("directix")


def test_snapshot_restore_and_profile(tmp_path_factory):
    """Snapshot -> restore round-trip serves identical results; the
    profile flag adds timing without changing the result body."""
    import json as _json

    base = str(tmp_path_factory.mktemp("snap"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("s1", DOCS)
    before = _json.loads(ix.query("apple banana"))
    snap = ix.snapshot("s1", base + "/backup_s1")
    ix.delete_index("s1")
    ix.restore(snap, "s2")
    ix.load_index("s2")
    assert _json.loads(ix.query("apple banana")) == before

    prof = ix.engine.search("apple banana", profile=True)
    assert prof["profile"]["took_ms"] > 0
    body = {k: v for k, v in prof.items() if k != "profile"}
    assert body == before
    ix.delete_index("s2")


def test_export_datastore_kinds(tmp_path_factory):
    """API-level datastore export: both kinds produce loadable bulk files
    with matching posting counts; unknown kind raises."""
    import glob as _glob
    import os

    from elasticsearch_ray.ops.datastore_export import (
        read_postgres_copy,
        read_redis_postings,
    )

    base = str(tmp_path_factory.mktemp("exp"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("e1", DOCS)
    m1 = ix.export("e1", base + "/pg", kind="postgres")
    m2 = ix.export("e1", base + "/rd", kind="redis")
    assert m1["num_documents"] == m2["num_documents"] == len(DOCS)
    assert os.path.exists(base + "/pg/load.sql")
    assert _glob.glob(base + "/rd/postings-*.resp")
    npg = read_postgres_copy(base + "/pg", "postings").count()
    nrd = read_redis_postings(base + "/rd").count()
    assert npg == nrd > 0
    with pytest.raises(ValueError):
        ix.export("e1", base + "/x", kind="mongodb")
    ix.delete_index("e1")


def test_inspect_index_tool(tmp_path_factory):
    """tools/inspect_index reads only manifests and reports consistent
    totals (the _cat analogue)."""
    import sys

    base = str(tmp_path_factory.mktemp("inspect"))
    ix = RayBM25Index(
        base_dir=base,
        config=BuildConfig(target_partition_rows=2, docs_per_segment=3),
    )
    ix.create_index("i1", DOCS)
    sys.path.insert(0, "/root/repo/tools")
    from inspect_index import inspect as _inspect

    info = _inspect(base + "/i1", with_segments=True)
    assert info["doc_count"] == len(DOCS)
    assert info["num_segments"] == len(info["segments"])
    assert sum(s["num_docs"] for s in info["segments"]) == len(DOCS)
    assert info["tombstones"] == 0
    ix.delete_index("i1")


def test_explain_and_phrase_suggest_api(idx):
    idx.load_index("t1")
    res = json.loads(idx.query("apple banana"))
    hit = res["results"][0]
    ex = idx.explain("apple banana", hit["doc_id"])
    assert ex["matched"]
    assert ex["score"] == pytest.approx(hit["score"], abs=1e-12)
    assert {d["term"] for d in ex["details"]} == {"appl", "banana"}
    sp = idx.suggest_phrase("aple banan", size=3, max_edits=2)
    assert sp["options"], "expected phrase candidates"
    # best candidate corrects both words to indexed terms
    assert sp["options"][0]["text"] == "appl banana" or \
        sp["options"][0]["total_dist"] <= 4


def test_mget(idx):
    # state-agnostic vs get_doc: earlier module tests may have
    # tombstoned or rewritten docs in the shared fixture index
    idx.load_index("t1")
    ids = [0, 2, 99_999, 4]
    singles = {d: idx.engine.get_doc(d) for d in ids}
    got = idx.mget(ids)
    assert [g["doc_id"] for g in got] == ids
    for g in got:
        s = singles[g["doc_id"]]
        if s is None:
            assert g == {"doc_id": g["doc_id"], "found": False}
        else:
            assert g["found"] and g["url"] == s["url"] \
                and g["source"] == s["source"]
    assert not got[2]["found"]  # id beyond the corpus


def test_validate_and_field_caps(idx):
    idx.load_index("t1")
    assert idx.validate_query("apple AND banana")["valid"]
    assert idx.validate_query("apple banana")["valid"]
    assert not idx.validate_query("")["valid"]
    bad = idx.validate_query("apple AND (banana OR")
    assert not bad["valid"] and bad["explanation"]
    caps = idx.field_caps()["fields"]
    assert all("type" in c and "numeric" in c for c in caps.values())
