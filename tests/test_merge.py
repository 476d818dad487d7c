"""Tiered segment merging: query results, scores, stats, phrases, and
deletes are invariant under merge; segment count drops."""

import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from elasticsearch_ray.pipelines.build import (
    BuildConfig,
    add_tombstones,
    build_index,
    extend_index,
    merge_segments,
)
from elasticsearch_ray.pipelines.query import QueryEngine

VOCAB = ["merge", "hash", "scan", "join", "other", "words", "table"]


def _write(path, rows):
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(path),
    )


def _snapshot(idx, queries, phrases=()):
    eng = QueryEngine(idx, num_searchers=2)
    try:
        out = {}
        for q in queries:
            r = eng.search(q, size=300)
            out[q] = (
                r["total_hits"],
                [(h["doc_id"], round(h["score"], 10)) for h in r["results"]],
            )
        for q in phrases:
            r = eng.search(q, size=300)
            out[q] = (r["total_hits"], [h["doc_id"] for h in r["results"]])
        stats = eng.get_stats()
        return out, (stats["doc_count"], round(stats["avg_doc_length"], 9))
    finally:
        eng.close()


def test_merge_preserves_results(tmp_path):
    rng = random.Random(59)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(90)
    ]
    more = [
        {"doc_id": 90 + i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(60)
    ]
    src = tmp_path / "src"; src.mkdir()
    _write(src / "a.parquet", rows)
    _write(src / "b.parquet", more)
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=20, target_partition_rows=15),
    )
    extend_index(idx, [str(src / "b.parquet")])
    with open(os.path.join(idx, "manifest.json")) as f:
        n_before = len(json.load(f)["segments"])
    assert n_before >= 5

    queries = ["merge hash", "scan join table", "merge AND hash",
               "words OR (scan AND NOT join)"]
    before, stats_before = _snapshot(idx, queries)

    res = merge_segments(idx, target_docs=60)
    with open(os.path.join(idx, "manifest.json")) as f:
        segs = json.load(f)["segments"]
    assert len(segs) < n_before
    assert segs == res["segments"]

    after, stats_after = _snapshot(idx, queries)
    assert after == before
    assert stats_after == stats_before

    # merge everything into one segment; still identical
    merge_segments(idx, target_docs=10_000)
    with open(os.path.join(idx, "manifest.json")) as f:
        assert len(json.load(f)["segments"]) == 1
    assert _snapshot(idx, queries)[0] == before

    # tombstones survive merging (global doc ids preserved)
    victim = before["merge hash"][1][0][0]
    add_tombstones(idx, [victim])
    got, _ = _snapshot(idx, queries)
    assert all(victim not in [d for d, _ in v[1]] for v in got.values())


def test_merge_preserves_phrases(tmp_path):
    texts = [
        "machine learning models train on big data",
        "learning machine is reversed here",
        "big data processing with machine learning pipelines",
        "data big reversed order",
        "the machine learning of machines that learn machine learning",
        "unrelated document about cooking recipes",
        "machine separated by stuff from learning",
        "more machine learning content for the second segment",
        "big data again with machine learning somewhere",
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}),
                   str(src), row_group_size=3)
    idx = str(tmp_path / "idx")
    build_index(
        str(src), idx,
        BuildConfig(target_partition_rows=3, docs_per_segment=3,
                    url_column=None, lang_column=None,
                    store_positions=True),
    )
    phrases = ['"machine learning"', '"machine learning"~2 AND NOT big',
               '"big data" OR "learning machine"', '"machine l*"']
    before, _ = _snapshot(idx, [], phrases=phrases)
    merge_segments(idx, target_docs=1_000)
    with open(os.path.join(idx, "manifest.json")) as f:
        assert len(json.load(f)["segments"]) == 1
    after, _ = _snapshot(idx, [], phrases=phrases)
    assert after == before


def test_merge_failure_leaves_index_intact(tmp_path):
    """Two-phase merge commit (round-4 ADVICE): a failing merge task must
    not delete or overwrite ANY referenced segment file — the manifest
    still points at intact members and the index stays fully loadable."""
    import glob
    import hashlib

    import pytest

    rng = random.Random(43)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(80)
    ]
    src = tmp_path / "src"; src.mkdir()
    _write(src / "a.parquet", rows)
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=20, target_partition_rows=15),
    )
    before, stats_before = _snapshot(idx, ["merge hash", "scan AND join"])
    with open(os.path.join(idx, "manifest.json")) as f:
        segs_before = json.load(f)["segments"]
    digests = {
        p: hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(idx, "segments", "*.arrow"))
    }
    # segments 0 and 2 are NOT doc-adjacent -> the merge task raises
    with pytest.raises(Exception, match="adjacent"):
        merge_segments(idx, seg_ids=[segs_before[0], segs_before[2]])
    with open(os.path.join(idx, "manifest.json")) as f:
        assert json.load(f)["segments"] == segs_before
    for p, d in digests.items():
        assert hashlib.md5(open(p, "rb").read()).hexdigest() == d, p
    after, stats_after = _snapshot(idx, ["merge hash", "scan AND join"])
    assert (after, stats_after) == (before, stats_before)


def test_merge_large_vocabulary(tmp_path):
    """Batch-decode merge path at scale: >=100k distinct terms across the
    members, merged segment's per-term postings identical to the
    pre-merge union (spot-checked via df totals and ranked/boolean
    results)."""
    rng = random.Random(7)
    # ~115k distinct terms: every doc carries unique tokens + shared ones
    rows = []
    tid = 0
    for i in range(2_400):
        uniq = [f"u{tid + j:06d}" for j in range(48)]
        tid += 48
        shared = [rng.choice(VOCAB) for _ in range(4)]
        rows.append({"doc_id": i, "text": " ".join(uniq + shared)})
    src = tmp_path / "src"; src.mkdir()
    _write(src / "a.parquet", rows)
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=600, target_partition_rows=400),
    )
    queries = ["merge hash", "scan AND join", "u000123 OR u099999",
               "u047999"]
    before, stats_before = _snapshot(idx, queries)
    from elasticsearch_ray.state.segment import SegmentReader
    with open(os.path.join(idx, "manifest.json")) as f:
        pre_ids = json.load(f)["segments"]
    df_total = sum(
        int(SegmentReader(idx, s)._df.sum()) for s in pre_ids
    )
    res = merge_segments(idx, target_docs=10_000)
    with open(os.path.join(idx, "manifest.json")) as f:
        assert len(json.load(f)["segments"]) == 1
    after, stats_after = _snapshot(idx, queries)
    assert (after, stats_after) == (before, stats_before)
    r = SegmentReader(idx, res["segments"][0])
    assert r.num_terms >= 100_000
    assert int(r._df.sum()) == df_total
