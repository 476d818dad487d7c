"""Serving fault tolerance: a dead SegmentSearcher actor is revived from
the immutable segments + the engine's tracked chunk/tombstone state, so a
query survives actor loss with identical results."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from elasticsearch_ray.pipelines.build import (
    BuildConfig,
    add_tombstones,
    build_index,
)
from elasticsearch_ray.pipelines.query import QueryEngine

VOCAB = ["merge", "hash", "scan", "join", "other", "words", "table"]
QUERIES = ["merge hash", "scan join table", "merge AND hash",
           "words OR (scan AND NOT join)"]


def _snap(eng):
    out = {}
    for q in QUERIES:
        r = eng.search(q, size=300)
        out[q] = (
            r["total_hits"],
            [(h["doc_id"], round(h["score"], 10)) for h in r["results"]],
        )
    return out


def test_searcher_death_revives_with_identical_results(tmp_path):
    rng = random.Random(37)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(90)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "a.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=25, target_partition_rows=20),
    )
    live = QueryEngine(idx, num_searchers=3)
    try:
        assert len(live.searchers) == 3
        base = _snap(live)
        killed = live.searchers[1]
        ray.kill(killed, no_restart=True)
        # single-query path revives mid-gather
        assert _snap(live) == base
        assert live.searchers[1] is not killed
        # a second kill on the (partly revived) pool also survives
        ray.kill(live.searchers[0], no_restart=True)
        assert _snap(live) == base
        # batch path revives too
        ray.kill(live.searchers[2], no_restart=True)
        batch = live.batch_search(QUERIES, size=300)
        got = {
            q: (r["total_hits"],
                [(h["doc_id"], round(h["score"], 10)) for h in r["results"]])
            for q, r in zip(QUERIES, batch)
        }
        assert got == base
    finally:
        live.close()


def test_searcher_death_preserves_tombstones(tmp_path):
    """A revived actor must come back with the CURRENT tombstone set (the
    round-4 revive path passes engine-tracked state, not the construction
    snapshot)."""
    rng = random.Random(41)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9)))}
        for i in range(60)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "a.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=20, target_partition_rows=20),
    )
    live = QueryEngine(idx, num_searchers=2)
    try:
        hit0 = live.search(QUERIES[0], size=300)
        victims = [h["doc_id"] for h in hit0["results"]][:3]
        assert victims
        add_tombstones(idx, victims)
        live.refresh()
        after = _snap(live)
        for q in QUERIES:
            assert not any(d in victims for d, _ in after[q][1])
        for s in list(live.searchers):
            ray.kill(s, no_restart=True)
        assert _snap(live) == after  # revived actors re-apply tombstones
    finally:
        live.close()


def test_route_build_survives_worker_death(tmp_path):
    """Injected hard worker death (os._exit in a tokenize task): the route
    dispatcher must replace the dead actor, re-tokenize the affected
    segment, and produce a byte-identical index to a clean build."""
    import hashlib
    import os

    from elasticsearch_ray.sources.synthetic import write_webtext

    def seg_md5s(idx):
        d = os.path.join(idx, "segments")
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    src = str(tmp_path / "src")
    write_webtext(src, 300, avg_len=50, rows_per_file=100, row_group_size=50)
    cfg = dict(target_partition_rows=50, docs_per_segment=100, shuffle="route")

    clean_idx = str(tmp_path / "idx_clean")
    build_index(src, clean_idx, BuildConfig(**cfg))

    marker = str(tmp_path / "die_once")
    faulty_idx = str(tmp_path / "idx_faulty")
    m = build_index(
        src, faulty_idx, BuildConfig(**cfg, fault_inject_path=marker)
    )
    assert os.path.exists(marker), "fault was never injected"
    assert m["doc_count"] == 300
    assert seg_md5s(faulty_idx) == seg_md5s(clean_idx)


def test_route_build_does_not_retry_deterministic_bugs(tmp_path):
    """A tokenize task that RAISES (application bug, not actor loss) must
    fail the build immediately — the loss classifier must not burn
    segment retries re-running a deterministic failure."""
    import os

    import pytest
    import ray as _ray

    from elasticsearch_ray.sources.synthetic import write_webtext

    src = str(tmp_path / "src")
    write_webtext(src, 200, avg_len=40, rows_per_file=100, row_group_size=50)
    marker = str(tmp_path / "bug_once")
    with pytest.raises(_ray.exceptions.RayTaskError, match="injected deterministic bug"):
        build_index(
            src, str(tmp_path / "idx"),
            BuildConfig(
                target_partition_rows=50, docs_per_segment=100,
                shuffle="route", fault_inject_path=marker,
                fault_inject_mode="raise",
            ),
        )
    assert os.path.exists(marker)


def test_fanout_many_survives_actor_death(tmp_path):
    """The batched multi-call fanout (suggesters) revives a dead actor
    mid-round and returns identical results."""
    rng = random.Random(43)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(VOCAB) for _ in range(6))}
        for i in range(90)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "a.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    docs_per_segment=25, target_partition_rows=20),
    )
    eng = QueryEngine(idx, num_searchers=3, hybrid=False)
    try:
        base_s = eng.suggest("merg scna", size=3)
        base_p = eng.suggest_phrase("merg scna", size=5, max_edits=2)
        killed = eng.searchers[1]
        ray.kill(killed, no_restart=True)
        assert eng.suggest("merg scna", size=3) == base_s
        assert eng.searchers[1] is not killed
        ray.kill(eng.searchers[0], no_restart=True)
        assert eng.suggest_phrase("merg scna", size=5,
                                  max_edits=2) == base_p
    finally:
        eng.close()
