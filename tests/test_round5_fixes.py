"""Round-5 fixes: cardinality-routed facet aggregations (high-cardinality
fields must never ship full per-shard value dicts), the two-phase exact
rare_terms protocol, and the shard_size guard."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def hicard_engine(tmp_path_factory):
    """120 docs over 3+ segments with TWO facet fields: 'tag' is
    high-cardinality (unique per doc except one cross-segment dup pair
    and one triple), 'source' is low-cardinality."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    import random
    rng = random.Random(11)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    rows = []
    for i in range(120):
        tag = f"t{i:04d}"
        if i in (7, 93):        # same value in different segments
            tag = "dup2"
        if i in (20, 55, 101):  # rare on each shard, common globally
            tag = "dup3"
        rows.append({
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(8)),
            "tag": tag,
            "source": f"s{i % 3}",
        })
    src = tmp_path_factory.mktemp("hicard_src")
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path_factory.mktemp("hicard")) + "/idx"
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("tag", "source"), docs_per_segment=40,
                    target_partition_rows=20),
    )
    eng = QueryEngine(idx, num_searchers=2)
    yield eng, rows
    eng.close()


def _spy_fanout(eng):
    calls = []
    orig = eng._fanout

    def spy(method, *args):
        calls.append(method)
        return orig(method, *args)

    eng._fanout = spy
    return calls, orig


def test_high_cardinality_facets_route_to_sharded(hicard_engine):
    """Above facet_exact_max the terms agg must use the O(shard_size)
    path — 'facet_counts' (full-dict ship) never crosses the wire."""
    eng, rows = hicard_engine
    eng.facet_exact_max = 50  # 'tag' has ~117 distinct values
    eng._facet_cards.clear()
    calls, orig = _spy_fanout(eng)
    try:
        res = eng.search_facets(None, "tag", size=5)
    finally:
        eng._fanout = orig
    assert "facet_counts_topn" in calls
    assert "facet_counts" not in calls
    # counts are exact here (each shard's top-shard_size covers the
    # global top: dup3=3, dup2=2, then lexicographically smallest tags)
    got = [(b["key"], b["doc_count"]) for b in res["buckets"]]
    exp = {}
    for r in rows:
        exp[r["tag"]] = exp.get(r["tag"], 0) + 1
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_low_cardinality_facets_stay_exact(hicard_engine):
    eng, rows = hicard_engine
    eng.facet_exact_max = 50
    eng._facet_cards.clear()
    calls, orig = _spy_fanout(eng)
    try:
        res = eng.search_facets(None, "source", size=10)
    finally:
        eng._fanout = orig
    assert "facet_counts" in calls
    assert "facet_counts_topn" not in calls
    got = [(b["key"], b["doc_count"]) for b in res["buckets"]]
    assert got == [("s0", 40), ("s1", 40), ("s2", 40)]


def test_rare_terms_two_phase_exact(hicard_engine):
    """The bounded two-phase protocol must equal the exact single-pass
    merge, including cross-shard disqualification: 'dup3' is locally rare
    on every shard (count 1) but globally common (3) and must be dropped;
    'dup2' (global 2) survives max_doc_count=2 but not 1."""
    eng, rows = hicard_engine

    def brute(max_dc):
        cnt = {}
        for r in rows:
            cnt[r["tag"]] = cnt.get(r["tag"], 0) + 1
        return sorted(
            ((v, n) for v, n in cnt.items() if n <= max_dc),
            key=lambda kv: (kv[1], kv[0]),
        )

    for max_dc in (1, 2, 3):
        # exact path (threshold above cardinality)
        eng.facet_exact_max = 1_000_000
        eng._facet_cards.clear()
        exact = eng.search_rare_terms(None, "tag", max_doc_count=max_dc)
        # two-phase path (threshold below cardinality)
        eng.facet_exact_max = 50
        eng._facet_cards.clear()
        calls, orig = _spy_fanout(eng)
        try:
            two = eng.search_rare_terms(None, "tag", max_doc_count=max_dc)
        finally:
            eng._fanout = orig
        assert "facet_counts_rare" in calls
        assert "facet_counts_for" in calls
        assert "facet_counts" not in calls
        got = [(b["key"], b["doc_count"]) for b in two["buckets"]]
        assert got == [
            (b["key"], b["doc_count"]) for b in exact["buckets"]
        ] == brute(max_dc)
    # the disqualification actually exercised
    keys1 = {b["key"] for b in two["buckets"]}
    assert "dup3" in keys1  # max_dc=3 run
    eng.facet_exact_max = 50
    eng._facet_cards.clear()
    one = eng.search_rare_terms(None, "tag", max_doc_count=1)
    keys = {b["key"] for b in one["buckets"]}
    assert "dup3" not in keys and "dup2" not in keys


def test_sharded_facets_shard_size_guard(hicard_engine):
    """shard_size <= 0 must clamp (ES resets shard_size < size to size),
    not IndexError on the actor."""
    eng, rows = hicard_engine
    res = eng.search_facets_sharded(None, "source", size=5, shard_size=0)
    got = [(b["key"], b["doc_count"]) for b in res["buckets"]]
    assert got == [("s0", 40), ("s1", 40), ("s2", 40)]


def test_synonym_multiword_alternate_rejected(hicard_engine):
    """Multi-word synonym ALTERNATES raise like multi-word keys (advisor:
    they were silently flattened into independent terms before)."""
    eng, _rows = hicard_engine
    with pytest.raises(ValueError, match="alternate"):
        eng.search_synonyms("merge", {"merge": ["hash join"]}, size=5)
    # single-word alternates still work
    res = eng.search_synonyms("merge", {"merge": ["hash"]}, size=5)
    assert res["results"]


def _mk_corpus_idx(tmp_path_factory, name, n=90, seed=37):
    import random

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    rng = random.Random(seed)
    vocab = ["merge", "hash", "scan", "join", "filter", "probe", "spark",
             "union", "batch", "window"]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9))),
         "source": f"s{i % 4}"}
        for i in range(n)
    ]
    src = tmp_path_factory.mktemp(f"{name}_src")
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "a.parquet"),
    )
    idx = str(tmp_path_factory.mktemp(name)) + "/idx"
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    build_index(
        [str(src / "a.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("source",), docs_per_segment=25,
                    target_partition_rows=20),
    )
    return idx


def test_hybrid_serving_bit_identical(tmp_path_factory):
    """Hybrid mode (shard 0 in-process, remainder actors, overlapped
    gather) must return results BIT-IDENTICAL to pure scatter-gather for
    every query family — the local shard is chunk 0, so part order and
    all merges are unchanged."""
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "hybrid")
    pure = QueryEngine(idx, num_searchers=3)
    hyb = QueryEngine(idx, num_searchers=3, hybrid=True)
    try:
        assert pure.local is None and len(pure.searchers) == 3
        assert hyb.local is not None and len(hyb.searchers) == 2
        assert hyb.get_stats()["num_searchers"] == 3
        queries = ["merge hash", "scan", "merge AND hash",
                   "merge OR (scan AND NOT join)", "merg*", "union~1",
                   "filter probe spark"]
        for q in queries:
            a = pure.search(q, size=20)
            b = hyb.search(q, size=20)
            assert a == b, q
        assert pure.batch_search(queries) == hyb.batch_search(queries)
        assert pure.search_facets("merge", "source", size=10) == \
            hyb.search_facets("merge", "source", size=10)
        assert pure.search_rare_terms(None, "source", 30) == \
            hyb.search_rare_terms(None, "source", 30)
    finally:
        pure.close()
        hyb.close()


def test_hybrid_survives_remote_death(tmp_path_factory):
    """Killing a REMOTE searcher under hybrid mode revives it mid-gather;
    the local shard is process-lifetime and needs no revival."""
    import ray

    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "hybridkill", seed=41)
    eng = QueryEngine(idx, num_searchers=3, hybrid=True)
    try:
        before = eng.search("merge hash", size=20)
        ray.kill(eng.searchers[0])
        after = eng.search("merge hash", size=20)
        assert before == after
    finally:
        eng.close()


def test_facet_stats_order_by_subagg(hicard_engine):
    """ES terms-agg 'order' forms: _count/_key/avg x asc/desc.  Exact
    partials merge BEFORE ordering, so sub-agg order has no shard_size
    truncation error; buckets without metric values sort last."""
    eng, rows = hicard_engine
    import collections

    # metric field: use doc_id itself (always present) for determinism
    by_src = collections.defaultdict(lambda: [0, 0, 0])
    for r in rows:
        acc = by_src[r["source"]]
        acc[0] += 1
        acc[1] += 1
        acc[2] += r["doc_id"]

    res = eng.search_facet_stats(None, "source", "doc_id", size=10,
                                 order=("avg", "desc"))
    got = [(b["key"], b["avg"]) for b in res["buckets"]]
    want = sorted(
        ((k, v[2] / v[1]) for k, v in by_src.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == want
    res_a = eng.search_facet_stats(None, "source", "doc_id", size=10,
                                   order=("avg", "asc"))
    assert [b["key"] for b in res_a["buckets"]] == \
        [k for k, _ in sorted(want, key=lambda kv: (kv[1], kv[0]))]
    res_k = eng.search_facet_stats(None, "source", "doc_id", size=10,
                                   order=("_key", "desc"))
    assert [b["key"] for b in res_k["buckets"]] == \
        sorted(by_src, reverse=True)
    res_c = eng.search_facet_stats(None, "source", "doc_id", size=10,
                                   order=("_count", "asc"))
    counts = [b["doc_count"] for b in res_c["buckets"]]
    assert counts == sorted(counts)
    with pytest.raises(ValueError):
        eng.search_facet_stats(None, "source", "doc_id",
                               order=("bogus", "asc"))


def test_scroll_cursor_covers_full_hit_set(hicard_engine):
    """scroll() pages the entire ranked hit set in strict (-score,
    doc_id) order with no overlap and no gap, equal to one giant
    search."""
    eng, rows = hicard_engine
    full = eng.search("merge hash scan", size=10_000)["results"]
    assert len(full) > 20
    paged = []
    for page in eng.scroll("merge hash scan", batch=7):
        assert len(page) <= 7
        paged.extend(page)
    assert paged == full
    # empty hit set -> zero pages
    assert list(eng.scroll("zzznomatch", batch=5)) == []


def test_scroll_noncursorable_terminates(hicard_engine):
    """Boolean/wildcard/fuzzy queries have no search_after cursor in
    their shard protocol; scroll() must fall back to from_ pagination
    (previously it silently re-served page 1 forever), and search()
    must REJECT search_after for them instead of ignoring it."""
    eng, rows = hicard_engine
    q = "merge AND hash"
    full = eng.search(q, size=10_000)["results"]
    assert len(full) > 3
    paged = []
    for i, page in enumerate(eng.scroll(q, batch=3)):
        assert len(page) <= 3
        paged.extend(page)
        assert i < 1_000, "scroll did not terminate"
    assert paged == full
    with pytest.raises(ValueError, match="search_after"):
        eng.search(q, size=3, search_after=(1.0, 0))


def test_extend_after_restore_preserves_global_df(tmp_path_factory,
                                                  tmp_path):
    """snapshot -> restore -> extend_index must re-finalize df_global
    from ALL segments' df parts, not just the newly added one (the
    restored index must carry df/seg-*.parquet)."""
    import random

    from elasticsearch_ray.pipelines.build import (
        BuildConfig, build_index, extend_index,
    )
    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.state.snapshot import (
        restore_index, snapshot_index,
    )

    idx = _mk_corpus_idx(tmp_path_factory, "snapext")
    snap = str(tmp_path / "snap")
    rest = str(tmp_path / "rest")
    snapshot_index(idx, snap)
    restore_index(snap, rest)

    # new docs that do NOT contain 'merge' — its global df must be
    # unchanged by the extend
    rng = random.Random(5)
    add = pa.table({
        "doc_id": pa.array(range(1000, 1030)),
        "text": pa.array([" ".join(rng.choice(["alpha", "beta", "gamma"])
                                   for _ in range(5)) for _ in range(30)]),
        "source": pa.array(["s9"] * 30),
    })
    src = tmp_path_factory.mktemp("snapext_add")
    pq.write_table(add, str(src / "b.parquet"))

    def df_of(index_dir, term):
        import pyarrow.dataset as pads
        d = pads.dataset(f"{index_dir}/df_global")
        t = d.to_table(filter=pads.field("term") == term)
        return t.column("df").to_pylist()

    want = df_of(idx, "merge")
    assert want and want[0] > 0
    extend_index(rest, [str(src / "b.parquet")])
    assert df_of(rest, "merge") == want
    # and the restored+extended index still serves the original docs
    eng = QueryEngine(rest, num_searchers=0)
    try:
        assert len(eng.search("merge", size=10)["results"]) == 10
        assert eng.search("alpha", size=5)["results"]
    finally:
        eng.close()


def test_snapshot_restore_validated(tmp_path_factory, tmp_path):
    """Manifest-consistent snapshot + validated restore: the snapshot
    copies exactly the committed view (manifest written LAST), restore
    refuses a corrupted snapshot, and a restored index serves results
    identical to the original."""
    import json
    import os

    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.state.snapshot import (
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    idx = _mk_corpus_idx(tmp_path_factory, "snap")
    orig = QueryEngine(idx, num_searchers=0)
    want = orig.search("merge hash", size=20)
    want_f = orig.search_facets("merge", "source", size=10)
    orig.close()

    snap = str(tmp_path / "snap")
    info = snapshot_index(idx, snap)
    assert info["segments"] >= 2 and info["bytes"] > 0
    assert verify_snapshot(snap)["ok"]
    # per-segment df parts ARE part of the committed view: extend_index's
    # _finalize re-aggregates df_global from df/seg-*.parquet, so a
    # restore that dropped them would corrupt global df on next extend
    man = json.load(open(os.path.join(idx, "manifest.json")))
    for s in man["segments"]:
        src_df = os.path.join(idx, f"df/seg-{int(s):05d}.parquet")
        if os.path.exists(src_df):
            assert os.path.exists(
                os.path.join(snap, f"df/seg-{int(s):05d}.parquet")
            )

    rest = str(tmp_path / "restored")
    restore_index(snap, rest)
    eng = QueryEngine(rest, num_searchers=0)
    try:
        assert eng.search("merge hash", size=20) == want
        assert eng.search_facets("merge", "source", size=10) == want_f
    finally:
        eng.close()

    # corruption: a missing segment fails validation AND restore
    seg0 = json.load(open(os.path.join(snap, "manifest.json")))["segments"][0]
    victim = os.path.join(snap, f"segments/seg-{int(seg0):05d}.arrow")
    os.remove(victim)
    with pytest.raises(ValueError, match="missing"):
        verify_snapshot(snap)
    bad = str(tmp_path / "bad_restore")
    with pytest.raises(ValueError):
        restore_index(snap, bad)
    # a failed restore must never look committed
    assert not os.path.exists(os.path.join(bad, "manifest.json"))


def test_docvalue_fields_lookup(hicard_engine):
    """ES docvalue_fields: bounded docmap join for top-k ids; unmapped
    fields raise like ES."""
    eng, rows = hicard_engine
    hits = eng.search("merge", size=5)["results"]
    ids = [r["doc_id"] for r in hits]
    dv = eng.lookup_docvalues(ids, ["source", "tag"])
    assert set(dv) == set(ids)
    by_id = {r["doc_id"]: r for r in rows}
    for d, vals in dv.items():
        assert vals["source"] == by_id[d]["source"]
        assert vals["tag"] == by_id[d]["tag"]
    with pytest.raises(ValueError, match="not in docmap"):
        eng.lookup_docvalues(ids, ["nonexistent_field"])


def test_cost_based_local_routing(tmp_path_factory):
    """Cost-based query routing: on a heuristic-sized (or explicitly
    opted-in) engine, a phrase/ranked query whose df candidate bound is
    small serves from an in-process all-segments Searcher with NO fanout,
    an all-zero-df query short-circuits to empty driver-side, and heavy
    queries still fan out — all result-identical to pure scatter-gather.
    An explicit num_searchers without the opt-in keeps pure fanout (the
    distributed-protocol tests rely on that)."""
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "router", n=120, seed=19)
    # opt-in routing on an explicit pool: df_max 3 => only queries whose
    # bound is tiny route local; vocab words have df >> 3 here
    routed = QueryEngine(idx, num_searchers=2, local_route_df_max=3)
    pure = QueryEngine(idx, num_searchers=2)
    try:
        assert routed._route_enabled and not pure._route_enabled
        # all-zero-df: answered driver-side as empty, no fanout
        calls, _ = _spy_fanout(routed)
        r = routed.search("zzznope qqqnope")
        assert r["total_hits"] == 0 and r["results"] == []
        assert "search_ranked" not in calls
        # head terms exceed the bound -> fanout, identical to pure
        calls.clear()
        a = routed.search("merge hash", size=20)
        assert "search_ranked" in calls
        assert a["results"] == pure.search("merge hash", size=20)["results"]
        # raise the bound so the same query routes local: identical
        # results, no fanout call, and the local searcher covers ALL
        # served segments
        routed.local_route_df_max = 10_000
        calls.clear()
        b = routed.search("merge hash", size=20)
        assert "search_ranked" not in calls
        assert b["results"] == a["results"]
        assert set(
            rd.seg_id for rd in routed._local_allsegs().readers
        ) == routed._served_seg_ids
    finally:
        routed.close()
        pure.close()


def test_local_routing_phrase_and_refresh(tmp_path_factory, tmp_path):
    """Phrase queries route by min-df (conjunctive bound) and the local
    all-segments searcher is dropped on refresh() so extended segments
    are visible to locally-routed queries."""
    from elasticsearch_ray.pipelines.build import extend_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "routerph", n=100, seed=23)
    eng = QueryEngine(idx, num_searchers=2, local_route_df_max=10_000)
    pure = QueryEngine(idx, num_searchers=2)
    try:
        calls, _ = _spy_fanout(eng)
        got = eng.search('"merge hash"', size=50)
        assert "search_phrase" not in calls  # df bound under threshold
        want = pure.search('"merge hash"', size=50)
        assert got["results"] == want["results"]
        assert got["total_hits"] == want["total_hits"]

        # extend with docs containing a brand-new term, refresh, and the
        # locally-routed query must see them (stale _cheap_local would not)
        add = pa.table({
            "doc_id": pa.array(range(500, 510)),
            "text": pa.array(["qznewterm merge hash"] * 10),
            "source": pa.array(["s0"] * 10),
        })
        src = tmp_path / "ext"
        src.mkdir()
        pq.write_table(add, str(src / "b.parquet"))
        extend_index(idx, [str(src / "b.parquet")])
        eng.refresh()
        assert eng._cheap_local is None  # dropped, rebuilds lazily
        r = eng.search("qznewterm", size=20)
        # the 10 extended docs get internal doc indexes 100..109 (appended
        # after the original 100)
        assert {h["doc_id"] for h in r["results"]} == set(range(100, 110))
    finally:
        eng.close()
        pure.close()


def test_local_routing_boolean_pure_and(tmp_path_factory):
    """Pure-AND boolean expressions share the conjunctive min-df route;
    OR/NOT expressions always fan out (no cheap candidate bound)."""
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "routerbool", n=110, seed=29)
    eng = QueryEngine(idx, num_searchers=2, local_route_df_max=10_000)
    pure = QueryEngine(idx, num_searchers=2)
    try:
        calls, _ = _spy_fanout(eng)
        for q, fans in [("merge AND hash", False),
                        ("merge AND hash AND scan", False),
                        ("merge OR hash", False),   # pure-OR: sum-df bound
                        ("merge AND NOT hash", True),
                        ("merge OR (hash AND scan)", True)]:
            calls.clear()
            got = eng.search(q, size=200)
            want = pure.search(q, size=200)
            assert got["results"] == want["results"], q
            assert got["total_hits"] == want["total_hits"], q
            assert ("search_boolean" in calls) == fans, q
        # zero-df term under pure AND: empty, no fanout
        calls.clear()
        r = eng.search("merge AND zzznope")
        assert r["total_hits"] == 0 and "search_boolean" not in calls
        # ...and under OR the union bound still matches pure fanout
        assert (eng.search("merge OR zzznope", size=200)["results"]
                == pure.search("merge OR zzznope", size=200)["results"])
        # wand zero-df empty route mirrors the scorer's total_hits=-1
        # "not counted" sentinel instead of inventing a 0
        e = eng.search("zzznope", mode="wand")
        p = pure.search("zzznope", mode="wand")
        assert e["total_hits"] == p["total_hits"] == -1
        assert e["results"] == p["results"] == []
    finally:
        eng.close()
        pure.close()


def test_local_routing_differential_fuzz(tmp_path_factory):
    """Randomized differential check of the whole routing surface:
    ranked (all modes), phrase, pure-AND / OR / NOT boolean, and synonym
    queries over a multi-segment corpus must be result-identical between
    a routed engine (threshold above every df => maximal local routing)
    and pure scatter-gather."""
    import random

    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "routerfuzz", n=140, seed=43)
    routed = QueryEngine(idx, num_searchers=3, local_route_df_max=10**9)
    pure = QueryEngine(idx, num_searchers=3)
    vocab = ["merge", "hash", "scan", "join", "filter", "probe", "spark",
             "union", "batch", "window", "zzznope"]
    rng = random.Random(7)
    try:
        for _ in range(60):
            w = [rng.choice(vocab) for _ in range(3)]
            kind = rng.randrange(5)
            if kind == 0:
                q = " ".join(w[:rng.randint(1, 3)])
                mode = rng.choice(["taat", "daat", "wand"])
                a = routed.search(q, size=15, mode=mode)
                b = pure.search(q, size=15, mode=mode)
            elif kind == 1:
                q = f'"{w[0]} {w[1]}"'
                a, b = routed.search(q, size=15), pure.search(q, size=15)
            elif kind == 2:
                op = rng.choice(["AND", "OR", "AND NOT"])
                q = f"{w[0]} {op} {w[1]}"
                a, b = routed.search(q, size=400), pure.search(q, size=400)
            elif kind == 3:
                q = f"({w[0]} OR {w[1]}) AND {w[2]}"
                a, b = routed.search(q, size=400), pure.search(q, size=400)
            else:
                syn = {w[0]: [w[1]]} if w[0] != w[1] else {}
                a = routed.search_synonyms(w[0], syn, size=15)
                b = pure.search_synonyms(w[0], syn, size=15)
            assert a["results"] == b["results"], (kind, w)
            assert a["total_hits"] == b["total_hits"], (kind, w)
    finally:
        routed.close()
        pure.close()


def test_local_route_shares_hybrid_readers(tmp_path_factory):
    """When hybrid serving already holds shard 0 in-process, the local
    route's all-segments searcher must reuse those SegmentReaders (same
    objects) instead of re-opening chunk 0, and still cover every served
    segment in doc order with results identical to pure fanout."""
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = _mk_corpus_idx(tmp_path_factory, "routershare", n=100, seed=31)
    eng = QueryEngine(idx, num_searchers=3, hybrid=True,
                      local_route_df_max=10_000)
    pure = QueryEngine(idx, num_searchers=3)
    try:
        assert eng.local is not None
        got = eng.search("merge hash", size=30)
        assert got["results"] == pure.search("merge hash", size=30)["results"]
        allsegs = eng._local_allsegs()
        shared = {id(r) for r in eng.local.readers}
        reused = [r for r in allsegs.readers if id(r) in shared]
        assert len(reused) == len(eng.local.readers)  # every one shared
        assert {r.seg_id for r in allsegs.readers} == eng._served_seg_ids
        bases = [r.doc_id_base for r in allsegs.readers]
        assert bases == sorted(bases)
    finally:
        eng.close()
        pure.close()
