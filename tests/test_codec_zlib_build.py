"""z=2 codec build path (zlib whole-list cells) + wordfreq ops."""

import pytest

from elasticsearch_ray.oracle.oracle import looks_boolean


def test_zlib_index_matches_oracle(tiny_corpus_dir, tiny_oracle, tmp_path):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = str(tmp_path / "idx_zlib")
    m = build_index(
        tiny_corpus_dir,
        idx,
        BuildConfig(target_partition_rows=50, docs_per_segment=70, codec="zlib"),
    )
    assert m["config"]["codec"] == "zlib"
    eng = QueryEngine(idx, num_searchers=2)
    try:
        for q in ["news sky connection", "run AND studi", "maximize argument"]:
            got = eng.search(q)
            exp = tiny_oracle.query(q)
            assert got["total_hits"] == exp["total_hits"], q
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], q
    finally:
        eng.close()

    # zlib branch of the batch decoder (merge path): per-row decode and
    # decode_all_postings must agree
    import numpy as np

    from elasticsearch_ray.pipelines.build import merge_segments
    from elasticsearch_ray.state.segment import SegmentReader

    r = SegmentReader(idx, 0)
    s_all, t_all, rs = r.decode_all_postings()
    for row in range(r.num_terms):
        es, et = r.postings_slots_by_row(row)
        assert np.array_equal(s_all[rs[row]:rs[row + 1]], es), row
        assert np.array_equal(t_all[rs[row]:rs[row + 1]], et), row

    # zlib segments merge losslessly
    merge_segments(idx, target_docs=10_000)
    eng = QueryEngine(idx, num_searchers=2)
    try:
        for q in ["news sky connection", "run AND studi"]:
            got = eng.search(q)
            exp = tiny_oracle.query(q)
            assert got["total_hits"] == exp["total_hits"], q
            assert [r_["doc_id"] for r_ in got["results"]] == [
                r_["doc_id"] for r_ in exp["results"]
            ], q
    finally:
        eng.close()


def test_wordfreq_matches_oracle_counters(tiny_corpus_dir, tiny_texts):
    import re
    from collections import Counter

    import ray.data

    from elasticsearch_ray.ops.wordfreq import corpus_token_stats, top_words

    ds = ray.data.read_parquet(tiny_corpus_dir)
    got = top_words(ds, top_n=20, preprocessed=False)

    ref = Counter()
    for t in tiny_texts:
        ref.update(re.findall(r"\b\w+\b", t.lower()))
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(
        zip(got.column("token").to_pylist(), got.column("n").to_pylist())
    ) == exp

    st = corpus_token_stats(ds, preprocessed=False)
    total = sum(ref.values())
    assert st.column("unique_tokens")[0].as_py() == len(ref)
    assert st.column("total_tokens")[0].as_py() == total
    exp_len = sum(len(t) * c for t, c in ref.items()) / total
    assert st.column("avg_token_len")[0].as_py() == pytest.approx(exp_len)


def test_wordfreq_preprocessed(tiny_corpus_dir, tiny_oracle):
    import ray.data

    from elasticsearch_ray.ops.wordfreq import token_frequencies

    ds = ray.data.read_parquet(tiny_corpus_dir)
    freq = {
        r["token"]: r["n"]
        for r in token_frequencies(ds, preprocessed=True).take_all()
    }
    # preprocessed token totals == sum of oracle tfs per term
    for term in list(tiny_oracle.term_doc_freq)[:30]:
        exp = sum(tf.get(term, 0) for tf in tiny_oracle.doc_tf.values())
        assert freq.get(term, 0) == exp, term


def test_zlib_wand_falls_back(tiny_corpus_dir, tiny_oracle, tmp_path):
    """zlib cells have no per-block offsets; WAND must degrade gracefully to
    the vectorized full-list path with identical results."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    idx = str(tmp_path / "idx_zlib_w")
    build_index(
        tiny_corpus_dir,
        idx,
        BuildConfig(target_partition_rows=50, docs_per_segment=70, codec="zlib"),
    )
    eng = QueryEngine(idx, num_searchers=0)
    try:
        for q in ["news sky connection", "maximize argument trouble happy", "news"]:
            got = eng.search(q, mode="wand")
            exp = tiny_oracle.query_taat(q)
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], q
    finally:
        eng.close()
