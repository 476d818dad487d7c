"""JSON ingestion (reference S2/S3 formats): giant JSON array + JSONL ->
partitioned Parquet -> index; results identical to building from the same
docs directly."""

import json
import random

import pyarrow.parquet as pq

from elasticsearch_ray.sources.ingest import (
    iter_json_array,
    json_array_to_parquet,
    jsonl_to_parquet,
)

VOCAB = ["merge", "hash", "scan", "join", "other", "words"]


def _docs(n, seed=67):
    rng = random.Random(seed)
    return [
        {
            "id": f"doc-{i}",
            "url": f"https://example.org/{i}",
            "title": rng.choice(VOCAB),
            "text": " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 9))),
        }
        for i in range(n)
    ]


def test_iter_json_array_streams_small_buffer(tmp_path):
    """The incremental array parser with a tiny refill buffer (forces
    objects to span refills) yields exactly json.load's objects —
    including nested values, unicode, and ]-in-strings."""
    docs = _docs(500)
    docs[3]["text"] = 'tricky "quoted] text" with ] and [ inside'
    docs[7]["nested"] = {"a": [1, 2, {"b": "c"}]}
    docs[11]["text"] = "ünïcode ästhetic — em-dash"
    path = tmp_path / "arr.json"
    path.write_text(json.dumps(docs, indent=1), encoding="utf-8")
    got = list(iter_json_array(str(path), buf_bytes=256))
    assert got == docs


def test_json_array_and_jsonl_to_index(tmp_path):
    """Both ingestion paths produce Parquet that builds an index with
    results identical to the oracle over the same docs."""
    from elasticsearch_ray.oracle.oracle import OracleIndex
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    docs = _docs(120)
    arr = tmp_path / "arr.json"
    arr.write_text(json.dumps(docs), encoding="utf-8")
    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        "\n".join(json.dumps(d) for d in docs), encoding="utf-8"
    )
    pq_a = json_array_to_parquet(
        str(arr), str(tmp_path / "pq_a"),
        columns=["id", "url", "title", "text"],
        rows_per_file=50, row_group_size=25,
    )
    pq_b = jsonl_to_parquet(str(jl), str(tmp_path / "pq_b"))
    n_a = sum(
        pq.read_metadata(f"{pq_a}/{f}").num_rows
        for f in sorted(__import__('os').listdir(pq_a))
    )
    assert n_a == len(docs)

    for src in (pq_a, pq_b):
        idx = str(tmp_path / ("idx_" + src.rsplit("_", 1)[-1]))
        build_index(
            src, idx,
            BuildConfig(analyzer="plain", text_column="text",
                        url_column="url", lang_column=None,
                        docs_per_segment=40, target_partition_rows=30),
        )
        eng = QueryEngine(idx, num_searchers=2)
        # doc order can differ between ingestion paths (ray.data block
        # order), so the oracle is rebuilt per index from its docmap
        import os as _os

        import pyarrow.dataset as pads

        dm = pads.dataset(
            _os.path.join(idx, "docmap"), format="parquet"
        ).to_table(columns=["doc_id", "url"]).sort_by("doc_id")
        by_url = {d["url"]: d["text"] for d in docs}
        o = OracleIndex()
        o.normalizer = eng.normalizer
        o.build([
            (did, by_url[u])
            for did, u in zip(dm.column("doc_id").to_pylist(),
                              dm.column("url").to_pylist())
        ])
        try:
            for q in ("merge hash", "scan join", "merge AND words"):
                got = eng.search(q, size=200)
                exp = o.query(q, size=200)
                assert got["total_hits"] == exp["total_hits"], (src, q)
                assert [
                    (r["doc_id"], round(r["score"], 9))
                    for r in got["results"]
                ] == [
                    (r["doc_id"], round(r["score"], 9))
                    for r in exp["results"]
                ], (src, q)
        finally:
            eng.close()


def test_csv_to_index(tmp_path):
    """CSV ingestion path: convert -> build -> query matches a build from
    equivalent parquet."""
    import csv as _csv

    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine
    from elasticsearch_ray.sources.ingest import csv_to_parquet

    docs = _docs(80)
    path = tmp_path / "docs.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["id", "url", "title", "text"])
        w.writeheader()
        w.writerows(docs)
    out = csv_to_parquet(str(path), str(tmp_path / "pq_csv"))
    idx = str(tmp_path / "idx_csv")
    build_index(
        out, idx,
        BuildConfig(analyzer="plain", text_column="text",
                    url_column="url", lang_column=None,
                    docs_per_segment=40, target_partition_rows=30),
    )
    eng = QueryEngine(idx, num_searchers=0)
    try:
        res = eng.search("merge hash", size=100)
        exp = sum(
            1 for d in docs
            if {"merge", "hash"} & set(d["text"].split())
        )
        assert res["total_hits"] == exp
    finally:
        eng.close()
