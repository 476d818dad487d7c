"""Round-3 advisory fixes: pair-add must not clobber the index's persisted
config; create_index resume must be config-aware; curate must refuse to
rmtree a directory it did not produce."""

import dataclasses
import json
import os

import pyarrow as pa
import pytest
import ray.data

from elasticsearch_ray.api import RayBM25Index
from elasticsearch_ray.pipelines.build import BuildConfig


DOCS = [
    ("doc-a", "apple banana cherry apple"),
    ("doc-b", "banana cherry durian"),
    ("doc-c", "cherry durian elderberry fig"),
]


def test_pair_add_preserves_manifest_config(tmp_path):
    """A (doc_id, content) pair add uses the pair config for tokenization
    only; the persisted manifest config must keep the original
    url/lang settings (ADVICE r2: api.py pair-add clobbered them)."""
    cfg = BuildConfig(
        target_partition_rows=2,
        docs_per_segment=3,
        url_column="my_url",
        lang_column="my_lang",
        lang_filter="en",
    )
    ix = RayBM25Index(base_dir=str(tmp_path), config=cfg)
    # build from a parquet path so the custom columns are exercised
    src = str(tmp_path / "src.parquet")
    pa.parquet.write_table(
        pa.table(
            {
                "my_url": pa.array([u for u, _ in DOCS]),
                "text": pa.array([t for _, t in DOCS]),
                "my_lang": pa.array(["en"] * len(DOCS)),
            }
        ),
        src,
    )
    ix.create_index("p1", src)
    man_before = json.load(open(os.path.join(str(tmp_path), "p1", "manifest.json")))
    assert man_before["config"]["url_column"] == "my_url"
    ix.update_index("p1", add_files=[("doc-z", "zebra zucchini apple")])
    man_after = json.load(open(os.path.join(str(tmp_path), "p1", "manifest.json")))
    assert man_after["config"]["url_column"] == "my_url"
    assert man_after["config"]["lang_column"] == "my_lang"
    assert man_after["config"]["lang_filter"] == "en"
    # and the add itself took effect
    assert man_after["doc_count"] == man_before["doc_count"] + 1
    # a later parquet-path add must still resolve the original columns
    src2 = str(tmp_path / "src2.parquet")
    pa.parquet.write_table(
        pa.table(
            {
                "my_url": pa.array(["doc-q"]),
                "text": pa.array(["quince apple"]),
                "my_lang": pa.array(["en"]),
            }
        ),
        src2,
    )
    ix.update_index("p1", add_files=src2)
    res = json.loads(ix.query("quince"))
    assert res["total_hits"] == 1  # the my_url-column doc was indexed
    man_final = json.load(open(os.path.join(str(tmp_path), "p1", "manifest.json")))
    assert man_final["doc_count"] == man_before["doc_count"] + 2
    ix.delete_index("p1")


def test_create_index_resume_fingerprint_includes_config(tmp_path):
    """A crashed build resumed with a CHANGED config must rebuild, not
    resume stale segments (fingerprint covers dataclasses.asdict(cfg))."""
    src = str(tmp_path / "src.parquet")
    pa.parquet.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in DOCS]),
                "text": pa.array([t for _, t in DOCS]),
            }
        ),
        src,
    )
    cfg = BuildConfig(target_partition_rows=2, docs_per_segment=3)
    ix = RayBM25Index(base_dir=str(tmp_path / "idx"), config=cfg)
    fp1 = ix._paths_fingerprint(src)
    ix.config = dataclasses.replace(cfg, codec="zlib")
    fp2 = ix._paths_fingerprint(src)
    assert fp1 != fp2
    # nested-directory inputs fingerprint recursively
    nest = tmp_path / "nested" / "sub"
    nest.mkdir(parents=True)
    pa.parquet.write_table(
        pa.table({"url": pa.array(["x"]), "text": pa.array(["y"])}),
        str(nest / "a.parquet"),
    )
    fp3 = ix._paths_fingerprint(str(tmp_path / "nested"))
    (nest / "a.parquet").write_bytes(b"different")
    assert ix._paths_fingerprint(str(tmp_path / "nested")) != fp3


def test_df_sharded_global_stats(tmp_path, monkeypatch):
    """Cold-term df comes from the term-range-sharded df_global parquet
    (one shard read, no all-searcher gather) and must equal the searcher
    gather at >1 shard."""
    from elasticsearch_ray.pipelines import build as build_mod
    from elasticsearch_ray.pipelines.build import build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    monkeypatch.setattr(build_mod, "DF_SHARD_ROWS", 8)  # force many shards
    texts = [
        " ".join(f"w{i:03d}" for i in range(d, d + 12)) for d in range(40)
    ]
    src = str(tmp_path / "src.parquet")
    pa.parquet.write_table(
        pa.table(
            {
                "url": pa.array([f"u{d}" for d in range(40)]),
                "text": pa.array(texts),
            }
        ),
        src,
    )
    idx = str(tmp_path / "idx")
    build_index(src, idx, build_mod.BuildConfig(
        target_partition_rows=10, docs_per_segment=20))
    shidx = json.load(open(os.path.join(idx, "df_global", "_df_shards.json")))
    assert len(shidx["shards"]) > 1
    eng = QueryEngine(idx, num_searchers=0)
    assert eng._df_shards  # shard path active
    terms = [f"w{i:03d}" for i in range(0, 52, 5)] + ["zzz_absent"]
    got = eng._global_dfs(terms)
    # ground truth: embedded searcher postings gather (the legacy path)
    exp = {t: eng._fanout("dfs", terms)[0][t] for t in terms}
    assert got == exp
    assert got["zzz_absent"] == 0
    eng.close()


def test_curate_refuses_foreign_out_dir(tmp_path, docs_for_curate=None):
    from elasticsearch_ray.ops.curation import curate

    foreign = tmp_path / "precious"
    foreign.mkdir()
    (foreign / "data.txt").write_text("do not delete")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(
                    ["the quick brown fox jumps over the lazy dog " * 8] * 30
                ),
            }
        )
    )
    with pytest.raises(ValueError, match="not produced by"):
        curate(ds, near_dedup=False, with_counts=False, out_dir=str(foreign))
    assert (foreign / "data.txt").read_text() == "do not delete"
    # a curate-produced dir IS reusable
    mine = str(tmp_path / "curated")
    curate(ds, near_dedup=False, with_counts=False, out_dir=mine)
    curate(ds, near_dedup=False, with_counts=False, out_dir=mine)
    assert os.path.exists(os.path.join(mine, ".esray_curate"))
