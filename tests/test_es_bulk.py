"""ES bulk sink (SURVEY §2 S6): wire format, round-trip fidelity, posting.

Reference semantics: ``elasticsearch_indexer.py:33-129`` — settings body
with the canonical analyzer chain, ``helpers.bulk`` in 1,000-action chunks.
"""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.sources.es_bulk import (
    es_index_name,
    post_es_bulk,
    read_es_bulk,
    write_es_bulk,
)


@pytest.fixture(scope="module")
def bulk_dir(tiny_corpus_dir, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("esbulk"))
    ds = ray.data.read_parquet(tiny_corpus_dir)
    write_es_bulk(
        ds, out, index_name="ESIndex.v1",
        id_col="url", source_cols=["url", "text", "lang"],
        actions_per_file=64,
    )
    return out


def test_index_name_normalization():
    # elasticsearch_indexer.py:34-36
    assert es_index_name("ESIndex.v1") == "esindex-v1"


def test_bulk_wire_format(bulk_dir):
    parts = sorted(glob.glob(os.path.join(bulk_dir, "part-*.bulk.ndjson")))
    assert parts
    total = 0
    for p in parts:
        body = open(p, encoding="utf-8").read()
        assert body.endswith("\n")  # _bulk requires a trailing newline
        lines = body.splitlines()
        assert len(lines) % 2 == 0
        assert len(lines) // 2 <= 64  # chunk bound (reference: 1000)
        for i in range(0, len(lines), 2):
            act = json.loads(lines[i])
            assert set(act) == {"index"}
            assert act["index"]["_index"] == "esindex-v1"
            src = json.loads(lines[i + 1])
            assert act["index"]["_id"] == src["url"]
            assert set(src) == {"url", "text", "lang"}
        total += len(lines) // 2
    assert total == 200


def test_settings_body(bulk_dir):
    body = json.load(open(os.path.join(bulk_dir, "_settings.json")))
    ana = body["settings"]["analysis"]["analyzer"]["custom_analyzer"]
    assert ana["tokenizer"] == "standard"
    assert ana["filter"] == ["lowercase", "porter_stem", "stop"]
    props = body["mappings"]["properties"]
    assert props["url"] == {"type": "keyword"}  # id column
    assert props["text"] == {"type": "text", "analyzer": "custom_analyzer"}
    # manifest rows account for every action
    man = pq.read_table(os.path.join(bulk_dir, "_manifest"))
    assert sum(man.column("actions").to_pylist()) == 200


def test_roundtrip_byte_exact(bulk_dir, tiny_corpus_dir):
    got = read_es_bulk(bulk_dir).to_pandas()
    want = pq.read_table(
        tiny_corpus_dir, columns=["url", "text", "lang"]
    ).to_pandas()
    got = got.sort_values("url").reset_index(drop=True)
    want = want.sort_values("url").reset_index(drop=True)
    assert got["_id"].tolist() == got["url"].tolist()
    for col in ["url", "text", "lang"]:
        assert got[col].tolist() == want[col].tolist()


def test_idempotent_rewrite(bulk_dir, tiny_corpus_dir):
    import ray.data

    before = sorted(glob.glob(os.path.join(bulk_dir, "part-*")))
    ds = ray.data.read_parquet(tiny_corpus_dir)
    write_es_bulk(
        ds, bulk_dir, index_name="ESIndex.v1",
        id_col="url", source_cols=["url", "text", "lang"],
        actions_per_file=64,
    )
    after = sorted(glob.glob(os.path.join(bulk_dir, "part-*")))
    assert len(after) == len(before)
    # content-addressed names: at least the file COUNT and total actions
    # are stable; same batching -> identical names
    total = sum(
        len(open(p, encoding="utf-8").read().splitlines()) // 2 for p in after
    )
    assert total == 200


def test_post_actor_pool(bulk_dir):
    # the dry-run client lives in the package (actor-side deserialization
    # needs an importable module, which a pytest test module is not)
    from elasticsearch_ray.sources.es_bulk import ValidatingClient

    statuses = post_es_bulk(bulk_dir, ValidatingClient, concurrency=2)
    parts = glob.glob(os.path.join(bulk_dir, "part-*.bulk.ndjson"))
    assert len(statuses) == len(parts)
    assert all('"errors": false' in s for s in statuses["status"])


def test_bulk_roundtrip_unicode_line_separators(tmp_path):
    """U+2028/U+2029 inside text are legal raw JSON (force_ascii=False
    emits them unescaped); the writer and parser must split on '\\n' only
    or the action/source pairing desyncs."""
    import pyarrow as pa
    import ray.data

    from elasticsearch_ray.sources.es_bulk import (
        ValidatingClient,
        read_es_bulk,
        write_es_bulk,
    )

    texts = ["line\u2028sep", "para\u2029sep", "nel\u0085sep", "plain"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    out = str(tmp_path / "bulk")
    write_es_bulk(ds, out, id_col="doc_id")
    back = {r["_id"]: r["text"] for r in read_es_bulk(out).take_all()}
    assert back == {str(i): t for i, t in enumerate(texts)}
    import glob as g
    import os as o

    for p in g.glob(o.path.join(out, "part-*.bulk.ndjson")):
        v = ValidatingClient()(open(p, encoding="utf-8").read())
        assert v["errors"] is False


def test_bulk_fallback_floats_lossless(tmp_path, monkeypatch):
    """The no-polars fallback serializer must round-trip floats exactly
    (the old pandas to_json path truncated to 10 significant digits,
    silently corrupting _source between environments)."""
    import builtins
    import json as _json

    import pyarrow as pa

    from elasticsearch_ray.sources.es_bulk import _BulkWriter

    real_import = builtins.__import__

    def no_polars(name, *a, **k):
        if name == "polars":
            raise ImportError("hidden for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_polars)
    vals = [0.1234567890123456789, 1e-300, 12345678901.234567]
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "score": pa.array(vals, pa.float64()),
        "s": pa.array(["a", "naïve ♞", None], pa.string()),
    })
    out = str(tmp_path / "bulk")
    import os
    os.makedirs(out, exist_ok=True)
    _BulkWriter(out, "esindex-v1-0", "doc_id")(batch)
    f = [p for p in os.listdir(out) if p.endswith(".ndjson")][0]
    lines = open(os.path.join(out, f), encoding="utf-8").read().split("\n")
    srcs = [_json.loads(lines[i]) for i in (1, 3, 5)]
    got = [s["score"] for s in srcs]
    assert got == [float(v) for v in vals]  # exact, not 10-digit
    assert srcs[1]["s"] == "naïve ♞"
    assert srcs[2]["s"] is None
