"""Elasticsearch bulk sink + loader (SURVEY §2 S6), Ray-Data-native.

The reference ships its corpus into a live Elasticsearch cluster
(``elasticsearch_indexer.py:33-114``): ``create_index`` posts a
settings+mappings body whose ``custom_analyzer`` is *exactly* this
engine's canonical analyzer (standard tokenizer + lowercase + porter_stem
+ stop, ``normalizer/tokenize.py``), then streams documents with
``helpers.bulk`` in chunks of 1,000 actions.

There is no cluster in this sandbox (and none needed at build time), so
the sink emits the ES ``_bulk`` *wire format* itself: each ≤``actions_per_file``
chunk becomes one ready-to-POST NDJSON body (action line + source line per
document, trailing newline as the API requires).  A user switching from
the reference feeds these bodies to ``POST /_bulk`` verbatim —
``post_es_bulk`` does that from an actor pool given any client callable —
or replays them elsewhere; ``read_es_bulk`` loads them back as a Dataset
(round-trip tested byte-exact on ``text``).

Scale shape: the writer is a streaming ``map_batches`` — one bounded batch
in memory per task, content-addressed file names (md5 of the chunk's ids)
so re-runs are idempotent, and a tiny manifest parquet written alongside
for resume/audit.  On a multi-node cluster ``out_dir`` is shared storage
and posting parallelism is the actor-pool size.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pyarrow as pa

# The reference's index body (elasticsearch_indexer.py:40-70): one shard,
# custom_analyzer = the engine's canonical analysis chain.
REFERENCE_SETTINGS = {
    "settings": {
        "number_of_shards": 1,
        "number_of_replicas": 0,
        "analysis": {
            "analyzer": {
                "custom_analyzer": {
                    "type": "custom",
                    "tokenizer": "standard",
                    "filter": ["lowercase", "porter_stem", "stop"],
                }
            }
        },
    }
}


def es_index_name(name: str) -> str:
    """ES index-name normalization the reference applies
    (``elasticsearch_indexer.py:34-36``): lowercase, dots to dashes."""
    return name.lower().replace(".", "-")


def _mappings_for(schema: pa.Schema, id_col: str) -> dict:
    """Text columns get the custom analyzer (reference mapping for
    title/text); the id column and other strings-of-strings are keyword;
    numerics map to long/double (reference: doc_id keyword,
    tokens_processed keyword)."""
    props: dict = {}
    for field in schema:
        t = field.type
        if field.name == id_col:
            props[field.name] = {"type": "keyword"}
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            props[field.name] = {"type": "text", "analyzer": "custom_analyzer"}
        elif pa.types.is_integer(t):
            props[field.name] = {"type": "long"}
        elif pa.types.is_floating(t):
            props[field.name] = {"type": "double"}
        elif pa.types.is_boolean(t):
            props[field.name] = {"type": "boolean"}
        elif pa.types.is_timestamp(t):
            props[field.name] = {"type": "date"}
        else:  # lists / binary: keyword, as the reference does for token lists
            props[field.name] = {"type": "keyword"}
    return {"properties": props}


class _BulkWriter:
    """Actor-pool stage: one batch -> one content-addressed bulk body file.

    Stateless beyond config, but run as a callable class so the sink slots
    into the same actor-pool pattern as every other stateful stage."""

    def __init__(self, out_dir: str, index_name: str, id_col: str):
        self.out_dir = out_dir
        self.index_name = index_name
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> dict:
        import pyarrow.compute as pc

        ids = pc.cast(batch.column(self.id_col), pa.string()).to_pylist()
        # vectorized source serialization straight off the Arrow batch
        # (zero-copy into polars' Rust NDJSON writer — no pandas
        # conversion on the data path); UTF-8 kept raw — ES accepts it
        # and round-trips byte-identically.
        # split on '\n' ONLY: the writer emits U+2028/U+2029/U+0085 raw
        # inside JSON strings (legal JSON), and splitlines() would cut a
        # record at them, desyncing the action/source pairing
        try:
            import polars as pl

            src = pl.from_arrow(batch).write_ndjson()
        except ImportError:  # pragma: no cover - polars ships in this env
            # stdlib fallback: json.dumps floats are shortest-round-trip
            # (lossless, matching polars' ryu writer except exponent
            # formatting) — the old pandas to_json path TRUNCATED floats
            # to 10 significant digits, silently corrupting _source
            src = "\n".join(
                json.dumps(row, ensure_ascii=False, separators=(",", ":"),
                           default=str)
                for row in batch.to_pylist()
            ) + "\n"
        src_lines = src.split("\n")
        if src_lines and src_lines[-1] == "":
            src_lines.pop()  # trailing newline
        prefix = '{"index": {"_index": %s, "_id": ' % json.dumps(self.index_name)
        lines = []
        for _id, src in zip(ids, src_lines):
            lines.append(prefix + json.dumps(_id) + "}}")
            lines.append(src)
        body = "\n".join(lines) + "\n"  # _bulk requires the trailing newline
        digest = hashlib.md5("\x00".join(ids).encode()).hexdigest()[:16]
        path = os.path.join(self.out_dir, f"part-{digest}.bulk.ndjson")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(body)
        os.replace(tmp, path)
        import numpy as np

        return {
            "path": np.array([path]),
            "actions": np.array([len(ids)], dtype=np.int64),
            "bytes": np.array([len(body.encode("utf-8"))], dtype=np.int64),
        }


def write_es_bulk(
    ds,
    out_dir: str,
    index_name: str = "esindex-v1-0",
    id_col: str = "doc_id",
    source_cols: list[str] | None = None,
    actions_per_file: int = 1000,
):
    """Stream ``ds`` into ES ``_bulk`` NDJSON bodies under ``out_dir``.

    Writes ``_settings.json`` (the reference's index body + mappings
    derived from the dataset schema) and one ``part-*.bulk.ndjson`` per
    ≤``actions_per_file`` documents (the reference's chunk size,
    ``elasticsearch_indexer.py:125-129``), plus a ``_manifest`` parquet of
    (path, actions, bytes).  Existing part files are cleared first so the
    directory always reflects exactly one dataset. Returns the manifest
    as a small pandas DataFrame (one row per ~1000 docs).
    """
    index_name = es_index_name(index_name)
    os.makedirs(out_dir, exist_ok=True)
    for stale in glob.glob(os.path.join(out_dir, "part-*.bulk.ndjson")):
        os.remove(stale)

    if source_cols is not None:
        ds = ds.select_columns(list(dict.fromkeys([id_col, *source_cols])))
    body = dict(REFERENCE_SETTINGS)
    body["mappings"] = _mappings_for(ds.schema().base_schema, id_col)
    with open(os.path.join(out_dir, "_settings.json"), "w") as f:
        json.dump({"index": index_name, **body}, f, indent=2)

    manifest = ds.map_batches(
        _BulkWriter,
        fn_constructor_args=(out_dir, index_name, id_col),
        batch_size=actions_per_file,
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    manifest.to_parquet(os.path.join(out_dir, "_manifest"))
    return manifest


def read_es_bulk(bulk_dir: str):
    """Load bulk bodies back as a Ray Dataset (one parse task per file;
    files are bounded at ``actions_per_file`` docs so per-file work is
    small and the read scales with the file count)."""
    import ray.data

    paths = sorted(glob.glob(os.path.join(bulk_dir, "part-*.bulk.ndjson")))
    if not paths:
        raise FileNotFoundError(f"no bulk bodies under {bulk_dir}")

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {"_id": []}
        for raw in batch.column("bytes").to_pylist():
            # '\n' only — raw U+2028 etc. inside JSON strings are legal
            lines = raw.decode("utf-8").split("\n")
            while lines and lines[-1] == "":
                lines.pop()
            for i in range(0, len(lines) - 1, 2):
                act = json.loads(lines[i])["index"]
                src = json.loads(lines[i + 1])
                cols["_id"].append(act["_id"])
                for k, v in src.items():
                    cols.setdefault(k, []).append(v)
        return pa.table(cols)

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


class HttpBulkClient:
    """Live bulk client over stdlib urllib: ``callable(body_str)`` POSTs
    to ``{base_url}/_bulk`` with the ES wire content type
    (``application/x-ndjson``) and returns the parsed JSON response —
    the reference's live path (``elasticsearch_indexer.py:33-114``,
    ``helpers.bulk``) without the elasticsearch-py dependency.  Build it
    per actor via ``functools.partial(HttpBulkClient, url)`` as
    ``post_factory`` (the urllib opener state is per-actor, never
    per-batch)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.url = base_url.rstrip("/") + "/_bulk"
        self.timeout = timeout

    def __call__(self, body: str):
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=body.encode("utf-8"),
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))


class ValidatingClient:
    """Dry-run bulk 'client': parses a body exactly like the server would
    (action/source line pairs, one JSON object each) and reports the item
    count — lets a pipeline be validated end-to-end with no cluster.
    Pass the class itself as ``post_factory``."""

    def __call__(self, body: str):
        lines = body.split("\n")
        while lines and lines[-1] == "":
            lines.pop()
        if len(lines) % 2:
            return {"errors": True, "items": 0,
                    "reason": "odd line count in bulk body"}
        n = 0
        for i in range(0, len(lines), 2):
            try:
                act = json.loads(lines[i])
                src = json.loads(lines[i + 1])
            except json.JSONDecodeError as e:
                return {"errors": True, "items": n,
                        "reason": f"invalid JSON at line {i}: {e}"}
            if "index" not in act or not isinstance(src, dict):
                return {"errors": True, "items": n,
                        "reason": f"malformed pair at line {i}"}
            n += 1
        return {"errors": False, "items": n}


class _Poster:
    """Actor-pool bulk poster: the client is built ONCE per actor from a
    serializable factory (e.g. ``lambda: Elasticsearch(hosts).bulk`` —
    or any ``callable(body_str) -> response``)."""

    def __init__(self, post_factory):
        self.post = post_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        statuses = []
        for path in batch.column("path").to_pylist():
            with open(path, encoding="utf-8") as f:
                resp = self.post(f.read())
            statuses.append(json.dumps(resp, default=str)[:200])
        return pa.table({"path": batch.column("path"),
                         "status": pa.array(statuses)})


def post_es_bulk(bulk_dir: str, post_factory, concurrency: int = 4):
    """POST every bulk body under ``bulk_dir`` through ``post_factory()``'s
    client callable from an actor pool; returns per-file statuses as a
    pandas DataFrame (one row per body)."""
    import ray.data

    paths = sorted(glob.glob(os.path.join(bulk_dir, "part-*.bulk.ndjson")))
    if not paths:
        raise FileNotFoundError(f"no bulk bodies under {bulk_dir}")
    return (
        ray.data.from_items([{"path": p} for p in paths],
                            override_num_blocks=len(paths))
        .map_batches(
            _Poster, fn_constructor_args=(post_factory,),
            batch_format="pyarrow", batch_size=8, concurrency=concurrency,
        )
        .to_pandas()
    )
