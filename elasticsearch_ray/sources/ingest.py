"""Corpus ingestion: the reference's JSON formats -> partitioned Parquet.

The reference downloads one giant JSON ARRAY of documents
(``download_wikipedia.py:31-40``) and later streams it back with a
hand-rolled brace-counting parser (``plot_c_info_type.py:165-219``,
``measure_latency_datastores.py:281-297`` line-based variant).  A user
switching from the reference brings corpora in exactly these shapes; this
module converts them ONCE into the engine's native partitioned Parquet
(row groups sized for the build planner) so every later build streams
column-pruned.

* ``jsonl_to_parquet`` — newline-delimited JSON via ``ray.data.read_json``
  (distributed, streaming; one task per file/block).
* ``json_array_to_parquet`` — a single multi-GB JSON array parsed
  INCREMENTALLY on the driver with ``json.JSONDecoder.raw_decode`` over a
  bounded sliding buffer (the array container makes the format inherently
  sequential — the reference pays the same single-scan cost; rows land in
  Parquet chunks and everything downstream is distributed).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def jsonl_to_parquet(src: str, out_dir: str) -> str:
    """Convert JSONL file(s) to partitioned Parquet with ray.data
    (streaming, distributed).  Returns ``out_dir``."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    ray.data.read_json(src).write_parquet(out_dir)
    return out_dir


def csv_to_parquet(src: str, out_dir: str) -> str:
    """CSV file(s) -> partitioned Parquet with ray.data (streaming,
    distributed; Arrow CSV reader per block)."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    ray.data.read_csv(src).write_parquet(out_dir)
    return out_dir


def iter_json_array(path: str, buf_bytes: int = 1 << 20):
    """Yield objects from one big JSON array without loading the file:
    ``raw_decode`` over a sliding buffer that grows only when a single
    object spans a refill boundary (reference S3 semantics,
    ``plot_c_info_type.py:165-219``, re-expressed without the hand-rolled
    brace counting)."""
    dec = json.JSONDecoder()
    with open(path, encoding="utf-8") as f:
        buf = ""
        pos = 0
        started = False
        while True:
            if pos >= len(buf) or len(buf) - pos < buf_bytes // 2:
                chunk = f.read(buf_bytes)
                buf = buf[pos:] + chunk
                pos = 0
                if not chunk and not buf.strip():
                    return
            if not started:
                i = buf.find("[", pos)
                if i < 0:
                    pos = len(buf)
                    continue
                pos = i + 1
                started = True
            while pos < len(buf) and buf[pos] in " \t\r\n,":
                pos += 1
            if pos < len(buf) and buf[pos] == "]":
                return
            try:
                obj, end = dec.raw_decode(buf, pos)
            except json.JSONDecodeError:
                chunk = f.read(buf_bytes)
                if not chunk:
                    raise
                buf = buf[pos:] + chunk
                pos = 0
                continue
            pos = end
            yield obj


def json_array_to_parquet(
    src: str,
    out_dir: str,
    columns: list[str] | None = None,
    rows_per_file: int = 50_000,
    row_group_size: int = 5_000,
) -> str:
    """One giant JSON array -> partitioned Parquet.  ``columns`` selects
    and orders the fields to keep (default: the first object's keys);
    missing fields become nulls.  Row-group sizing feeds the build
    planner's read parallelism."""
    os.makedirs(out_dir, exist_ok=True)
    batch: list[dict] = []
    part = 0
    cols = list(columns) if columns else None

    def flush():
        nonlocal part, cols
        if not batch:
            return
        if cols is None:
            cols = list(batch[0].keys())
        tbl = pa.table(
            {c: pa.array([r.get(c) for r in batch]) for c in cols}
        )
        pq.write_table(
            tbl,
            os.path.join(out_dir, f"ingest-{part:05d}.parquet"),
            row_group_size=row_group_size,
        )
        part += 1
        batch.clear()

    for obj in iter_json_array(src):
        batch.append(obj)
        if len(batch) >= rows_per_file:
            flush()
    flush()
    return out_dir
