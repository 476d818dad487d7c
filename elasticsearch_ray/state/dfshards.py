"""Shared access to the term-range-sharded global df table.

``_finalize`` (pipelines/build.py) writes ``df_global/`` as sorted
term-range shards with a ``_df_shards.json`` index; both the query engine
and the cross-field engine look terms up the same way: bisect the shard
index, one predicate read per touched shard (row-group pruning via the
sorted term column).  This module is the single implementation so the
shard layout and the reference idf convention
(``selfindex_q_taat.py:133,158-160``: ln((N+1)/(df+1)), 0 when df == 0)
cannot drift between engines.
"""
from __future__ import annotations

import bisect
import json
import math
import os

Shard = tuple[str, str, str]  # (lo_term, hi_term, parquet_path)


def load_df_shards(index_dir: str) -> list[Shard]:
    """Read ``df_global/_df_shards.json``; [] when the index predates the
    shard layout (callers fall back to a per-segment df gather)."""
    shards: list[Shard] = []
    sh_path = os.path.join(index_dir, "df_global", "_df_shards.json")
    if os.path.exists(sh_path):
        with open(sh_path) as f:
            for s in json.load(f).get("shards", []):
                shards.append(
                    (s["lo"], s["hi"],
                     os.path.join(index_dir, "df_global", s["file"]))
                )
        shards.sort()
    return shards


def dfs_from_shards(
    shards: list[Shard], shard_los: list[str], terms: list[str]
) -> dict[str, int]:
    """df for each term: bisect the shard index, one predicate read per
    touched shard.  Terms outside every range are absent: df = 0."""
    from collections import defaultdict

    import pyarrow.dataset as pads

    out = {t: 0 for t in terms}
    groups: dict[int, list[str]] = defaultdict(list)
    for t in terms:
        i = bisect.bisect_right(shard_los, t) - 1
        if i >= 0 and t <= shards[i][1]:
            groups[i].append(t)
    for i, ts in groups.items():
        tbl = pads.dataset(shards[i][2]).to_table(
            columns=["term", "df"],
            filter=pads.field("term").isin(ts),
        )
        for term, df in zip(
            tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
        ):
            out[term] = int(df)
    return out


def idf(doc_count: int, df: int) -> float:
    """Reference convention: ln((N+1)/(df+1)) if df > 0 else 0."""
    return math.log((doc_count + 1) / (df + 1)) if df > 0 else 0.0
