"""Composed training-data curation pipeline — the end-to-end shape a
100 TB pretraining-data run takes, built from the ops in this package:

    read -> quality filter -> exact dedup -> (optional) MinHash near-dedup
         -> resumable partitioned parquet out + per-stage kept/dropped counts

Everything streams; the only materialized driver-side values are the stage
counters.  Output is written as partitioned Parquet (one file per block) so
a failed run can be resumed by diffing finished files.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .dedup import exact_dedup, minhash_lsh_dedup
from .textstats import quality_scores


def curate(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 3,
    near_dedup: bool = True,
    out_dir: str | None = None,
) -> dict:
    """Returns per-stage counts + the surviving doc ids Dataset.

    Keep criteria: quality >= min_quality AND n_words >= min_words AND
    doc is its duplicate-group representative (min doc_id) AND (optionally)
    not a MinHash near-duplicate of a smaller doc.

    Scale note: the keep/drop id sets are materialized driver-side here
    (fine up to ~1e8 ids); at 1e12-doc scale the same decisions become
    hash-partitioned anti-joins (groupby(id) over (id, stage-flag) rows) so
    nothing leaves the cluster.
    """
    total = ds.count()

    q = quality_scores(ds, text_col=text_col, id_col=id_col)
    q_keep = q.filter(
        lambda r: r["quality"] >= min_quality and r["n_words"] >= min_words
    ).select_columns([id_col])
    n_quality = q_keep.count()

    reps = exact_dedup(ds, text_col=text_col, id_col=id_col).select_columns(
        [id_col]
    )
    n_exact = reps.count()

    drop_ids: set[int] = set()
    if near_dedup:
        dups = minhash_lsh_dedup(ds, text_col=text_col, id_col=id_col)
        drop_ids = {r[id_col] for r in dups.take_all()}  # dup ids are few

    keep_q = {r[id_col] for r in q_keep.take_all()}
    keep_rep = {r[id_col] for r in reps.take_all()}
    final_ids = sorted((keep_q & keep_rep) - drop_ids)
    final_set = set(final_ids)

    kept = ds.filter(lambda r: r[id_col] in final_set)
    if out_dir is not None:
        kept.write_parquet(out_dir)

    return {
        "total": total,
        "after_quality": n_quality,
        "exact_dedup_reps": n_exact,
        "near_dups_dropped": len(drop_ids & keep_q & keep_rep),
        "kept": len(final_ids),
        "kept_ids": final_ids,
    }
