"""Composed training-data curation pipeline — the end-to-end shape a
100 TB pretraining-data run takes, built from the ops in this package:

    read -> quality filter (inline Arrow-mask, payload streams through)
         -> exact-dedup representative semi-join
         -> (optional) MinHash near-dup anti-join
         -> resumable partitioned parquet out + per-stage kept/dropped counts

Everything stays in the cluster: keep/drop decisions are hash-partitioned
semi-/anti-joins on doc_id (``Dataset.join``), never driver-side id sets,
and the quality filter is a vectorized per-batch mask, never a per-row
Python lambda.  The only driver-side values are the stage counters (scalar
aggregates).  Output is written as partitioned Parquet (one file per
block); a retried run replaces the output directory wholesale (Ray's
write_parquet appends into existing dirs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import exact_dedup, minhash_lsh_dedup
from .textstats import quality_feature_arrays


def curate(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 3,
    near_dedup: bool = True,
    out_dir: str | None = None,
    num_partitions: int = 16,
    with_counts: bool = True,
) -> dict:
    """Returns per-stage counts + the surviving-rows Dataset (``kept_ds``).

    Keep criteria: quality >= min_quality AND n_words >= min_words AND
    doc is its duplicate-group representative (min doc_id) AND (optionally)
    not a MinHash near-duplicate of a smaller doc.

    ``num_partitions`` sizes the join shuffle (≈ cluster cores at scale).
    ``with_counts=False`` skips the intermediate stage counters (each is a
    full-pipeline scalar aggregate) for production runs that only want the
    output.
    """
    total = ds.count() if with_counts else None

    def qfilter(batch: pa.Table) -> pa.Table:
        feats = quality_feature_arrays(batch.column(text_col))
        mask = (feats["quality"] >= min_quality) & (feats["n_words"] >= min_words)
        return batch.filter(pa.array(mask))

    q_keep = ds.map_batches(qfilter, batch_format="pyarrow")
    n_quality = q_keep.count() if with_counts else None

    reps = exact_dedup(ds, text_col=text_col, id_col=id_col).select_columns(
        [id_col]
    )
    n_exact = reps.count() if with_counts else None

    # quality-passing rows whose id is an exact-dedup representative:
    # hash-partitioned semi-join, payload never leaves the cluster
    kept = q_keep.join(
        reps, join_type="left_semi", num_partitions=num_partitions, on=(id_col,)
    )
    n_after_exact = None
    near_dropped = None
    if near_dedup:
        if with_counts:
            n_after_exact = kept.count()
        dups = minhash_lsh_dedup(
            ds, text_col=text_col, id_col=id_col
        ).select_columns([id_col])
        kept = kept.join(
            dups, join_type="left_anti", num_partitions=num_partitions,
            on=(id_col,),
        )

    n_kept = None
    if out_dir is not None:
        # Ray's write_parquet APPENDS into an existing dir; a retried run
        # would double every surviving row (and inflate the counts below),
        # so replace the output wholesale.  Partition-level resume would
        # need per-shard done-markers — not implemented; a rerun redoes the
        # write.  Refuse to clobber a directory curate() did not produce
        # (marker file check) — rmtree on an arbitrary caller path would
        # silently destroy unrelated data.
        import shutil

        marker = os.path.join(out_dir, ".esray_curate")
        if os.path.isdir(out_dir) and not os.path.exists(marker):
            raise ValueError(
                f"curate out_dir {out_dir!r} exists and was not produced by "
                "a prior curate run; remove it yourself or pass a fresh path"
            )
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        open(marker, "w").close()
        kept.write_parquet(out_dir)
        if with_counts:
            # metadata-only count over the written files — no re-execution
            n_kept = ray.data.read_parquet(out_dir).count()
            kept = ray.data.read_parquet(out_dir)
    elif with_counts:
        n_kept = kept.count()
    if with_counts and near_dedup:
        near_dropped = n_after_exact - n_kept

    return {
        "total": total,
        "after_quality": n_quality,
        "exact_dedup_reps": n_exact,
        "near_dups_dropped": near_dropped,
        "kept": n_kept,
        "kept_ds": kept,
    }
