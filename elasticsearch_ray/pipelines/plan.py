"""Metadata-only build planner.

Reads ONLY Parquet footers to split the input corpus into deterministic
read partitions (path + row-group range + row offset) and to group contiguous
partitions into segments.  doc_ids are assigned from the plan —
``doc_id = partition.doc_id_base + row_index_within_partition`` — so they are
stable under retries and independent of scheduling/arrival order
(SURVEY.md §3.4; the reference instead uses in-memory ``enumerate`` order,
``selfindex_q_daat.py:81``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq


@dataclass
class PartitionSpec:
    part_id: int
    path: str
    row_group_start: int  # first row group (inclusive)
    row_group_end: int  # last row group (exclusive)
    row_offset: int  # rows to skip inside the row-group range
    num_rows: int
    doc_id_base: int
    seg_id: int = -1
    seg_base: int = 0  # doc_id_base of the owning segment

    def to_row(self) -> dict:
        return {
            "part_id": self.part_id,
            "path": self.path,
            "row_group_start": self.row_group_start,
            "row_group_end": self.row_group_end,
            "row_offset": self.row_offset,
            "num_rows": self.num_rows,
            "doc_id_base": self.doc_id_base,
            "seg_id": self.seg_id,
            "seg_base": self.seg_base,
        }


@dataclass
class SegmentSpec:
    seg_id: int
    partitions: list[PartitionSpec] = field(default_factory=list)

    @property
    def doc_id_base(self) -> int:
        return self.partitions[0].doc_id_base

    @property
    def num_docs(self) -> int:
        return sum(p.num_rows for p in self.partitions)

    @property
    def doc_id_end(self) -> int:
        return self.doc_id_base + self.num_docs


def list_input_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        out = []
        for p in input_path:
            out.extend(list_input_files(p))
        return out
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


def plan_partitions(
    input_path: str | list[str],
    target_rows_per_partition: int = 2_000,
) -> list[PartitionSpec]:
    """One pass over Parquet footers; no data reads.

    Row groups are packed into partitions of ~target_rows.  A row group
    larger than the target is split by row ranges (several partitions read
    the same row group with different offsets — acceptable at the small row
    counts where single-row-group files occur; web-scale inputs have many
    row groups and never hit this path).
    """
    parts: list[PartitionSpec] = []
    doc_base = 0
    part_id = 0
    for path in list_input_files(input_path):
        meta = pq.ParquetFile(path).metadata
        rg_sizes = [meta.row_group(i).num_rows for i in range(meta.num_row_groups)]
        i = 0
        while i < len(rg_sizes):
            if rg_sizes[i] > target_rows_per_partition * 2:
                # split single large row group by row ranges
                total = rg_sizes[i]
                offset = 0
                while offset < total:
                    n = min(target_rows_per_partition, total - offset)
                    parts.append(
                        PartitionSpec(part_id, path, i, i + 1, offset, n, doc_base)
                    )
                    part_id += 1
                    doc_base += n
                    offset += n
                i += 1
            else:
                # pack consecutive row groups up to the target
                j = i
                acc = 0
                while j < len(rg_sizes) and acc + rg_sizes[j] <= max(
                    target_rows_per_partition, rg_sizes[i]
                ):
                    acc += rg_sizes[j]
                    j += 1
                parts.append(PartitionSpec(part_id, path, i, j, 0, acc, doc_base))
                part_id += 1
                doc_base += acc
                i = j
    return parts


def plan_segments(
    parts: list[PartitionSpec], docs_per_segment: int
) -> list[SegmentSpec]:
    segs: list[SegmentSpec] = []
    cur = SegmentSpec(seg_id=0)
    acc = 0
    for p in parts:
        if acc >= docs_per_segment and cur.partitions:
            segs.append(cur)
            cur = SegmentSpec(seg_id=len(segs))
            acc = 0
        p.seg_id = cur.seg_id
        cur.partitions.append(p)
        acc += p.num_rows
    if cur.partitions:
        segs.append(cur)
    for s in segs:
        base = s.doc_id_base
        for p in s.partitions:
            p.seg_base = base
    return segs
