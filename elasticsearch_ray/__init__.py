"""elasticsearch_ray — a Ray-Data-native inverted-index + BM25 engine.

A from-scratch distributed re-expression of the capabilities of the reference
repo ``hrishirajmitra/elasticsearch`` (an in-memory single-process
inverted-index course project): streaming Parquet ingestion, actor-pool
tokenization, sort-shuffle posting-list construction with skew-splitting,
delta+VByte compressed immutable segments with per-group lineage manifests,
and distributed BM25 (TAAT / DAAT / block-max WAND) + boolean query serving
over segment actors.
"""

__version__ = "0.1.0"
