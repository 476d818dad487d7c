"""Public engine API: the reference ``IndexBase`` contract on Ray.

Mirrors the 7-method ABC (``index_base.py:35-87``) plus ``get_stats``:
create_index / load_index / update_index / query / delete_index /
list_indices / list_indexed_files.  ``query`` returns the reference's JSON
result string shape (``selfindex_q_taat.py:203-209``).

Variant identifier parity (``index_base.py:9-49``): the build config's
``identifier`` plays the role of ``core_i{x}d{y}c{z}q{q}o{i}``.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Iterable

from .pipelines.build import (
    BuildConfig,
    add_tombstones,
    build_index,
    compact_index,
    extend_index,
)
from .pipelines.query import QueryEngine


class RayBM25Index:
    """Distributed inverted index + BM25/boolean search over Ray Data.

    ``files`` arguments accept the reference's ``(doc_id, content)`` pairs
    (written to a scratch Parquet) or Parquet paths/directories directly.
    """

    def __init__(
        self,
        base_dir: str = "/tmp/esray_indices",
        scoring: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
        mode: str = "taat",
        config: BuildConfig | None = None,
    ):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.scoring = scoring
        self.k1 = k1
        self.b = b
        self.mode = mode
        self.config = config or BuildConfig()
        self.engine: QueryEngine | None = None
        self.current_index: str | None = None
        self._alias_engines: dict = {}

    # -- helpers -----------------------------------------------------------

    def _dir(self, index_id: str) -> str:
        return os.path.join(self.base_dir, index_id)

    @staticmethod
    def _files_to_parquet(files: Iterable[tuple[str, str]], path: str) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids, texts = [], []
        for doc_id, content in files:
            ids.append(str(doc_id))
            texts.append(content)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(
            pa.table({"url": pa.array(ids), "text": pa.array(texts)}),
            path,
            row_group_size=2048,
        )
        return path

    @staticmethod
    def _is_parquet_paths(files) -> bool:
        return isinstance(files, str) or (
            isinstance(files, list) and all(isinstance(f, str) for f in files)
        )

    def _input_for(self, index_id: str, files, tag: str):
        if self._is_parquet_paths(files):
            return files  # parquet path(s)
        scratch = os.path.join(self._dir(index_id), f"_input_{tag}.parquet")
        return self._files_to_parquet(files, scratch)

    def _pair_config(self, base_cfg):
        """Config override for (doc_id, content)-pair inputs: ids land in the
        scratch parquet's 'url' column; lang metadata (and any lang filter)
        doesn't exist for pairs."""
        import dataclasses

        return dataclasses.replace(
            base_cfg, url_column="url", lang_column=None, lang_filter=None
        )

    def _paths_fingerprint(self, resolved) -> str:
        """Identity for a (parquet input, build config) pair — decides
        whether a crashed build dir may be resumed.  Covers nested
        directories recursively and the analyzer/codec/segmentation config:
        resuming stale segments built under a DIFFERENT config would yield a
        silently mixed-config index (segment_is_done checks file existence
        only)."""
        import dataclasses
        import hashlib

        paths = [resolved] if isinstance(resolved, str) else sorted(resolved)
        h = hashlib.md5()
        h.update(json.dumps(dataclasses.asdict(self.config), sort_keys=True).encode())
        for p in paths:
            h.update(p.encode())
            if os.path.isfile(p):
                h.update(str(os.path.getsize(p)).encode())
            elif os.path.isdir(p):
                for root, dirs, files in os.walk(p):
                    dirs.sort()
                    for f in sorted(files):
                        fp = os.path.join(root, f)
                        h.update(os.path.relpath(fp, p).encode())
                        h.update(str(os.path.getsize(fp)).encode())
        return h.hexdigest()

    def _close_engine(self):
        if self.engine is not None:
            self.engine.close()
            self.engine = None

    # -- IndexBase contract ------------------------------------------------

    def create_index(self, index_id: str, files=None) -> None:
        if files is None:
            raise ValueError("create_index requires files or a parquet path")
        index_dir = self._dir(index_id)
        # "Creates an index for the given files" (index_base.py:41-46): a
        # FINISHED pre-existing index under this id must not leak through —
        # purge it so resume logic can't skip the new build and serve stale
        # segments.  A dir WITHOUT manifest.json is a crashed build: keep it
        # (segment-level resume) only when it was building the SAME parquet
        # input, else purge — resumed stale segments would serve the old
        # corpus.  Pair inputs always rebuild (small by construction).
        if self.current_index == index_id:
            self._close_engine()
            self.current_index = None
        is_paths = self._is_parquet_paths(files)
        fp_path = os.path.join(index_dir, "_build_input.json")
        if os.path.exists(os.path.join(index_dir, "manifest.json")):
            shutil.rmtree(index_dir, ignore_errors=True)
        elif os.path.isdir(index_dir):
            same_input = False
            if is_paths and os.path.exists(fp_path):
                with open(fp_path) as f:
                    same_input = json.load(f).get("fp") == self._paths_fingerprint(files)
            if not same_input:
                shutil.rmtree(index_dir, ignore_errors=True)
        cfg = self.config if is_paths else self._pair_config(self.config)
        resolved = self._input_for(index_id, files, "create")
        if is_paths:
            os.makedirs(index_dir, exist_ok=True)
            with open(fp_path, "w") as f:
                json.dump({"fp": self._paths_fingerprint(files)}, f)
        build_index(resolved, index_dir, cfg)
        self.load_index(index_id)

    def load_index(self, index_id: str) -> None:
        self._close_engine()
        self.engine = QueryEngine(
            self._dir(index_id),
            scoring=self.scoring,
            k1=self.k1,
            b=self.b,
            mode=self.mode,
        )
        self.current_index = index_id

    def update_index(self, index_id: str, remove_files=None, add_files=None) -> None:
        index_dir = self._dir(index_id)
        if remove_files:
            urls = [
                f[0] if isinstance(f, tuple) else str(f) for f in remove_files
            ]
            add_tombstones(index_dir, self._doc_ids_for_urls(index_dir, urls))
        if add_files is not None:
            cfg = None
            if not self._is_parquet_paths(add_files):
                # pair adds land in a scratch parquet with a 'url' column —
                # an index built with url_column != 'url' must not look for
                # its original column there (ids would silently become
                # synthetic row-N names)
                from .pipelines.build import BuildConfig as _BC
                from .state.manifest import read_json as _rj

                manifest_cfg = _BC(
                    **_rj(os.path.join(index_dir, "manifest.json"))["config"]
                )
                cfg = self._pair_config(manifest_cfg)
            extend_index(
                index_dir, self._input_for(index_id, add_files, "add"),
                config=cfg,
            )
        if self.current_index == index_id:
            self.load_index(index_id)  # reload segments + tombstones

    @staticmethod
    def _doc_ids_for_urls(index_dir: str, urls: list[str]) -> list[int]:
        import pyarrow.dataset as pads

        dset = pads.dataset(os.path.join(index_dir, "docmap"))
        t = dset.to_table(
            columns=["doc_id", "url"], filter=pads.field("url").isin(urls)
        )
        return t.column("doc_id").to_pylist()

    def put_alias(self, alias: str, index_ids: list[str]) -> None:
        """ES index alias: name a set of indices; ``search_alias`` searches
        them as one corpus with exact cross-index stats.  Persisted in
        ``aliases.json`` beside the indices."""
        path = os.path.join(self.base_dir, "aliases.json")
        aliases = {}
        if os.path.exists(path):
            with open(path) as f:
                aliases = json.load(f)
        aliases[alias] = list(index_ids)
        with open(path, "w") as f:
            json.dump(aliases, f)
        stale = self._alias_engines.pop(alias, None)
        if stale is not None:
            for e in stale.engines.values():
                e.close()

    def search_alias(self, alias: str, query_text: str,
                     size: int = 10) -> dict:
        """Ranked search across every index under ``alias`` — one
        MultiIndexEngine (cached per alias) with summed N/df and
        token-weighted avgdl, so scores equal a single union index."""
        from .pipelines.query import MultiIndexEngine

        eng = self._alias_engines.get(alias)
        if eng is None:
            path = os.path.join(self.base_dir, "aliases.json")
            with open(path) as f:
                ids = json.load(f)[alias]
            eng = MultiIndexEngine(
                {
                    i: QueryEngine(self._dir(i), scoring=self.scoring,
                                   k1=self.k1, b=self.b, mode=self.mode)
                    for i in ids
                }
            )
            self._alias_engines[alias] = eng
        return eng.search(query_text, size=size)

    def delete_by_query(self, index_id: str, query_text: str) -> dict:
        """ES _delete_by_query: tombstone every live doc matching a match /
        boolean / wildcard / regexp-routed query.  Searches exclude the
        docs immediately; space + collection stats are reclaimed at
        ``compact()`` (Lucene-style).  The tombstone list is the match
        set — for huge deletions compact promptly."""
        was_current = self.current_index == index_id and self.engine is not None
        eng = (
            self.engine if was_current
            else QueryEngine(self._dir(index_id), num_searchers=0)
        )
        kind, payload = eng._agg_route(query_text)
        parts = eng._fanout("match_ids", kind, payload)
        ids = sorted({int(d) for p in parts for d in p})
        add_tombstones(self._dir(index_id), ids)
        if not was_current:
            eng.close()
        else:
            self.load_index(index_id)  # reload tombstones
        return {"deleted": len(ids)}

    def compact(self, index_id: str) -> None:
        """Make tombstoned deletions physical and refresh collection stats."""
        compact_index(self._dir(index_id))
        if self.current_index == index_id:
            self.load_index(index_id)

    def reindex(self, src_index_id: str, dst_index_id: str,
                config: BuildConfig | None = None) -> None:
        """ES _reindex: build a NEW index from the source index's stored
        ``_source`` (requires the source was built with
        ``store_source=True``) — change analyzer / codec / segmentation /
        facets without the original corpus files.  The source docmap IS
        the corpus: a column-pruned distributed parquet read, so the
        reindex streams exactly like a normal build.  Doc ids are
        re-assigned in docmap-part order (the original order).  Pending
        tombstones must be compacted first (ES reindexes live docs; our
        docmap drops deleted rows at compaction)."""
        import dataclasses

        import pyarrow.dataset as pads

        from .state.manifest import read_json

        src_dir = self._dir(src_index_id)
        manifest = read_json(os.path.join(src_dir, "manifest.json"))
        if manifest.get("tombstones"):
            raise ValueError(
                "source index has pending deletes; compact() before reindex"
            )
        dm_dir = os.path.join(src_dir, "docmap")
        if "source_text" not in pads.dataset(dm_dir).schema.names:
            raise ValueError(
                "source index was built without store_source=True"
            )
        cfg = dataclasses.replace(
            config or self.config,
            text_column="source_text",
            url_column="url",
            lang_column=None,
        )
        parts = sorted(
            os.path.join(dm_dir, f)
            for f in os.listdir(dm_dir)
            if f.endswith(".parquet")
        )
        dst_dir = self._dir(dst_index_id)
        if self.current_index == dst_index_id:
            self._close_engine()
            self.current_index = None
        shutil.rmtree(dst_dir, ignore_errors=True)
        build_index(parts, dst_dir, cfg)

    def refresh(self) -> dict:
        """ES NRT refresh on the loaded index: new segments + tombstones
        become searchable without respawning searcher actors."""
        assert self.engine is not None, "load_index first"
        return self.engine.refresh()

    def merge(self, index_id: str, target_docs: int | None = None) -> dict:
        """Tiered segment merge (Lucene force-merge analogue): consolidate
        the small segments left behind by incremental adds; results and
        stats are invariant, only the segment packaging changes."""
        from .pipelines.build import merge_segments

        res = merge_segments(self._dir(index_id), target_docs=target_docs)
        if self.current_index == index_id:
            self.load_index(index_id)
        return res

    def query(self, query_text: str, size: int = 10) -> str:
        assert self.engine is not None, "load_index first"
        return json.dumps(self.engine.search(query_text, size=size))

    def snapshot(self, index_id: str, dest_dir: str) -> str:
        """ES snapshot: copy the COMMITTED manifest view of the index to
        ``dest_dir`` (``state/snapshot.py::snapshot_index``) — the
        manifest is read once up front, exactly the files it references
        are copied, and the snapshot's own manifest lands LAST, so a
        snapshot taken while an extend/merge runs is the last committed
        view, never a torn one.  Returns the snapshot path."""
        from .state.snapshot import snapshot_index

        src = self._dir(index_id)
        if not os.path.exists(os.path.join(src, "manifest.json")):
            raise ValueError(f"no finished index at {src}")
        tmp = dest_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        snapshot_index(src, tmp)
        shutil.rmtree(dest_dir, ignore_errors=True)
        os.replace(tmp, dest_dir)
        return dest_dir

    def export(self, index_id: str, dest_dir: str,
               kind: str = "postgres") -> dict:
        """Export the index as a datastore bulk load (reference
        ``plot_a_datastore.py``): ``kind='postgres'`` writes COPY parts +
        ``load.sql`` (psql-loadable), ``kind='redis'`` writes RESP
        mass-insertion files (``redis-cli --pipe``).  Returns the export
        manifest."""
        from .ops.datastore_export import export_postgres, export_redis

        src = self._dir(index_id)
        if not os.path.exists(os.path.join(src, "manifest.json")):
            raise ValueError(f"no finished index at {src}")
        if kind == "postgres":
            return export_postgres(src, dest_dir)
        if kind == "redis":
            return export_redis(src, dest_dir)
        raise ValueError(f"unknown export kind {kind!r}")

    def restore(self, snapshot_dir: str, index_id: str) -> None:
        """ES restore: VALIDATE the snapshot inventory (every referenced
        segment + lineage manifest present and self-consistent —
        ``state/snapshot.py::verify_snapshot``) then install it under
        ``index_id`` (replaces any existing index of that id); the
        destination manifest is written last, so an interrupted restore
        never looks committed."""
        from .state.snapshot import restore_index

        dst = self._dir(index_id)
        if self.current_index == index_id:
            self._close_engine()
            self.current_index = None
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        restore_index(snapshot_dir, tmp)
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(tmp, dst)

    def delete_index(self, index_id: str) -> None:
        if self.current_index == index_id:
            self._close_engine()
            self.current_index = None
        shutil.rmtree(self._dir(index_id), ignore_errors=True)

    def list_indices(self) -> list[str]:
        if not os.path.isdir(self.base_dir):
            return []
        return sorted(
            d
            for d in os.listdir(self.base_dir)
            if os.path.exists(os.path.join(self.base_dir, d, "manifest.json"))
        )

    def list_indexed_files(self, index_id: str | None = None) -> list[str]:
        index_dir = self._dir(index_id or self.current_index)
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(index_dir, "docmap"), columns=["doc_id", "url"]
        )
        manifest_path = os.path.join(index_dir, "manifest.json")
        tombs: set[int] = set()
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                tombs = set(json.load(f).get("tombstones", []))
        if not tombs:
            return t.column("url").to_pylist()
        # tombstoned docs are removed, not indexed — don't list them
        return [
            u
            for d, u in zip(
                t.column("doc_id").to_pylist(), t.column("url").to_pylist()
            )
            if d not in tombs
        ]

    def get_stats(self) -> dict:
        assert self.engine is not None, "load_index first"
        return self.engine.get_stats()

    # -- aggregations (beyond the reference contract: ES aggs surface) ----

    def facets(self, query: str, field: str, size: int = 10) -> dict:
        """ES terms aggregation over a build-time facet column
        (``BuildConfig.facet_columns``): per-value doc counts of the FULL
        hit set, ES bucket shape."""
        assert self.engine is not None, "load_index first"
        return self.engine.search_facets(query, field, size=size)

    def stats(self, query: str, field: str) -> dict:
        """ES stats aggregation (count/sum/min/max/avg) of an integer
        facet column over the full hit set."""
        assert self.engine is not None, "load_index first"
        return self.engine.search_stats(query, field)

    def get_doc(self, doc_id: int) -> dict | None:
        """ES GET /index/_doc/{id}: url + stored _source (requires
        ``store_source=True`` at build time for the source field)."""
        assert self.engine is not None, "load_index first"
        return self.engine.get_doc(doc_id)

    def mget(self, doc_ids: list[int]) -> list[dict]:
        """ES _mget: all requested docs in one bounded docmap predicate
        read; absent/tombstoned ids report found=False in order."""
        assert self.engine is not None, "load_index first"
        return self.engine.mget(doc_ids)

    def validate_query(self, query: str) -> dict:
        """ES _validate/query: parse-check a query (analyzer + boolean
        RPN compile) without executing it."""
        assert self.engine is not None, "load_index first"
        return self.engine.validate_query(query)

    def field_caps(self) -> dict:
        """ES _field_caps: docmap doc-value columns with type /
        aggregatability — one schema read."""
        assert self.engine is not None, "load_index first"
        return self.engine.field_caps()

    def highlight(self, query: str, size: int = 10,
                  before: int = 3, after: int = 3) -> dict:
        """ES highlight: per-hit ``<em>``-tagged fragments around the first
        occurrence of each analyzed query term (requires store_source)."""
        assert self.engine is not None, "load_index first"
        return self.engine.highlight(query, size=size, before=before,
                                     after=after)

    def histogram(self, query: str, field: str, interval: int,
                  min_doc_count: int = 1) -> dict:
        """ES histogram aggregation: fixed-interval buckets with exact doc
        counts over the full hit set of ``query``."""
        assert self.engine is not None, "load_index first"
        return self.engine.search_histogram(query, field, interval,
                                            min_doc_count=min_doc_count)

    def percentiles(self, query: str, field: str,
                    percents: tuple = (25.0, 50.0, 75.0, 95.0, 99.0),
                    method: str = "exact") -> dict:
        """ES percentiles aggregation.  ``method='exact'``: discrete
        nearest-rank values (SQL ``percentile_disc``) from per-searcher
        value-count maps — exact, but actor->driver traffic is
        O(distinct values).  ``method='approx'``: centroid-digest sketch
        (ES's own percentiles are t-digest) — fixed per-searcher payload,
        rank error <= ~n/4096; the 100 TB path for unbounded fields."""
        assert self.engine is not None, "load_index first"
        if method == "approx":
            return self.engine.search_percentiles_approx(
                query, field, percents=percents
            )
        return self.engine.search_percentiles(query, field, percents=percents)

    def cardinality(self, query: str, field: str,
                    method: str = "exact") -> dict:
        """ES cardinality aggregation.  ``method='exact'``: distinct count
        from per-searcher value sets.  ``method='approx'``: HyperLogLog
        (ES's own cardinality is HLL++) — fixed 16 KB per searcher,
        ~0.8% standard error; the 100 TB path for unbounded fields."""
        assert self.engine is not None, "load_index first"
        if method == "approx":
            return self.engine.search_cardinality_approx(query, field)
        return self.engine.search_cardinality(query, field)

    def explain(self, query: str, doc_id: int) -> dict:
        """ES GET /index/_explain/{id}: per-term score breakdown (tf,
        df, idf, repetition count, contribution) of one doc against a
        ranked query; ``score`` sums to the search score."""
        assert self.engine is not None, "load_index first"
        return self.engine.explain(query, doc_id)

    def suggest_phrase(self, text: str, size: int = 5,
                       max_edits: int = 1, per_word: int = 3) -> dict:
        """ES phrase suggester (deterministic variant): whole-phrase
        did-you-mean built from per-word fuzzy dictionary candidates,
        ranked (total edit distance, df sum desc, phrase)."""
        assert self.engine is not None, "load_index first"
        return self.engine.suggest_phrase(text, size=size,
                                          max_edits=max_edits,
                                          per_word=per_word)

    def range_query(self, query: str | None, field: str,
                    gte: int | None = None, lte: int | None = None,
                    size: int = 10) -> dict:
        """ES range query over an integer facet column, optionally
        intersected with a match/boolean/wildcard query (None =
        match_all); filter-context shape (doc_id asc, unscored)."""
        assert self.engine is not None, "load_index first"
        return self.engine.search_range(query, field, gte=gte, lte=lte,
                                        size=size)
