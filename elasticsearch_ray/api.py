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

    def _input_for(self, index_id: str, files, tag: str):
        if isinstance(files, (str, list)) and (
            not isinstance(files, list) or all(isinstance(f, str) for f in files)
        ):
            return files  # parquet path(s)
        scratch = os.path.join(self._dir(index_id), f"_input_{tag}.parquet")
        return self._files_to_parquet(files, scratch)

    def _close_engine(self):
        if self.engine is not None:
            self.engine.close()
            self.engine = None

    # -- IndexBase contract ------------------------------------------------

    def create_index(self, index_id: str, files=None) -> None:
        import dataclasses

        if files is None:
            raise ValueError("create_index requires files or a parquet path")
        index_dir = self._dir(index_id)
        # "Creates an index for the given files" (index_base.py:41-46): a
        # FINISHED pre-existing index under this id must not leak through —
        # purge it so resume logic can't skip the new build and serve stale
        # segments.  A dir WITHOUT manifest.json is a crashed build of this
        # same id: keep it so the build's segment-level resume still works.
        if self.current_index == index_id:
            self._close_engine()
            self.current_index = None
        if os.path.exists(os.path.join(index_dir, "manifest.json")):
            shutil.rmtree(index_dir, ignore_errors=True)
        cfg = self.config
        if files is not None and not isinstance(files, (str,)):
            cfg = dataclasses.replace(
                self.config, url_column="url", lang_column=None
            )
        build_index(self._input_for(index_id, files, "create"), index_dir, cfg)
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
            extend_index(
                index_dir, self._input_for(index_id, add_files, "add")
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

    def compact(self, index_id: str) -> None:
        """Make tombstoned deletions physical and refresh collection stats."""
        compact_index(self._dir(index_id))
        if self.current_index == index_id:
            self.load_index(index_id)

    def query(self, query_text: str, size: int = 10) -> str:
        assert self.engine is not None, "load_index first"
        return json.dumps(self.engine.search(query_text, size=size))

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

        t = pq.read_table(os.path.join(index_dir, "docmap"), columns=["url"])
        return t.column("url").to_pylist()

    def get_stats(self) -> dict:
        assert self.engine is not None, "load_index first"
        return self.engine.get_stats()
