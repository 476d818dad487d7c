"""Regression: block-max WAND's skip branch must treat cursors TIED at the
pivot doc as part of the involved set (their UBs count, and they must advance
with the group) and may not jump past the next cursor's doc.  The original
code missed both and silently dropped true top-k docs on dense
co-occurrence corpora."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dense_engine(tmp_path_factory):
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(5)
    texts = []
    for _ in range(2000):
        words = []
        if rng.random() < 0.9:
            words += ["aaa"] * rng.randint(1, 8)
        if rng.random() < 0.9:
            words += ["bbb"] * rng.randint(1, 8)
        if rng.random() < 0.3:
            words += ["ccc"] * rng.randint(1, 4)
        words += [f"filler{rng.randint(0, 50)}" for _ in range(rng.randint(5, 30))]
        rng.shuffle(words)
        texts.append(" ".join(words))
    d = tmp_path_factory.mktemp("wandbug")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string())}), src, row_group_size=250
    )
    idx = str(d / "idx")
    build_index(
        src,
        idx,
        BuildConfig(
            target_partition_rows=250,
            docs_per_segment=2000,
            url_column=None,
            lang_column=None,
        ),
    )
    eng = QueryEngine(idx, num_searchers=0)
    yield eng
    eng.close()


def test_wand_tied_pivot_blockmax(dense_engine):
    for q in [
        "aaa bbb", "aaa bbb ccc", "bbb ccc", "aaa ccc", "aaa aaa bbb",
        "aaa bbb ccc filler1", "filler2 aaa bbb",
    ]:
        for k in (1, 3, 10, 25):
            a = dense_engine.search(q, size=k, mode="taat")["results"]
            b = dense_engine.search(q, size=k, mode="wand")["results"]
            assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b], (q, k)
            for x, y in zip(a, b):
                assert abs(x["score"] - y["score"]) <= 1e-9
