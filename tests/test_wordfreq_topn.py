"""top_words must never materialize the vocabulary driver-side: each
post-groupby block contributes at most top_n rows, and the merged result
still equals Counter.most_common with the (-n, token) tie-break."""

from collections import Counter

import pyarrow as pa
import ray.data

from elasticsearch_ray.ops.wordfreq import _local_topn, top_words


def test_local_topn_bounds_and_order():
    tbl = pa.table(
        {
            "token": pa.array([f"t{i:04d}" for i in range(500)]),
            "n": pa.array([i % 7 + 1 for i in range(500)], pa.int64()),
        }
    )
    out = _local_topn(tbl, 10)
    assert out.num_rows == 10
    rows = sorted(
        zip(out.column("n").to_pylist(), out.column("token").to_pylist()),
        key=lambda r: (-r[0], r[1]),
    )
    exp = sorted(
        zip(tbl.column("n").to_pylist(), tbl.column("token").to_pylist()),
        key=lambda r: (-r[0], r[1]),
    )[:10]
    assert rows == exp
    # small blocks pass through untouched
    assert _local_topn(tbl.slice(0, 3), 10).num_rows == 3


def test_top_words_matches_counter(ray_session):
    import random

    rng = random.Random(13)
    vocab = [f"w{i:03d}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40)))
        for _ in range(400)
    ]
    c: Counter = Counter()
    for t in texts:
        c.update(t.split())
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    ds = ray.data.from_items([{"text": t} for t in texts])
    got = top_words(ds, top_n=25, preprocessed=False)
    assert list(
        zip(got.column("token").to_pylist(), got.column("n").to_pylist())
    ) == exp
