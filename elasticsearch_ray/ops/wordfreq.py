"""Word-frequency / Zipf analysis pipeline (reference M1/M9/K5/A8:
``preprocess_data.py:54-55,74-108,239-269``).

The reference accumulates two global Counters over the whole corpus in one
process; here the same numbers come from a flat-map to tokens plus a
``groupby(token).count()`` shuffle, streaming end-to-end.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from ..normalizer import make_normalizer

_RAW_TOKEN_RE = re.compile(r"\b\w+\b")


class _Tokens:
    """Actor-pool stage: text batch -> PARTIAL (token, n) counts.

    Map-side combiner: the batch's token stream is counted locally (one
    ``np.unique`` over dictionary codes), so the ``groupby(token)``
    exchange moves one row per distinct token per batch — not one row per
    corpus token (at 100 TB the raw-token explode would shuffle ~10^13
    rows; distinct-per-batch is bounded by batch vocabulary)."""

    def __init__(self, text_col: str, preprocessed: bool, analyzer: str):
        self.text_col = text_col
        self.preprocessed = preprocessed
        self.normalizer = make_normalizer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..normalizer.tokenize import tokenize_rows_flat

        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        if self.preprocessed:
            cleaned = self.normalizer.clean_batch(texts)
            _, codes, terms = tokenize_rows_flat(self.normalizer, cleaned)
            if len(codes) == 0:
                return pa.table(
                    {
                        "token": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            counts = np.bincount(codes, minlength=len(terms))
            return pa.table(
                {
                    "token": pa.array(terms, pa.string()),
                    "n": pa.array(counts.astype(np.int64)),
                }
            )
        # reference raw tokenizer: re.findall(r'\b\w+\b', text.lower())
        toks: list[str] = []
        for t in texts:
            toks.extend(_RAW_TOKEN_RE.findall(t.lower()))
        arr = pa.array(toks, pa.string())
        denc = arr.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(idx, minlength=len(denc.dictionary))
        return pa.table(
            {
                "token": denc.dictionary.cast(pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )


def token_frequencies(
    ds: ray.data.Dataset,
    text_col: str = "text",
    preprocessed: bool = False,
    analyzer: str = "reference",
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """(token, n) frequency table — the Counter equivalent."""
    toks = ds.map_batches(
        _Tokens,
        fn_constructor_kwargs=dict(
            text_col=text_col, preprocessed=preprocessed, analyzer=analyzer
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    counts = toks.groupby("token").sum("n")
    # select by NAME (not positional rename): aggregate column order is a
    # version-dependent trap — see build.py _finalize
    return counts.map_batches(
        lambda t: pa.table(
            {
                "token": t.column("token"),
                "n": t.column("sum(n)").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _local_topn(batch: pa.Table, top_n: int) -> pa.Table:
    """Vectorized per-block top-N by (-n, token): at most ``top_n`` rows
    leave each frequency block, so the driver merge sees O(top_n * blocks)
    rows — never the vocabulary."""
    if batch.num_rows <= top_n:
        return batch
    import numpy as np

    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    toks = np.asarray(batch.column("token").to_pylist(), dtype=object)
    keep = np.lexsort((toks, -n))[:top_n]
    return batch.take(pa.array(np.sort(keep)))


def top_words(
    ds: ray.data.Dataset, top_n: int = 30, **kwargs
) -> pa.Table:
    """``Counter.most_common(top_n)`` equivalent (reference K5), with the
    deterministic (-n, token) tie-break.

    Each token lands in exactly one post-groupby block, so a per-block
    local top-N is lossless; the driver only ever holds top_n rows per
    block (at web scale the full distinct-token table is 10^8-10^9 rows
    of typo/numeric junk that must never be materialized driver-side)."""
    freq = token_frequencies(ds, **kwargs)
    rows = freq.map_batches(
        lambda t: _local_topn(t, top_n), batch_format="pyarrow"
    ).take_all()
    rows.sort(key=lambda r: (-r["n"], r["token"]))
    rows = rows[:top_n]
    return pa.table(
        {
            "token": pa.array([r["token"] for r in rows], pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
        }
    )


def corpus_token_stats(ds: ray.data.Dataset, **kwargs) -> pa.Table:
    """Reference A8 (``preprocess_data.py:252-266``): unique tokens, total
    tokens, average token length — computed from the frequency table, never
    materializing the token stream driver-side."""
    freq = token_frequencies(ds, **kwargs)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.column("n")
        tok_len = pc.utf8_length(batch.column("token"))
        return pa.table(
            {
                "unique": pa.array([batch.num_rows], pa.int64()),
                "total": pa.array([pc.sum(n).as_py() or 0], pa.int64()),
                "len_sum": pa.array(
                    [pc.sum(pc.multiply(tok_len.cast(pa.int64()), n)).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    parts = freq.map_batches(partial, batch_format="pyarrow").take_all()
    unique = sum(r["unique"] for r in parts)
    total = sum(r["total"] for r in parts)
    len_sum = sum(r["len_sum"] for r in parts)
    return pa.table(
        {
            "unique_tokens": pa.array([unique], pa.int64()),
            "total_tokens": pa.array([total], pa.int64()),
            "avg_token_len": pa.array(
                [len_sum / total if total else 0.0], pa.float64()
            ),
        }
    )
