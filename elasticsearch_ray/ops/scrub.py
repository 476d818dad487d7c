"""Privacy scrubbing and benchmark decontamination for training corpora.

Two first-class LLM-data-pipeline stages the reference engine has no
counterpart for (SURVEY training-data axis):

- :func:`pii_scrub` — redact personally identifying spans (emails, phone
  numbers, IPv4 addresses) with typed placeholder tokens, fully
  vectorized: chained RE2 ``replace_substring_regex`` kernels over the
  Arrow string column, zero Python per row.  The pattern set is the
  standard public scrub family (C4/The-Pile-style cleaning).

- :func:`decontaminate` — drop documents that share any ``n``-token
  shingle with a benchmark/eval corpus (the industry-standard n-gram
  decontamination from the GPT-3 appendix: 13-gram overlap).  The
  contamination shingle-hash array is built ONCE and broadcast via
  ``ray.put``; every actor fetches it once in ``__init__`` and each
  batch is one vectorized pipeline — Arrow lower/strip/split, one blake
  hash per UNIQUE token (dictionary-encoded), wrapping-uint64 polynomial
  shingle hashes over the flat token stream, ``np.isin`` membership.
  No shuffle, no per-batch reshipping, no Python loop over tokens.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# RE2-safe patterns (no backrefs / lookbehinds): applied IN ORDER — email
# before phone so the digits of 'user123@x.com' can't half-match a phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # label, RE2 pattern, replacement
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # international-ish phone: optional +CC, separators, 7+ digits total
    ("phone",
     r"\+?[0-9]{1,3}[ .\-]?\(?[0-9]{2,4}\)?[ .\-][0-9]{3,4}[ .\-][0-9]{3,4}"
     r"|\+[0-9]{7,15}",
     "<PHONE>"),
]


def pii_scrub(
    ds: ray.data.Dataset,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: list[tuple[str, str, str]] | None = None,
) -> ray.data.Dataset:
    """Redact PII spans in ``text_col`` (in place, or into ``out_col``),
    appending a per-document ``pii_hits`` count (redactions applied) so
    downstream quality filters can drop PII-dense documents."""
    pats = patterns if patterns is not None else PII_PATTERNS
    target = out_col or text_col

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cur = pc.fill_null(col, "")
        hits = np.zeros(len(cur), dtype=np.int64)
        for _label, pat, repl in pats:
            n_before = pc.count_substring_regex(cur, pattern=pat)
            hits += n_before.to_numpy(zero_copy_only=False).astype(np.int64)
            cur = pc.replace_substring_regex(
                cur, pattern=pat, replacement=repl
            )
        out = batch
        # drop BOTH columns we are about to append (re-scrubbing
        # already-scrubbed output must not create duplicate names)
        drop = [c for c in (target, "pii_hits") if c in out.column_names]
        if drop:
            out = out.drop_columns(drop)
        return out.append_column(target, cur).append_column(
            "pii_hits", pa.array(hits, pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# fixed wrapping-uint64 polynomial coefficients for shingle hashing: the
# SAME formula must run on the eval side and the corpus side, so the
# multipliers are module constants (odd -> invertible mod 2^64)
_SHINGLE_BASE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _shingle_coeffs(n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(n - 1, -1, -1):
            out[i] = acc
            acc = acc * _SHINGLE_BASE
    return out


def _token_hash(tok: str) -> int:
    """Canonical 64-bit token hash (blake2b — stable across processes,
    unlike salted ``hash()``)."""
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
    )


def _normalize_arrow(col) -> pa.Array:
    """Decontamination canonicalization, Arrow-vectorized: lowercase and
    collapse every non-alphanumeric run to one space (so punctuation and
    casing can't hide an overlap — the GPT-3 appendix-C style)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    cur = pc.fill_null(col, "")
    cur = pc.utf8_lower(cur)
    return pc.replace_substring_regex(
        cur, pattern=r"[^a-z0-9]+", replacement=" "
    )


def _shingle_hashes_flat(
    norm: pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All n-token shingle hashes of a batch of normalized texts.

    Returns ``(hashes, doc_idx)`` — one uint64 polynomial hash per
    shingle plus the row each came from; shingles never cross document
    boundaries.  One blake hash per UNIQUE surface token (dictionary
    encode), everything else numpy."""
    tok = pc.split_pattern_regex(norm, pattern=" +")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    n_tok = (
        pc.fill_null(pc.list_value_length(tok), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(tok)
    enc = flat.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    # '' artifacts from leading/trailing separator runs hash like any
    # token WOULD skew shingles — map them out by position instead:
    # normalized text always splits to words + possibly '' at the ends.
    tok_h = np.array(
        [_token_hash(u) if u else 0 for u in uniq], dtype=np.uint64
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.array([bool(u) for u in uniq], dtype=bool)[codes]
    doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)[keep]
    stream = tok_h[codes[keep]]
    if stream.size < n:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(stream, n)
    coeffs = _shingle_coeffs(n)
    with np.errstate(over="ignore"):
        h = (win * coeffs[None, :]).sum(axis=1, dtype=np.uint64)
    # a window is valid only when it stays inside one document
    same_doc = doc_idx[: stream.size - n + 1] == doc_idx[n - 1 :]
    return h[same_doc], doc_idx[: stream.size - n + 1][same_doc]


def contamination_hashes(eval_texts: list[str], n: int = 13) -> np.ndarray:
    """Sorted unique shingle-hash array for the eval/benchmark corpus —
    built once on the driver (eval sets are small) and broadcast with
    ``ray.put``.  Same normalization + hash formula as the corpus side."""
    norm = _normalize_arrow(pa.array(eval_texts, pa.string()))
    h, _ = _shingle_hashes_flat(norm, n)
    return np.unique(h)


class _Decontaminator:
    """Actor-pool stage: the broadcast hash array is fetched ONCE per
    actor in ``__init__`` (one plasma copy per node, not per task)."""

    def __init__(self, contamination_ref, text_col: str, n: int):
        self.contaminated = ray.get(contamination_ref)  # sorted uint64
        self.text_col = text_col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = _normalize_arrow(batch.column(self.text_col))
        h, doc_idx = _shingle_hashes_flat(norm, self.n)
        overlaps = np.zeros(batch.num_rows, dtype=np.int64)
        if h.size and self.contaminated.size:
            idx = np.searchsorted(self.contaminated, h, side="left")
            hit = idx < self.contaminated.size
            hit &= self.contaminated[idx.clip(0, self.contaminated.size - 1)] == h
            if hit.any():
                np.add.at(overlaps, doc_idx[hit], 1)
        out = batch
        drop = [c for c in ("contaminated", "overlap_ngrams")
                if c in out.column_names]
        if drop:
            out = out.drop_columns(drop)
        return out.append_column(
            "contaminated", pa.array(overlaps > 0)
        ).append_column("overlap_ngrams", pa.array(overlaps, pa.int64()))


def decontaminate(
    ds: ray.data.Dataset,
    eval_texts: list[str],
    text_col: str = "text",
    n: int = 13,
    keep_clean_only: bool = True,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """GPT-3-style n-gram decontamination: mark (and by default drop)
    documents sharing any ``n``-token shingle with ``eval_texts``.

    The shingle-hash array ships by broadcast (``ray.put`` once,
    ``ray.get`` once per actor) — never per batch; the corpus streams
    through an actor pool with no shuffle, and the drop filter is an
    Arrow mask, not a per-row Python predicate."""
    ref = ray.put(contamination_hashes(eval_texts, n))
    out = ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(ref, text_col, n),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if keep_clean_only:
        out = out.map_batches(
            lambda t: t.filter(pc.invert(t.column("contaminated"))),
            batch_format="pyarrow",
        )
    return out
