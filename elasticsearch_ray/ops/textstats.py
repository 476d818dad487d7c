"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  Each is a vectorized-per-batch ``map_batches``
transform over a documents Dataset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..normalizer import ENGLISH_STOPWORDS

# Tiny per-language marker profiles (top function words) for the n-gram /
# stopword-hit language heuristic.  Public knowledge, vendored.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "are", "this", "you", "have"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "ich", "von", "den", "zu", "auf", "für"},
    "fr": {"le", "la", "les", "et", "est", "pas", "des", "une", "un", "que",
           "qui", "dans", "pour", "sur", "avec"},
}

_BPE_ISH = r"[a-zA-Z]+|[0-9]{1,3}|[^\sa-zA-Z0-9]"


def language_id(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Heuristic language ID by function-word hits; 'und' (undetermined) when
    no marker matches."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        langs = []
        for t in texts:
            words = set((t or "").lower().split())
            scores = {
                lang: len(words & markers) for lang, markers in _LANG_MARKERS.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            langs.append(best if scores[best] > 0 else "und")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "lang_pred": pa.array(langs, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def token_counts(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Whitespace token count + BPE-ish regex token count per doc."""
    import re

    pat = re.compile(_BPE_ISH)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ws = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
        bpe = np.array([len(pat.findall(t or "")) for t in texts], dtype=np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "ws_tokens": pa.array(ws),
                "bpe_tokens": pa.array(bpe),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_feature_arrays(texts: list[str | None]) -> dict[str, np.ndarray]:
    """Per-text quality features + composite score (Gopher/C4-style,
    simplified).  Shared kernel for :func:`quality_scores` and the composed
    curation pipeline's inline filter."""
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_words = np.zeros(n, dtype=np.int64)
    stop_ratio = np.zeros(n)
    punct_ratio = np.zeros(n)
    digit_ratio = np.zeros(n)
    mean_wlen = np.zeros(n)
    for i, t in enumerate(texts):
        t = t or ""
        words = t.split()
        n_chars[i] = len(t)
        n_words[i] = len(words)
        if words:
            lw = [w.lower() for w in words]
            stop_ratio[i] = sum(1 for w in lw if w in ENGLISH_STOPWORDS) / len(words)
            mean_wlen[i] = sum(len(w) for w in words) / len(words)
        if t:
            punct_ratio[i] = sum(1 for c in t if not c.isalnum() and not c.isspace()) / len(t)
            digit_ratio[i] = sum(1 for c in t if c.isdigit()) / len(t)
    len_score = np.clip(n_words / 50.0, 0, 1)
    wlen_score = np.where((mean_wlen >= 3) & (mean_wlen <= 10), 1.0, 0.5)
    punct_score = 1.0 - np.clip(punct_ratio * 4, 0, 1)
    digit_score = 1.0 - np.clip(digit_ratio * 4, 0, 1)
    score = (len_score + wlen_score + punct_score + digit_score) / 4.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "mean_word_len": mean_wlen,
        "quality": score,
    }


def quality_scores(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Heuristic quality features + a composite score in [0, 1]:
    length norm, stopword ratio, punctuation ratio, digit ratio, mean word
    length sanity.  (Gopher/C4-style filters, simplified.)"""

    def fn(batch: pa.Table) -> pa.Table:
        feats = quality_feature_arrays(batch.column(text_col).to_pylist())
        cols = {id_col: batch.column(id_col)}
        cols.update({k: pa.array(v) for k, v in feats.items()})
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    base: int = 257,
    mod: int = (1 << 31) - 1,  # Mersenne prime; keeps int64 math overflow-free
) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: minimum Rabin-Karp rolling hash
    over byte windows (plus the full-doc hash)."""

    # constant per (window, base, mod) — not per document
    powers = np.array(
        [pow(base, e, mod) for e in range(window - 1, -1, -1)], dtype=np.int64
    )

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib

        texts = batch.column(text_col).to_pylist()
        mins = np.zeros(len(texts), dtype=np.int64)
        fulls = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            data = (t or "").encode()
            fulls[i] = int.from_bytes(
                hashlib.blake2b(data, digest_size=8).digest(), "little"
            ) >> 1
            if len(data) < window:
                mins[i] = fulls[i]
                continue
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
            # vectorized rolling hash: h_j = sum arr[j+t]*base^(w-1-t) mod m
            # sliding windows via stride trick
            win = np.lib.stride_tricks.sliding_window_view(arr, window)
            h = (win * powers[None, :] % mod).sum(axis=1) % mod
            mins[i] = int(h.min())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fp_min": pa.array(mins),
                "fp_full": pa.array(fulls),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
