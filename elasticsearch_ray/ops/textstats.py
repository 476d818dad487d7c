"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  Each is a vectorized-per-batch ``map_batches``
transform over a documents Dataset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..normalizer import ENGLISH_STOPWORDS

# --- byte-class lookup tables for the ASCII fast path -----------------------
# Texts whose every byte is printable ASCII or common whitespace take a fully
# vectorized numpy path (byte-class masks + cumsum segment sums, O(bytes) in
# C); anything else (unicode, rare control chars where Python's str.split /
# isalnum semantics differ from the ASCII tables) falls back to the original
# per-text Python kernel.  Same ASCII-routing pattern as
# normalizer.clean_batch; outputs are bit-identical either way.
_WS_BYTES = (9, 10, 11, 12, 13, 32)
_ELIGIBLE = np.zeros(256, dtype=bool)
_ELIGIBLE[33:127] = True
_ELIGIBLE[list(_WS_BYTES)] = True
_IS_SPACE = np.zeros(256, dtype=bool)
_IS_SPACE[list(_WS_BYTES)] = True
_IS_DIGIT = np.zeros(256, dtype=bool)
_IS_DIGIT[48:58] = True
_IS_ALNUM = _IS_DIGIT.copy()
_IS_ALNUM[65:91] = True
_IS_ALNUM[97:123] = True

_STOP_ARR = pa.array(sorted(ENGLISH_STOPWORDS), pa.string())


def _string_view(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Zero-copy (array, data_bytes, offsets) view of a string column;
    accepts Array / ChunkedArray / list.  Nulls become ''."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    elif not isinstance(col, pa.Array):
        col = pa.array([t if t is not None else "" for t in col], pa.string())
    if col.null_count:
        col = pc.fill_null(col, "")
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return col, data, offs


def _seg_sum(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-text sums of a per-byte (or per-token) bool/int mask, segmented by
    ``offs`` — cumsum-based so empty segments are handled exactly."""
    c = np.zeros(mask.size + 1, dtype=np.int64)
    np.cumsum(mask, dtype=np.int64, out=c[1:])
    return c[offs[1:]] - c[offs[:-1]]


def _word_stats(data: np.ndarray, offs: np.ndarray, space: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """(n_words, nonspace_chars) per text: words are maximal nonspace runs,
    exactly str.split() on the ASCII-eligible byte set."""
    ns = ~space
    starts = np.empty_like(ns)
    if ns.size:
        starts[0] = ns[0]
        np.logical_and(ns[1:], ~ns[:-1], out=starts[1:])
        # a run crossing a text boundary starts a NEW word in the next text
        b = offs[:-1][offs[:-1] < ns.size]
        starts[b] = ns[b]
    n_words = _seg_sum(starts, offs)
    nonspace = _seg_sum(ns, offs)
    return n_words, nonspace


def _token_seg(sarr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """ASCII-whitespace tokens of each text: (flat lowercase token array,
    per-text list offsets).  Boundary empties from ascii_split_whitespace are
    harmless for membership tests (never match a real word)."""
    tok = pc.ascii_split_whitespace(sarr)
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    loffs = np.frombuffer(tok.buffers()[1], dtype=np.int32)[
        tok.offset : tok.offset + len(tok) + 1
    ].astype(np.int64)
    loffs = loffs - loffs[0]  # flatten() yields values relative to the slice
    flat = pc.ascii_lower(tok.flatten())
    return flat, loffs

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


_LANGS_SORTED = sorted(_LANG_MARKERS)  # tie-break = lexicographically largest
_MARKER_WORDS = [
    (w, li) for li, lang in enumerate(_LANGS_SORTED)
    for w in sorted(_LANG_MARKERS[lang])
]
_MARKER_ARR = pa.array([w for w, _ in _MARKER_WORDS], pa.string())
_MARKER_LANG = np.array([li for _, li in _MARKER_WORDS], dtype=np.int64)


def _langid_py(t: str | None) -> str:
    words = set((t or "").lower().split())
    scores = {lang: len(words & markers) for lang, markers in _LANG_MARKERS.items()}
    best = max(scores, key=lambda k: (scores[k], k))
    return best if scores[best] > 0 else "und"


def language_id(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Heuristic language ID by DISTINCT function-word hits; 'und'
    (undetermined) when no marker matches.

    Vectorized: tokens -> ``index_in`` against the 45-marker vocabulary ->
    unique (text, marker) pairs -> per-language bincount; argmax with the
    (score, lang) tie-break.  Non-ASCII texts fall back to the per-text
    Python kernel (identical semantics)."""

    def fn(batch: pa.Table) -> pa.Table:
        sarr, data, offs = _string_view(batch.column(text_col))
        n = len(sarr)
        eligible = _seg_sum(~_ELIGIBLE[data], offs) == 0
        flat, loffs = _token_seg(sarr)
        idx = pc.fill_null(pc.index_in(flat, value_set=_MARKER_ARR), -1)
        idxn = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        text_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(loffs))
        valid = idxn >= 0
        pairs = np.unique(text_id[valid] * 64 + idxn[valid])
        counts = np.zeros((n, len(_LANGS_SORTED)), dtype=np.int64)
        np.add.at(counts, (pairs // 64, _MARKER_LANG[pairs % 64]), 1)
        # ties pick the largest lang index == lexicographically largest lang
        best = counts.shape[1] - 1 - np.argmax(counts[:, ::-1], axis=1)
        score = counts[np.arange(n), best]
        langs = np.where(
            score > 0, np.array(_LANGS_SORTED, dtype=object)[best], "und"
        ).tolist()
        if not eligible.all():
            texts = sarr.to_pylist()
            for i in np.flatnonzero(~eligible):
                langs[i] = _langid_py(texts[i])
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


def _quality_py_row(t: str | None) -> tuple[int, int, float, float, float, float]:
    """Original per-text kernel; the exact-semantics fallback for texts the
    ASCII fast path can't take (unicode / rare control chars)."""
    t = t or ""
    words = t.split()
    n_chars, n_words = len(t), len(words)
    stop_ratio = punct_ratio = digit_ratio = mean_wlen = 0.0
    if words:
        lw = [w.lower() for w in words]
        stop_ratio = sum(1 for w in lw if w in ENGLISH_STOPWORDS) / len(words)
        mean_wlen = sum(len(w) for w in words) / len(words)
    if t:
        punct_ratio = sum(1 for c in t if not c.isalnum() and not c.isspace()) / len(t)
        digit_ratio = sum(1 for c in t if c.isdigit()) / len(t)
    return n_chars, n_words, stop_ratio, punct_ratio, digit_ratio, mean_wlen


def quality_feature_arrays(texts) -> dict[str, np.ndarray]:
    """Per-text quality features + composite score (Gopher/C4-style,
    simplified).  Shared kernel for :func:`quality_scores` and the composed
    curation pipeline's inline filter.  Accepts a pyarrow string
    Array/ChunkedArray (zero-copy fast path) or a list of str.

    Vectorized over the batch's raw UTF-8 bytes: byte-class lookup tables +
    cumsum segment sums give char/punct/digit counts, nonspace-run starts
    give word counts, and Arrow ``is_in`` against the stopword vocabulary
    gives stopword hits — no per-character Python.  Texts containing
    non-ASCII or unusual control bytes (where Python's str semantics differ)
    are recomputed with the original per-text kernel, so outputs are
    bit-identical to the pure-Python version."""
    sarr, data, offs = _string_view(texts)
    n = len(sarr)
    n_bytes = offs[1:] - offs[:-1]
    eligible = _seg_sum(~_ELIGIBLE[data], offs) == 0
    space_mask = _IS_SPACE[data]
    n_chars = n_bytes.copy()
    alnum = _seg_sum(_IS_ALNUM[data], offs)
    digits = _seg_sum(_IS_DIGIT[data], offs)
    spaces = _seg_sum(space_mask, offs)
    punct = n_bytes - alnum - spaces
    n_words, nonspace = _word_stats(data, offs, space_mask)
    # stopword hits over lowercase ASCII tokens (empty boundary tokens from
    # ascii_split_whitespace never match a stopword)
    flat, loffs = _token_seg(sarr)
    hits = pc.is_in(flat, value_set=_STOP_ARR).to_numpy(zero_copy_only=False)
    stop_hits = _seg_sum(hits, loffs)
    wsafe = np.maximum(n_words, 1)
    csafe = np.maximum(n_bytes, 1)
    stop_ratio = np.where(n_words > 0, stop_hits / wsafe, 0.0)
    mean_wlen = np.where(n_words > 0, nonspace / wsafe, 0.0)
    punct_ratio = np.where(n_bytes > 0, punct / csafe, 0.0)
    digit_ratio = np.where(n_bytes > 0, digits / csafe, 0.0)
    if not eligible.all():
        tl = sarr.to_pylist()
        for i in np.flatnonzero(~eligible):
            (n_chars[i], n_words[i], stop_ratio[i], punct_ratio[i],
             digit_ratio[i], mean_wlen[i]) = _quality_py_row(tl[i])
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
        feats = quality_feature_arrays(batch.column(text_col))
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


def repetition_stats(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Gopher-style repetition quality signals per document (the
    repetition-removal family of web-corpus filters): whitespace token
    count, distinct-token ratio, and the fraction of the doc's bigrams
    taken by its single most repeated bigram.  Fully vectorized per
    batch: one dictionary-encode of the flat token stream, composite
    (doc, code) keys, one sort + run-length pass — no per-document
    python.  Ratios ship as floor(x*1e6+0.5) micro-units (the repo-wide
    hash-safe convention)."""

    def fn(batch: pa.Table) -> pa.Table:
        sarr = batch.column(text_col)
        if isinstance(sarr, pa.ChunkedArray):
            sarr = sarr.combine_chunks()
        n = len(sarr)
        tok = pc.split_pattern(sarr, pattern=" ")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        # per-list lengths via the compute kernel, not raw buffer reads:
        # split_pattern may yield list<int32> or large_list<int64> offsets
        # (e.g. large_string input after combine_chunks on >2GB data), and
        # null rows must contribute zero tokens.  list_flatten skips null
        # slots' children, so lengths (null->0) and the flat stream agree.
        n_tok = (
            pc.fill_null(pc.list_value_length(tok), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(tok)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = max(len(enc.dictionary), 1)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_tok)
        # distinct tokens per doc: unique composite (doc, code) keys
        if codes.size:
            key = np.sort(doc_idx * v + codes)
            new = np.empty(key.size, dtype=bool)
            new[0] = True
            new[1:] = key[1:] != key[:-1]
            distinct = np.bincount(key[new] // v, minlength=n)
        else:
            distinct = np.zeros(n, dtype=np.int64)
        # most-repeated-bigram count per doc: run lengths over sorted
        # (doc, code_i * V + code_{i+1})
        max_bg = np.zeros(n, dtype=np.int64)
        n_bg = np.zeros(n, dtype=np.int64)
        if codes.size > 1:
            same = doc_idx[1:] == doc_idx[:-1]
            bdoc = doc_idx[:-1][same]
            bkey = codes[:-1][same] * v + codes[1:][same]
            if bdoc.size:
                order = np.lexsort((bkey, bdoc))
                sd, sk = bdoc[order], bkey[order]
                ng = np.empty(sd.size, dtype=bool)
                ng[0] = True
                ng[1:] = (sd[1:] != sd[:-1]) | (sk[1:] != sk[:-1])
                starts = np.flatnonzero(ng)
                lens = np.diff(np.append(starts, sd.size))
                np.maximum.at(max_bg, sd[starts], lens)
                n_bg = np.bincount(bdoc, minlength=n)
        nt = np.maximum(n_tok, 1)
        nb = np.maximum(n_bg, 1)
        distinct_u = np.floor(distinct / nt * 1e6 + 0.5).astype(np.int64)
        top_bg_u = np.floor(max_bg / nb * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "distinct_ratio_u": pa.array(distinct_u, pa.int64()),
                "top_bigram_frac_u": pa.array(top_bg_u, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def categorize_text(
    ds: ray.data.Dataset,
    max_tokens: int = 2,
    size: int = 10,
    text_col: str = "text",
) -> list[dict]:
    """ES ``categorize_text`` aggregation, deterministic variant: docs
    bucket by their token-pattern category — the space-join of the
    first ``max_tokens`` whitespace tokens that contain NO digit (ES's
    categorizer likewise discards numeric tokens as variable parts; its
    drain-style merge heuristic is replaced here by a documented exact
    key so the result is engine-independent).  Buckets come back
    (count desc, key asc), top ``size``.

    Vectorized per batch: one Arrow split (corpus._space_split — the
    DuckDB string_split-parity tokenization) + regex token mask +
    offset rebuild + list_slice + binary_join chain; the shuffle
    carries one row per (batch, distinct category) partial.  Driver
    merge is
    O(distinct categories) — bounded by vocabulary^max_tokens, keep
    ``max_tokens`` small (ES's equivalent knob is
    ``similarity_threshold``; both cap category cardinality)."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        from .corpus import _space_split

        toks = _space_split(pc.coalesce(batch.column(text_col), ""))
        flat = pc.list_flatten(toks)
        mask = pc.invert(pc.match_substring_regex(flat, "[0-9]"))
        # rebuild list offsets over the kept tokens (no list_filter
        # kernel in this pyarrow): segment-sum the keep mask
        offs = np.asarray(toks.offsets)
        cum = np.concatenate(
            [[0], np.cumsum(mask.to_numpy(zero_copy_only=False)
                            .astype(np.int64))]
        )
        new_off = np.concatenate(
            [[0], np.cumsum(cum[offs[1:]] - cum[offs[:-1]])]
        ).astype(np.int32)
        kept = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(mask)
        )
        head = pc.list_slice(kept, 0, max_tokens)
        key = pc.binary_join(head, " ")
        g = pa.table({"category": key}).group_by("category").aggregate(
            [("category", "count")]
        )
        return pa.table({
            "category": g.column("category"),
            "n_part": g.column("category_count").cast(pa.int64()),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category").aggregate(Sum("n_part")).take_all()
    )  # O(distinct categories) rows
    buckets = sorted(
        ((int(r["sum(n_part)"]), str(r["category"])) for r in rows),
        key=lambda t: (-t[0], t[1]),
    )[:size]
    return [{"key": k, "doc_count": n} for n, k in buckets]
