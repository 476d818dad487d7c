"""Deterministic synthetic Common-Crawl-style webtext generator.

Produces the exact input_hint schema from BASELINE.json:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
— no external data, fixed seed, reproducible row-for-row regardless of scale
or chunking (row ``i`` is a pure function of ``(seed, i)``).

The token stream is Zipf-distributed over a ~2,000-word vocabulary so head
terms have df ≈ N (exercising skew handling / salted sub-partitioning) and
tail terms have df ∈ {1, 2}.  Noise injections cover every branch of the
reference normalizer (``preprocess_data.py:57-72``): URLs, emails,
punctuation, pure digits, 1-char tokens, stopwords, mixed case.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Word families that exercise Porter stemming + NLTK irregular forms.
_FAMILIES = [
    "run running runs runner",
    "study studies studied studying",
    "connection connected connecting connect",
    "generalization generalizations general generally",
    "happy happily happiness",
    "sky skies",
    "news",
    "dying die dies died",
    "relational rational relate",
    "oscillators oscillate oscillation",
    "troubled troubling trouble troubles",
    "argue arguing argued argument",
    "maximize maximizing maximization",
]


def _build_vocab(size: int = 2000) -> list[str]:
    from ..normalizer import ENGLISH_STOPWORDS

    seen: set[str] = set()
    vocab: list[str] = []

    def add(w: str) -> None:
        # vocab words must survive the reference normalizer (len>=2,
        # non-digit, non-stopword), else a Zipf slot silently has df=0
        if w not in seen and len(w) >= 2 and w not in ENGLISH_STOPWORDS:
            seen.add(w)
            vocab.append(w)

    for fam in _FAMILIES:
        for w in fam.split():
            add(w)
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    syll = [c + v for c in consonants for v in vowels]
    rng = np.random.default_rng(12345)
    while len(vocab) < size:
        parts = rng.integers(0, len(syll), size=3)
        word = syll[parts[0]] + syll[parts[1]]
        form = rng.integers(0, 6)
        if form == 0:
            word += syll[parts[2]]
        elif form == 1:
            word += "ing"
        elif form == 2:
            word += "s"
        elif form == 3:
            word += "ed"
        add(word)
    return vocab[:size]


VOCAB = _build_vocab()

_NOISE = [
    "http://x{i}.example.com/a",
    "a{i}@b.com",
    "Hello, World!",
    "{i}",
    "x",
    "the and of to in",
    "MiXeD CaSe TeXT",
    '"quoted; punct: (here)!"',
    "www.noise{i}.org",
]

_EPOCH_2024 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _doc_text(rng: np.random.Generator, i: int, vocab_arr: np.ndarray,
              zipf_a: float, avg_len: int) -> str:
    n_tokens = max(20, int(rng.normal(avg_len, avg_len / 4)))
    # Zipf ranks (1-based), clipped into the vocabulary.
    ranks = rng.zipf(zipf_a, size=n_tokens)
    ranks = np.minimum(ranks - 1, len(vocab_arr) - 1)
    words = vocab_arr[ranks]
    parts = words.tolist()
    # Inject noise tokens at deterministic positions.
    for k in range(0, len(parts), 37):
        noise = _NOISE[(i + k) % len(_NOISE)].format(i=i)
        parts.insert(k, noise)
    # Sentence-ish punctuation.
    for k in range(12, len(parts), 13):
        parts[k] = parts[k] + "."
    return " ".join(parts)


def generate_chunk(start: int, count: int, seed: int = 42,
                   avg_len: int = 500, zipf_a: float = 1.1) -> pa.Table:
    """Rows [start, start+count) of the corpus — pure function of (seed, i)."""
    vocab_arr = np.array(VOCAB)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, start + count):
        rng = np.random.default_rng((seed << 20) + i)
        text = _doc_text(rng, i, vocab_arr, zipf_a, avg_len)
        urls.append(f"https://site{i % 997}.example.com/page/{i}")
        tss.append(_EPOCH_2024 + i * 1_000_000)
        htmls.append(b"<html><body><p>" + text.encode() + b"</p></body></html>")
        texts.append(text)
        r = i % 20
        # non-en docs alternate de/fr by corpus position (i%20==19 forces i
        # odd, so an i%2 test would make one branch unreachable)
        langs.append("en" if r < 19 else ("de" if (i // 20) % 2 == 0 else "fr"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_webtext(
    out_dir: str,
    num_docs: int,
    seed: int = 42,
    avg_len: int = 500,
    rows_per_file: int = 10_000,
    row_group_size: int = 1_000,
) -> list[str]:
    """Write the corpus as partitioned Parquet (many row groups so the build
    planner gets read parallelism).  Returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    start = 0
    part = 0
    while start < num_docs:
        count = min(rows_per_file, num_docs - start)
        path = os.path.join(out_dir, f"webtext-{part:05d}.parquet")
        tbl = generate_chunk(start, count, seed=seed, avg_len=avg_len)
        pq.write_table(tbl, path, row_group_size=row_group_size)
        paths.append(path)
        start += count
        part += 1
    return paths


_CORPUS_V = 2  # bump when the generator's output changes


def cached_webtext(num_docs: int, avg_len: int = 500, seed: int = 42,
                   base: str = "/tmp/esray_webtext") -> str:
    """Generate-once cache used by tests and bench.  ``_CORPUS_V`` keys the
    cache dir so generator changes invalidate stale corpora."""
    out_dir = f"{base}/v{_CORPUS_V}_n{num_docs}_l{avg_len}_s{seed}"
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        write_webtext(out_dir, num_docs, seed=seed, avg_len=avg_len)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir
