"""Canonical text normalizer + tokenizer — THE per-row invariant.

Reimplements the reference preprocessing pipeline exactly
(``preprocess_data.py:57-72`` for documents, ``query_preprocessing.py:35-76``
for queries — the two are intentionally the *same function* here, because the
reference's documented critical bug was doc/query preprocessing divergence,
``REPORT.md:182-185``).

Pipeline (order matters):
  1. ``text.lower()``                       (Python/Unicode lower semantics)
  2. strip URLs and emails:  ``http\\S+|www\\S+|https\\S+|\\S+@\\S+`` -> ''
  3. strip non-alphanumerics: ``[^a-z0-9\\s]`` -> ' '
  4. collapse whitespace:     ``\\s+`` -> ' ', strip
  5. tokenize.  The reference calls ``nltk.word_tokenize`` but after step 3
     the text contains only ``[a-z0-9 ]`` (plus stray unicode whitespace that
     step 4 collapsed), for which ``word_tokenize`` degenerates to
     ``str.split()`` — we use ``split()`` and assert the equivalence in tests.
  6. drop tokens that are pure digits (``str.isdigit``) or shorter than 2
  7. drop NLTK English stopwords
  8. Porter-stem every remaining token (NLTK_EXTENSIONS semantics)
"""

from __future__ import annotations

import re

from .porter import PorterStemmer
from .stopwords import ENGLISH_STOPWORDS

# Compiled once per process/actor (stage state, SURVEY.md §2.3 T1).
_URL_EMAIL_RE = re.compile(r"http\S+|www\S+|https\S+|\S+@\S+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9\s]")
_WS_RE = re.compile(r"\s+")

BOOLEAN_OPERATORS = frozenset({"AND", "OR", "NOT"})


class Normalizer:
    """Stateful normalizer: stemmer cache + compiled regexes, built once.

    Use one instance per tokenizer actor (``stages/tokenizer.py``) or one
    module-level instance driver-side for queries.
    """

    def __init__(self) -> None:
        self.stemmer = PorterStemmer()
        self.stop_words = ENGLISH_STOPWORDS
        # surface token -> stemmed form, or "" when the token is filtered
        # (short/digit/stopword).  One dict hit replaces the whole per-token
        # filter+stem pipeline on repeats; web text is Zipfian, so the hit
        # rate is ~100% and this is the tokenize hot path's main lever.
        self._tok_cache: dict[str, str] = {}

    def normalize_text(self, text: str) -> str:
        """Steps 1-4: returns the cleaned ``[a-z0-9 ]`` string."""
        text = text.lower()
        text = _URL_EMAIL_RE.sub("", text)
        text = _NON_ALNUM_RE.sub(" ", text)
        text = _WS_RE.sub(" ", text).strip()
        return text

    def tokenize(self, text: str) -> list[str]:
        """Full pipeline: raw text -> stemmed token list (reference M2).

        The whitespace-collapse step (regex #3) is skipped: ``str.split()``
        with no argument already splits on whitespace runs and ignores
        leading/trailing whitespace, so the token stream is identical
        (property-tested against the literal reference transcription).
        """
        return self.tokenize_cleaned(
            _NON_ALNUM_RE.sub(" ", _URL_EMAIL_RE.sub("", text.lower()))
        )

    def tokenize_cleaned(self, cleaned: str) -> list[str]:
        """Split + filter + stem a string already lowered and regex-cleaned
        (the output of :meth:`clean_batch` / the inline subs above).
        Shares :meth:`map_token` — the ONE per-token filter+stem+cache
        rule — so the per-row path can never drift from the vectorized
        batch path (tokenize_rows_flat), the exact doc/query divergence
        class this module exists to prevent; the hot path is one dict
        hit per token either way."""
        mt = self.map_token
        return [r for token in cleaned.split() if (r := mt(token))]

    def map_token(self, token: str) -> str:
        """One surface token -> stemmed form, or '' when filtered
        (short/digit/stopword) — the per-token decision of
        :meth:`tokenize_cleaned`, exposed for the vectorized batch path
        (``tokenize_rows_flat``) that applies it once per UNIQUE token."""
        cache = self._tok_cache
        r = cache.get(token)
        if r is None:
            r = (
                self.stemmer.stem(token)
                if len(token) >= 2
                and not token.isdigit()
                and token not in self.stop_words
                else ""
            )
            if len(cache) < 4_000_000:
                cache[token] = r
        return r

    def clean_batch(self, texts: list[str | None]) -> list[str]:
        """Vectorized lower + URL/e-mail strip + non-alnum blank for a whole
        batch via Arrow's C++ re2 kernels (~5x the Python re loop).

        re2 and Python ``re`` agree exactly on ASCII input (``\\s``/``\\S``
        and lower() are identical there) but diverge on unicode whitespace
        inside the URL pattern, so non-ASCII rows take the Python path —
        the per-row token stream stays byte-identical either way.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        safe = [t or "" for t in texts]
        arr = pa.array(safe, pa.string())
        # ASCII alone is not enough: RE2 and Python re also disagree on
        # the ASCII control chars \x0b, \x1c-\x1f (\S in the URL
        # pattern), so such rows take the Python path too
        is_ascii = pc.string_is_ascii(arr)
        diverg = pc.match_substring_regex(
            arr, _RE2_DIVERGENT_RE_PATTERN
        )
        low = pc.utf8_lower(arr)
        s = pc.replace_substring_regex(
            low, pattern=_URL_EMAIL_RE.pattern, replacement=""
        )
        s = pc.replace_substring_regex(
            s, pattern=_NON_ALNUM_RE.pattern, replacement=" "
        )
        out = s.to_pylist()
        for i, (ok, dv) in enumerate(
            zip(is_ascii.to_pylist(), diverg.to_pylist())
        ):
            if not ok or dv:
                out[i] = _NON_ALNUM_RE.sub(
                    " ", _URL_EMAIL_RE.sub("", safe[i].lower())
                )
        return out

    def preprocess_query(self, query: str) -> str:
        """Reference ``query_preprocessing.preprocess_query``: tokens joined."""
        return " ".join(self.tokenize(query))

    def preprocess_query_list(self, query: str) -> list[str]:
        return self.tokenize(query)


# Boolean-preserving query tokenizer (reference M5,
# ``measure_latency_datastores.py:45-60``): keeps AND/OR/NOT and parens,
# stems alphanumeric non-stopword tokens.  The reference uses
# ``nltk.word_tokenize`` on the lowered query; for the query grammar
# (words, parens, boolean ops) this is equivalent to extracting
# ``[a-z0-9]+`` runs and parens, which is what we do.
# ASCII control chars where RE2's \\s ([\\t\\n\\f\\r ]) and Python's
# \\s disagree: a row containing one must take the per-row Python path
# or the batch (index) and scalar (query/oracle) token streams diverge
_RE2_DIVERGENT_RE_PATTERN = "[\\x0b\\x1c-\\x1f]"


_BOOL_TOKEN_RE = re.compile(r"[a-z0-9]+|\(|\)")


def preprocess_boolean_query(query: str, normalizer: Normalizer) -> tuple[str, ...]:
    # the analyzer's char filter runs on the query side too (ES: char
    # filters precede tokenization on BOTH sides) — without this, a
    # boolean query against an html_* index would tokenize markup
    # ('<b>dogs</b>' -> 'b', 'dogs', 'b') the index side stripped
    query = getattr(normalizer, "char_filter", lambda t: t)(query)
    tokens = _BOOL_TOKEN_RE.findall(query.lower())
    processed: list[str] = []
    for word in tokens:
        if word.upper() in BOOLEAN_OPERATORS or word in ("(", ")"):
            processed.append(word.upper())
        elif word not in normalizer.stop_words:
            # every non-paren token matched [a-z0-9]+, so the reference's
            # isalnum() check is vacuously true here
            processed.append(normalizer.stemmer.stem(word))
    return tuple(processed)


class PlainNormalizer:
    """Whitespace analyzer: lowercase + split, no stopwords/stemming/filters.

    Used for SQL-oracle-checkable pipelines (DuckDB can reproduce it exactly
    with ``string_split(lower(text), ' ')``) and as the ES-"standard-ish"
    analyzer option.  API-compatible with :class:`Normalizer`.
    """

    def __init__(self) -> None:
        self.stop_words = frozenset()

        class _IdStemmer:
            @staticmethod
            def stem(w: str) -> str:
                return w

        self.stemmer = _IdStemmer()

    def normalize_text(self, text: str) -> str:
        return " ".join(text.lower().split())

    def tokenize(self, text: str) -> list[str]:
        return text.lower().split()

    def tokenize_cleaned(self, cleaned: str) -> list[str]:
        return cleaned.split()

    def map_token(self, token: str) -> str:
        return token

    def clean_batch(self, texts: list[str | None]) -> list[str]:
        import pyarrow as pa
        import pyarrow.compute as pc

        safe = [t or "" for t in texts]
        arr = pa.array(safe, pa.string())
        out = pc.utf8_lower(arr).to_pylist()
        # utf8_lower == str.lower() on ASCII; fall back elsewhere
        for i, ok in enumerate(pc.string_is_ascii(arr).to_pylist()):
            if not ok:
                out[i] = safe[i].lower()
        return out

    def preprocess_query(self, query: str) -> str:
        return " ".join(self.tokenize(query))

    def preprocess_query_list(self, query: str) -> list[str]:
        return self.tokenize(query)


def tokenize_rows_flat(normalizer, cleaned: list[str]):
    """Vectorized batch tokenizer: cleaned rows -> flat token stream.

    Returns ``(tok_doc, codes, terms)`` where ``tok_doc[i]`` is the row
    index of the i-th KEPT token (row-major, in-document order), ``codes[i]``
    indexes into ``terms`` (the distinct mapped/stemmed term strings, in
    first-appearance order of their surface forms), and dropped tokens
    (short/digit/stopword per ``normalizer.map_token``) are already removed.

    Token streams are identical to ``[normalizer.tokenize_cleaned(r) for r
    in cleaned]`` (property-tested): the whitespace split runs in Arrow C++
    (``utf8_split_whitespace``), the per-token filter+stem decision runs
    ONCE PER UNIQUE surface token (``dictionary_encode``), and everything
    per-token is a numpy gather — no Python loop over the corpus.  Non-ASCII
    rows are pre-split with Python ``str.split`` semantics (Arrow's unicode
    whitespace classes differ from Python's on a few control chars) and
    re-joined with single spaces, after which the Arrow split agrees.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(cleaned, pa.string())
    ascii_ok = pc.string_is_ascii(arr)
    if not pc.all(ascii_ok).as_py():
        fixed = list(cleaned)
        for i, ok in enumerate(ascii_ok.to_pylist()):
            if not ok:
                fixed[i] = " ".join(fixed[i].split())
        arr = pa.array(fixed, pa.string())
    split = pc.utf8_split_whitespace(arr)
    lens = pc.list_value_length(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    tok_doc = np.repeat(np.arange(len(cleaned), dtype=np.int64), lens)
    denc = flat.dictionary_encode()
    indices = denc.indices.to_numpy(zero_copy_only=False)
    uniq = denc.dictionary.to_pylist()
    # per-UNIQUE mapping: '' (and Arrow's edge empty tokens) drop to -1
    mapped = np.empty(len(uniq), dtype=np.int64)
    terms: list[str] = []
    term_id: dict[str, int] = {}
    map_token = normalizer.map_token
    for j, u in enumerate(uniq):
        r = map_token(u) if u else ""
        if r:
            tid = term_id.get(r)
            if tid is None:
                term_id[r] = tid = len(terms)
                terms.append(r)
            mapped[j] = tid
        else:
            mapped[j] = -1
    codes = mapped[indices]
    keep = codes >= 0
    return tok_doc[keep], codes[keep], terms


# Lucene's HTMLStripCharFilter only opens a tag when '<' is followed by
# a letter, '/', '!' or '?' — a bare '<' in text ('1 < 2', 'i <3 you')
# is literal content and must survive.  Replacement is element-class
# aware, like Lucene: comments vanish (including any '>' inside them),
# script/style elements vanish WITH their content (one '\n' emitted),
# block-level tags emit '\n', and inline tags emit NOTHING — so
# 'data<i>base</i>' stays ONE token, matching ES analysis.
# Block-level element set from Lucene's HTMLStripCharFilter.jflex.
_HTML_BLOCK_ELEMENTS = (
    "address|article|aside|blockquote|body|br|canvas|center|dd|del|div|dl"
    "|dt|fieldset|figcaption|figure|footer|form|frame|frameset|h[1-6]|head"
    "|header|hgroup|hr|html|iframe|ins|isindex|li|main|menu|nav|noframes"
    "|noscript|ol|output|p|pre|section|table|tbody|td|tfoot|th|thead"
    "|title|tr|ul|video"
)
# chain order matters: comments first (their '>'s must not terminate a
# tag scan), then script/style with content, then block, then the rest.
# Tag bodies (_TAG_ATTRS) skip quoted attribute values — a '>' inside
# href="x>y" must not terminate the tag (Lucene's char filter handles
# quoted attributes; a bare [^>]* leaked attribute text as tokens).
# Documented deviation (in addition to the entity/CDATA notes below):
# an unterminated '<!--' inside script content deletes to end-of-text
# (the comment rule runs first), where Lucene's state machine would end
# the script element at '</script>'.
_TAG_ATTRS = r"""(?:[^>"']|"[^"]*"|'[^']*')*"""
_HTML_CHAIN: list[tuple[str, str]] = [
    (r"(?s)<!--.*?(?:-->|$)", ""),
    (rf"(?is)<script\b{_TAG_ATTRS}>.*?(?:</script\s*>|$)", "\n"),
    (rf"(?is)<style\b{_TAG_ATTRS}>.*?(?:</style\s*>|$)", "\n"),
    (rf"(?i)</?(?:{_HTML_BLOCK_ELEMENTS})\b{_TAG_ATTRS}>", "\n"),
    (rf"<[a-zA-Z/!?]{_TAG_ATTRS}>", ""),
]
_HTML_CHAIN_RE = [(re.compile(p), r) for p, r in _HTML_CHAIN]
# decode order matters (ES html_strip decodes entities ONCE, after tag
# removal): '&amp;' last so '&amp;lt;' ends as '&lt;', not '<'
_HTML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
]


def html_strip(text: str) -> str:
    """ES ``html_strip`` char filter (Lucene ``HTMLStripCharFilter``):
    comments and script/style content removed, block-level tags replaced
    by a newline, inline tags deleted with NO separator, then the
    standard XML entities (+ ``&nbsp;``) decoded once.  Decoded text is
    NOT re-scanned for tags (ES behavior — ``&lt;b&gt;`` survives as
    literal ``<b>`` text).  Documented deviations from Lucene: numeric
    character references (``&#65;``) and the full HTML-4 entity table are
    not decoded, and CDATA sections are treated as ordinary markup."""
    for rx, rep in _HTML_CHAIN_RE:
        text = rx.sub(rep, text)
    for k, v in _HTML_ENTITIES:
        text = text.replace(k, v)
    return text


class HtmlStripNormalizer:
    """ES analyzer with the ``html_strip`` char filter in front of a base
    analyzer (``char_filter: [html_strip]`` in an ES analyzer definition).
    The char filter runs on BOTH the index and the query side, like ES.
    Batch path is fully Arrow: one RE2 tag replace + chained literal
    entity replaces, then the base analyzer's clean_batch."""

    def __init__(self, base) -> None:
        self.base = base
        self.stop_words = base.stop_words
        self.stemmer = base.stemmer

    def normalize_text(self, text: str) -> str:
        return self.base.normalize_text(html_strip(text))

    def tokenize(self, text: str) -> list[str]:
        return self.base.tokenize(html_strip(text))

    def tokenize_cleaned(self, cleaned: str) -> list[str]:
        return self.base.tokenize_cleaned(cleaned)  # already stripped

    def map_token(self, token: str) -> str:
        return self.base.map_token(token)

    def clean_batch(self, texts: list[str | None]) -> list[str]:
        import pyarrow as pa
        import pyarrow.compute as pc

        safe = [t or "" for t in texts]
        arr = pa.array(safe, pa.string())
        # same batch/scalar consistency contract as Normalizer: rows
        # where RE2's \s diverges from Python's (non-ASCII, or the
        # ASCII control chars) run the scalar html_strip instead — the
        # close-tag patterns use \s*, so a divergent char inside a
        # </script\x0b> tag would otherwise delete the document's tail
        # at index time while query-side html_strip keeps it
        is_ascii = pc.string_is_ascii(arr)
        diverg = pc.match_substring_regex(
            arr, _RE2_DIVERGENT_RE_PATTERN
        )
        for p, rep in _HTML_CHAIN:
            arr = pc.replace_substring_regex(arr, pattern=p, replacement=rep)
        for k, v in _HTML_ENTITIES:
            arr = pc.replace_substring(arr, pattern=k, replacement=v)
        out = arr.to_pylist()
        for i, (ok, dv) in enumerate(
            zip(is_ascii.to_pylist(), diverg.to_pylist())
        ):
            if not ok or dv:
                out[i] = html_strip(safe[i])
        return self.base.clean_batch(out)

    def char_filter(self, text: str) -> str:
        return html_strip(text)

    def preprocess_query(self, query: str) -> str:
        return self.base.preprocess_query(html_strip(query))

    def preprocess_query_list(self, query: str) -> list[str]:
        return self.base.preprocess_query_list(html_strip(query))


def make_normalizer(analyzer: str = "reference"):
    if analyzer == "plain":
        return PlainNormalizer()
    if analyzer == "reference":
        return Normalizer()
    if analyzer == "html_plain":
        return HtmlStripNormalizer(PlainNormalizer())
    if analyzer == "html_reference":
        return HtmlStripNormalizer(Normalizer())
    raise ValueError(f"unknown analyzer: {analyzer!r}")


_default = None


def default_normalizer() -> Normalizer:
    global _default
    if _default is None:
        _default = Normalizer()
    return _default


def tokenize(text: str) -> list[str]:
    return default_normalizer().tokenize(text)
