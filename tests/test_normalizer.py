"""Normalizer byte-identity tests (the per-row invariant, BASELINE.json
input_hint) against the reference pipeline ``preprocess_data.py:57-72``."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_ray.normalizer import (
    ENGLISH_STOPWORDS,
    Normalizer,
    preprocess_boolean_query,
    tokenize,
)

N = Normalizer()


def reference_tokenize(text, stop_words=ENGLISH_STOPWORDS):
    """Line-by-line transcription of the reference normalizer for testing
    (``preprocess_data.py:57-72``), with word_tokenize -> split() (see below).
    """
    text = text.lower()
    text = re.sub(r"http\S+|www\S+|https\S+|\S+@\S+", "", text)
    text = re.sub(r"[^a-z0-9\s]", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    tokens = text.split()
    tokens = [t for t in tokens if not t.isdigit() and len(t) >= 2]
    tokens = [t for t in tokens if t not in stop_words]
    from elasticsearch_ray.normalizer import porter_stem

    return [porter_stem(t) for t in tokens]


ADVERSARIAL = [
    "Check http://foo.com and a@b.com! Running studies, 42, x — naïve café.",
    "UPPER lower MiXeD 123 1 ab",
    "www.example.org https://x.y/z?a=1&b=2 trailing",
    "  multiple   spaces\tand\nnewlines  ",
    "punctuation!!! ... ??? ;;; :: () [] {} \"quotes\" 'single'",
    "hyphen-ated under_scored dot.sep.arated",
    "unicode: café naïve résumé Ω≈ç√ 東京 مرحبا",
    "digits 007 42 3.14 1e9 0x1F",
    "don't can't won't shouldn't I'll you're",
    "the and of to in a an",  # all stopwords
    "",
    "   ",
    "a",  # single char
    "ab",  # shortest keepable token (if not stopword)
]


def test_adversarial_byte_identity():
    for text in ADVERSARIAL:
        assert tokenize(text) == reference_tokenize(text), text


def test_url_email_stripping():
    # NB: "now" is an NLTK stopword, hence absent
    assert tokenize("visit http://foo.bar/baz today") == ["visit", "today"]
    assert tokenize("mail me@you.com ok") == ["mail", "ok"]
    assert tokenize("www.site.com hello") == ["hello"]


def test_digits_and_short_dropped():
    assert tokenize("42 7 x running") == ["run"]


def test_stopwords_dropped():
    assert tokenize("the quick brown fox") == ["quick", "brown", "fox"]


def test_stopword_count():
    assert len(ENGLISH_STOPWORDS) == 179  # NLTK english list size


def test_word_tokenize_split_equivalence_precondition():
    """After the regex pipeline the text is [a-z0-9 ]-only, which is the
    precondition for word_tokenize == str.split (SURVEY.md §2.2 M2)."""
    for text in ADVERSARIAL:
        cleaned = N.normalize_text(text)
        assert re.fullmatch(r"[a-z0-9 ]*", cleaned), repr(cleaned)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_property_byte_identity(text):
    assert tokenize(text) == reference_tokenize(text)


@settings(max_examples=100, deadline=None)
@given(
    st.text(
        alphabet=string.ascii_letters + string.digits + " ().!-'",
        max_size=100,
    )
)
def test_query_doc_same_pipeline(q):
    """Docs and queries MUST share one normalizer (the reference's critical
    bug was divergence here, ``REPORT.md:182-185``)."""
    assert N.preprocess_query_list(q) == tokenize(q)


def test_boolean_query_tokenizer():
    toks = preprocess_boolean_query("(Machine AND learning) OR NOT cats", N)
    assert toks == ("(", "machin", "AND", "learn", ")", "OR", "NOT", "cat")
    # lowercase operators recognised too (reference upper()s each token)
    toks = preprocess_boolean_query("dogs and cats", N)
    assert toks == ("dog", "AND", "cat")


def test_clean_batch_matches_python_re():
    """Arrow-re2 fast path must be token-identical to the Python re pipeline,
    including unicode rows (which route through the Python fallback)."""
    import random

    from elasticsearch_ray.normalizer import make_normalizer
    from elasticsearch_ray.normalizer.tokenize import _NON_ALNUM_RE, _URL_EMAIL_RE

    n = make_normalizer("reference")
    rng = random.Random(3)
    pool = list("abc XYZ123 .,!\xa0 　éÉİß\U0001F600") + [
        "http://x.y ", "a@b.c ", "www.z ",
    ]
    texts = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 40)))
        for _ in range(500)
    ] + [None, ""]
    got = [g.split() for g in n.clean_batch(texts)]
    exp = [
        _NON_ALNUM_RE.sub(" ", _URL_EMAIL_RE.sub("", (t or "").lower())).split()
        for t in texts
    ]
    assert got == exp
    p = make_normalizer("plain")
    assert [g.split() for g in p.clean_batch(texts)] == [
        (t or "").lower().split() for t in texts
    ]


def test_tokenize_rows_flat_matches_per_row():
    """The vectorized batch tokenizer (Arrow split + dictionary-encode +
    per-unique map, ``tokenize_rows_flat``) must reproduce the per-row
    ``tokenize_cleaned`` token streams exactly — including unicode
    whitespace, ASCII control chars Python treats as whitespace, empty
    rows, and Arrow's edge-empty-token artifacts."""
    import random

    from elasticsearch_ray.normalizer import make_normalizer
    from elasticsearch_ray.normalizer.tokenize import tokenize_rows_flat

    rng = random.Random(11)
    pool = (
        ["run", "running", "studies", "the", "and", "a", "x", "42", "1999"]
        + ["caf\xe9", "ß", "straße"]
        + [" ", "\t", "\n", "  ", "\x1c", "\x1d", "\x85", "\xa0", " "]
    )
    for analyzer in ("reference", "plain"):
        n = make_normalizer(analyzer)
        rows = [
            "".join(rng.choice(pool) for _ in range(rng.randint(0, 30)))
            for _ in range(300)
        ] + ["", " ", "\x1c\x1d", "a\x1cb", "q  r "]
        cleaned = (
            n.clean_batch(rows)
            if analyzer == "reference"
            else [r.lower() for r in rows]
        )
        exp = [n.tokenize_cleaned(c) for c in cleaned]
        tok_doc, codes, terms = tokenize_rows_flat(n, cleaned)
        got = [[] for _ in cleaned]
        for d, c in zip(tok_doc.tolist(), codes.tolist()):
            got[d].append(terms[c])
        assert got == exp, analyzer


def test_html_strip_char_filter():
    """ES html_strip semantics (Lucene HTMLStripCharFilter): comments and
    script/style content removed, block tags -> newline, inline tags ->
    NOTHING (mid-word markup doesn't split tokens), entities decoded ONCE
    after tag removal (decoded '<b>' text is NOT re-stripped), &amp;
    decoded last; batch (Arrow) and scalar paths agree."""
    from elasticsearch_ray.normalizer.tokenize import (
        HtmlStripNormalizer,
        PlainNormalizer,
        html_strip,
        make_normalizer,
    )

    # block element <p> emits '\n'; inline <b> emits nothing
    assert html_strip('<p id="x">Hello <b>world</b></p>') == \
        "\nHello world\n"
    # mid-word inline markup must NOT split the token (ES token parity)
    assert html_strip("data<i>base</i>") == "database"
    # entities decode once, after tags; &amp;lt; -> &lt; (literal)
    assert html_strip("&lt;b&gt;bold&lt;/b&gt;") == "<b>bold</b>"
    assert html_strip("&amp;lt;") == "&lt;"
    assert html_strip("a&nbsp;b &quot;q&quot; &apos;s&apos;") == \
        'a b "q" \'s\''
    # a bare '<' not opening a tag is literal text (Lucene: tag only
    # when '<' is followed by a letter, '/', '!' or '?')
    assert html_strip("1 < 2 > 0") == "1 < 2 > 0"
    assert html_strip("i <3 you > me") == "i <3 you > me"
    # comments vanish entirely, even with '>' inside; unclosed comment
    # consumes to EOF (Lucene)
    assert html_strip("a <!-- c --> b") == "a  b"
    assert html_strip("a <!-- x > y --> b") == "a  b"
    assert html_strip("a <!-- never closed") == "a "
    # script/style content is stripped WITH the element (one newline)
    assert html_strip("a <script>var x = '<p>';</script> b") == "a \n b"
    assert html_strip("a <style>p > em {}</style> b") == "a \n b"
    assert html_strip("x <? pi ?> y") == "x  y"
    n = make_normalizer("html_plain")
    assert isinstance(n, HtmlStripNormalizer)
    texts = [
        '<html><body class="d">Run <i>fast</i> &amp; far</body></html>',
        None,
        "no tags at all",
        "&lt;script&gt; stays text",
    ]
    cleaned = n.clean_batch(texts)
    base = PlainNormalizer()
    for t, c in zip(texts, cleaned):
        # the invariant the build path relies on: cleaned batch text
        # re-tokenizes to exactly the scalar analyzer's tokens
        assert n.tokenize_cleaned(c) == n.tokenize(t or "")
        assert n.tokenize(t or "") == base.tokenize(html_strip(t or ""))
    assert n.tokenize(texts[0]) == ["run", "fast", "&", "far"]
    # query side strips too (ES applies char filters in query analysis)
    assert n.preprocess_query_list("<b>run</b>") == ["run"]
    # stemming base composes
    hr = make_normalizer("html_reference")
    assert hr.tokenize("<p>running studies</p>") == \
        make_normalizer("reference").tokenize("running studies")
