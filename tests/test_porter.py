"""Porter stemmer vectors recorded from NLTK PorterStemmer (NLTK_EXTENSIONS).

The reference stems every token with ``nltk.stem.PorterStemmer``
(``preprocess_data.py:70``); NLTK is unavailable offline so the behaviour is
vendored and locked here.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_ray.normalizer import PorterStemmer, porter_stem

# Classic Porter vocabulary (Porter 1980 examples) where NLTK agrees.
CLASSIC = {
    "caresses": "caress", "ponies": "poni", "ties": "tie", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}

# NLTK_EXTENSIONS departures (irregular pool, short words, ies/ied, y->i).
NLTK_SPECIFIC = {
    "skies": "sky", "sky": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning", "inning": "inning",
    "outing": "outing", "canning": "canning", "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    "dies": "die", "died": "die", "ties": "tie",
    "studied": "studi", "studies": "studi", "studying": "studi",
    "say": "say", "enjoy": "enjoy", "cry": "cri", "by": "by", "y": "y",
    "a": "a", "at": "at", "is": "is",
    "running": "run", "runs": "run", "runner": "runner",
    "connection": "connect", "connected": "connect", "connecting": "connect",
    "generalization": "gener", "oscillators": "oscil",
    "happily": "happili", "apologize": "apolog", "geology": "geolog",
    "archaeology": "archaeolog",
}


def test_classic_vectors():
    for w, e in CLASSIC.items():
        assert porter_stem(w) == e, (w, porter_stem(w), e)


def test_nltk_extension_vectors():
    for w, e in NLTK_SPECIFIC.items():
        assert porter_stem(w) == e, (w, porter_stem(w), e)


def test_short_words_unchanged():
    for w in ["a", "b", "ab", "xy", "s", "ss", "is"]:
        assert porter_stem(w) == w


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=15))
def test_stemmer_total_and_idempotent_on_output_alphabet(w):
    s = porter_stem(w)
    assert isinstance(s, str)
    assert s == s.lower()
    # cache path equals direct path
    assert PorterStemmer().stem(w) == s


def test_cache_consistency():
    ps = PorterStemmer()
    assert ps.stem("running") == "run"
    assert ps.stem("running") == "run"
