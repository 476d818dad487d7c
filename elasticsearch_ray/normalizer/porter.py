"""Porter stemmer, NLTK-compatible (NLTK_EXTENSIONS mode).

A from-scratch implementation of the Porter (1980) stemming algorithm with the
NLTK departures, so that our normalizer produces the exact token stream the
reference pipeline produces via ``nltk.stem.PorterStemmer`` (reference:
``preprocess_data.py:70``, ``query_preprocessing.py:66``).  NLTK is not
available offline, so the behaviour is vendored here and locked by recorded
test vectors (``tests/test_porter.py``).

NLTK_EXTENSIONS departures from the published algorithm that we replicate:

* an irregular-forms pool (sky/die/lie/tie/news/inning/outing/canning/howe/
  proceed/exceed/succeed) checked before any step;
* words of length <= 2 are returned unchanged;
* step 1a: ``ies`` -> ``ie`` for 4-letter words (``dies`` -> ``die``);
* step 1b: ``ied`` -> ``ie``/``i`` depending on length;
* step 1c: ``y`` -> ``i`` only after a consonant when the stem is longer than
  one character (``say`` stays ``say``, ``cry`` -> ``cri``);
* step 2: ``alli`` -> ``al`` applied first with a recursive re-run, the
  ``bli`` -> ``ble`` rule replacing ``abli`` -> ``able``, plus the
  ``fulli`` -> ``ful`` and ``logi`` -> ``log`` rules;
* ``_ends_cvc`` treats two-letter vowel-consonant words as cvc.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

_IRREGULAR_FORMS = {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}

_POOL: dict[str, str] = {}
for _key, _vals in _IRREGULAR_FORMS.items():
    for _val in _vals:
        _POOL[_val] = _key


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        if i == 0:
            return True
        return not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC)^m[V]."""
    # Build the condensed c/v form and count 'vc' occurrences.
    cv = []
    prev = None
    for i in range(len(stem)):
        c = "c" if _is_consonant(stem, i) else "v"
        if c != prev:
            cv.append(c)
            prev = c
    return "".join(cv).count("vc")


def _has_positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    for i in range(len(stem)):
        if not _is_consonant(stem, i):
            return True
    return False


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK_EXTENSIONS: two-letter vowel-consonant words count as cvc.
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _apply_rule_list(word: str, rules) -> str:
    for suffix, replacement, condition in rules:
        if suffix == "*d" and _ends_double_consonant(word):
            stem = word[:-2]
            if condition is None or condition(stem):
                return stem + replacement
            return word
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"
    return _apply_rule_list(
        word,
        [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        if len(word) == 4:
            return word[:-3] + "ie"
        return word[:-3] + "i"

    if word.endswith("eed"):
        stem = word[:-3]
        if _measure(stem) > 0:
            return stem + "ee"
        return word

    intermediate_stem = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            candidate = word[: len(word) - len(suffix)]
            if _contains_vowel(candidate):
                intermediate_stem = candidate
                break
    if intermediate_stem is None:
        return word

    final_letter = intermediate_stem[-1] if intermediate_stem else ""
    return _apply_rule_list(
        intermediate_stem,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", final_letter, lambda stem: final_letter not in ("l", "s", "z")),
            (
                "",
                "e",
                lambda stem: _measure(intermediate_stem) == 1
                and _ends_cvc(intermediate_stem),
            ),
        ],
    )


def _step1c(word: str) -> str:
    def nltk_condition(stem: str) -> bool:
        return len(stem) > 1 and _is_consonant(stem, len(stem) - 1)

    return _apply_rule_list(word, [("y", "i", nltk_condition)])


def _step2(word: str) -> str:
    if word.endswith("alli") and _has_positive_measure(word[:-4]):
        return _step2(word[:-4] + "al")

    rules = [
        ("ational", "ate", _has_positive_measure),
        ("tional", "tion", _has_positive_measure),
        ("enci", "ence", _has_positive_measure),
        ("anci", "ance", _has_positive_measure),
        ("izer", "ize", _has_positive_measure),
        ("bli", "ble", _has_positive_measure),
        ("alli", "al", _has_positive_measure),
        ("entli", "ent", _has_positive_measure),
        ("eli", "e", _has_positive_measure),
        ("ousli", "ous", _has_positive_measure),
        ("ization", "ize", _has_positive_measure),
        ("ation", "ate", _has_positive_measure),
        ("ator", "ate", _has_positive_measure),
        ("alism", "al", _has_positive_measure),
        ("iveness", "ive", _has_positive_measure),
        ("fulness", "ful", _has_positive_measure),
        ("ousness", "ous", _has_positive_measure),
        ("aliti", "al", _has_positive_measure),
        ("iviti", "ive", _has_positive_measure),
        ("biliti", "ble", _has_positive_measure),
        ("fulli", "ful", _has_positive_measure),
        # 'l' stays with the stem so short stems (geo-, theo-) work.
        ("logi", "log", lambda stem: _has_positive_measure(word[:-3])),
    ]
    return _apply_rule_list(word, rules)


def _step3(word: str) -> str:
    return _apply_rule_list(
        word,
        [
            ("icate", "ic", _has_positive_measure),
            ("ative", "", _has_positive_measure),
            ("alize", "al", _has_positive_measure),
            ("iciti", "ic", _has_positive_measure),
            ("ical", "ic", _has_positive_measure),
            ("ful", "", _has_positive_measure),
            ("ness", "", _has_positive_measure),
        ],
    )


def _step4(word: str) -> str:
    def measure_gt_1(stem: str) -> bool:
        return _measure(stem) > 1

    return _apply_rule_list(
        word,
        [
            ("al", "", measure_gt_1),
            ("ance", "", measure_gt_1),
            ("ence", "", measure_gt_1),
            ("er", "", measure_gt_1),
            ("ic", "", measure_gt_1),
            ("able", "", measure_gt_1),
            ("ible", "", measure_gt_1),
            ("ant", "", measure_gt_1),
            ("ement", "", measure_gt_1),
            ("ment", "", measure_gt_1),
            ("ent", "", measure_gt_1),
            (
                "ion",
                "",
                lambda stem: _measure(stem) > 1 and bool(stem) and stem[-1] in ("s", "t"),
            ),
            ("ou", "", measure_gt_1),
            ("ism", "", measure_gt_1),
            ("ate", "", measure_gt_1),
            ("iti", "", measure_gt_1),
            ("ous", "", measure_gt_1),
            ("ive", "", measure_gt_1),
            ("ize", "", measure_gt_1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    if word.endswith("ll") and _measure(word[:-1]) > 1:
        return word[:-1]
    return word


def porter_stem(word: str, to_lowercase: bool = True) -> str:
    """Stem one word; identical output to ``nltk.PorterStemmer().stem(word)``."""
    stem = word.lower() if to_lowercase else word
    if word in _POOL:
        return _POOL[stem]
    if len(word) <= 2:
        return word

    stem = _step1a(stem)
    stem = _step1b(stem)
    stem = _step1c(stem)
    stem = _step2(stem)
    stem = _step3(stem)
    stem = _step4(stem)
    stem = _step5a(stem)
    stem = _step5b(stem)
    return stem


class PorterStemmer:
    """Object API mirroring ``nltk.stem.PorterStemmer`` (with a stem cache).

    The cache matters: at web scale the token stream is extremely Zipfian, so
    nearly every stem call is a repeat.  One instance lives per tokenizer
    actor (state built once per worker, see ``stages/tokenizer.py``).
    """

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem(self, word: str) -> str:
        cached = self._cache.get(word)
        if cached is None:
            cached = porter_stem(word)
            # Bound the per-actor cache; real vocabularies are ~1e6 surface
            # forms, which fits, but guard against adversarial streams.
            if len(self._cache) < 4_000_000:
                self._cache[word] = cached
        return cached
