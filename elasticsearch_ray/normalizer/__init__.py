from .porter import PorterStemmer, porter_stem
from .stopwords import ENGLISH_STOPWORDS
from .tokenize import (
    BOOLEAN_OPERATORS,
    Normalizer,
    PlainNormalizer,
    default_normalizer,
    make_normalizer,
    preprocess_boolean_query,
    tokenize,
)

__all__ = [
    "PorterStemmer",
    "porter_stem",
    "ENGLISH_STOPWORDS",
    "BOOLEAN_OPERATORS",
    "Normalizer",
    "PlainNormalizer",
    "make_normalizer",
    "default_normalizer",
    "preprocess_boolean_query",
    "tokenize",
]
