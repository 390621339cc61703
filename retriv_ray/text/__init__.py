from retriv_ray.text.normalization import (
    lowercasing,
    normalize_acronyms,
    normalize_ampersand,
    normalize_special_chars,
    remove_punctuation,
    strip_whitespaces,
)
from retriv_ray.text.pipeline import TextPreprocessor, preprocessing
from retriv_ray.text.stemmer import get_stemmer
from retriv_ray.text.stopwords import get_stopwords
from retriv_ray.text.tokenizer import get_tokenizer

__all__ = [
    "lowercasing",
    "normalize_acronyms",
    "normalize_ampersand",
    "normalize_special_chars",
    "remove_punctuation",
    "strip_whitespaces",
    "preprocessing",
    "TextPreprocessor",
    "get_stemmer",
    "get_stopwords",
    "get_tokenizer",
]
