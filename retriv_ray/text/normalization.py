"""Text normalizers with semantics identical to the reference.

Reference: retriv/sparse_retriever/preprocessing/normalization.py:7-41.
Each function is a pure ``str -> str`` map; they are applied per turn
inside ``map_batches`` (see retriv_ray.text.pipeline). The exact
composition order matters for score parity and is replicated in
``pipeline.preprocess`` (reference preprocessing/__init__.py:31-63).
"""

from __future__ import annotations

import re
import string

# reference normalization.py:19-23 — curly quotes / acute accent /
# en-dash mapped onto ASCII equivalents ('-' maps to itself).
_SPECIAL_CHARS_TRANS = {ord(a): ord(b) for a, b in zip("‘’´“”–-", "'''\"\"--")}

# reference normalization.py:26-27 — drop '.' unless followed by
# (non-space char then a char other than '.'/' ') or a digit:
# "a.b.c." -> "abc" but "foo.bar" and "a.b@hello.com" survive.
_ACRONYMS_RE = re.compile(r"\.(?!(\S[^. ])|\d)")

# reference normalization.py:30-32 — every ASCII punctuation char
# becomes a space (note '&' was already expanded to " and " earlier
# in the chain, reference preprocessing/__init__.py:37-38).
_PUNCT_TRANS = str.maketrans(string.punctuation, " " * len(string.punctuation))

# unidecode-fidelity folds for latin letters that NFKD does NOT
# decompose (they are base letters, not letter+combining-mark): these
# match unidecode's published transliterations, closing the known
# NFKD/unidecode gap for European text (reference normalization.py:16
# uses unidecode).
_NON_COMBINING_FOLDS = {
    ord("ß"): "ss", ord("ẞ"): "SS",
    ord("æ"): "ae", ord("Æ"): "AE",
    ord("œ"): "oe", ord("Œ"): "OE",
    ord("ø"): "o", ord("Ø"): "O",
    ord("đ"): "d", ord("Đ"): "D",
    ord("ð"): "d", ord("Ð"): "D",
    ord("þ"): "th", ord("Þ"): "Th",
    ord("ł"): "l", ord("Ł"): "L",
    ord("ħ"): "h", ord("Ħ"): "H",
    ord("ŋ"): "ng", ord("Ŋ"): "NG",
    ord("ĸ"): "k",
    ord("ı"): "i", ord("İ"): "I",
    ord("«"): '"', ord("»"): '"',
    ord("…"): "...",
}

# unidecode-style transliteration for the Greek and Cyrillic
# alphabets (applied after NFKD so accented forms fold to their base
# letter first). Tables follow unidecode's published mappings
# (θ->th, χ->kh, ψ->ps; ж->zh, х->kh, ц->ts, щ->shch, ю->iu, я->ia).
_GREEK_TRANSLIT = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "e", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "u", "φ": "ph", "χ": "kh", "ψ": "ps",
    "ω": "o",
}
_CYRILLIC_TRANSLIT = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "e", "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts",
    "ч": "ch", "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "",
    "э": "e", "ю": "iu", "я": "ia",
}
_TRANSLIT_FOLDS = {}
for _src, _dst in {**_GREEK_TRANSLIT, **_CYRILLIC_TRANSLIT}.items():
    _TRANSLIT_FOLDS[ord(_src)] = _dst
    _up = _src.upper()
    if _up != _src:
        _TRANSLIT_FOLDS[ord(_up)] = _dst.capitalize()
del _src, _dst, _up


def normalize_diacritics(x: str) -> str:
    """ASCII-fold accented latin characters (reference
    normalization.py:15-16 uses unidecode; that dependency is absent
    here, so NFKD-decompose + drop combining marks — identical for
    combining-form latin accents, e.g. "übermensch" -> "ubermensch" —
    plus an explicit fold table for the non-combining letters where
    NFKD differs from unidecode: "ß"->"ss", "ø"->"o", "æ"->"ae",
    "þ"->"th" etc., plus unidecode-style Greek and Cyrillic
    transliteration ("Ψάρι" -> "Psari", "Москва" -> "Moskva"). CJK
    transliteration remains out of scope. NOTE:
    like the reference, this is exported but NOT wired into the
    default pipeline (reference preprocessing/__init__.py:31-63 never
    calls it despite the docstring at sparse_retriever.py:61)."""
    import unicodedata

    x = x.translate(_NON_COMBINING_FOLDS)
    x = "".join(
        c
        for c in unicodedata.normalize("NFKD", x)
        if not unicodedata.combining(c)
    )
    return x.translate(_TRANSLIT_FOLDS)


def lowercasing(x: str) -> str:
    """reference normalization.py:7-8"""
    return x.lower()


def normalize_ampersand(x: str) -> str:
    """reference normalization.py:11-12"""
    return x.replace("&", " and ")


def normalize_special_chars(x: str) -> str:
    """reference normalization.py:19-23"""
    return x.translate(_SPECIAL_CHARS_TRANS)


def normalize_acronyms(x: str) -> str:
    """reference normalization.py:26-27"""
    return _ACRONYMS_RE.sub("", x)


def remove_punctuation(x: str) -> str:
    """reference normalization.py:30-32"""
    return x.translate(_PUNCT_TRANS)


def strip_whitespaces(x: str) -> str:
    """reference normalization.py:35-41 — strip then collapse runs of
    ASCII spaces (other whitespace is left alone; the whitespace
    tokenizer splits on it anyway)."""
    x = x.strip()
    while "  " in x:
        x = x.replace("  ", " ")
    return x
