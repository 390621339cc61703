"""Tokenizer registry.

Reference: retriv/sparse_retriever/preprocessing/tokenizer.py:7-30.
The reference's "whitespace" tokenizer is literally ``str.split``;
"wordpunct" is the public regex ``\\w+|[^\\w\\s]+`` which we implement
directly; "word" is a from-scratch Treebank-rule tokenizer
(retriv_ray.text.treebank — the reference's is NLTK ``word_tokenize``,
see treebank.py's parity note on punkt sentence splitting); "sent" is
a rule-based sentence splitter (the reference's is punkt — behavior
differs on abbreviation-heavy text, documented below). ``None`` ->
identity, callables pass through.

The preprocessing chain branches on *whether the tokenizer is
``str.split``* (reference preprocessing/__init__.py:47-57); we expose
``is_whitespace`` for that check instead of comparing function
identity.
"""

from __future__ import annotations

import re
from typing import Callable, Union

_WORDPUNCT_RE = re.compile(r"\w+|[^\w\s]+")


def whitespace_tokenizer(x: str) -> list:
    return x.split()


def wordpunct_tokenizer(x: str) -> list:
    """Same token language as nltk.tokenize.wordpunct_tokenize."""
    return _WORDPUNCT_RE.findall(x)


def identity_function(x):
    return x


# Rule-based sentence splitter: break after .!? (+ closing quotes /
# brackets) followed by whitespace and an upper-case / digit / quote
# opener, except after common abbreviations and single initials.
# Punkt (the reference's "sent") learns abbreviations from a corpus;
# this static list covers the frequent english ones.
_ABBREV = frozenset(
    "mr mrs ms dr prof rev hon st jr sr vs etc inc ltd co corp dept "
    "univ assn bros ph.d e.g i.e u.s u.k no vol fig al".split()
)
# next-char class includes lowercase: inside the preprocessing chain
# the text is already lowercased before tokenizing, and the
# abbreviation/initial guards below carry the false-split protection.
_SENT_BOUNDARY = re.compile(r'([.!?]+[\'")\]]*)\s+(?=["\'(\[]?[A-Za-z0-9])')


def sent_tokenizer(text: str) -> list:
    """Sentence splitter over the public boundary heuristic (NOT punkt;
    abbreviation handling is a static list, see module docstring)."""
    parts: list = []
    start = 0
    for m in _SENT_BOUNDARY.finditer(text):
        candidate = text[start : m.end(1)]
        last_word = candidate.rsplit(None, 1)[-1] if candidate.split() else ""
        bare = last_word.rstrip(".!?\"')]").lower()
        # skip abbreviation / single-initial boundaries ("Dr. Smith", "J. Doe")
        if last_word.endswith(".") and (bare in _ABBREV or len(bare) == 1):
            continue
        parts.append(candidate.strip())
        start = m.end()
    tail = text[start:].strip()
    if tail:
        parts.append(tail)
    return parts


from retriv_ray.text.treebank import treebank_word_tokenizer  # noqa: E402

_TOKENIZERS = {
    "whitespace": whitespace_tokenizer,
    "wordpunct": wordpunct_tokenizer,
    "word": treebank_word_tokenizer,
    "sent": sent_tokenizer,
}


def get_tokenizer(tokenizer: Union[str, Callable, None]) -> Callable:
    """reference tokenizer.py:22-30."""
    if isinstance(tokenizer, str):
        name = tokenizer.lower()
        if name not in _TOKENIZERS:
            raise AssertionError(f"Tokenizer {tokenizer} not supported.")
        return _TOKENIZERS[name]
    elif callable(tokenizer):
        return tokenizer
    elif tokenizer is None:
        return identity_function
    else:
        raise NotImplementedError


def is_whitespace(tokenizer: Callable) -> bool:
    """True when the resolved tokenizer is the whitespace one (the
    reference compares ``tokenizer == str.split``,
    preprocessing/__init__.py:47)."""
    return tokenizer is whitespace_tokenizer or tokenizer is str.split
