"""Tokenizer registry.

Reference: retriv/sparse_retriever/preprocessing/tokenizer.py:7-30.
The reference's "whitespace" tokenizer is literally ``str.split``;
"word"/"sent" require NLTK's punkt models (not shipped here — raise),
"wordpunct" is the public regex ``\\w+|[^\\w\\s]+`` which we implement
directly. ``None`` -> identity, callables pass through.

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


_TOKENIZERS = {
    "whitespace": whitespace_tokenizer,
    "wordpunct": wordpunct_tokenizer,
}


def get_tokenizer(tokenizer: Union[str, Callable, None]) -> Callable:
    """reference tokenizer.py:22-30."""
    if isinstance(tokenizer, str):
        name = tokenizer.lower()
        if name in ("word", "sent"):
            raise NotImplementedError(
                f"Tokenizer {tokenizer!r} needs NLTK punkt models, which "
                f"are not available; use 'whitespace', 'wordpunct', or a "
                f"custom callable."
            )
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
