"""Stemmer registry.

Reference: retriv/sparse_retriever/preprocessing/stemmer.py:10-223
resolves 32 named stemmers via NLTK / PyStemmer / krovetzstemmer.
None of those packages is available here; we ship a from-scratch
Porter2 implementation (retriv_ray.text.porter2) for the default
"english" stemmer — the reference's "english" is NLTK's Snowball
english (stemmer.py:23), i.e. the same published Porter2 algorithm —
and a from-scratch classic Porter 1980 (retriv_ray.text.porter1) for
"porter" (the reference's "porter" is NLTK's PorterStemmer,
stemmer.py:116; see porter1.py's parity note on NLTK's extensions).
Other names raise with a clear message; custom callables pass
through; ``None`` -> identity (reference stemmer.py:215-223).
"""

from __future__ import annotations

from typing import Callable, Union

from retriv_ray.text.french import stem as french_stem
from retriv_ray.text.german import stem as german_stem
from retriv_ray.text.italian import stem as italian_stem
from retriv_ray.text.lancaster import stem as lancaster_stem
from retriv_ray.text.porter1 import stem as porter1_stem
from retriv_ray.text.porter2 import stem as english_stem
from retriv_ray.text.portuguese import stem as portuguese_stem
from retriv_ray.text.russian import stem as russian_stem
from retriv_ray.text.spanish import stem as spanish_stem
from retriv_ray.text.tokenizer import identity_function

_STEMMERS = {
    "english": english_stem,
    "porter": porter1_stem,
    "lancaster": lancaster_stem,
    "german": german_stem,
    "spanish": spanish_stem,
    "italian": italian_stem,
    "french": french_stem,
    "portuguese": portuguese_stem,
    "russian": russian_stem,
}


def get_stemmer(stemmer: Union[str, Callable, None]) -> Callable:
    """reference stemmer.py:209-223 (named set limited to english)."""
    if isinstance(stemmer, str):
        name = stemmer.lower()
        if name not in _STEMMERS:
            raise NotImplementedError(
                f"Stemmer {stemmer!r} requires NLTK/PyStemmer which are "
                f"not available; 'english' (Porter2) ships with "
                f"retriv_ray, or pass a custom callable."
            )
        return _STEMMERS[name]
    elif callable(stemmer):
        return stemmer
    elif stemmer is None:
        return identity_function
    else:
        raise NotImplementedError
