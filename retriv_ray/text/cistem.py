"""CISTEM German stemmer, implemented from the published algorithm
(Weißweiler & Fraser 2017, "Developing a Stemmer for German Based on
a Comparative Analysis of Publicly Available Stemmers"; the paper
publishes the full pseudocode).

Reference parity note: the reference's ``get_stemmer("cistem")``
resolves to ``nltk.stem.Cistem().stem``
(retriv/sparse_retriever/preprocessing/stemmer.py:16), which encodes
this same published algorithm with ``case_insensitive=False``: a
word whose first letter is upper-case (a German noun) keeps its
final ``t``. The reference pipeline lower-cases before stemming, so
words normally arrive lower-cased and the ``t`` rule is active.

Algorithm: fold umlauts and ß; strip a ``ge`` prefix when at least 4
characters remain; protect ``sch``/``ei``/``ie`` and doubled letters
with placeholder characters; repeatedly strip ``em``/``er`` (length
> 5), ``nd``, ``t`` (lower-case words only), ``e``/``s``/``n``
while the word stays longer than 3; then undo the placeholders.
"""

from __future__ import annotations

import re

_STRIP_GE = re.compile(r"^ge(.{4,})")
_REPL_XX = re.compile(r"(.)\1")
_REPL_XX_BACK = re.compile(r"(.)\*")

_UMLAUT_FOLD = str.maketrans("üöä", "uoa")


def stem(word: str, case_insensitive: bool = False) -> str:
    if not word:
        return word
    upper = word[0].isupper()
    w = word.lower().translate(_UMLAUT_FOLD).replace("ß", "ss")
    w = _STRIP_GE.sub(r"\1", w)
    w = w.replace("sch", "$").replace("ei", "%").replace("ie", "&")
    w = _REPL_XX.sub(r"\1*", w)

    while len(w) > 3:
        if len(w) > 5 and w.endswith(("em", "er")):
            w = w[:-2]
            continue
        if w.endswith("nd"):
            w = w[:-2]
            continue
        if (not upper or case_insensitive) and w.endswith("t"):
            w = w[:-1]
            continue
        if w.endswith(("e", "s", "n")):
            w = w[:-1]
            continue
        break

    w = _REPL_XX_BACK.sub(r"\1\1", w)
    w = w.replace("%", "ei").replace("&", "ie").replace("$", "sch")
    return w
