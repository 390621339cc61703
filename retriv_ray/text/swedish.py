"""Swedish Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Swedish stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.danish`.

Reference parity note: the reference's ``get_stemmer("swedish")``
resolves to PyStemmer's Snowball swedish
(retriv/sparse_retriever/preprocessing/stemmer.py:40). Spec summary:

- R1 = region after the first non-vowel following a vowel, adjusted so
  that at least 3 letters precede it.
- step 1 (longest match in R1): delete one of 36 listed suffixes, or
  delete final ``s`` preceded by a valid s-ending
  (one of b c d f g h j k l m n o p r t v y).
- step 2: if the word ends dd/gd/nn/dt/gt/kt/tt with the suffix in R1,
  delete the final letter.
- step 3 (in R1): delete lig/ig/els; replace löst with lös and fullt
  with full.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäåö")

_STEP1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast",
)

_S_ENDING = set("bcdfghjklmnoprtvy")

_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def _r1(word: str) -> int:
    n = len(word)
    i = 0
    while i < n and word[i] not in _VOWELS:
        i += 1
    while i < n and word[i] in _VOWELS:
        i += 1
    r1 = i + 1 if i < n else n
    return max(3, r1)


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w)

    # ---- step 1 (longest match; bare "s" can only win when no listed
    # suffix matched — every s-final list entry is longer)
    best = None
    for suf in _STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if best is None or len(suf) > len(best):
                best = suf
    if best is not None:
        w = w[: -len(best)]
    elif (
        w.endswith("s")
        and len(w) - 1 >= r1
        and len(w) >= 2
        and w[-2] in _S_ENDING
    ):
        w = w[:-1]

    # ---- step 2
    for suf in _STEP2:
        if w.endswith(suf) and len(w) - 2 >= r1:
            w = w[:-1]
            break

    # ---- step 3 (longest match in R1; the five suffixes are mutually
    # exclusive by final letter so sequential checks are equivalent)
    for suf in ("lig", "ig", "els"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("löst") and len(w) - 4 >= r1:
            w = w[:-1]
        elif w.endswith("fullt") and len(w) - 5 >= r1:
            w = w[:-1]

    return w
