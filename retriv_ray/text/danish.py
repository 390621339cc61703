"""Danish Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Danish stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("danish")``
resolves to PyStemmer's Snowball danish
(retriv/sparse_retriever/preprocessing/stemmer.py:21), which encodes
this same published algorithm. Spec summary:

- R1 = region after the first non-vowel following a vowel, adjusted so
  that at least 3 letters precede it.
- step 1: delete the longest of 31 listed suffixes in R1, or final
  ``s`` in R1 when preceded by a valid s-ending (the preceding letter
  itself need not lie in R1).
- step 2: if the word ends gd/dt/gt/kt with the suffix in R1, delete
  the final letter.
- step 3: strip ``st`` off a final ``igst``; then delete the longest
  of ig/lig/elig/els in R1 (re-running step 2 afterwards), or replace
  a final ``løst`` in R1 with ``løs``.
- step 4: undouble a final double consonant whose last letter is in R1.
"""

from __future__ import annotations

_VOWELS = set("aeiouyæåø")

# step 1(a), deletion in R1 (longest match wins; listed here unordered,
# _longest() compares lengths)
_STEP1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)

# step 1(b): final s deleted when preceded by one of these
_S_ENDING = set("abcdfghjklmnoprtvyzå")

_STEP2 = ("gd", "dt", "gt", "kt")

_STEP3 = ("ig", "lig", "elig", "els")


def _r1(word: str) -> int:
    """Start of R1, but never before position 3 (spec: at least three
    letters precede R1)."""
    n = len(word)
    i = 0
    while i < n and word[i] not in _VOWELS:
        i += 1
    while i < n and word[i] in _VOWELS:
        i += 1
    r1 = i + 1 if i < n else n
    return max(3, r1)


def _longest(w: str, sufs, r1: int):
    best = None
    for suf in sufs:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if best is None or len(suf) > len(best):
                best = suf
    return best


def _step2(w: str, r1: int) -> str:
    for suf in _STEP2:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            return w[:-1]
    return w


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w)

    # ---- step 1
    suf = _longest(w, _STEP1, r1)
    if suf is not None:
        w = w[: -len(suf)]
    elif (
        w.endswith("s")
        and len(w) - 1 >= r1
        and len(w) >= 2
        and w[-2] in _S_ENDING
    ):
        w = w[:-1]

    # ---- step 2
    w = _step2(w, r1)

    # ---- step 3
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest(w, _STEP3, r1)
    if suf is not None:
        w = w[: -len(suf)]
        w = _step2(w, r1)
    elif w.endswith("løst") and len(w) - 4 >= r1:
        w = w[:-1]

    # ---- step 4: undouble final double consonant (last letter in R1)
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]

    return w
