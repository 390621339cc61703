"""German Snowball stemmer, implemented from the published algorithm
(snowballstem.org "German stemming algorithm") — the same
from-scratch-from-spec approach as :mod:`retriv_ray.text.porter2`.

Reference parity note: the reference's ``get_stemmer("german")``
resolves to PyStemmer/NLTK's Snowball german (reference
retriv/sparse_retriever/preprocessing/stemmer.py), which encodes this
same published algorithm. Spec summary:
- prelude: ß -> ss; u and y between vowels are marked as consonants
  (tracked here with a boolean mask rather than upper-casing).
- regions: R1/R2 as in all Snowball stemmers, with R1's start moved
  to at least position 3.
- step 1 (longest match): em/ern/er delete in R1; e/en/es delete in
  R1, then an ending "niss" drops its final s; s deletes in R1 after
  a valid s-ending (bdfghklmnrt).
- step 2 (longest match): en/er/est delete in R1; st deletes in R1
  after a valid st-ending (bdfghklmnt) with >= 3 letters before it.
- step 3 (d-suffixes, longest match): end/ung delete in R2 (a
  preceding non-"e"-preceded ig also deletes in R2); ig/ik/isch
  delete in R2 unless preceded by e; lich/heit delete in R2 (a
  preceding er/en deletes in R1); keit deletes in R2 (a preceding
  lich/ig deletes in R2).
- postlude: ä->a, ö->o, ü->u.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäöü")
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")


def _consonant_mask(word: str) -> list:
    """True where the char acts as a consonant: non-vowels always; u/y
    also when BETWEEN vowels (spec prelude)."""
    n = len(word)
    mask = [word[i] not in _VOWELS for i in range(n)]
    for i in range(1, n - 1):
        if word[i] in "uy" and word[i - 1] in _VOWELS and word[i + 1] in _VOWELS:
            mask[i] = True
    return mask


def _regions(word: str) -> tuple:
    """(r1, r2) start indexes; r1 adjusted to >= 3 (spec)."""
    cons = _consonant_mask(word)
    n = len(word)

    def after_vc(start: int) -> int:
        i = start
        while i < n and cons[i]:
            i += 1
        while i < n and not cons[i]:
            i += 1
        # i is at the first consonant after the first vowel (from
        # `start`); region begins after it
        while i < n and cons[i]:
            return i + 1
        return n

    r1 = after_vc(0)
    r2 = after_vc(r1) if r1 < n else n
    if r1 < 3:
        r1 = min(3, n)
    return r1, r2


def stem(word: str) -> str:
    w = word.lower().replace("ß", "ss")
    if len(w) <= 2:
        return w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    r1, r2 = _regions(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1 — longest of the three groups
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and in_r1(len(w) - 1)
                and len(w) >= 2
                and w[-2] in _S_ENDING
            ):
                w = w[:-1]

    # step 2 — longest of en/er/est, else st
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and in_r1(len(w) - 2)
            and len(w) >= 6  # >= 3 letters before the st-ending letter
            and w[-3] in _ST_ENDING
        ):
            w = w[:-2]

    # step 3 — d-suffixes, longest match
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(pos):
                w = w[:pos]
                if (
                    w.endswith("ig")
                    and in_r2(len(w) - 2)
                    and not w[: -2].endswith("e")
                ):
                    w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(pos) and not w[:pos].endswith("e"):
                w = w[:pos]
        elif suf in ("lich", "heit"):
            if in_r2(pos):
                w = w[:pos]
                for pre in ("er", "en"):
                    if w.endswith(pre) and in_r1(len(w) - 2):
                        w = w[:-2]
                        break
        elif suf == "keit":
            if in_r2(pos):
                w = w[:pos]
                for pre in ("lich", "ig"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        break

    return w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
