"""Dutch Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Dutch stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.german`.

Reference parity note: the reference's ``get_stemmer("dutch")``
resolves to PyStemmer's Snowball dutch
(retriv/sparse_retriever/preprocessing/stemmer.py:22). Spec summary:

- prelude: strip umlaut/acute accents (grave è stays, it is a listed
  vowel); mark initial ``y``, ``y`` after a vowel and ``i`` between
  vowels as consonants by upper-casing (undone in the postlude).
- R1/R2 standard, R1 floored so at least 3 letters precede it.
- step 1 (longest match): heden→heid in R1; en/ene deleted in R1
  after a valid en-ending (non-vowel, not preceded by ``gem``), then
  undouble kk/dd/tt; s/se deleted in R1 after a valid s-ending
  (non-vowel other than j).
- step 2: delete final e in R1 after a non-vowel, then undouble;
  remember that an e was removed.
- step 3a: delete heid in R2 unless preceded by c, then re-apply the
  en rule.
- step 3b (longest match, all in R2): end/ing deleted, then a
  preceding ig (in R2, not after e) is deleted, else undouble;
  ig deleted unless after e; lijk deleted then step 2 re-run;
  baar deleted; bar deleted only if step 2 removed an e.
- step 4: undouble a final aa/ee/oo/uu between consonants
  (C V V D with D not the consonant-marked I).
"""

from __future__ import annotations

_VOWELS = set("aeiouyè")

_ACCENT_FOLD = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(w: str) -> str:
    w = w.translate(_ACCENT_FOLD)
    out = []
    n = len(w)
    for i, ch in enumerate(w):
        if ch == "y" and (i == 0 or w[i - 1] in _VOWELS):
            out.append("Y")
        elif (
            ch == "i"
            and 0 < i < n - 1
            and w[i - 1] in _VOWELS
            and w[i + 1] in _VOWELS
        ):
            out.append("I")
        else:
            out.append(ch)
    return "".join(out)


def _regions(w: str):
    n = len(w)

    def after_vc(start: int) -> int:
        i = start
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return max(3, r1), r2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def _valid_en(w: str, pos: int) -> bool:
    """en/ene at ``pos``: preceded by a non-vowel and not by 'gem'."""
    if pos < 1 or w[pos - 1] in _VOWELS:
        return False
    return not w[:pos].endswith("gem")


def stem(word: str) -> str:
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w.lower()
    r1, r2 = _regions(w)

    # ---- step 1. Dutch tests R1 inside the among ACTIONS (not via
    # setlimit), so the longest matching suffix is chosen first and a
    # failed condition means no action — no fallback to a shorter
    # suffix.
    suf = next(
        (s for s in ("heden", "ene", "en", "se", "s") if w.endswith(s)), None
    )
    if suf == "heden":
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif suf in ("ene", "en"):
        pos = len(w) - len(suf)
        if pos >= r1 and _valid_en(w, pos):
            w = _undouble(w[:pos])
    elif suf in ("se", "s"):
        pos = len(w) - len(suf)
        if pos >= r1 and pos >= 1 and w[pos - 1] not in _VOWELS and w[pos - 1] != "j":
            w = w[:pos]

    # ---- step 2
    e_removed = False
    if (
        w.endswith("e")
        and len(w) - 1 >= r1
        and len(w) >= 2
        and w[-2] not in _VOWELS
    ):
        w = _undouble(w[:-1])
        e_removed = True

    # ---- step 3a
    if w.endswith("heid") and len(w) - 4 >= r2 and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= r1 and _valid_en(w, len(w) - 2):
            w = _undouble(w[:-2])

    # ---- step 3b (same among semantics: longest match chosen first,
    # conditions tested after, no fallback)
    suf = next(
        (s for s in ("lijk", "baar", "end", "ing", "bar", "ig") if w.endswith(s)),
        None,
    )
    if suf in ("end", "ing"):
        if len(w) - 3 >= r2:
            w = w[:-3]
            if (
                w.endswith("ig")
                and len(w) - 2 >= r2
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif suf == "ig":
        if len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif suf == "lijk":
        if len(w) - 4 >= r2:
            w = w[:-4]
            # repeat step 2
            if (
                w.endswith("e")
                and len(w) - 1 >= r1
                and len(w) >= 2
                and w[-2] not in _VOWELS
            ):
                w = _undouble(w[:-1])
    elif suf == "baar":
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif suf == "bar":
        if len(w) - 3 >= r2 and e_removed:
            w = w[:-3]

    # ---- step 4: undouble vowel (C aa/ee/oo/uu D, D a non-vowel ≠ I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            c not in _VOWELS
            and v1 == v2
            and v1 in "aeou"
            and d not in _VOWELS
            and d != "I"
        ):
            w = w[:-2] + w[-1]

    return w.lower()
