"""Norwegian (Bokmål) Snowball stemmer, implemented from the published
algorithm (snowballstem.org "Norwegian stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.danish`.

Reference parity note: the reference's ``get_stemmer("norwegian")``
resolves to PyStemmer's Snowball norwegian
(retriv/sparse_retriever/preprocessing/stemmer.py:35). Spec summary:

- R1 = region after the first non-vowel following a vowel, adjusted so
  that at least 3 letters precede it.
- step 1 (longest match in R1): delete one of 26 listed suffixes;
  or delete final ``s`` preceded by a valid s-ending (one of
  b c d f g h j l m n o p r t v y z, or ``k`` not preceded by a
  vowel); or replace erte/ert with ``er``.
- step 2: if the word ends dt/vt with the suffix in R1, delete the
  final letter.
- step 3: delete the longest of
  leg/eleg/ig/eig/lig/elig/els/lov/elov/slov/hetslov in R1.
"""

from __future__ import annotations

_VOWELS = set("aeiouyæåø")

_STEP1_DELETE = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
)
_STEP1_ERT = ("erte", "ert")  # -> er

_S_ENDING = set("bcdfghjlmnoprtvyz")

_STEP3 = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


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

    # ---- step 1 (longest match across all three suffix classes)
    best = None  # (suffix, action) with action in {del, s, ert}
    for suf in _STEP1_DELETE:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if best is None or len(suf) > len(best[0]):
                best = (suf, "del")
    for suf in _STEP1_ERT:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if best is None or len(suf) > len(best[0]):
                best = (suf, "ert")
    # bare "s" is the shortest suffix in the among: it can only be the
    # longest match when nothing else matched (every other s-final
    # entry — as/es/ens/… — is longer and would have won)
    if best is None and w.endswith("s") and len(w) - 1 >= r1:
        best = ("s", "s")
    if best is not None:
        suf, action = best
        if action == "del":
            w = w[: -len(suf)]
        elif action == "ert":
            w = w[: -len(suf)] + "er"
        else:  # final s: valid s-ending check (k needs a non-vowel before it)
            prev = w[-2] if len(w) >= 2 else ""
            if prev in _S_ENDING or (
                prev == "k" and (len(w) < 3 or w[-3] not in _VOWELS)
            ):
                w = w[:-1]

    # ---- step 2
    if (w.endswith("dt") or w.endswith("vt")) and len(w) - 2 >= r1:
        w = w[:-1]

    # ---- step 3
    best3 = None
    for suf in _STEP3:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if best3 is None or len(suf) > len(best3):
                best3 = suf
    if best3 is not None:
        w = w[: -len(best3)]

    return w
