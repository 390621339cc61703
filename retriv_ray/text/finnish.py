"""Finnish Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Finnish stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.german`.

Reference parity note: the reference's ``get_stemmer("finnish")``
resolves to PyStemmer's Snowball finnish
(retriv/sparse_retriever/preprocessing/stemmer.py:24). Spec summary:

- vowels a e i o u y ä ö; restricted vowels V = the same minus y;
  LV = one of the long pairs aa ee ii oo uu ää öö.
- R1/R2 standard (no 3-letter floor). Suffix MATCHING is limited to
  the step's region (setlimit), while action conditions may read
  characters before it.
- step 1 (particles, longest in R1): kin/kaan/kään/ko/kö/han/hän/
  pa/pä deleted after n, t or a vowel; sti deleted if in R2.
- step 2 (possessives, longest in R1): si unless after k; ni (then
  kse→ksi); nsa/nsä/mme/nne; an after ta/ssa/sta/lla/lta/na (and the
  ä-forms for än); en after lle/ine.
- step 3 (cases, longest in R1): hXn after its own X; siin/den/tten
  after Vi; seen after LV; a/ä after consonant+vowel; tta/ttä after
  e; the plain case list; n (then a final LV or ie loses its last
  vowel).
- step 4 (comparatives, longest in R2): mpi/mpa/mpä/mmi/mma/mmä
  unless after po; impi/…/immä and eja/ejä unconditionally.
- step 5: if step 3 removed an ending, delete a final i/j in R1;
  otherwise delete a final t in R1 after a vowel, and if a t went,
  delete a final imma, or mma not after po, in R2.
- step 6 (tidy): final LV in R1 loses a letter; final c+[aäei] in R1
  loses a letter; final oj/uj in R1 loses a letter; final jo in R1
  loses a letter; a final double consonant followed only by vowels
  is undoubled.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäö")
_RESTRICTED = set("aeiouäö")
_LV = {"aa", "ee", "ii", "oo", "uu", "ää", "öö"}

_STEP1_PARTICLES = ("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä")

_STEP2 = ("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en")

_STEP3_HXN = ("han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön")
_STEP3_VI = ("siin", "den", "tten")
_STEP3_PLAIN = (
    "ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
    "lle", "na", "nä", "ksi", "ine",
)

_STEP4_MP = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
_STEP4_UNCOND = ("impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä")


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
    return r1, r2


def _longest_in(w: str, sufs, region: int):
    best = None
    for suf in sufs:
        if w.endswith(suf) and len(w) - len(suf) >= region:
            if best is None or len(suf) > len(best):
                best = suf
    return best


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1, r2 = _regions(w)

    # ---- step 1: particles etc (matched in R1)
    cands = list(_STEP1_PARTICLES) + ["sti"]
    suf = _longest_in(w, cands, r1)
    if suf == "sti":
        if len(w) - 3 >= r2:
            w = w[:-3]
    elif suf is not None:
        pos = len(w) - len(suf)
        if pos >= 1 and (w[pos - 1] in "nt" or w[pos - 1] in _VOWELS):
            w = w[:pos]

    # ---- step 2: possessives (matched in R1)
    suf = _longest_in(w, _STEP2, r1)
    if suf is not None:
        pos = len(w) - len(suf)
        if suf == "si":
            if pos < 1 or w[pos - 1] != "k":
                w = w[:pos]
        elif suf == "ni":
            w = w[:pos]
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            w = w[:pos]
        elif suf == "an":
            if w[:pos].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                w = w[:pos]
        elif suf == "än":
            if w[:pos].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = w[:pos]
        elif suf == "en":
            if w[:pos].endswith(("lle", "ine")):
                w = w[:pos]

    # ---- step 3: case endings (matched in R1)
    removed_in_3 = False
    cands3 = (
        list(_STEP3_HXN)
        + list(_STEP3_VI)
        + ["seen", "a", "ä", "tta", "ttä", "n"]
        + list(_STEP3_PLAIN)
    )
    suf = _longest_in(w, cands3, r1)
    if suf is not None:
        pos = len(w) - len(suf)
        if suf in _STEP3_HXN:
            if pos >= 1 and w[pos - 1] == suf[1]:
                w = w[:pos]
                removed_in_3 = True
        elif suf in _STEP3_VI:
            if pos >= 2 and w[pos - 2] in _RESTRICTED and w[pos - 1] == "i":
                w = w[:pos]
                removed_in_3 = True
        elif suf == "seen":
            if pos >= 2 and w[pos - 2 : pos] in _LV:
                w = w[:pos]
                removed_in_3 = True
        elif suf in ("a", "ä"):
            if (
                pos >= 2
                and w[pos - 2] not in _VOWELS
                and w[pos - 1] in _VOWELS
            ):
                w = w[:pos]
                removed_in_3 = True
        elif suf in ("tta", "ttä"):
            if pos >= 1 and w[pos - 1] == "e":
                w = w[:pos]
                removed_in_3 = True
        elif suf == "n":
            w = w[:pos]
            removed_in_3 = True
            if w[-2:] in _LV or w.endswith("ie"):
                w = w[:-1]
        else:  # plain list
            w = w[:pos]
            removed_in_3 = True

    # ---- step 4: other endings (matched in R2)
    suf = _longest_in(w, list(_STEP4_MP) + list(_STEP4_UNCOND), r2)
    if suf is not None:
        pos = len(w) - len(suf)
        if suf in _STEP4_MP:
            if not w[:pos].endswith("po"):
                w = w[:pos]
        else:
            w = w[:pos]

    # ---- step 5: plurals
    if removed_in_3:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (
            w.endswith("t")
            and len(w) - 1 >= r1
            and len(w) >= 2
            and w[-2] in _VOWELS
        ):
            w = w[:-1]
            if w.endswith("imma") and len(w) - 4 >= r2:
                w = w[:-4]
            elif (
                w.endswith("mma")
                and len(w) - 3 >= r2
                and not w[: len(w) - 3].endswith("po")
            ):
                w = w[:-3]

    # ---- step 6: tidying up ("restricting each to R1": the matched
    # pair must lie wholly inside R1)
    # (a) final long vowel in R1
    if len(w) >= 2 and w[-2:] in _LV and len(w) - 2 >= r1:
        w = w[:-1]
    # (b) final consonant + a/ä/e/i in R1
    if (
        len(w) >= 2
        and w[-1] in "aäei"
        and w[-2] not in _VOWELS
        and len(w) - 2 >= r1
    ):
        w = w[:-1]
    # (c) final oj / uj
    if len(w) >= 2 and w[-2:] in ("oj", "uj") and len(w) - 2 >= r1:
        w = w[:-1]
    # (d) final jo
    if len(w) >= 2 and w[-2:] == "jo" and len(w) - 2 >= r1:
        w = w[:-1]
    # (e) undouble a final double consonant followed only by vowels
    i = len(w) - 1
    while i >= 0 and w[i] in _VOWELS:
        i -= 1
    if i >= 1 and w[i] not in _VOWELS and w[i] == w[i - 1]:
        w = w[:i] + w[i + 1 :]

    return w
