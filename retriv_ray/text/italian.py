"""Italian Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Italian stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("italian")``
resolves to PyStemmer/NLTK's Snowball italian, which encodes this same
published algorithm. Spec summary:
- prelude: acute accents -> grave; ``qu`` -> ``qU``; u/i between
  vowels marked U/I (consonants from then on).
- RV/R1/R2 as in Spanish.
- step 0: attached pronouns after gerund (delete) or infinitive
  (replace with e) endings in RV.
- step 1: standard suffixes (R2 conditions; logia->log, uzione->u,
  enza->ente; amento/imento in RV; amente in R1 with iv/at and
  os/ic/abil follow-ups; ità and ivo families with follow-ups).
- step 2 (only if step 1 removed nothing): verb endings in RV.
- step 3a: residual final vowel in RV (+ a preceding i in RV);
  step 3b: final ch/gh -> c/g in RV.
- postlude: lower-case the U/I marks.
"""

from __future__ import annotations

_VOWELS = set("aeiouàèìòù")

_ACUTE2GRAVE = str.maketrans("áéíóú", "àèìòù")

_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene",
    "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
    "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
    "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
)
_PRE_GERUND = ("ando", "endo")
_PRE_INFIN = ("ar", "er", "ir")

_STEP1 = [
    (("atrice", "atrici", "abile", "abili", "ibile", "ibili", "mente",
      "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste",
      "isti", "istà", "istè", "istì", "ante", "anti", "ico", "ici",
      "ica", "ice", "oso", "osi", "osa", "ose"),
     "delete_r2"),
    (("azione", "azioni", "atore", "atori"), "delete_r2_ic"),
    (("logia", "logie"), "log"),
    (("uzione", "uzioni", "usione", "usioni"), "u"),
    (("enza", "enze"), "ente"),
    (("amento", "amenti", "imento", "imenti"), "delete_rv"),
    (("amente",), "amente"),
    (("ità",), "ita"),
    (("ivo", "ivi", "iva", "ive"), "iva"),
]

_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def _prelude(word: str) -> str:
    w = word.translate(_ACUTE2GRAVE)
    chars = list(w)
    # qu -> qU (first pass of the spec's prelude)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    # u/i between vowels -> U/I, left to right over the CURRENT state
    # (a freshly marked U/I is a consonant for the next position)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in ("u", "i")
            and chars[i - 1] in _VOWELS
            and chars[i + 1] in _VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _VOWELS:
        i = 2
        while i < n and word[i] not in _VOWELS:
            i += 1
        return min(i + 1, n)
    if word[0] in _VOWELS and word[1] in _VOWELS:
        i = 2
        while i < n and word[i] in _VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


def _regions(word: str) -> tuple:
    n = len(word)

    def after_vc(start: int) -> int:
        i = start
        while i < n and word[i] not in _VOWELS:
            i += 1
        while i < n and word[i] in _VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return r1, r2


def stem(word: str) -> str:
    w = _prelude(word.lower())
    rv = _rv(w)
    r1, r2 = _regions(w)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 0: attached pronouns (longest pronoun, tried once)
    for pron in _PRONOUNS:
        if not w.endswith(pron):
            continue
        stem_ = w[: -len(pron)]
        cut = len(stem_)
        for pre in _PRE_GERUND:
            if stem_.endswith(pre) and in_rv(cut - len(pre)):
                w = stem_  # case (a): delete the pronoun
                break
        else:
            for pre in _PRE_INFIN:
                if stem_.endswith(pre) and in_rv(cut - len(pre)):
                    w = stem_ + "e"  # case (b): replace pronoun with e
                    break
        break

    step1_changed = False

    # ---- step 1: standard suffixes (longest match over the table)
    best = None
    for sufs, action in _STEP1:
        for suf in sufs:
            if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
                best = (suf, action)
    if best is not None:
        suf, action = best
        pos = len(w) - len(suf)
        if action == "delete_r2":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
        elif action == "delete_r2_ic":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif action in ("log", "u", "ente"):
            if in_r2(pos):
                w = w[:pos] + action
                step1_changed = True
        elif action == "delete_rv":
            if in_rv(pos):
                w = w[:pos]
                step1_changed = True
        elif action == "amente":
            if in_r1(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("abil", "os", "ic"):
                        if w.endswith(pre) and in_r2(len(w) - len(pre)):
                            w = w[: -len(pre)]
                            break
        elif action == "ita":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif action == "iva":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if not step1_changed:
        best2 = None
        for suf in _STEP2:
            if w.endswith(suf) and (best2 is None or len(suf) > len(best2)):
                best2 = suf
        if best2 is not None and in_rv(len(w) - len(best2)):
            w = w[: -len(best2)]

    # ---- step 3a: residual final vowel (+ a preceding i) in RV
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]

    # ---- step 3b: final ch/gh -> c/g in RV
    if (w.endswith("ch") or w.endswith("gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    # ---- postlude
    return w.translate(str.maketrans("UI", "ui"))
