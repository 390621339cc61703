"""Spanish Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Spanish stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.german`.

Reference parity note: the reference's ``get_stemmer("spanish")``
resolves to PyStemmer/NLTK's Snowball spanish, which encodes this same
published algorithm. Spec summary:
- RV: after the next vowel when letter 2 is a consonant; after the
  next consonant when letters 1-2 are vowels; else after letter 3.
- step 0: attached pronouns after gerund/infinitive endings in RV
  (accented forms lose their accent).
- step 1: standard suffixes (R2 conditions; logía->log, ución->u,
  encia->ente; amente in R1 with iv/at, os/ic/ad follow-ups; mente,
  idad, iva/ivo families with their follow-ups).
- step 2a (only if step 1 changed nothing): y-verb suffixes in RV
  preceded by u; step 2b: the big verb-ending table in RV ("en es
  éis emos" additionally drop a preceding "gu"'s u).
- step 3: residual vowels in RV ("e/é" also drop a "gu"'s u in RV).
- postlude: strip acute accents.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóúü")


def _rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _VOWELS:
        # skip to the next vowel after position 1
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
        # now at first consonant after a vowel (or end)
        return i + 1 if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return r1, r2


_DEACCENT = str.maketrans("áéíóú", "aeiou")

_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_PRE_ACCENTED = ("iéndo", "ándo", "ár", "ér", "ír")
_PRE_PLAIN = ("iendo", "ando", "ar", "er", "ir")

_STEP1 = [
    # (suffixes longest-first, action)
    (("amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
      "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
      "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa"),
     "delete_r2"),
    (("adoras", "adores", "aciones", "ancias", "adora", "ación", "antes",
      "ancia", "ador", "ante"),
     "delete_r2_ic"),
    (("logías", "logía"), "log"),
    (("uciones", "ución"), "u"),
    (("encias", "encia"), "ente"),
    (("amente",), "amente"),
    (("mente",), "mente"),
    (("idades", "idad"), "idad"),
    (("ivas", "ivos", "iva", "ivo"), "iva"),
]

_STEP2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
           "yes", "ya", "ye", "yo", "yó")

_STEP2B_GU = ("emos", "éis", "en", "es")

_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
    "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
    "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
    "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís",
)

_STEP3_DEL = ("os", "a", "o", "á", "í", "ó")


def stem(word: str) -> str:
    w = word.lower()
    rv = _rv(w)
    r1, r2 = _regions(w)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 0: attached pronouns
    for pron in _PRONOUNS:
        if not w.endswith(pron):
            continue
        stem_ = w[: -len(pron)]
        cut = len(stem_)
        matched = False
        for pre in _PRE_ACCENTED:
            if stem_.endswith(pre) and in_rv(cut - len(pre)):
                w = stem_.translate(_DEACCENT)
                matched = True
                break
        if not matched:
            for pre in _PRE_PLAIN:
                if stem_.endswith(pre) and in_rv(cut - len(pre)):
                    w = stem_
                    matched = True
                    break
        # spec: "yendo" must lie in RV (only the preceding u may sit
        # outside RV) — without the RV check, very short words like
        # "uyendolo" (RV starts at 3) would be over-stemmed.
        if (
            not matched
            and stem_.endswith("yendo")
            and "uyendo" == stem_[-6:]
            and in_rv(len(stem_) - 5)
        ):
            w = stem_
        break  # longest pronoun matched; pronoun rules tried once

    step1_changed = False

    # ---- step 1: standard suffixes (longest match over the whole table)
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
        elif action == "amente":
            if in_r1(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif action == "mente":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif action == "idad":
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

    # ---- step 2a: y-verb suffixes (only if step 1 did nothing)
    step2a_changed = False
    if not step1_changed:
        for suf in sorted(_STEP2A, key=len, reverse=True):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_rv(pos) and pos >= 1 and w[pos - 1] == "u":
                    w = w[:pos]
                    step2a_changed = True
                break

    # ---- step 2b: other verb suffixes
    if not step1_changed and not step2a_changed:
        best2 = None
        for suf in _STEP2B_GU + _STEP2B:
            if w.endswith(suf) and (best2 is None or len(suf) > len(best2[0])):
                best2 = (suf, suf in _STEP2B_GU)
        if best2 is not None:
            suf, is_gu = best2
            pos = len(w) - len(suf)
            if in_rv(pos):
                w = w[:pos]
                if is_gu and w.endswith("gu"):
                    w = w[:-1]

    # ---- step 3: residual suffix
    for suf in ("os", "e", "é", "a", "o", "á", "í", "ó"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in ("e", "é"):
                if in_rv(pos):
                    w = w[:pos]
                    if w.endswith("gu") and in_rv(len(w) - 1):
                        w = w[:-1]
            elif suf in _STEP3_DEL and in_rv(pos):
                w = w[:pos]
            break

    return w.translate(_DEACCENT)
