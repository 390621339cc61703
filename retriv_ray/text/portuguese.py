"""Portuguese Snowball stemmer, implemented from the published
algorithm (snowballstem.org "Portuguese stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("portuguese")``
resolves to PyStemmer/NLTK's Snowball portuguese, which encodes this
same published algorithm. Spec summary:
- prelude: nasal vowels ã/õ are rewritten a~/o~ (the ~ acting as a
  consonant), undone by the postlude.
- RV/R1/R2 as in Spanish.
- step 1: standard suffixes (R2 conditions; logia->log, uça~o->u,
  ência->ente; amente in R1 with iv/at and os/ic/ad follow-ups;
  mente with ante/avel/ível follow-ups; idade with abil/ic/iv;
  iva/ivo with at; ira->ir after e in RV).
- step 2 (only if step 1 changed nothing): the verb-ending table
  in RV.
- step 3 (if step 1 or 2 changed the word): final i after c in RV.
- step 4 (if neither changed it): residual suffix os/a/i/o/á/í/ó
  in RV.
- step 5 (always): final e/é/ê in RV (dropping a preceding gu/ci's
  u/i in RV), and ç -> c.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóúâêô")


def _prelude(word: str) -> str:
    return word.replace("ã", "a~").replace("õ", "o~")


def _postlude(word: str) -> str:
    return word.replace("a~", "ã").replace("o~", "õ")


_STEP1 = [
    (("amento", "amentos", "imento", "imentos", "adoras", "adores",
      "aço~es", "adora", "ador", "aça~o", "antes", "ância", "ezas",
      "icos", "icas", "ismos", "ável", "ível", "istas", "osos",
      "osas", "eza", "ico", "ica", "ismo", "ista", "oso", "osa",
      "ante"),
     "delete_r2"),
    (("logias", "logia"), "log"),
    (("uço~es", "uça~o"), "u"),
    (("ências", "ência"), "ente"),
    (("amente",), "amente"),
    (("mente",), "mente"),
    (("idades", "idade"), "idade"),
    (("ivas", "ivos", "iva", "ivo"), "iva"),
    (("iras", "ira"), "ira"),
]

_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)


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

    changed = False

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
                changed = True
        elif action in ("log", "u", "ente"):
            if in_r2(pos):
                w = w[:pos] + action
                changed = True
        elif action == "amente":
            if in_r1(pos):
                w = w[:pos]
                changed = True
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
                changed = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif action == "idade":
            if in_r2(pos):
                w = w[:pos]
                changed = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif action == "iva":
            if in_r2(pos):
                w = w[:pos]
                changed = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif action == "ira":
            # replace with ir if in RV and preceded by e
            if in_rv(pos) and pos >= 1 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
                changed = True

    # ---- step 2: verb suffixes (only if step 1 changed nothing)
    if not changed:
        best2 = None
        for suf in _STEP2:
            if w.endswith(suf) and (best2 is None or len(suf) > len(best2)):
                best2 = suf
        if best2 is not None and in_rv(len(w) - len(best2)):
            w = w[: -len(best2)]
            changed = True

    if changed:
        # ---- step 3: final i after c, in RV
        if w.endswith("ci") and in_rv(len(w) - 1):
            w = w[:-1]
    else:
        # ---- step 4: residual suffix
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # ---- step 5: final e/é/ê (+ gu/ci contraction), ç -> c
    if w and w[-1] in "eéê" and in_rv(len(w) - 1):
        w = w[:-1]
        if (
            (w.endswith("gu") or w.endswith("ci"))
            and in_rv(len(w) - 1)
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return _postlude(w)
