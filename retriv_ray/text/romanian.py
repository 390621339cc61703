"""Romanian Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Romanian stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("romanian")``
resolves to PyStemmer's Snowball romanian
(retriv/sparse_retriever/preprocessing/stemmer.py:37). The modern
algorithm normalizes the legacy cedilla letters ş/ţ to the correct
comma-below forms ș/ț in a prelude; we do the same, so stems are
emitted with comma-below forms regardless of input convention.

Spec summary:
- prelude: cedilla fold; i and u between vowels are marked as
  consonants by upper-casing (undone at the end).
- R1/R2 standard; RV as for Spanish.
- step 0 (plurals/articles, longest in R1): ul/ului deleted;
  aua→a; ea/ele/elor→e; ii/iua/iei/iile/iilor/ilor→i;
  ile→i unless preceded by ab; atei→at; ație/ația→ați.
- step 1 (combining suffixes, longest in R1, repeated):
  abilitate/abilitati/abilități→abil; ibilitate→ibil;
  ivitate/ivitati/ivități→iv; icitate/…/ical…→ic;
  ativ/…/ător…→at; itiv/…/itor…→it.
- step 2 (standard suffixes, longest in R2): a long deletion list;
  țiune/țiuni→ț→t; ism/…/iști→ist.
- step 3 (verb suffixes in RV, only if steps 1 and 2 removed
  nothing): group (a) deleted when preceded in RV by a consonant or
  ``u``; group (b) deleted unconditionally.
- step 4: delete final a/e/i/ie/ă in RV (longest match).
"""

from __future__ import annotations

_VOWELS = set("aăâeiîou")

_CEDILLA_FOLD = str.maketrans("şţ", "șț")

# ---- step 0: (suffix, replacement); longest match in R1
_STEP0 = [
    ("ului", ""), ("ul", ""),
    ("aua", "a"),
    ("elor", "e"), ("ele", "e"), ("ea", "e"),
    ("iilor", "i"), ("iile", "i"), ("iua", "i"), ("iei", "i"),
    ("ilor", "i"), ("ii", "i"),
    ("atei", "at"),
    ("ație", "ați"), ("ația", "ați"),
]

# ---- step 1: (suffix, replacement); longest in R1, applied repeatedly
_STEP1 = [
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilități", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivități", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icități", "ic"),
    ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("icivă", "ic"),
    ("ical", "ic"), ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("ațiune", "at"),
    ("atoare", "at"), ("ator", "at"), ("atori", "at"),
    ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("ițiune", "it"),
    ("itoare", "it"), ("itor", "it"), ("itori", "it"),
]

# ---- step 2 (longest in R2)
_STEP2_DELETE = (
    "at", "ata", "ată", "ati", "ate",
    "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite",
    "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oși",
    "ant", "anta", "ante", "anti", "antă",
    "ator", "atori",
    "itate", "itati", "ități",
    "iv", "iva", "ive", "ivi", "ivă",
)
_STEP2_IUNE = ("iune", "iuni")  # delete if preceded by ț; ț -> t
_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "iști")

# ---- step 3 verb suffixes in RV
_STEP3_A = (
    "are", "ere", "ire", "âre",
    "ind", "ând", "indu", "ându",
    "eze", "ească", "ez", "ezi", "ează",
    "esc", "ești", "ește", "ăsc", "ăști", "ăște",
    "am", "ai", "au", "eam", "eai", "eau", "iam", "iai", "iau",
    "ui", "ași", "arăm", "arăți", "ară",
    "uși", "urăm", "urăți", "ură",
    "iși", "irăm", "irăți", "iră",
    "âi", "âși", "ârăm", "ârăți", "âră",
    "asem", "aseși", "ase", "aserăm", "aserăți", "aseră",
    "isem", "iseși", "ise", "iserăm", "iserăți", "iseră",
    "âsem", "âseși", "âse", "âserăm", "âserăți", "âseră",
    "usem", "useși", "use", "userăm", "userăți", "useră",
)
_STEP3_B = (
    "ăm", "ați", "em", "eți", "im", "iți", "âm", "âți",
    "seși", "serăm", "serăți", "seră", "sei", "se",
    "sesem", "seseși", "sese", "seserăm", "seserăți", "seseră",
)

_STEP4 = ("ie", "a", "e", "i", "ă")


def _prelude(w: str) -> str:
    w = w.translate(_CEDILLA_FOLD)
    out = []
    n = len(w)
    for i, ch in enumerate(w):
        if (
            ch in "iu"
            and 0 < i < n - 1
            and w[i - 1] in _VOWELS
            and w[i + 1] in _VOWELS
        ):
            out.append(ch.upper())
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
    # RV (Spanish-style)
    if n < 3:
        rv = n
    elif w[1] not in _VOWELS:
        i = 2
        while i < n and w[i] not in _VOWELS:
            i += 1
        rv = i + 1 if i < n else n
    elif w[0] in _VOWELS and w[1] in _VOWELS:
        i = 2
        while i < n and w[i] in _VOWELS:
            i += 1
        rv = i + 1 if i < n else n
    else:
        rv = 3
    return r1, r2, rv


def _longest_pairs(w: str, pairs, region: int):
    """Longest (suffix, repl) whose suffix lies in ``region``; among
    semantics — the longest matching suffix is chosen regardless of
    region, then the region test gates the action."""
    best = None
    for suf, repl in pairs:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, repl)
    if best is None or len(w) - len(best[0]) < region:
        return None
    return best


def stem(word: str) -> str:
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w.lower()
    r1, r2, rv = _regions(w)

    # ---- step 0
    hit = _longest_pairs(w, _STEP0, r1)
    if hit is not None:
        suf, repl = hit
        w = w[: len(w) - len(suf)] + repl
    elif w.endswith("ile") and len(w) - 3 >= r1 and not w[:-3].endswith("ab"):
        # 'ile' -> 'i' unless preceded by 'ab'; kept out of _STEP0 so
        # the ab-condition failure correctly yields no action (its only
        # longer sibling 'iile' is matched above)
        w = w[:-3] + "i"

    # ---- step 1 (repeat while a replacement applies)
    changed_any = False
    while True:
        hit = _longest_pairs(w, _STEP1, r1)
        if hit is None:
            break
        suf, repl = hit
        w = w[: len(w) - len(suf)] + repl
        changed_any = True

    # ---- step 2 (longest across the three groups)
    best = None  # (suffix, kind)
    for suf in _STEP2_DELETE:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, "del")
    for suf in _STEP2_IUNE:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, "iune")
    for suf in _STEP2_IST:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, "ist")
    if best is not None and len(w) - len(best[0]) >= r2:
        suf, kind = best
        pos = len(w) - len(suf)
        if kind == "del":
            w = w[:pos]
            changed_any = True
        elif kind == "iune":
            if pos >= 1 and w[pos - 1] == "ț":
                w = w[: pos - 1] + "t"
                changed_any = True
        else:  # ist family
            w = w[:pos] + "ist"
            changed_any = True

    # ---- step 3 (only if steps 1/2 removed nothing). The source wraps
    # this among in ``setlimit tomark pV``: matching itself is
    # restricted to RV, so only suffixes fully inside RV are candidates
    # (a longer suffix straddling the RV boundary falls back to a
    # shorter in-RV one), and group (a)'s preceding-character test must
    # also read inside RV.
    if not changed_any:
        best = None
        for suf in _STEP3_A:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                if best is None or len(suf) > len(best[0]):
                    best = (suf, "a")
        for suf in _STEP3_B:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                if best is None or len(suf) > len(best[0]):
                    best = (suf, "b")
        if best is not None:
            suf, kind = best
            pos = len(w) - len(suf)
            if kind == "b":
                w = w[:pos]
            elif pos - 1 >= rv and (
                w[pos - 1] not in _VOWELS or w[pos - 1] == "u"
            ):
                w = w[:pos]

    # ---- step 4 (longest of ie/a/e/i/ă in RV)
    best4 = None
    for suf in _STEP4:
        if w.endswith(suf) and (best4 is None or len(suf) > len(best4)):
            best4 = suf
    if best4 is not None and len(w) - len(best4) >= rv:
        w = w[: len(w) - len(best4)]

    return w.lower()
