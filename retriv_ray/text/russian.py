"""Russian Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Russian stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("russian")``
resolves to PyStemmer/NLTK's Snowball russian, which encodes this same
published algorithm. Spec summary (all searches in RV; longest-match
within each ``among``; a failed group-1 а/я precondition fails the
whole category, with no fallback to a shorter suffix):
- ё is treated as е.
- step 1: perfective gerund, else [reflexive then] adjectival
  (adjective optionally preceded by participle), else verb, else
  noun.
- step 2: final и. step 3: derivational ост/ость in R2.
- step 4: undouble нн, else superlative ейш/ейше (then undouble нн),
  else final ь.
"""

from __future__ import annotations

_VOWELS = set("аеиоуыэюя")

# group-1 endings must directly follow а or я (the а/я stays, and must
# itself lie inside RV — the spec's setlimit covers the test character)
_PERF_GERUND_1 = ("вшись", "вши", "в")
_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")

_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")

_REFLEXIVE = ("ся", "сь")

_VERB_1 = (
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)

_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ия", "ья",
    "ью", "ию", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
    "ах", "ях", "ие", "ье", "ев", "ов", "а", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)

_SUPERLATIVE = ("ейше", "ейш")
_DERIVATIONAL = ("ость", "ост")


def _rv(word: str) -> int:
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            return i + 1
    return len(word)


def _r2(word: str) -> int:
    n = len(word)

    def after_vc(start: int) -> int:
        i = start
        while i < n and word[i] not in _VOWELS:
            i += 1
        while i < n and word[i] in _VOWELS:
            i += 1
        return i + 1 if i < n else n

    return after_vc(after_vc(0))


def _match(w: str, groups, rv: int):
    """Longest suffix across all (suffixes, needs_a_ya) groups, with
    the а/я precondition evaluated on THAT longest match only (among
    semantics: no fallback to shorter suffixes). Returns the new word
    or None."""
    best = None
    for sufs, needs in groups:
        for suf in sufs:
            if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
                best = (suf, needs)
    if best is None:
        return None
    suf, needs = best
    pos = len(w) - len(suf)
    if pos < rv:
        return None
    if needs:
        if pos < 1 or w[pos - 1] not in "ая" or pos - 1 < rv:
            return None
    return w[:pos]


def stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    rv = _rv(w)
    r2 = _r2(w)

    # ---- step 1
    out = _match(
        w, [(_PERF_GERUND_1, True), (_PERF_GERUND_2, False)], rv
    )
    if out is not None:
        w = out
    else:
        refl = _match(w, [(_REFLEXIVE, False)], rv)
        if refl is not None:
            w = refl
        # adjectival: adjective, optionally preceded by participle
        adj = _match(w, [(_ADJECTIVE, False)], rv)
        if adj is not None:
            w = adj
            part = _match(
                w, [(_PARTICIPLE_1, True), (_PARTICIPLE_2, False)], rv
            )
            if part is not None:
                w = part
        else:
            verb = _match(w, [(_VERB_1, True), (_VERB_2, False)], rv)
            if verb is not None:
                w = verb
            else:
                noun = _match(w, [(_NOUN, False)], rv)
                if noun is not None:
                    w = noun

    # ---- step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # ---- step 3: derivational ending in R2
    for suf in _DERIVATIONAL:
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # ---- step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = _match(w, [(_SUPERLATIVE, False)], rv)
        if sup is not None:
            w = sup
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]

    return w
