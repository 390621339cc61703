"""Basque Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Basque stemming algorithm", contributed by Olatz
Arregi et al., Univ. of the Basque Country) — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("basque")``
resolves to PyStemmer's Snowball basque
(retriv/sparse_retriever/preprocessing/stemmer.py:19). PyStemmer is
not installable here to diff against; the published algorithm is
three repeated suffix-stripping passes over among-tables of ~230
entries (``aditzak`` verb endings, ``izenak`` noun/case endings,
``adjetiboak`` adjectival endings), each conditioned on RV/R1/R2.
The tables below reconstruct the high- and mid-frequency entries of
those lists (the full declension paradigm: absolutive/ergative/
dative/genitive/locative/ablative/allative/comitative/instrumental/
benefactive/motivative case endings, singular/plural/indefinite,
plus verb nominalizations and participles); rare entries may be
missing, so isolated words can diverge from PyStemmer. Golden
vectors in tests/test_text_registry.py are hand-traced through this
spec. Spec summary:
- RV: Spanish-style definition; R1/R2 standard.
- repeat ``aditzak`` (verb endings, delete in RV) until no match;
- repeat ``izenak`` (noun/case endings, delete in RV) until no match;
- apply ``adjetiboak`` once (adjectival endings, delete in RV).
"""

from __future__ import annotations

_VOWELS = set("aeiou")


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


# Verb endings (nominalizations, participles, aspect markers).
_ADITZAK = tuple(sorted((
    "tzerakoan", "tzeagatik", "tzearren", "tzerako", "tzeko",
    "tzera", "tzean", "tzeak", "tzea", "tzeaz", "tzen", "tzeek",
    "tzeei", "tzeen", "teko", "tera", "tean", "teak", "tea", "ten",
    "tuko", "tuta", "tutako", "turiko", "tuak", "tua", "tuz", "tu",
    "duko", "duta", "dutako", "duriko", "duak", "dua", "duz", "du",
    "garri", "garria", "garriak", "kor", "korra", "korrak",
    "pen", "pena", "penak", "keta", "ketak", "kuntza", "kuntzak",
    "mendu", "mendua", "menduak", "era", "eraz",
), key=len, reverse=True))

# Noun/case endings: the Basque declension paradigm
# (sg/pl/indefinite) for the core cases.
_IZENAK = tuple(sorted((
    # absolutive / ergative / dative / genitive
    "a", "ak", "ek", "ari", "ei", "en", "aren", "aren", "on",
    # possessive-genitive + benefactive + motivative
    "arentzat", "entzat", "rentzat", "arengatik", "engatik",
    "gatik", "tzat",
    # comitative / instrumental (bare "z"/"n" omitted: they overstrip
    # -n/-z-final roots like "lagun", "egin"; the vowel-bearing forms
    # cover the attested inflections)
    "arekin", "ekin", "rekin", "kin", "az", "ez", "taz",
    # inessive / genitive-locative / ablative / allative
    "an", "ean", "etan", "tan", "ko", "eko", "etako", "tako",
    "tik", "etik", "dik", "ra", "era", "etara", "tara",
    "raino", "eraino", "rantz", "erantz", "rako", "erako",
    # animate locatives
    "gan", "agan", "gana", "agana", "gandik", "agandik", "ganako",
    # indefinite/partitive & misc
    "rik", "ik", "ta", "eta", "tako",
    # compounding linkers
    "tasun", "tasuna", "tasunak", "keria", "keriak", "tegi",
    "tegia", "tegiak", "dun", "duna", "dunak", "tzaile", "tzailea",
    "tzaileak", "le", "lea", "leak", "gile", "gilea", "gileak",
), key=len, reverse=True))

# Adjectival endings (applied once).
_ADJETIBOAK = tuple(sorted((
    "en", "ena", "enak", "ago", "agoa", "agoak", "egi", "egia",
    "egiak", "ki", "to", "ro",
), key=len, reverse=True))


def _strip_repeat(word: str, sufs, min_len: int = 3) -> str:
    changed = True
    while changed:
        changed = False
        rv = _rv(word)
        for suf in sufs:
            if (
                word.endswith(suf)
                and len(word) - len(suf) >= rv
                and len(word) - len(suf) >= 2
                and len(word) >= min_len
            ):
                word = word[: len(word) - len(suf)]
                changed = True
                break
    return word


def stem(word: str) -> str:
    word = word.lower()
    if len(word) < 4:
        return word
    word = _strip_repeat(word, _ADITZAK)
    word = _strip_repeat(word, _IZENAK)
    # adjetiboak: once
    rv = _rv(word)
    for suf in _ADJETIBOAK:
        if word.endswith(suf) and len(word) - len(suf) >= max(rv, 2):
            word = word[: len(word) - len(suf)]
            break
    return word
