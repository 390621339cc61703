"""Lithuanian Snowball stemmer, implemented from the published
algorithm (snowballstem.org "Lithuanian stemming algorithm",
contributed by Dainius Jocas) — same from-scratch-from-spec approach
as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("lithuanian")``
resolves to PyStemmer's Snowball lithuanian
(retriv/sparse_retriever/preprocessing/stemmer.py:33). PyStemmer is
not installable here to diff against. The published algorithm is a
longest-match strip of the nominal/adjectival declension endings and
the verb conjugation endings in R1, followed by the palatalization
recodings (stem-final ``č`` -> ``t``, ``dž`` -> ``d``). The ending
inventory below reconstructs the published among-list from the
standard declension/conjugation paradigms (5 noun declensions ×
7 cases × 2 numbers, adjective and participle endings, the
present/past/future/conditional/imperative verb paradigm); rare
entries may be missing, so isolated words can diverge from
PyStemmer. Golden vectors in tests/test_text_registry.py are
hand-traced through this spec.
"""

from __future__ import annotations

_VOWELS = set("aeiouyąęėįųū")


def _r1(word: str) -> int:
    n = len(word)
    i = 0
    while i < n and word[i] not in _VOWELS:
        i += 1
    while i < n and word[i] in _VOWELS:
        i += 1
    return i + 1 if i < n else n


_ENDINGS = tuple(sorted((
    # noun declension I (-as/-is/-ys) sg
    "as", "ias", "is", "ys", "o", "io", "ui", "iui", "ą", "ią", "į",
    "u", "iu", "e", "yje", "ije", "au",
    # pl
    "ai", "iai", "ų", "ių", "ams", "iams", "us", "ius", "ais",
    "iais", "uose", "iuose",
    # declension II (-a/-ė) sg
    "a", "ia", "ė", "os", "ios", "ės", "ai", "iai", "ei", "ą", "ę",
    "oje", "ioje", "ėje", "oj", "ėj",
    # pl
    "oms", "ioms", "ėms", "es", "omis", "iomis", "ėmis", "ose",
    "iose", "ėse",
    # declension III-V (-us/-uo/-is fem)
    "aus", "iaus", "umi", "iumi", "uje", "iuje", "ūs", "ums",
    "umis", "uose", "enį", "eniu", "enyje", "enys", "enų", "enims",
    "enimis", "enyse", "ers", "erį", "erimi", "eryje",
    # adjective / pronominal
    "asis", "ysis", "oji", "ioji", "ąjį", "ąją", "ajam", "ajai",
    "uoju", "ąja", "ame", "iame", "oje", "ajame", "ojoje",
    "esnis", "esnė", "esni", "esnės", "esnių", "iausias", "iausia",
    "iausi", "iausios",
    # verb: infinitive / present / past / future / conditional /
    # imperative / participles
    "ti", "tis", "damas", "dama", "dami", "damos", "damasis",
    "antis", "anti", "intis", "ęs", "usi", "usios", "tas", "ta",
    "tos", "tam", "toje",
    "ame", "iame", "ome", "ėme", "ate", "iate", "ote", "ėte",
    "uoja", "uoju", "uoji", "uojame", "uojate",
    "iau", "ei", "ėjo", "ėjai", "ėjau",
    "siu", "si", "sime", "site", "sis", "sies",
    "čiau", "tum", "tų", "tume", "tute", "tumėme", "tumėte",
    "k", "kite", "kime",
    "nt", "int", "ant",
), key=len, reverse=True))


def stem(word: str) -> str:
    word = word.lower()
    if len(word) < 4:
        return word
    r1 = _r1(word)
    for suf in _ENDINGS:
        if word.endswith(suf) and len(word) - len(suf) >= max(r1, 2):
            word = word[: len(word) - len(suf)]
            break
    # palatalization recoding at the new stem end
    if word.endswith("dž"):
        word = word[:-2] + "d"
    elif word.endswith("č"):
        word = word[:-1] + "t"
    return word
