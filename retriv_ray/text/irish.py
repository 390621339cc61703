"""Irish Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Irish stemming algorithm", contributed by Jim
O'Regan) — same from-scratch-from-spec approach as
:mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("irish")``
resolves to PyStemmer's Snowball irish
(retriv/sparse_retriever/preprocessing/stemmer.py:31). PyStemmer is
not installable here to diff against. The algorithm's four parts:
- ``initial_morph``: undo initial mutation — strip the prothetic
  ``n-``/``h-``/``t-``, and reduce eclipsis clusters (``mb``->``b``,
  ``gc``->``c``, ``nd``->``d``, ``bhf``->``f``, ``ng``->``g``,
  ``bp``->``p``, ``ts``->``s``, ``dt``->``t``). These rules are the
  grammar's closed set and are encoded exactly.
- ``noun_sfx`` (R1): verbal-noun/plural endings.
- ``deriv`` (R2): derivational endings (the ``-acht``/``-íocht``
  abstract-noun family and its genitives, with the published
  special recodings).
- ``verb_sfx`` (R1): conjugation endings (present ``-(e)ann``,
  future ``-f(a)idh``, 1pl ``-(a)imid``, autonomous ``-t(e)ar``,
  conditional ``-f(e)adh``, past-habitual and plural endings).
The suffix tables reconstruct the published among-lists; rare
entries may be missing, so isolated words can diverge from
PyStemmer. Golden vectors in tests/test_text_registry.py are
hand-traced through this spec.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóú")


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


_ECLIPSIS = (
    ("bhf", "f"), ("mb", "b"), ("gc", "c"), ("nd", "d"),
    ("ng", "g"), ("bp", "p"), ("ts", "s"), ("dt", "t"),
)

# noun_sfx: verbal-noun and plural endings, delete in R1.
_NOUN = tuple(sorted((
    "amh", "eamh", "abh", "eabh", "aibh", "ibh", "aimh", "imh",
    "anna", "eanna", "acha", "eacha", "tha", "ta", "aí",
), key=len, reverse=True))

# deriv: derivational endings, delete/recode in R2.
_DERIV = (
    # (suffix, replacement)
    ("arcachtaí", "arc"), ("arcachta", "arc"), ("arcacht", "arc"),
    ("grafaíochta", "graf"), ("grafaíocht", "graf"),
    ("paiteolaíochta", "paiteolaíoch"),
    ("eachtaí", ""), ("eachta", ""), ("eacht", ""),
    ("achtaí", ""), ("achta", ""), ("acht", ""),
    ("aíochta", ""), ("aíocht", ""), ("íochta", ""), ("íocht", ""),
    ("úlachta", ""), ("úlacht", ""),
)

# verb_sfx: conjugation endings, delete in R1.
_VERB = tuple(sorted((
    "aimid", "imid", "aímid", "ímid", "aidh", "idh", "faidh", "fidh",
    "ann", "eann", "tear", "tar", "tír", "tí",
    "adh", "eadh", "fadh", "feadh", "álaim", "álann",
    "amar", "eamar", "aíomar", "íomar", "aigí", "igí",
    "aíonn", "íonn", "aím", "ím", "far", "fear",
), key=len, reverse=True))


def stem(word: str) -> str:
    word = word.lower()

    # initial_morph: prothesis + eclipsis
    if word[:2] in ("n-", "h-", "t-"):
        word = word[2:]
    else:
        for cluster, repl in _ECLIPSIS:
            if word.startswith(cluster):
                word = repl + word[len(cluster):]
                break

    if len(word) < 4:
        return word
    r1, r2 = _regions(word)

    # noun_sfx (R1)
    for suf in _NOUN:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: len(word) - len(suf)]
            break

    # deriv (R2)
    r1, r2 = _regions(word)
    for suf, repl in _DERIV:
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: len(word) - len(suf)] + repl
            break

    # verb_sfx (R1)
    r1, r2 = _regions(word)
    for suf in _VERB:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: len(word) - len(suf)]
            break

    return word
