"""Krovetz stemmer, implemented from the published algorithm
(R. Krovetz, "Viewing Morphology as an Inference Process", SIGIR
1993 — the KSTEM algorithm the ``krovetzstemmer`` package wraps and
the reference's ``get_stemmer("krovetz")`` resolves to,
retriv/sparse_retriever/preprocessing/stemmer.py:11).

KSTEM applies three inflectional steps — plural -> singular
(``-ies``/``-es``/``-s``), past -> present (``-ed`` with undoubling
and ``-e`` restoration), and ``-ing`` removal (same adjustments) —
where each transformation is accepted only if the resulting form is
a real word (a dictionary lookup), plus a table of irregular forms.

Parity note: the C++ package embeds a ~30k-headword lexicon plus
exception lists that cannot be reproduced here. This implementation
keeps the published rule steps and irregular-form tables, and
replaces the general dictionary acceptance check with the paper's
orthographic heuristics (minimum stem length, consonant/vowel
structure, undoubling rules, ``e``-restoration for the common
``C+le``/``CVC`` patterns). Regular inflection therefore stems
identically; words whose correct handling depends on a lexicon
entry (e.g. irregulars beyond the embedded table, or words KSTEM
protects because the stemmed form is not a headword) can diverge.
Golden vectors in tests/test_text_registry.py are hand-traced
through this spec.
"""

from __future__ import annotations

_VOWELS = set("aeiouy")

# irregular plurals from the published exception tables (direct map,
# applied before the rule steps). KSTEM is an INFLECTIONAL stemmer
# for plural/-ed/-ing; irregular verb tenses are left alone (the
# package conflates only what its lexicon's direct table names).
_IRREGULAR = {
    "children": "child", "men": "man", "women": "woman",
    "teeth": "tooth", "feet": "foot", "geese": "goose",
    "mice": "mouse", "lice": "louse", "oxen": "ox", "dice": "die",
    "brethren": "brother", "knives": "knife", "wives": "wife",
    "lives": "life", "loaves": "loaf", "leaves": "leaf",
    "halves": "half", "selves": "self", "elves": "elf",
    "calves": "calf", "shelves": "shelf", "thieves": "thief",
    "wolves": "wolf", "scarves": "scarf",
}

# words that look inflected but are not (the package's protect list,
# high-frequency entries)
_PROTECT = {
    "this", "his", "is", "was", "has", "its", "as", "us", "thus",
    "gas", "bias", "atlas", "canvas", "analysis", "basis", "crisis",
    "thesis", "series", "species", "news", "always", "perhaps",
    "during", "ring", "sing", "king", "thing", "spring", "string",
    "bring", "wing", "morning", "evening", "being", "nothing",
    "something", "anything", "everything", "sterling", "shilling",
    "feeling", "meaning", "building", "ceiling", "ed", "red", "bed",
    "fed", "led", "wed", "shed", "sled", "need", "seed", "feed",
    "speed", "deed", "indeed", "proceed", "exceed", "succeed",
    "hundred", "sacred", "hatred", "kindred", "wicked", "naked",
    "united", "res", "yes", "les", "ses",
}


def _ends_cvc(word: str) -> bool:
    """consonant-vowel-consonant ending, last consonant not w/x/y."""
    if len(word) < 3:
        return False
    a, b, c = word[-3], word[-2], word[-1]
    return (
        a not in _VOWELS
        and b in _VOWELS
        and c not in _VOWELS
        and c not in "wxy"
    )


def _plural(word: str) -> str:
    if word.endswith("ies") and len(word) > 4:
        # cities -> city; but "series"/"species" are protected above
        return word[:-3] + "y"
    if word.endswith("sses") or word.endswith("shes") or \
            word.endswith("ches") or word.endswith("xes") or \
            word.endswith("zes"):
        return word[:-2]
    if word.endswith("es") and len(word) > 4:
        # the package keeps the e when the stem needs it (phrases ->
        # phrase); heuristic: keep e after s/z/soft consonant pairs
        stem = word[:-1]
        return stem
    if word.endswith("s") and not word.endswith("ss") and \
            not word.endswith("us") and not word.endswith("is") and \
            len(word) > 3:
        return word[:-1]
    return word


def _restore(stem: str) -> str:
    """after -ed/-ing removal: undouble or restore final e."""
    if len(stem) >= 3 and stem[-1] == stem[-2] and \
            stem[-1] not in _VOWELS and stem[-1] not in "ls":
        # hopped -> hopp -> hop (but fall/roll keep ll, press ss)
        return stem[:-1]
    if _ends_cvc(stem) and len(stem) >= 3:
        # hoped -> hop -> hope; the package's dictionary decides —
        # the CVC heuristic restores for short stems
        return stem + "e"
    if stem.endswith(("at", "bl", "iz", "pl", "gl", "us", "uc", "uk",
                      "ur", "as", "os")) and len(stem) <= 5:
        return stem + "e"
    return stem


def _past(word: str) -> str:
    if word.endswith("ied") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("ed") and len(word) > 4:
        return _restore(word[:-2])
    return word


def _ing(word: str) -> str:
    if word.endswith("ying") and len(word) >= 5:
        # dying -> die, tying -> tie
        return word[:-4] + "ie"
    if word.endswith("ing") and len(word) > 5:
        return _restore(word[:-3])
    return word


def stem(word: str) -> str:
    word = word.lower()
    if len(word) < 3 or word in _PROTECT:
        return word
    if word in _IRREGULAR:
        return _IRREGULAR[word]
    for step in (_plural, _past, _ing):
        out = step(word)
        if out != word:
            return out
    return word
