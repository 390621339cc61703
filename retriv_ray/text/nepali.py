"""Nepali Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Nepali stemming algorithm", after Bal Krishna
Bal's morphological analysis; the Snowball implementation removes
three published suffix categories) — same from-scratch-from-spec
approach as :mod:`retriv_ray.text.hindi`.

Reference parity note: the reference's ``get_stemmer("nepali")``
resolves to PyStemmer's Snowball nepali
(retriv/sparse_retriever/preprocessing/stemmer.py:35). PyStemmer is
not installable here to diff against. Algorithm structure:
- category 1: agglutinated postpositions / case clitics / the plural
  marker (को का की लाई ले बाट मा हरू …) — stripped repeatedly
  (Nepali stacks them: घरहरूमा = घर + हरू + मा).
- category 2: the interrogative/emphatic particles (ै ौ …) checked
  before category 3.
- category 3: verb conjugation endings (छ-forms, past/future/
  infinitive/participle endings) — stripped repeatedly.
The inventories reconstruct the published tables; rare entries may
be missing. Golden vectors in tests/test_text_registry.py are
hand-traced through this spec.
"""

from __future__ import annotations

# Category 1: postpositions, case markers, plural.
_CAT1 = tuple(sorted((
    "मार्फत", "द्वारा", "देखि", "सम्म", "सँग", "संग", "तिर",
    "पछि", "अघि", "माथि", "मुनि", "बारे", "लागि", "हरू", "हरु",
    "लाई", "ले", "बाट", "को", "का", "की", "मा", "सित",
), key=len, reverse=True))

# Category 2: emphatic/interrogative particles (single matras).
_CAT2 = ("ै", "ौ")

# Category 3: verb endings.
_CAT3 = tuple(sorted((
    "छु", "छौ", "छ", "छन्", "छौं", "छेस्", "छे", "छिन्", "छस्",
    "हुन्छ", "हुन्न",
    "थिएँ", "थियौ", "थियो", "थिए", "थिइन्", "थिइनँ",
    "एको", "एका", "एकी", "ेको", "ेका", "ेकी", "ेर", "एर",
    "ने", "नु", "न्", "नोस्",
    "यो", "ई", "इन्", "यौ", "ए", "एँ", "ें", "ौं", "औं",
    "दै", "दि", "द", "िदै",
    "ूँ", "ुँ", "ौँ",
    "िन्छ", "िन्", "िए", "िएँ", "िस्", "िई",
    "ाउने", "ाएको", "ाउनु", "ाउँछ",
    "ुन्छ", "ुने", "ुनु",
), key=len, reverse=True))


# Participle-protecting guard (published category-1 condition): the
# genitive clitics को/का/की are NOT category 1 when preceded by ए/े —
# there they are part of the participle एको/ेको, which category 3 owns.
_GENITIVE = ("को", "का", "की")


def _strip_repeat(word: str, sufs, min_len: int) -> str:
    changed = True
    while changed:
        changed = False
        for suf in sufs:
            if word.endswith(suf) and len(word) - len(suf) >= min_len:
                if suf in _GENITIVE and word[-3] in ("ए", "े"):
                    continue
                word = word[: len(word) - len(suf)]
                changed = True
                break
    return word


def stem(word: str) -> str:
    if len(word) < 3:
        return word
    word = _strip_repeat(word, _CAT1, 2)
    # category 2: a single trailing particle matra
    for suf in _CAT2:
        if word.endswith(suf) and len(word) - 1 >= 2:
            word = word[:-1]
            break
    word = _strip_repeat(word, _CAT3, 2)
    return word
