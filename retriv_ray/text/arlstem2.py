"""ARLSTem2 Arabic light stemmer, implemented from the published
revision (K. Abainia, H. Rebbani, "Comparing the Effectiveness of
the Improved ARLSTem Algorithm with Existing Arabic Light Stemmers",
ICTAACS 2019 / the ARLSTem v2 described therein) — the algorithm
NLTK's ``ARLSTem2`` encodes and the reference's
``get_stemmer("arlstem2")`` resolves to
(retriv/sparse_retriever/preprocessing/stemmer.py:15).

v2's published changes over :mod:`retriv_ray.text.arlstem`:
- strips the conjunctions و/ف fused before the definite article;
- extends verb stemming with the ل-prefixed (emphatic/purposive)
  imperfect forms and the س-future with circumfix suffixes;
- adds feminine-plural handling before the ta-marbuta rule.

Parity note: NLTK is not installable here to diff against; shares
the reconstruction caveats of :mod:`retriv_ray.text.arlstem`.
Golden vectors in tests/test_text_registry.py are hand-traced.
"""

from __future__ import annotations

from retriv_ray.text.arlstem import (
    _IMPERF_SUF,
    fem2masc,
    normalize,
    plur2sing,
    remove_article,
    verb_stem,
)


def stem(word: str) -> str:
    word = normalize(word)
    if len(word) <= 2:
        return word

    # v2: conjunction fused before the article (والكتاب، فالبيت)
    if len(word) > 6 and word[0] in ("و", "ف") and word[1:3] == "ال":
        word = word[1:]
    word = remove_article(word)

    # v2: ل-prefixed imperfect (لنكتب، ليكتبوا)
    if (
        len(word) >= 5
        and word[0] == "ل"
        and word[1] in ("ي", "ت", "ن", "ا")
    ):
        rest = word[2:]
        for suf in ("ون", "ان", "ين", "وا"):
            if rest.endswith(suf) and len(rest) - 2 >= 3:
                return rest[:-2]
        return rest

    # future/imperfect circumfix before sound plural (as in v1)
    if (
        len(word) >= 7
        and word[0] == "س"
        and word[1] in ("ي", "ت", "ن", "ا")
        and word.endswith(_IMPERF_SUF)
    ):
        return word[2:-2]
    if (
        len(word) >= 6
        and word[0] in ("ي", "ت", "ن", "ا")
        and word.endswith(_IMPERF_SUF)
    ):
        return word[1:-2]

    # v2: feminine plural ات before the ta-marbuta rule
    if len(word) > 5 and word.endswith("ات"):
        return word[:-2]

    sing = plur2sing(word)
    if sing is not None and len(sing) >= 2:
        return sing

    fem = fem2masc(word)
    if fem != word:
        return fem

    verb = verb_stem(word)
    if verb is not None and len(verb) >= 2:
        return verb
    return word
