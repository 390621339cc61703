"""ARLSTem Arabic light stemmer, implemented from the published
algorithm (K. Abainia, S. Ouamour, H. Sayoud, "A novel robust Arabic
light stemmer", Journal of Experimental & Theoretical AI, 2017) —
the algorithm NLTK's ``ARLSTem`` encodes and the reference's
``get_stemmer("arlstem")`` resolves to
(retriv/sparse_retriever/preprocessing/stemmer.py:14).

Algorithm (per the paper):
1. normalization: strip diacritics/tatweel, fold the alef-hamza
   forms (آ أ إ -> ا);
2. remove the definite article (3- then 2-letter fused forms);
3. remove the feminine ta-marbuta and convert feminine forms to
   masculine;
4. convert plurals to singular (sound masculine/feminine plurals,
   dual, and the frequent broken-plural templates);
5. verb stemming: future/imperfect prefix+suffix combinations, then
   past-tense suffixes.

Parity note: NLTK is not installable here to diff against; the
broken-plural template set is the paper's main inventory — rare
templates are omitted, so isolated words can diverge. Golden vectors
in tests/test_text_registry.py are hand-traced through this spec.
"""

from __future__ import annotations

_DIACRITICS = set("ًٌٍَُِّْـ")


def normalize(word: str) -> str:
    word = "".join(ch for ch in word if ch not in _DIACRITICS)
    return word.replace("آ", "ا").replace("أ", "ا").replace("إ", "ا")


def remove_article(word: str) -> str:
    if len(word) > 5:
        for p in ("كال", "بال", "ولل", "وال", "فال"):
            if word.startswith(p):
                return word[3:]
    if len(word) > 4:
        for p in ("ال", "لل"):
            if word.startswith(p):
                return word[2:]
    return word


def fem2masc(word: str) -> str:
    if len(word) > 3 and word.endswith("ة"):
        # اية -> اي ; اءة -> اء ; default: drop the ta-marbuta
        return word[:-1]
    if len(word) > 4 and word.endswith("ية"):
        return word[:-2] + "ي"
    return word


def plur2sing(word: str):
    """Return the singular, or None if no plural pattern applies."""
    n = len(word)
    if n > 4:
        # sound plurals and dual
        for suf in ("ات", "ون", "ين", "ان"):
            if word.endswith(suf):
                return word[:-2]
    # broken plural templates
    if n == 5:
        # افعال -> فعل
        if word[0] == "ا" and word[3] == "ا":
            return word[1:3] + word[4]
        # فعوال? فواعل -> فاعل? keep to the paper's main ones:
        # فعائل -> فعيلة family: word like قبائل -> قبيل
        if word[2] == "ا" and word[3] == "ئ":
            return word[:2] + "ي" + word[4]
        # فعول -> فعل (5 incl. article leftovers) not applicable here
    if n == 4:
        # فعول / فعال / فعل + ا patterns -> فعل
        if word[2] in ("و", "ا", "ي"):
            return word[:2] + word[3]
    if n == 6:
        # مفاعل -> مفعل? the paper reduces فواعل/مفاعل to the
        # triliteral+formative: فناجين -> فنجان family:
        if word[2] == "ا" and word[4] == "ي":
            return word[:2] + word[3] + word[5]
    return None


_FUTURE_PRE = ("سي", "ست", "سن", "سا")
_IMPERF_PRE = ("ي", "ت", "ن", "ا")
_IMPERF_SUF = ("ون", "ان", "ين")
_PAST_SUF = ("تما", "تم", "تن", "نا", "وا", "تا", "ت", "ن", "ا")


def verb_stem(word: str):
    """Strip verb morphology; return the stem or None."""
    n = len(word)
    # future prefix (+ optional imperfect suffix)
    for pre in _FUTURE_PRE:
        if word.startswith(pre) and n - len(pre) >= 3:
            rest = word[len(pre):]
            for suf in _IMPERF_SUF:
                if rest.endswith(suf) and len(rest) - 2 >= 3:
                    return rest[:-2]
            return rest
    # imperfect prefix + suffix combination
    for pre in _IMPERF_PRE:
        if word.startswith(pre) and n - 1 >= 4:
            rest = word[1:]
            for suf in _IMPERF_SUF:
                if rest.endswith(suf) and len(rest) - 2 >= 3:
                    return rest[:-2]
            if n - 1 >= 4 and pre in ("ي",):
                return rest
    # past suffixes
    for suf in _PAST_SUF:
        if word.endswith(suf) and n - len(suf) >= 3:
            return word[: n - len(suf)]
    return None


def stem(word: str) -> str:
    word = normalize(word)
    if len(word) <= 2:
        return word
    word = remove_article(word)

    # imperfect/future circumfix (prefix + ون/ان/ين) outranks the
    # sound plural: in يكتبون/سيذهبون the ون is verb inflection
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
