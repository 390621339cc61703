"""Arabic Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Arabic stemming algorithm", contributed by Assem
Chelli, Abdelkrim Aries and Lakhdar Benzahia) — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("arabic")``
resolves to PyStemmer's Snowball arabic
(retriv/sparse_retriever/preprocessing/stemmer.py:18). PyStemmer is
not installable here to diff against. The published algorithm:
- ``normalize_pre``: strip the tashkeel diacritics and the tatweel,
  expand the lam-alef ligatures.
- ``checks``: classify the word as noun (definite-article prefixes)
  or verb (person prefixes) to gate the affix steps.
- prefix steps: conjunctions و/ف, prepositions ب/ك/ل, the definite
  article ال and its fused forms (وال فال بال كال لل ولل فلل),
  verb/future prefixes (س + imperfect letters).
- suffix steps: noun suffixes (possessive pronouns, sound plurals
  ون/ين/ات, dual ان, taa marbuta ة, nisba ي), verb suffixes
  (person/number endings تما كما هما تم تن نا وا ون ين ان ت …).
- ``normalize_post``: fold the hamza seats (أ إ آ ؤ ئ -> ا/ء forms).
The affix inventories below reconstruct the published among-lists
with their length conditions; the full sbl's rarer entries and some
flag interactions are simplified, so isolated words can diverge from
PyStemmer. Golden vectors in tests/test_text_registry.py are
hand-traced through this spec.
"""

from __future__ import annotations

# tashkeel (harakat + tanween + shadda + sukun) and tatweel
_TASHKEEL = set("ًٌٍَُِّْ")
_TATWEEL = "ـ"

_LIGATURES = {
    "ﻻ": "لا", "ﻷ": "لأ", "ﻵ": "لآ", "ﻹ": "لإ",
    "ﻼ": "لا", "ﻸ": "لأ", "ﻶ": "لآ", "ﻺ": "لإ",
}

# definite-article prefix forms, longest first
_ARTICLES = ("فبال", "وبال", "فكال", "وكال", "ولل", "فلل", "وال",
             "فال", "بال", "كال", "لل", "ال")

# possessive / object pronoun suffixes (nouns and verbs), longest first
_PRON = ("كموها", "كموه", "كما", "هما", "كم", "كن", "هم", "هن",
         "ها", "نا", "ني", "ك", "ه", "ي")

# sound plural / dual / feminine noun endings
_NOUN_SUF = ("تين", "تان", "ات", "ون", "ين", "ان", "ة")

# verb person/number suffixes
_VERB_SUF = ("تموها", "تموه", "تما", "تمو", "تم", "تن", "نا",
             "وا", "ون", "ين", "ان", "ات", "ت", "ن", "ا")

# imperfect (present) verb prefixes
_VERB_PRE = ("سي", "ست", "سن", "سأ", "لي", "لت", "لن", "لأ")


def _normalize_pre(word: str) -> str:
    out = []
    for ch in word:
        if ch in _TASHKEEL or ch == _TATWEEL:
            continue
        out.append(_LIGATURES.get(ch, ch))
    return "".join(out)


def _normalize_post(word: str) -> str:
    # fold hamza seats
    return (word.replace("آ", "ا").replace("أ", "ا")
            .replace("إ", "ا").replace("ؤ", "ء").replace("ئ", "ء"))


def stem(word: str) -> str:
    word = _normalize_pre(word)
    if len(word) <= 2:
        return _normalize_post(word)

    is_noun = False

    # conjunction و / ف before an article or a long word
    for conj in ("و", "ف"):
        if word.startswith(conj) and len(word) > 4 and (
            word[1:].startswith("ال") or word[1:3] in ("لل",)
        ):
            word = word[1:]
            break

    # definite article -> noun
    for art in _ARTICLES:
        if word.startswith(art) and len(word) - len(art) >= 2:
            word = word[len(art):]
            is_noun = True
            break

    # NOTE: bare prepositions (ب ك ل) are NOT stripped outside the
    # fused-article forms above — ك/ب are common root letters (كتاب,
    # بيت) and stripping them unconditionally destroys stems.

    if is_noun:
        # noun suffixes: pronoun then plural/feminine
        for suf in _PRON:
            if word.endswith(suf) and len(word) - len(suf) >= 2:
                word = word[: len(word) - len(suf)]
                break
        for suf in _NOUN_SUF:
            if word.endswith(suf) and len(word) - len(suf) >= 2:
                word = word[: len(word) - len(suf)]
                break
    else:
        # verb path: future/imperfect prefixes
        for pre in _VERB_PRE:
            if word.startswith(pre) and len(word) - len(pre) >= 3:
                word = word[len(pre):]
                break
        else:
            for pre in ("ي", "ت", "ن", "أ"):
                if word.startswith(pre) and len(word) >= 5:
                    word = word[1:]
                    break
        # object pronoun, then person/number ending
        for suf in _PRON:
            if word.endswith(suf) and len(word) - len(suf) >= 3:
                word = word[: len(word) - len(suf)]
                break
        for suf in _VERB_SUF:
            if word.endswith(suf) and len(word) - len(suf) >= 2:
                word = word[: len(word) - len(suf)]
                break
        # feminine marker also occurs on verbal nouns
        if word.endswith("ة") and len(word) >= 3:
            word = word[:-1]

    return _normalize_post(word)
