"""ISRI Arabic stemmer, implemented from the published algorithm
(K. Taghva, R. Elkhoury, J. Coombs, "Arabic Stemming Without a Root
Dictionary", ISRI/ITCC 2005) — the algorithm NLTK's ``ISRIStemmer``
encodes and the reference's ``get_stemmer("isri")`` resolves to
(retriv/sparse_retriever/preprocessing/stemmer.py:16).

Algorithm (per the paper):
1. remove diacritics; 2. strip length-3 then length-2 prefixes;
3. strip length-3 then length-2 suffixes; 4. collapse an initial
 double-waw; 5. normalize the alef-hamza forms to bare alef; then
6. reduce the word toward its (usually triliteral) root by matching
 the morphological pattern templates for 4-, 5- and 6-letter words
 (letters ف/ع/ل in a template mark root positions, other letters
 must match literally), falling back to single-character affix
 trims.

Parity note: NLTK is not installable here to diff against; the
pattern-template inventory below carries the paper's standard
templates — a few of NLTK's rarer 5/6-letter sub-patterns are
omitted, so isolated words can diverge. Golden vectors in
tests/test_text_registry.py are hand-traced through this spec.
"""

from __future__ import annotations

_DIACRITICS = set("ًٌٍَُِّْـ")

_P3 = ("كال", "بال", "ولل", "وال")   # length-3 prefixes
_P2 = ("ال", "لل")                    # length-2 prefixes
_S3 = ("تمل", "همل", "تان", "تين", "كمل")  # length-3 suffixes
_S2 = ("ون", "ات", "ان", "ين", "تن", "كم", "هن", "نا", "يا",
       "ها", "هم", "كن", "ني", "وا", "ما")
_S1 = ("ة", "ه", "ي", "ك", "ت", "ا", "ن")   # length-1 suffixes
_P1 = ("ل", "ب", "ف", "س", "و", "ي", "ت", "ن", "ا")  # length-1 prefixes

# pattern templates: ف/ع/ل mark root positions, other letters literal
_W5 = ("افتعل", "انفعل", "مفاعل", "تفاعل", "فواعل", "فعائل",
       "تفعيل", "مفعول", "مفعال", "مفعيل", "مفعلة", "تفعلة",
       "افعلة", "مفعلت", "فعالة", "فعالي", "مفتعل", "يفتعل",
       "تفتعل", "فاعول", "فعولة", "فعوله")
_W6 = ("مستفعل", "استفعل", "انفعال", "افتعال", "تفاعيل", "مفاعيل",
       "مفاعلة", "متفاعل", "يستفعل", "تستفعل", "افتعلت")


def _norm(word: str) -> str:
    return "".join(ch for ch in word if ch not in _DIACRITICS)


def _norm_alef(word: str) -> str:
    return word.replace("أ", "ا").replace("إ", "ا").replace("آ", "ا")


def _match_template(word: str, template: str):
    """Extract the root letters if ``word`` fits ``template``."""
    if len(word) != len(template):
        return None
    root = []
    for w, t in zip(word, template):
        if t in "فعل":
            root.append(w)
        elif w != t:
            return None
    return "".join(root)


def _apply_templates(word: str, templates):
    for t in templates:
        root = _match_template(word, t)
        if root:
            return root
    return None


def _suf1(word: str) -> str:
    if len(word) > 3 and word[-1] in _S1:
        return word[:-1]
    return word


def _pre1(word: str) -> str:
    if len(word) > 3 and word[0] in _P1:
        return word[1:]
    return word


def stem(word: str) -> str:
    word = _norm(word)
    if len(word) <= 2:
        return word

    # pre32
    if len(word) >= 6:
        for p in _P3:
            if word.startswith(p):
                word = word[3:]
                break
    if len(word) >= 5:
        for p in _P2:
            if word.startswith(p):
                word = word[2:]
                break

    # suf32
    if len(word) >= 6:
        for s in _S3:
            if word.endswith(s):
                word = word[:-3]
                break
    if len(word) >= 5:
        for s in _S2:
            if word.endswith(s):
                word = word[:-2]
                break

    # initial double waw
    if len(word) >= 4 and word.startswith("وو"):
        word = word[1:]

    word = _norm_alef(word)

    n = len(word)
    if n <= 3:
        return word
    if n == 4:
        # pro_w4: positional affix letters of quadriliteral patterns
        if word[0] == "م":
            return word[1:]
        if word[1] == "ا":
            return word[0] + word[2:]
        if word[2] in ("ا", "و", "ي"):
            return word[:2] + word[3]
        if word[3] == "ة":
            return word[:3]
        word = _suf1(word)
        if len(word) == 4:
            word = _pre1(word)
        return word
    if n == 5:
        root = _apply_templates(word, _W5)
        if root:
            return root
        word = _suf1(word)
        if len(word) == 5:
            word = _pre1(word)
        if len(word) == 4:
            return stem(word)
        return word
    if n == 6:
        root = _apply_templates(word, _W6)
        if root:
            return root
        word = _suf1(word)
        if len(word) == 6:
            word = _pre1(word)
        if len(word) in (4, 5):
            return stem(word)
        return word
    # n >= 7: trim one affix and re-run the length dispatch
    trimmed = _suf1(word)
    if len(trimmed) == len(word):
        trimmed = _pre1(word)
    if len(trimmed) < len(word):
        return stem(trimmed)
    return word
