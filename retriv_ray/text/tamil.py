"""Tamil Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Tamil stemming algorithm", contributed by
Damodharan Rajalingam) — same from-scratch-from-spec approach as
:mod:`retriv_ray.text.hindi`.

Reference parity note: the reference's ``get_stemmer("tamil")``
resolves to PyStemmer's Snowball tamil
(retriv/sparse_retriever/preprocessing/stemmer.py:41). PyStemmer is
not installable here to diff against. The published algorithm is a
sequence of routines over the Tamil script: remove question clitics
(ஆ/ஓ/ஏ vowel signs, restoring the virama), the conjunctive உம்,
plural கள்/க்கள்/ங்கள் (with the ம் sandhi undo), common word
endings (உடைய/இன்றி …), the case endings (vetrumai urupukal:
accusative ை, dative (உ)க்கு, locative இல்/இடம், genitive இன்,
instrumental ஆல்/ஓடு/உடன், ablative இலிருந்து), and a repeated
tense-suffix pass (present கிற்/கின்ற், past ந்த்/த்த்/ட்ட்/ற்ற்,
future வ்/ப்ப் stems with their person-number-gender endings).
The inventories reconstruct the published tables; rare entries may
be missing, so isolated words can diverge from PyStemmer. Golden
vectors in tests/test_text_registry.py are hand-traced through this
spec.
"""

from __future__ import annotations

_PULLI = "்"  # ்  (virama)

# vowel signs used by the question/emphasis clitics
_QUESTION_SIGNS = ("ா", "ோ", "ே")  # ா ோ ே

# (suffix, replacement) — longest first within each step.
_PLURAL = (
    ("ங்கள்", "ம்"),   # sandhi: மரங்கள் -> மரம்
    ("க்கள்", ""),
    ("கள்", ""),
)

_COMMON_ENDINGS = (
    ("உடைய", ""), ("ுடைய", ""), ("இன்றி", ""), ("ின்றி", ""),
    ("ாகிய", ""), ("ான", ""), ("ென", ""), ("ாக", ""),
)

_CASE = (
    ("ிலிருந்து", _PULLI), ("லிருந்து", ""),
    ("ுக்காக", _PULLI), ("ுக்கு", _PULLI), ("க்கு", ""),
    ("ிடமிருந்து", _PULLI), ("ிடம்", _PULLI),
    ("ோடு", _PULLI), ("ுடன்", _PULLI), ("ூடன்", _PULLI),
    ("ால்", _PULLI), ("ினால்", _PULLI),
    ("ில்", _PULLI), ("ின்", _PULLI), ("ினது", _PULLI),
    ("ை", _PULLI), ("ினை", _PULLI), ("ாது", _PULLI),
)

_TENSE = (
    # present
    ("கின்றான்", ""), ("கின்றாள்", ""), ("கின்றார்", ""),
    ("கின்றது", ""), ("கின்றன", ""), ("கின்றேன்", ""),
    ("கின்றோம்", ""), ("கின்றீர்கள்", ""), ("கின்றார்கள்", ""),
    ("கிறான்", ""), ("கிறாள்", ""), ("கிறார்", ""),
    ("கிறது", ""), ("கிறன", ""), ("கிறேன்", ""),
    ("கிறோம்", ""), ("கிறீர்கள்", ""), ("கிறார்கள்", ""),
    # past (ந்த் / த்த் / ட்ட் / ற்ற் stems)
    ("ந்தான்", _PULLI), ("ந்தாள்", _PULLI), ("ந்தார்", _PULLI),
    ("ந்தது", _PULLI), ("ந்தன", _PULLI), ("ந்தேன்", _PULLI),
    ("ந்தோம்", _PULLI), ("ந்தீர்கள்", _PULLI), ("ந்தார்கள்", _PULLI),
    ("த்தான்", _PULLI), ("த்தாள்", _PULLI), ("த்தார்", _PULLI),
    ("த்தது", _PULLI), ("த்தன", _PULLI), ("த்தேன்", _PULLI),
    ("த்தோம்", _PULLI), ("த்தீர்கள்", _PULLI), ("த்தார்கள்", _PULLI),
    ("தான்", _PULLI), ("தாள்", _PULLI), ("தார்", _PULLI),
    ("தது", _PULLI), ("தன", _PULLI), ("தேன்", _PULLI),
    ("தோம்", _PULLI), ("தீர்கள்", _PULLI), ("தார்கள்", _PULLI),
    ("ட்டான்", _PULLI), ("ட்டாள்", _PULLI), ("ட்டார்", _PULLI),
    ("ட்டது", _PULLI), ("ட்டன", _PULLI), ("ட்டேன்", _PULLI),
    ("ற்றான்", _PULLI), ("ற்றாள்", _PULLI), ("ற்றார்", _PULLI),
    ("ற்றது", _PULLI), ("ற்றன", _PULLI),
    # future
    ("ப்பான்", _PULLI), ("ப்பாள்", _PULLI), ("ப்பார்", _PULLI),
    ("ப்பது", _PULLI), ("ப்பன", _PULLI), ("ப்பேன்", _PULLI),
    ("ப்போம்", _PULLI), ("ப்பீர்கள்", _PULLI), ("ப்பார்கள்", _PULLI),
    ("வான்", _PULLI), ("வாள்", _PULLI), ("வார்", _PULLI),
    ("வது", _PULLI), ("வன", _PULLI), ("வேன்", _PULLI),
    ("வோம்", _PULLI), ("வீர்கள்", _PULLI), ("வார்கள்", _PULLI),
    # verbal noun / infinitive / adverbial participle
    ("ப்பதற்கு", _PULLI), ("ுதல்", _PULLI), ("த்தல்", _PULLI),
    ("ிக்க", _PULLI), ("க்க", ""), ("ித்து", _PULLI), ("த்து", _PULLI),
    ("ிந்து", _PULLI), ("ந்து", _PULLI), ("ட்டு", _PULLI), ("ற்று", _PULLI),
)


def _apply_once(word: str, table, min_len: int = 4):
    for suf, repl in sorted(table, key=lambda t: len(t[0]), reverse=True):
        if word.endswith(suf) and len(word) - len(suf) >= min_len - len(repl):
            base = word[: len(word) - len(suf)]
            if repl == _PULLI and base.endswith(_PULLI):
                repl = ""  # stem already consonant-final
            return base + repl, True
    return word, False


def stem(word: str) -> str:
    if len(word) < 4:
        return word

    # question/emphasis clitics: a final long-vowel sign on a word
    # that already has body; restore the virama
    if len(word) >= 5 and word[-1] in _QUESTION_SIGNS and word[-2] not in _QUESTION_SIGNS:
        word = word[:-1] + _PULLI

    # conjunctive உம்
    if word.endswith("ும்") and len(word) >= 6:
        word = word[:-3] + _PULLI

    word, _ = _apply_once(word, _PLURAL)
    word, _ = _apply_once(word, _COMMON_ENDINGS)
    word, _ = _apply_once(word, _CASE)

    # tense suffixes are stripped repeatedly (published behavior)
    for _ in range(3):
        word, changed = _apply_once(word, _TENSE)
        if not changed:
            break

    # fix_endings: undo the oblique-stem augment (மரத்த்- is the
    # oblique of மரம்; வீட்ட்- of வீடு)
    if word.endswith("த்த்"):
        word = word[:-4] + "ம்"
    elif word.endswith("ட்ட்"):
        word = word[:-4] + "டு"
    elif word.endswith("ற்ற்"):
        word = word[:-4] + "று"
    return word
