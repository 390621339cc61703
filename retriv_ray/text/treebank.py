"""Treebank-style word tokenizer, implemented from the published Penn
Treebank tokenization rules (Robert MacIntyre's tokenizer.sed, public;
the same rule set NLTK's TreebankWordTokenizer encodes).

Reference parity note: the reference's ``get_tokenizer("word")`` is
NLTK ``word_tokenize`` (reference
retriv/sparse_retriever/preprocessing/tokenizer.py:13-16), which first
runs punkt sentence splitting and then the Treebank rules per
sentence. Punkt models are unavailable here, so the rules run over the
whole text; behavior differs only in final-period handling of inner
sentences (e.g. "York." mid-text keeps its period — matching the raw
TreebankWordTokenizer, not word_tokenize).
"""

from __future__ import annotations

import re

# rule order follows the published sed script
_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (
        re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'),
        r"\1 \2\3 ",
    ),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")]

_DOUBLE_DASHES = [(re.compile(r"--"), r" -- ")]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS2 = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(mor)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)\s"),
]

_CONTRACTIONS3 = [
    re.compile(r"(?i) ('t)(?#X)(is)\b"),
    re.compile(r"(?i) ('t)(?#X)(was)\b"),
]


def treebank_word_tokenizer(text: str) -> list:
    for pat, sub in _STARTING_QUOTES:
        text = pat.sub(sub, text)
    for pat, sub in _PUNCTUATION:
        text = pat.sub(sub, text)
    for pat, sub in _PARENS_BRACKETS:
        text = pat.sub(sub, text)
    for pat, sub in _DOUBLE_DASHES:
        text = pat.sub(sub, text)
    text = " " + text + " "
    for pat, sub in _ENDING_QUOTES:
        text = pat.sub(sub, text)
    for pat in _CONTRACTIONS2:
        text = pat.sub(r" \1 \2 ", text)
    for pat in _CONTRACTIONS3:
        text = pat.sub(r" \1 \2 ", text)
    return text.split()
