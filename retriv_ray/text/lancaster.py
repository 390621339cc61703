"""Lancaster (Paice/Husk) stemmer, implemented from the published
algorithm (C. D. Paice, "Another Stemmer", SIGIR Forum 24(3), 1990)
and its published default rule table.

Reference parity note: the reference's ``get_stemmer("lancaster")``
resolves to NLTK's LancasterStemmer (reference
retriv/sparse_retriever/preprocessing/stemmer.py), which encodes the
same published rule table. Rules are ``(reversed_ending, intact_only,
remove_count, append, cont)``: a rule fires when the word ends with
``ending``; ``intact_only`` rules fire only if the word is still
unstemmed; after remove/append, ``cont`` repeats the scan. The
acceptability condition: a stem starting with a vowel keeps >= 2
letters; one starting with a consonant keeps >= 3 letters and must
contain a vowel (y after the first letter counts as a vowel).
"""

from __future__ import annotations

# Published default rule table, written here as
# (ending, intact_only, remove, append, continue).
_RULES = [
    ("ia", True, 2, "", False),
    ("a", True, 1, "", False),
    ("bb", False, 1, "", False),
    ("ytic", False, 3, "s", False),
    ("ic", False, 2, "", True),
    ("nc", False, 1, "t", True),
    ("dd", False, 1, "", False),
    ("ied", False, 3, "y", True),
    ("ceed", False, 2, "ss", False),
    ("eed", False, 1, "", False),
    ("ed", False, 2, "", True),
    ("hood", False, 4, "", True),
    ("e", False, 1, "", True),
    ("lief", False, 1, "v", False),
    ("if", False, 2, "", True),
    ("ing", False, 3, "", True),
    ("iag", False, 3, "y", False),
    ("ag", False, 2, "", True),
    ("gg", False, 1, "", False),
    ("th", True, 2, "", False),
    ("guish", False, 5, "ct", False),
    ("ish", False, 3, "", True),
    ("i", True, 1, "", False),
    ("i", False, 1, "y", True),
    ("ij", False, 1, "d", False),
    ("fuj", False, 1, "s", False),
    ("uj", False, 1, "d", False),
    ("oj", False, 1, "d", False),
    ("hej", False, 1, "r", False),
    ("verj", False, 1, "t", False),
    ("misj", False, 2, "t", False),
    ("nj", False, 1, "d", False),
    ("j", False, 1, "s", False),
    ("ifiabl", False, 6, "", False),
    ("iabl", False, 4, "y", False),
    ("abl", False, 3, "", True),
    ("ibl", False, 3, "", False),
    ("bil", False, 2, "l", True),
    ("cl", False, 1, "", False),
    ("iful", False, 4, "y", False),
    ("ful", False, 3, "", True),
    ("ul", False, 2, "", False),
    ("ial", False, 3, "", True),
    ("ual", False, 3, "", True),
    ("al", False, 2, "", True),
    ("ll", False, 1, "", False),
    ("ium", False, 3, "", False),
    ("um", True, 2, "", False),
    ("ism", False, 3, "", True),
    ("mm", False, 1, "", False),
    ("sion", False, 4, "j", True),
    ("xion", False, 4, "ct", False),
    ("ion", False, 3, "", True),
    ("ian", False, 3, "", True),
    ("an", False, 2, "", True),
    ("een", False, 0, "", False),
    ("en", False, 2, "", True),
    ("nn", False, 1, "", False),
    ("ship", False, 4, "", True),
    ("pp", False, 1, "", False),
    ("er", False, 2, "", True),
    ("ear", False, 0, "", False),
    ("ar", False, 2, "", False),
    ("or", False, 2, "", True),
    ("ur", False, 2, "", True),
    ("rr", False, 1, "", False),
    ("tr", False, 1, "", True),
    ("ier", False, 3, "y", True),
    ("ies", False, 3, "y", True),
    ("sis", False, 2, "", False),
    ("is", False, 2, "", True),
    ("ness", False, 4, "", True),
    ("ss", False, 0, "", False),
    ("ous", False, 3, "", True),
    ("us", True, 2, "", False),
    ("s", True, 1, "", True),
    ("s", False, 0, "", False),
    ("plicat", False, 4, "c", False),
    ("at", False, 2, "", True),
    ("ment", False, 4, "", True),
    ("ent", False, 3, "", True),
    ("ant", False, 3, "", True),
    ("ript", False, 2, "b", False),
    ("orpt", False, 2, "b", False),
    ("duct", False, 1, "", False),
    ("sumpt", False, 2, "", False),
    ("cept", False, 2, "iv", False),
    ("olut", False, 2, "v", False),
    ("sist", False, 0, "", False),
    ("ist", False, 3, "", True),
    ("tt", False, 1, "", False),
    ("iqu", False, 3, "", False),
    ("ogu", False, 1, "", False),
    ("siv", False, 3, "j", True),
    ("eiv", False, 0, "", False),
    ("iv", False, 2, "", True),
    ("bly", False, 1, "", True),
    ("ily", False, 3, "y", True),
    ("ply", False, 0, "", False),
    ("ly", False, 2, "", True),
    ("ogy", False, 1, "", False),
    ("phy", False, 1, "", False),
    ("omy", False, 1, "", False),
    ("opy", False, 1, "", False),
    ("ity", False, 3, "", True),
    ("ety", False, 3, "", True),
    ("lty", False, 2, "", False),
    ("istry", False, 5, "", False),
    ("ary", False, 3, "", True),
    ("ory", False, 3, "", True),
    ("ify", False, 3, "", False),
    ("ncy", False, 2, "t", True),
    ("acy", False, 3, "", True),
    ("iz", False, 2, "", True),
    ("yz", False, 1, "s", False),
]

# index rules by final letter for the scan
_BY_LAST: dict = {}
for _r in _RULES:
    _BY_LAST.setdefault(_r[0][-1], []).append(_r)

_VOWELS = set("aeiou")


def _acceptable(stem: str) -> bool:
    if not stem:
        return False
    if stem[0] in _VOWELS:
        return len(stem) >= 2
    # consonant start: >= 3 letters, containing a vowel or a y beyond
    # the first position
    return len(stem) >= 3 and any(
        c in _VOWELS or (c == "y") for c in stem[1:]
    )


def stem(word: str) -> str:
    w = word
    intact = True
    while True:
        rules = _BY_LAST.get(w[-1:] or "")
        if not rules:
            return w
        applied = False
        for ending, intact_only, remove, append, cont in rules:
            if not w.endswith(ending):
                continue
            if intact_only and not intact:
                continue
            if remove == 0 and not append and not cont:
                # protect rule: ending matched -> stop stemming
                return w
            cand = w[: len(w) - remove] + append if remove else w + append
            if remove and not _acceptable(w[: len(w) - remove] + append):
                continue
            w = cand
            intact = False
            applied = True
            if not cont:
                return w
            break  # re-scan from the (new) final letter
        if not applied:
            return w
