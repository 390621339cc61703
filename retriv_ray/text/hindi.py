"""Hindi lightweight stemmer, implemented from the published algorithm
(A. Ramanathan & D. Rao, "A Lightweight Stemmer for Hindi", EACL 2003
workshop) — the algorithm Snowball's hindi stemmer implements and the
reference's ``get_stemmer("hindi")`` resolves to via PyStemmer
(retriv/sparse_retriever/preprocessing/stemmer.py:28).

Algorithm: strip the LONGEST matching suffix from the published
Devanagari suffix table (lengths 5..1, case endings + verb
inflections + plural/oblique markers), provided at least one
character remains. No recoding, no regions.

Reference parity note: PyStemmer is not installable in this
environment to diff against; the suffix table below is the paper's
(as reproduced across open implementations). Snowball's hindi.sbl
carries the same inventory; any divergence would be limited to rare
entries. Golden vectors in tests/test_text_registry.py are
hand-traced.
"""

from __future__ import annotations

# The paper's suffix list, grouped by length in characters (Python
# len over the unicode string — Devanagari matras count as one).
_SUFFIXES = {
    1: ("ो", "े", "ू", "ु", "ी", "ि", "ा"),
    # ो े ू ु ी ि ा
    2: (
        "कर",  # कर
        "ाओ",  # ाओ
        "िए",  # िए
        "ाई",  # ाई
        "ाए",  # ाए
        "ने",  # ने
        "नी",  # नी
        "ना",  # ना
        "ते",  # ते
        "ीं",  # ीं
        "ती",  # ती
        "ता",  # ता
        "ाँ",  # ाँ
        "ां",  # ां
        "ों",  # ों
        "ें",  # ें
    ),
    3: (
        "ाकर",  # ाकर
        "ाइए",  # ाइए
        "ाईं",  # ाईं
        "ाया",  # ाया
        "ेगी",  # ेगी
        "ेगा",  # ेगा
        "ोगी",  # ोगी
        "ोगे",  # ोगे
        "ाने",  # ाने
        "ाना",  # ाना
        "ाते",  # ाते
        "ाती",  # ाती
        "ाता",  # ाता
        "तीं",  # तीं
        "ाओं",  # ाओं
        "ाएं",  # ाएं
        "ुओं",  # ुओं
        "ुएं",  # ुएं
        "ुआं",  # ुआं
    ),
    4: (
        "ाएगी",  # ाएगी
        "ाएगा",  # ाएगा
        "ाओगी",  # ाओगी
        "ाओगे",  # ाओगे
        "एंगी",  # एंगी
        "ेंगी",  # ेंगी
        "एंगे",  # एंगे
        "ेंगे",  # ेंगे
        "ूंगी",  # ूंगी
        "ूंगा",  # ूंगा
        "ातीं",  # ातीं
        "नाओं",  # नाओं
        "नाएं",  # नाएं
        "ताओं",  # ताओं
        "ताएं",  # ताएं
        "ियाँ",  # ियाँ
        "ियों",  # ियों
        "ियां",  # ियां
    ),
    5: (
        "ाएंगी",  # ाएंगी
        "ाएंगे",  # ाएंगे
        "ाऊंगी",  # ाऊंगी
        "ाऊंगा",  # ाऊंगा
        "ाइयाँ",  # ाइयाँ
        "ाइयों",  # ाइयों
        "ाइयां",  # ाइयां
    ),
}


def stem(word: str) -> str:
    w = word
    for length in (5, 4, 3, 2, 1):
        if len(w) > length:
            for suf in _SUFFIXES[length]:
                if w.endswith(suf):
                    return w[:-length]
    return w
