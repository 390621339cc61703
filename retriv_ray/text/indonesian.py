"""Indonesian confix-stripping stemmer, implemented from the published
algorithm (F. Z. Tala, "A Study of Stemming Effects on Information
Retrieval in Bahasa Indonesia", 2003; order of operations per
J. Asian's confix-stripping refinement, whose appendix is the basis
of Snowball's indonesian stemmer — the reference's
``get_stemmer("indonesian")`` resolves to PyStemmer's Snowball
indonesian, retriv/sparse_retriever/preprocessing/stemmer.py:30).

Steps (every removal requires the word to keep > 2 vowels — Tala's
two-syllable floor, applied before each removal):
1. inflectional particles -kah/-lah/-tah/-pun;
2. possessive pronouns -ku/-mu/-nya;
3. EITHER a first-order derivational prefix (meng-/meny-/men-/mem-/
   me-/peng-/peny-/pen-/pem-/di-/ter-/ke-), then derivational suffix
   (-kan/-an/-i), then a second-order prefix (ber-/bel-/be-/per-/
   pel-/pe-); OR — when no first-order prefix matches — a
   second-order prefix, then the suffix.

Morphophonemic recodings (Tala's template rules, resolved
deterministically — Snowball likewise picks one alternative):
meny+V -> s+V, peny+V -> s+V (menyapu -> sapu); men+V -> t+V,
pen+V -> t+V (menulis/penulis -> tulis); mem+V -> p+V, pem+V -> p+V
(memilih/pemilih -> pilih); meng+V and peng+V delete (mengambil ->
ambil); bel-/pel- delete only before 'ajar' (belajar -> ajar);
be- deletes before consonant+'er' (beserta stays, bekerja -> kerja).

Prefix-suffix restrictions (Tala's disallowed-confix table): after
be- never strip -i; after di- never strip -an; after ke- never strip
-i or -kan; after the me- family never strip -an. -i is additionally
never stripped after 's' (the -si rule).

Reference parity note: PyStemmer is not installable here to diff
against; where Tala's template rules are ambiguous the choice above
is the linguistically dominant one and may differ from Snowball's on
individual words. Golden vectors in tests/test_text_registry.py are
hand-traced through these rules.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _measure(w: str) -> int:
    return sum(1 for c in w if c in _VOWELS)


def _is_v(w: str, i: int) -> bool:
    return i < len(w) and w[i] in _VOWELS


def _remove_particle(w: str) -> str:
    for suf in ("kah", "lah", "tah", "pun"):
        if w.endswith(suf):
            return w[: -len(suf)]
    return w


def _remove_possessive(w: str) -> str:
    for suf in ("nya", "ku", "mu"):
        if w.endswith(suf):
            return w[: -len(suf)]
    return w


def _first_order_prefix(w: str):
    """(stem, prefix_class) or None. Longest form first."""
    if w.startswith("meny") and _is_v(w, 4):
        return "s" + w[4:], "me"
    if w.startswith("meng"):
        return w[4:], "me"
    if w.startswith("men") and _is_v(w, 3):
        return "t" + w[3:], "me"
    if w.startswith("men"):
        return w[3:], "me"
    if w.startswith("mem") and _is_v(w, 3):
        return "p" + w[3:], "me"
    if w.startswith("mem"):
        return w[3:], "me"
    if w.startswith("me"):
        return w[2:], "me"
    if w.startswith("peny") and _is_v(w, 4):
        return "s" + w[4:], "pe"
    if w.startswith("peng"):
        return w[4:], "pe"
    if w.startswith("pen") and _is_v(w, 3):
        return "t" + w[3:], "pe"
    if w.startswith("pen"):
        return w[3:], "pe"
    if w.startswith("pem") and _is_v(w, 3):
        return "p" + w[3:], "pe"
    if w.startswith("pem"):
        return w[3:], "pe"
    if w.startswith("di"):
        return w[2:], "di"
    if w.startswith("ter"):
        return w[3:], "ter"
    if w.startswith("ke"):
        return w[2:], "ke"
    return None


def _second_order_prefix(w: str):
    """(stem, prefix_class) or None."""
    if w.startswith("belajar"):
        return w[3:], "be"
    if w.startswith("ber"):
        return w[3:], "be"
    # be + consonant + 'er' (bekerja -> kerja)
    if w.startswith("be") and len(w) > 4 and w[2] not in _VOWELS and w[3:5] == "er":
        return w[2:], "be"
    if w.startswith("pelajar"):
        return w[3:], "pe"
    if w.startswith("per"):
        return w[3:], "pe"
    if w.startswith("pe"):
        return w[2:], "pe"
    return None


def _remove_suffix(w: str, prefix: str) -> str:
    if w.endswith("kan") and prefix != "ke":
        return w[:-3]
    if w.endswith("an") and prefix not in ("di", "me"):
        return w[:-2]
    if w.endswith("i") and prefix not in ("be", "ke") and not w.endswith("si"):
        return w[:-1]
    return w


def stem(word: str) -> str:
    w = word.lower()
    if _measure(w) > 2:
        w = _remove_particle(w)
    if _measure(w) > 2:
        w = _remove_possessive(w)
    prefix = ""
    first = _first_order_prefix(w) if _measure(w) > 2 else None
    if first is not None and _measure(first[0]) >= 2:
        w, prefix = first
        if _measure(w) > 2:
            w = _remove_suffix(w, prefix)
        if _measure(w) > 2:
            second = _second_order_prefix(w)
            if second is not None and _measure(second[0]) >= 2:
                w = second[0]
    else:
        if _measure(w) > 2:
            second = _second_order_prefix(w)
            if second is not None and _measure(second[0]) >= 2:
                w, prefix = second
        if _measure(w) > 2:
            w = _remove_suffix(w, prefix)
    return w
