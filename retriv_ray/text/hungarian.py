"""Hungarian Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Hungarian stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.german`.

Reference parity note: the reference's ``get_stemmer("hungarian")``
resolves to PyStemmer's Snowball hungarian
(retriv/sparse_retriever/preprocessing/stemmer.py:29). The case /
instrumental / factive / plural steps follow the published prose
exactly; the owned / owner-suffix steps (6–8) are reconstructed from
the prose's pattern (long-vowel forms á…/é… rewrite to a/e, the rest
delete) and may differ from PyStemmer on a handful of rare owner
forms — PyStemmer is not installable in this environment to
diff against, so the unit vectors below are hand-traced.

Every among is evaluated with the match itself restricted to R1
(Snowball ``setlimit tolimit ... among``): a shorter suffix wholly in
R1 beats a longer one that straddles the boundary (e.g. ``onként``
with r1=2 strips ``ként`` → ``on``, not nothing).

Spec summary:
- vowels a á e é i í o ó ö ő u ú ü ű; digraphs cs dz dzs gy ly ny sz
  ty zs count as single consonants for R1; doubled consonants
  (bb … zzs, including doubled digraphs ccs/ggy/lly/nny/ssz/tty/zzs)
  undouble after the instrumental and factive deletions.
- R1: after the first consonant/digraph if the word starts with a
  vowel, after the first vowel if it starts with a consonant.
- steps: 1 instrumental al/el after a double consonant; 2 frequent
  cases (delete, then final á→a, é→e); 3 special cases án/ánként→a,
  én→e; 4 other cases astul/estül/stul/stül delete, ástul→a,
  éstül→e; 5 factive á/é after a double consonant; 6 owned; 7
  singular owner; 8 plural owner; 9 plural (ák→a, ék→e,
  ök/ok/ek/ak/k delete).
"""

from __future__ import annotations

_VOWELS = set("aáeéiíoóöőuúüű")

_DIGRAPHS = ("cs", "dzs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

# doubled consonants, longest first so 'ccs' wins over 'cc'
_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)

_STEP2_CASES = (
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
    "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
    "anként", "ként", "en", "on", "an", "ön", "n", "t",
)

_STEP7_DELETE = (
    "ünk", "unk", "nk", "juk", "jük", "uk", "ük", "em", "om", "am",
    "m", "od", "ed", "ad", "öd", "d", "ja", "je", "a", "e", "o",
)
_STEP7_A = ("ánk", "ám", "ád", "á")
_STEP7_E = ("énk", "ém", "éd", "é")

_STEP8_DELETE = (
    "jaim", "jeim", "aim", "eim", "im", "jaid", "jeid", "aid", "eid",
    "id", "jai", "jei", "ai", "ei", "i", "jaink", "jeink", "aink",
    "eink", "ink", "jaitok", "jeitek", "aitok", "eitek", "itek",
    "jaik", "jeik", "aik", "eik", "ik",
)
_STEP8_A = ("áim", "áid", "ái", "áink", "áitok", "áik")
_STEP8_E = ("éim", "éid", "éi", "éink", "éitek", "éik")

_STEP6_DELETE = ("oké", "öké", "aké", "eké", "uké", "üké", "ké", "éi", "é")
_STEP6_A = ("áké", "áéi")
_STEP6_E = ("éké", "ééi")


def _r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _VOWELS:
        i = 0
        while i < n and w[i] in _VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    return i + 1 if i < n else n


def _ends_double(w: str):
    for d in _DOUBLES:
        if w.endswith(d):
            return d
    return None


def _undouble(w: str) -> str:
    d = _ends_double(w)
    if d is None:
        return w
    half = d[len(d) // 2 :] if len(d) % 2 == 0 else d[1:]
    return w[: len(w) - len(d)] + half


def _longest_in(w: str, r1: int, pairs):
    """Longest (suffix, repl) among those whose match lies wholly in
    R1 — Snowball wraps each ``among`` in ``setlimit`` to R1, which
    restricts the *match itself*, so a shorter in-R1 suffix must win
    over a longer one that straddles the R1 boundary."""
    best = None
    for suf, repl in pairs:
        if (
            w.endswith(suf)
            and len(w) - len(suf) >= r1
            and (best is None or len(suf) > len(best[0]))
        ):
            best = (suf, repl)
    return best


def _v_ending(w: str, r1: int) -> str:
    if w.endswith("á") and len(w) - 1 >= r1:
        return w[:-1] + "a"
    if w.endswith("é") and len(w) - 1 >= r1:
        return w[:-1] + "e"
    return w


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w)

    # ---- step 1: instrumental al/el after a double consonant
    for suf in ("al", "el"):
        if w.endswith(suf) and len(w) - 2 >= r1:
            if _ends_double(w[:-2]):
                w = _undouble(w[:-2])
            break

    # ---- step 2: frequent cases
    best = _longest_in(w, r1, ((s, "") for s in _STEP2_CASES))
    if best is not None:
        w = w[: len(w) - len(best[0])]
        w = _v_ending(w, r1)

    # ---- step 3: special cases
    best = _longest_in(w, r1, (("ánként", "a"), ("án", "a"), ("én", "e")))
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    # ---- step 4: other cases
    best = _longest_in(
        w,
        r1,
        (
            ("astul", ""), ("estül", ""), ("ástul", "a"), ("éstül", "e"),
            ("stul", ""), ("stül", ""),
        ),
    )
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    # ---- step 5: factive á/é after a double consonant
    for suf in ("á", "é"):
        if w.endswith(suf) and len(w) - 1 >= r1:
            if _ends_double(w[:-1]):
                w = _undouble(w[:-1])
            break

    # ---- step 6: owned
    best = _longest_in(
        w,
        r1,
        [(s, "a") for s in _STEP6_A]
        + [(s, "e") for s in _STEP6_E]
        + [(s, "") for s in _STEP6_DELETE],
    )
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    # ---- step 7: singular owner
    best = _longest_in(
        w,
        r1,
        [(s, "a") for s in _STEP7_A]
        + [(s, "e") for s in _STEP7_E]
        + [(s, "") for s in _STEP7_DELETE],
    )
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    # ---- step 8: plural owner
    best = _longest_in(
        w,
        r1,
        [(s, "a") for s in _STEP8_A]
        + [(s, "e") for s in _STEP8_E]
        + [(s, "") for s in _STEP8_DELETE],
    )
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    # ---- step 9: plural
    best = _longest_in(
        w,
        r1,
        (
            ("ák", "a"), ("ék", "e"),
            ("ök", ""), ("ok", ""), ("ek", ""), ("ak", ""), ("k", ""),
        ),
    )
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    return w
