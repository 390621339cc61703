"""Turkish Snowball stemmer, implemented from the published algorithm
(E. Kapusuz Çilden, "Stemming Turkish Words Using Snowball",
snowballstem.org "Turkish stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.german`.

The reference's ``get_stemmer("turkish")`` resolves to PyStemmer's
Snowball turkish (retriv/sparse_retriever/preprocessing/stemmer.py:43).

Structure (all suffix stripping in backwards mode, only for words
with more than one vowel):
1. nominal verb suffixes ("to be" forms on nouns), stripped once with
   the report's agglutination continuations: -(y)mUş/-(y)DU/-(y)sA/
   -(y)ken; -cAsInA and -DUr each followed by an optional person
   ending and -(y)mUş; -nUz followed by -(y)DU/-(y)sA; person endings
   -(y)Um/-sUn/-(y)Uz/-sUnUz followed by -(y)mUş; plural -lAr
   followed by -DUr/-(y)DU/-(y)sA/-(y)mUş.
2. noun suffixes as the morphotactic chain root+lAr+possessive+case
   (+ki, which re-enters the chain): stripped backwards as
   [case][possessive][plural], with -ki re-running the chain
   (evdekiler -> lAr, ki, DA -> ev).
3. post-processing: a stem left ending in d/g gets the
   vowel-harmonized U appended (kredi -> kred -> kredi), then a final
   b/c/d/ğ devoices to p/ç/t/k (kitabı -> kitab -> kitap).

Template letters: U = ı/i/u/ü (all U's in one suffix harmonize
together, e.g. -(U)mUz -> ımız/imiz/umuz/ümüz), A = a/e, D = d/t,
C = c/ç. Every vowel-bearing suffix (except -ken, -ki) passes the
vowel-harmony check — its first vowel must harmonize with the stem's
last vowel (a/ı after a,ı,o,u; e/i after e,i,ö,ü; u after o,u; ü
after ö,ü) — and optional buffer letters validate symmetrically: an
optional consonant (y/n/s) must follow a vowel when present, and the
bare suffix must follow a consonant; the optional U vowel of
-(U)m/-(U)n/-(U)mUz/-(U)nUz the reverse.

Reference parity notes (PyStemmer not installable here to diff):
suffix inventory, harmony/buffer rules, chain shapes and
post-processing follow the published report; the Snowball source's
exact branch alternation is reconstructed (accusative -(y)U and
3sg-possessive -(s)U are merged into one (s|y)U mark so the buffer
rule picks the right segmentation), so individual rare forms may
differ from PyStemmer. Golden vectors in tests/test_text_registry.py
are hand-traced through these rules.
"""

from __future__ import annotations

from typing import Optional, Tuple

_VOWELS = set("aeıioöuü")

# harmony: suffix vowel -> allowed preceding stem vowels
_HARMONY = {
    "a": set("aıou"),
    "e": set("eiöü"),
    "ı": set("aı"),
    "i": set("ei"),
    "o": set("ou"),
    "ö": set("öü"),
    "u": set("ou"),
    "ü": set("öü"),
}

_LETTERS = {"U": "ıiuü", "A": "ae", "D": "dt", "C": "cç"}


def _expand(template: str):
    """'(y)Um' -> concrete forms, longest first. The optional group
    may list alternatives ('(sy)U') and may itself be a template
    letter ('(U)mUz'). All occurrences of one template letter take the
    same concrete vowel/consonant (vowel harmony within a suffix:
    -(U)mUz -> ımız/imiz/umuz/ümüz, never ımuz)."""
    opts = ""
    body = template
    if template.startswith("("):
        close = template.index(")")
        opts, body = template[1:close], template[close + 1 :]
    pairs = [(opts, body)]
    for ch, alphabet in _LETTERS.items():
        if ch in body or ch in opts:
            pairs = [
                (o.replace(ch, c), b.replace(ch, c))
                for o, b in pairs
                for c in alphabet
            ]
    forms = []
    for o, b in pairs:
        for oc in o:
            forms.append(("opt", oc + b))
        forms.append(("bare", b))
    forms = sorted(set(forms), key=lambda t: (-len(t[1]), t[1]))
    return opts, forms


class _Mark:
    def __init__(self, template: str, harmony: bool = True):
        self.opts, self.forms = _expand(template)
        self.harmony = harmony
        # vowel-type optional ('(U)m') vs consonant-type ('(y)A', '(sy)U')
        self.opt_is_vowel = bool(self.opts) and (
            self.opts[0] == "U" or self.opts[0] in _VOWELS
        )

    def strip(self, w: str) -> Optional[str]:
        """Stem with this suffix removed, or None. Enforces harmony,
        buffer validity, and a non-empty vowel-bearing stem."""
        for kind, form in self.forms:
            if not w.endswith(form) or len(w) <= len(form):
                continue
            stem_ = w[: -len(form)]
            prev = stem_[-1]
            if self.opts:
                has_opt = kind == "opt"
                prev_is_vowel = prev in _VOWELS
                if self.opt_is_vowel:
                    # optional U: present after a consonant, bare after a vowel
                    if has_opt == prev_is_vowel:
                        continue
                else:
                    # optional y/n/s: present after a vowel, bare after a consonant
                    if has_opt != prev_is_vowel:
                        continue
            if self.harmony:
                first_v = next((c for c in form if c in _VOWELS), None)
                if first_v is not None:
                    last_stem_v = next(
                        (c for c in reversed(stem_) if c in _VOWELS), None
                    )
                    if last_stem_v is None or last_stem_v not in _HARMONY[first_v]:
                        continue
            if not any(c in _VOWELS for c in stem_):
                continue
            return stem_
        return None


def _try(w: str, *marks: _Mark) -> Tuple[str, bool]:
    for m in marks:
        out = m.strip(w)
        if out is not None:
            return out, True
    return w, False


def _try_which(w: str, marks) -> Tuple[str, Optional[_Mark]]:
    for m in marks:
        out = m.strip(w)
        if out is not None:
            return out, m
    return w, None


# -- nominal verb suffixes --------------------------------------------------
_ymUs = _Mark("(y)mUş")
_yDU = _Mark("(y)DU")
_ysA = _Mark("(y)sA")
_yken = _Mark("(y)ken", harmony=False)
_cAsInA = _Mark("CAsInA")
_DUr = _Mark("DUr")
_nUz = _Mark("nUz")
_sUnUz = _Mark("sUnUz")
_yUz = _Mark("(y)Uz")
_sUn = _Mark("sUn")
_yUm = _Mark("(y)Um")
_lAr = _Mark("lAr")

# -- noun suffixes: case, then possessive, then plural (backwards) ----------
_KI = _Mark("ki", harmony=False)
_SYU = _Mark("(sy)U")
_CASE = (
    _Mark("ndAn"),
    _Mark("ndA"),
    _Mark("(n)Un"),
    _Mark("(n)CA"),
    _Mark("DAn"),
    _Mark("nA"),
    _Mark("DA"),
    _Mark("(y)lA"),
    _Mark("nU"),
    _SYU,
    _Mark("(y)A"),
)
# -ki attaches only to a locative/genitive (evDEki, onunki), so 'ki'
# strips ONLY when one of these immediately strips after it — a bare
# ...ki word (türki, eski) is left alone
_KI_HOSTS = (_Mark("ndA"), _Mark("DA"), _Mark("(n)Un"))
_POSS = (
    _Mark("lArI"),
    _Mark("(U)mUz"),
    _Mark("(U)nUz"),
    _Mark("(s)U"),
    _Mark("(U)m"),
    _Mark("(U)n"),
)


def _stem_nominal_verb(w: str) -> str:
    out, ok = _try(w, _ymUs, _yDU, _ysA, _yken)
    if ok:
        return out
    out, ok = _try(w, _cAsInA)
    if ok:
        out, _ = _try(out, _sUnUz, _lAr, _yUm, _sUn, _yUz)
        out, _ = _try(out, _ymUs)
        return out
    out, ok = _try(w, _DUr)
    if ok:
        out, _ = _try(out, _sUnUz, _lAr, _yUm, _sUn, _yUz)
        out, _ = _try(out, _ymUs)
        return out
    out, ok = _try(w, _nUz)
    if ok:
        # -nUz is only a chain tail after -yDU/-ysA (geldiniz -> gel);
        # without that continuation prefer the person endings below
        # (doktorsunuz: -sUnUz, not -nUz)
        out2, ok2 = _try(out, _yDU, _ysA)
        if ok2:
            return out2
    out, ok = _try(w, _sUnUz, _yUz, _sUn, _yUm)
    if ok:
        out, _ = _try(out, _ymUs)
        return out
    out, ok = _try(w, _lAr)
    if ok:
        out, _ = _try(out, _DUr, _yDU, _ysA, _ymUs)
        return out
    return w


def _strip_ki_chain(w: str) -> Tuple[str, bool]:
    ki = _KI.strip(w)
    if ki is None:
        return w, False
    out, ok = _try(ki, *_KI_HOSTS)
    if ok:
        return out, True
    return w, False


def _stem_noun(w: str) -> str:
    """Backwards pass of the [case][possessive][plural] chain; a -ki
    (validated by its locative/genitive host) re-enters the chain
    (arabasındakilerden: -DAn, -lAr, -ki+-ndA, then -sU). A case
    stripped via -(s|y)U cannot be preceded by a possessive (the
    accusative after a possessive is -nU, never -(y)U), so that
    branch skips the possessive stage."""
    for _round in range(3):
        out, ok = _strip_ki_chain(w)
        if ok:
            w = out
            continue
        w, case_mark = _try_which(w, _CASE)
        if case_mark is not _SYU:
            w, _ = _try(w, *_POSS)
        w, _ = _try(w, _lAr)
        out, ok = _strip_ki_chain(w)
        if not ok:
            return w
        w = out
    return w


def _post_process(w: str) -> str:
    if w and w[-1] in "dg":
        last_v = next((c for c in reversed(w) if c in _VOWELS), None)
        if last_v is not None:
            for u in _LETTERS["U"]:
                if last_v in _HARMONY[u]:
                    return w + u
    if w:
        repl = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(w[-1])
        if repl:
            return w[:-1] + repl
    return w


def stem(word: str) -> str:
    w = word.lower()
    # proper-noun apostrophe (İstanbul'da): the suffix after the
    # apostrophe is a normal case suffix; newer Snowball strips it
    # with the apostrophe
    if "'" in w:
        head = w.split("'", 1)[0]
        if any(c in _VOWELS for c in head):
            w = head
    if sum(1 for c in w if c in _VOWELS) < 2:
        return w
    w = _stem_nominal_verb(w)
    w = _stem_noun(w)
    return _post_process(w)
