"""French Snowball stemmer, implemented from the published algorithm
(snowballstem.org "French stemming algorithm") — same
from-scratch-from-spec approach as :mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("french")``
resolves to PyStemmer/NLTK's Snowball french, which encodes this same
published algorithm. Spec summary:
- prelude: u/i between vowels, y next to a vowel, and u after q are
  marked U/I/Y (consonants from then on), undone by the postlude.
- RV: after the third letter when the word starts with two vowels
  (or with par/col/tap), else after the first vowel not at the start.
- step 1: the standard-suffix table (R1/R2/RV conditions and the
  ement/ité/if follow-up chains).
- step 2a (if step 1 removed nothing, or matched one of the ment
  adverb endings): i-verb suffixes in RV preceded by a non-vowel;
  step 2b (if 2a ran and removed nothing): other verb suffixes in RV
  (ions in R2; the a-group drops a preceding e in RV).
- step 3 (if the last obeyed step altered the word): final Y -> i,
  ç -> c; otherwise step 4: trailing s (unless after a i o u è s),
  then ion (R2, after s/t) / ier, ière -> i / e in RV.
- step 5: undouble enn/onn/ett/ell/eill; step 6: un-accent a final
  é/è syllable closed by consonants.
"""

from __future__ import annotations

_VOWELS = set("aeiouyâàëéêèïîôûù")

_STEP1 = [
    # (suffixes, action tag)
    (("ances", "iqUes", "ismes", "ables", "istes",
      "ance", "iqUe", "isme", "able", "iste", "eux"),
     "delete_r2"),
    (("atrices", "atrice", "ateurs", "ations", "ateur", "ation"),
     "ator"),
    (("logies", "logie"), "log"),
    (("usions", "utions", "usion", "ution"), "u"),
    (("ences", "ence"), "ent"),
    (("ements", "ement"), "ement"),
    (("ités", "ité"), "ite"),
    (("ives", "ifs", "ive", "if"), "if"),
    (("eaux",), "eaux"),
    (("aux",), "aux"),
    (("euses", "euse"), "euse"),
    (("issements", "issement"), "issement"),
    (("amment",), "amment"),
    (("emment",), "emment"),
    (("ments", "ment"), "ment"),
]

_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)

_STEP2B_IONS = ("ions",)
_STEP2B_E = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "iez", "era", "ées", "és", "ée",
    "er", "ez", "é",
)
_STEP2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)


def _prelude(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1] in _VOWELS
        next_v = i + 1 < n and chars[i + 1] in _VOWELS
        if c == "u":
            if i > 0 and chars[i - 1] == "q":
                chars[i] = "U"
            elif prev_v and next_v:
                chars[i] = "U"
        elif c == "i":
            if prev_v and next_v:
                chars[i] = "I"
        elif c == "y":
            if prev_v or next_v:
                chars[i] = "Y"
    return "".join(chars)


def _rv(word: str) -> int:
    n = len(word)
    if n >= 3 and word[0] in _VOWELS and word[1] in _VOWELS:
        return 3
    if word[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if word[i] in _VOWELS:
            return i + 1
    return n


def _regions(word: str) -> tuple:
    n = len(word)

    def after_vc(start: int) -> int:
        i = start
        while i < n and word[i] not in _VOWELS:
            i += 1
        while i < n and word[i] in _VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return r1, r2


def stem(word: str) -> str:
    w = _prelude(word.lower())
    rv = _rv(w)
    r1, r2 = _regions(w)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    step1_changed = False
    found_ment = False  # amment/emment/ment/ments matched (step 2a gate)

    # ---- step 1: standard suffixes (longest match over the table)
    best = None
    for sufs, action in _STEP1:
        for suf in sufs:
            if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
                best = (suf, action)
    if best is not None:
        suf, action = best
        pos = len(w) - len(suf)
        if action == "delete_r2":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
        elif action == "ator":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif action == "log":
            if in_r2(pos):
                w = w[:pos] + "log"
                step1_changed = True
        elif action == "u":
            if in_r2(pos):
                w = w[:pos] + "u"
                step1_changed = True
        elif action == "ent":
            if in_r2(pos):
                w = w[:pos] + "ent"
                step1_changed = True
        elif action == "ement":
            if in_rv(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("iqU") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif action == "ite":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif action == "if":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif action == "eaux":
            w = w[:pos] + "eau"
            step1_changed = True
        elif action == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
                step1_changed = True
        elif action == "euse":
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
            elif in_r1(pos):
                w = w[:pos] + "eux"
                step1_changed = True
        elif action == "issement":
            if in_r1(pos) and pos >= 1 and w[pos - 1] not in _VOWELS:
                w = w[:pos]
                step1_changed = True
        elif action == "amment":
            found_ment = True
            if in_rv(pos):
                w = w[:pos] + "ant"
                step1_changed = True
        elif action == "emment":
            found_ment = True
            if in_rv(pos):
                w = w[:pos] + "ent"
                step1_changed = True
        elif action == "ment":
            found_ment = True
            # delete if preceded by a vowel in RV
            if pos >= 1 and w[pos - 1] in _VOWELS and in_rv(pos - 1):
                w = w[:pos]
                step1_changed = True

    # ---- steps 2a/2b: verb suffixes
    ran_2a = ran_2b = False
    changed_2a = changed_2b = False
    if not step1_changed or found_ment:
        ran_2a = True
        best2a = None
        for suf in _STEP2A:
            if w.endswith(suf) and (best2a is None or len(suf) > len(best2a)):
                best2a = suf
        if best2a is not None:
            pos = len(w) - len(best2a)
            # delete if in RV, preceded by a non-vowel-in-RV (a char
            # outside RV counts as non-vowel, per the setlimit spec)
            if in_rv(pos) and (
                pos - 1 < rv or (pos >= 1 and w[pos - 1] not in _VOWELS)
            ) and pos >= 1:
                w = w[:pos]
                changed_2a = True
        if not changed_2a:
            ran_2b = True
            best2b = None
            for group, sufs in (
                ("ions", _STEP2B_IONS),
                ("e", _STEP2B_E),
                ("a", _STEP2B_A),
            ):
                for suf in sufs:
                    if w.endswith(suf) and (
                        best2b is None or len(suf) > len(best2b[0])
                    ):
                        best2b = (suf, group)
            if best2b is not None:
                suf, group = best2b
                pos = len(w) - len(suf)
                if group == "ions":
                    if in_r2(pos) and in_rv(pos):
                        w = w[:pos]
                        changed_2b = True
                elif group == "e":
                    if in_rv(pos):
                        w = w[:pos]
                        changed_2b = True
                else:  # a-group
                    if in_rv(pos):
                        w = w[:pos]
                        changed_2b = True
                        if w.endswith("e") and in_rv(len(w) - 1):
                            w = w[:-1]

    last_altered = (
        changed_2b if ran_2b else (changed_2a if ran_2a else step1_changed)
    )

    if last_altered:
        # ---- step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---- step 4
        if (
            w.endswith("s")
            and (len(w) < 2 or w[-2] not in "aiouès")
        ):
            w = w[:-1]
        best4 = None
        for suf in ("ière", "Ière", "ier", "Ier", "ion", "e", "ë"):
            if w.endswith(suf) and (best4 is None or len(suf) > len(best4)):
                best4 = suf
        if best4 is not None:
            pos = len(w) - len(best4)
            if best4 == "ion":
                if (
                    in_r2(pos)
                    and in_rv(pos)
                    and pos >= 1
                    and w[pos - 1] in "st"
                    and in_rv(pos - 1)
                ):
                    w = w[:pos]
            elif best4 in ("ier", "ière", "Ier", "Ière"):
                if in_rv(pos):
                    w = w[:pos] + "i"
            elif best4 == "e":
                if in_rv(pos):
                    w = w[:pos]
            elif best4 == "ë":
                if in_rv(pos) and w[:pos].endswith("gu"):
                    w = w[:pos]

    # ---- step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # ---- step 6: un-accent (final é/è syllable closed by non-vowels)
    i = len(w) - 1
    seen_nonvowel = False
    while i >= 0:
        if w[i] in _VOWELS:
            if w[i] in "éè" and seen_nonvowel:
                w = w[:i] + "e" + w[i + 1 :]
            break
        seen_nonvowel = True
        i -= 1

    # ---- postlude
    return w.translate(str.maketrans("UIY", "uiy"))
