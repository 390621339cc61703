"""Catalan Snowball stemmer, implemented from the published algorithm
(snowballstem.org "Catalan stemming algorithm", contributed by Israel
Olalla / iSOCO) — same from-scratch-from-spec approach as
:mod:`retriv_ray.text.spanish`.

Reference parity note: the reference's ``get_stemmer("catalan")``
resolves to PyStemmer's Snowball catalan
(retriv/sparse_retriever/preprocessing/stemmer.py:20), which encodes
this same published algorithm. PyStemmer is not installable here to
diff against; the suffix inventory below reconstructs the published
tables (attached pronouns, standard derivational suffixes, the verb
ending table, residual vowels, final de-accenting) — rare entries of
the original among-lists may be missing, so isolated words can
diverge; golden vectors in tests/test_text_registry.py are
hand-traced through this spec. Spec summary:
- R1/R2: standard Snowball definitions.
- step 0 attached pronoun: clitic pronouns (apostrophe, hyphen and
  plain forms) deleted in R1.
- step 1 standard suffix: derivational noun/adjective/adverb suffixes
  deleted in R1 or R2 per the table; ``log(i|í)(a|es)`` -> ``log``,
  ``ic/iqu`` follow-ups.
- step 2 verb suffix (only if step 1 removed nothing): the Catalan
  conjugation ending table, deleted in R1.
- step 3 residual suffix: final thematic vowels/markers in R1.
- cleaning: strip accents/diaeresis, ``ç`` -> ``c``.
"""

from __future__ import annotations

_VOWELS = set("aeiouáàéèíïóòúü")


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


# step 0: attached (enclitic) pronouns, longest first. Standard
# Catalan orthography always attaches clitics with a hyphen or an
# apostrophe ("portar-los", "dona'm"), so only separator forms are
# stripped — bare forms would overstrip ordinary vocabulary
# ("catalanisme" ends in "me").
_PRONOUNS = (
    "'ls-hi", "-les-hi", "-los-hi", "-nos-en", "-se'n", "-se'm",
    "-les", "-los", "-nos", "-vos", "'ns", "'ls", "-me", "-te",
    "-se", "-ne", "-ho", "-hi", "-la", "-li", "-lo", "'hi", "'ho",
    "'l", "'m", "'n", "'s", "'t",
)

# step 1: standard suffixes. (suffixes, region, replacement)
_STEP1 = [
    (("issimes", "íssimes", "issims", "íssims", "issima", "íssima",
      "issim", "íssim", "íssem", "ísseu", "ísses"), 1, ""),
    (("aments", "ament"), 1, ""),
    (("ments", "ment"), 1, ""),
    (("amment",), 1, ""),
    (("acions", "ació", "ancies", "àncies", "ancia", "ància",
      "encies", "ències", "encia", "ència"), 1, ""),
    (("adores", "adors", "adora", "ador", "ants", "ant"), 1, ""),
    (("ables", "able", "ibles", "ible"), 1, ""),
    (("ismes", "isme", "istes", "ista"), 1, ""),
    (("itats", "itat", "etats", "etat"), 1, ""),
    (("ives", "iva", "ius", "iu"), 1, ""),
    (("icos", "icas", "ics", "ica", "ic", "iques"), 1, ""),
    (("osos", "oses", "osa", "ós"), 1, ""),
    (("logies", "logia", "logíes", "logía"), 0, "log"),
    (("ucions", "ució", "uccions", "ucció"), 0, "u"),
    (("idees", "idea"), 1, ""),
    (("eries", "eria"), 1, ""),
    (("eses", "esa"), 1, ""),
    (("atges", "atge"), 1, ""),
    (("eres", "era"), 1, ""),
    (("aires", "aire"), 1, ""),
    (("dats", "dat"), 1, ""),
]

# step 2: verb endings (deleted in R1), longest first.
_VERB = tuple(sorted((
    # -ar conjugation
    "aríem", "aríeu", "arien", "aries", "ària", "àriem", "àrieu",
    "aria", "ariem", "arieu", "aré", "aràs", "arà", "arem", "areu",
    "aran", "ava", "aves", "àvem", "àveu", "aven", "ant", "ada",
    "ades", "ats", "at", "essis", "éssim", "éssiu", "essin", "essen",
    "esses", "assis", "àssim", "àssiu", "assin", "assen", "asses",
    "éssem", "ésseu", "éssen", "am", "ams",
    # -er/-re conjugation
    "eria", "eries", "eríem", "eríeu", "erien", "eré", "eràs", "erà",
    "erem", "ereu", "eran", "ia", "ies", "íem", "íeu", "ien",
    "ut", "uda", "udes", "uts", "ent",
    # -ir conjugation (incl. inchoative -eix-)
    "iria", "iries", "iríem", "iríeu", "irien", "iré", "iràs", "irà",
    "irem", "ireu", "iran", "int", "ida", "ides", "its", "it",
    "eixen", "eixes", "eixo", "eix", "eixi", "eixis", "eixin",
    "eixem", "eixeu", "isquen", "isques", "isca", "isquin",
    # person/number endings
    "em", "eu", "en", "es", "às", "àssem", "àsseu",
    "ar", "er", "ir", "re",
    "o", "i", "a", "e",
    "ïm", "ïu", "ïen", "ïa", "ïes",
), key=len, reverse=True))

# step 3: residual suffixes (R1).
_RESIDUAL = ("itz", "os", "eu", "iv", "a", "o", "á", "à", "í", "ï",
             "ó", "ò", "é", "è", "e", "i", "s", ".")

_CLEAN = str.maketrans("áàéèíïóòúüç", "aaeeiioouuc")


def _del_if(word: str, sufs, bound: int, repl: str = ""):
    """Delete/replace the longest suffix of ``sufs`` lying in the
    region starting at ``bound``; return (word, changed)."""
    for suf in sorted(sufs, key=len, reverse=True):
        if word.endswith(suf) and len(word) - len(suf) >= bound:
            return word[: len(word) - len(suf)] + repl, True
    return word, False


def stem(word: str) -> str:
    word = word.lower()
    if len(word) < 3:
        return word.translate(_CLEAN)
    r1, r2 = _regions(word)

    # step 0: attached pronouns
    word, _ = _del_if(word, _PRONOUNS, r1)

    # step 1: standard suffixes
    changed = False
    for sufs, depth, repl in _STEP1:
        bound = r2 if depth else r1
        word, ch = _del_if(word, sufs, bound, repl)
        if ch:
            changed = True
            if repl == "" and word.endswith("iqu") and len(word) - 3 >= r2:
                word = word[:-3] + "ic"
            break

    # step 2: verb suffixes, only when step 1 left the word alone
    if not changed:
        n0 = len(word)
        r1, r2 = _regions(word)
        for suf in _VERB:
            if word.endswith(suf) and n0 - len(suf) >= r1:
                word = word[: n0 - len(suf)]
                break

    # step 3: residual suffix
    r1, r2 = _regions(word)
    word, _ = _del_if(word, _RESIDUAL, r1)

    return word.translate(_CLEAN)
