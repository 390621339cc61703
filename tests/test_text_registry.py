"""Unit vectors for the round-2 text-prep registry additions:
classic Porter ("porter"), Treebank word tokenizer ("word"),
rule-based sentence splitter ("sent"), multi-language stopwords.

Reference parity targets:
- stemmers: reference retriv/sparse_retriever/preprocessing/stemmer.py:116
- tokenizers: reference preprocessing/tokenizer.py:13-21
- stopwords: reference preprocessing/stopwords.py:5-43
"""

import pytest

from retriv_ray.text.porter1 import stem as porter1
from retriv_ray.text.stemmer import get_stemmer
from retriv_ray.text.stopwords import get_stopwords
from retriv_ray.text.tokenizer import get_tokenizer
from retriv_ray.text.treebank import treebank_word_tokenizer


# End-to-end outputs of the original published Porter algorithm
# (cross-checked against the official voc.txt/output.txt pairs).
PORTER_VECTORS = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("electricity", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("effective", "effect"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controlling", "control"),
    ("rolling", "roll"),
    ("generalizations", "gener"),
    ("oscillators", "oscil"),
]


@pytest.mark.parametrize("word,expected", PORTER_VECTORS)
def test_porter1_vectors(word, expected):
    assert porter1(word) == expected


def test_porter1_short_words_untouched():
    for w in ("a", "as", "is", "be", "on"):
        assert porter1(w) == w


def test_stemmer_registry_porter():
    fn = get_stemmer("porter")
    assert fn("running") == "run"
    assert fn("relational") == "relat"


def test_stemmer_registry_unknown_still_raises():
    with pytest.raises(NotImplementedError):
        get_stemmer("klingon")


TREEBANK_VECTORS = [
    (
        "Good muffins cost $3.88 in New York.",
        ["Good", "muffins", "cost", "$", "3.88", "in", "New", "York", "."],
    ),
    (
        "They'll save and invest more.",
        ["They", "'ll", "save", "and", "invest", "more", "."],
    ),
    (
        "hi, my name can't hello,",
        ["hi", ",", "my", "name", "ca", "n't", "hello", ","],
    ),
    (
        '"We beat some pretty good teams," he said.',
        ["``", "We", "beat", "some", "pretty", "good", "teams", ",", "''",
         "he", "said", "."],
    ),
    (
        "I cannot do it; gonna pass.",
        ["I", "can", "not", "do", "it", ";", "gon", "na", "pass", "."],
    ),
    (
        "A (simple) test -- with dashes.",
        ["A", "(", "simple", ")", "test", "--", "with", "dashes", "."],
    ),
]


@pytest.mark.parametrize("text,expected", TREEBANK_VECTORS)
def test_treebank_vectors(text, expected):
    assert treebank_word_tokenizer(text) == expected


def test_tokenizer_registry_word_and_sent():
    word = get_tokenizer("word")
    assert word("Don't stop.") == ["Do", "n't", "stop", "."]
    sent = get_tokenizer("sent")
    out = sent("First sentence. Second one! Dr. Smith agreed. Done?")
    assert out == [
        "First sentence.",
        "Second one!",
        "Dr. Smith agreed.",
        "Done?",
    ]


def test_sent_tokenizer_initials_and_tail():
    sent = get_tokenizer("sent")
    assert sent("J. K. Rowling wrote it. It sold well") == [
        "J. K. Rowling wrote it.",
        "It sold well",
    ]


def test_stopword_languages():
    checks = {
        "german": ["und", "der", "nicht", "ist"],
        "french": ["le", "et", "pas", "vous"],
        "spanish": ["el", "de", "que", "los"],
        "italian": ["il", "che", "di", "non"],
        "portuguese": ["de", "que", "para", "como"],
        "russian": ["и", "не", "что", "как"],
    }
    for lang, words in checks.items():
        sw = get_stopwords(lang)
        assert len(sw) > 100, lang
        assert len(set(sw)) == len(sw), f"{lang} has duplicates"
        for w in words:
            assert w in sw, (lang, w)


def test_stopword_unknown_still_raises():
    with pytest.raises(NotImplementedError):
        get_stopwords("klingon")


def test_pipeline_accepts_new_names():
    # the full chain resolves the new registry names end-to-end
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cfg = SparseConfig(tokenizer="word", stemmer="porter", stopwords="german")
    prep = TextPreprocessor(cfg)
    out = prep.tokens("Die Katzen laufen schnell und springen.")
    assert "und" not in out and len(out) > 0


LANCASTER_VECTORS = [
    ("maximum", "maxim"),
    ("presumably", "presum"),
    ("multiply", "multiply"),
    ("provision", "provid"),
    ("owed", "ow"),
    ("ear", "ear"),
    ("saying", "say"),
    ("crying", "cry"),
    ("string", "string"),
    ("meant", "meant"),
    ("cement", "cem"),
    ("running", "run"),
    ("analytic", "analys"),
    ("fusion", "fus"),
    ("conclusion", "conclud"),
    ("adhesion", "adher"),
    ("conversion", "convert"),
    ("admission", "admit"),
    ("expansion", "expand"),
    ("decision", "decid"),
    ("explosion", "explod"),
    ("agency", "ag"),
    ("evidence", "evid"),
    ("early", "ear"),
    ("happiness", "happy"),
    ("national", "nat"),
    ("connectivity", "connect"),
]


@pytest.mark.parametrize("word,expected", LANCASTER_VECTORS)
def test_lancaster_vectors(word, expected):
    from retriv_ray.text.lancaster import stem as lancaster

    assert lancaster(word) == expected


def test_stemmer_registry_lancaster():
    fn = get_stemmer("lancaster")
    assert fn("maximum") == "maxim"
    assert fn("") == ""  # no final letter -> unchanged


def test_diacritics_unidecode_fidelity():
    from retriv_ray.text.normalization import normalize_diacritics as nd

    assert nd("übermensch café naïve") == "ubermensch cafe naive"
    assert nd("Straße") == "Strasse"
    assert nd("Øresund æther Łódź") == "Oresund aether Lodz"
    assert nd("Þingvellir ð") == "Thingvellir d"


GERMAN_VECTORS = [
    ("katzen", "katz"),
    ("aufgabe", "aufgab"),
    ("häuser", "haus"),
    ("laufen", "lauf"),
    ("aufeinander", "aufeinand"),
    ("aufeinanderfolgende", "aufeinanderfolg"),
    ("bedürfnissen", "bedurfnis"),  # step-1 "niss" undoubling
    ("allgemeinen", "allgemein"),
    ("verschiedenen", "verschied"),  # step 1 + step 2
    ("schönheit", "schonheit"),  # heit NOT in R2 -> kept
    ("unglaublich", "unglaub"),  # lich in R2
    ("bauern", "bau"),  # u between vowels acts as consonant
    ("arbeiten", "arbeit"),
    ("möglichkeiten", "moglich"),  # en -> keit -> (lich kept: not R2)
    ("wissenschaftlich", "wissenschaft"),
    ("freundlichkeit", "freundlich"),
    ("straße", "strass"),  # ß -> ss, then e-removal? no: "strasse"->"strass"
]


@pytest.mark.parametrize("word,expected", GERMAN_VECTORS)
def test_german_vectors(word, expected):
    from retriv_ray.text.german import stem as german

    assert german(word) == expected


def test_german_pipeline_end_to_end():
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cfg = SparseConfig(stemmer="german", stopwords="german")
    out = TextPreprocessor(cfg).tokens("Die Katzen laufen zwischen den Häusern.")
    # "zwischen" survives via the M12 stemmed-stopword quirk: the
    # stopword list is stemmed ("zwisch") but tokens filter PRE-stem
    assert out == ["katz", "lauf", "zwisch", "haus"]


SPANISH_VECTORS = [
    ("casas", "cas"),
    ("corriendo", "corr"),
    ("importante", "import"),
    ("comunicación", "comun"),  # ación in R2, then ic follow-up
    ("niñas", "niñ"),  # postlude strips acutes only; ñ kept
    ("trabajando", "trabaj"),
    ("librería", "libr"),  # -ería verb-suffix strip (spec trace)
    ("nacional", "nacional"),  # no matching suffix
    ("guerra", "guerr"),
    ("tomando", "tom"),
    ("lógica", "logic"),
    ("rapidamente", "rapid"),
    ("comiéndoselo", "com"),  # step-0 pronoun + deaccent + iendo
    ("fácilmente", "facil"),
    ("capacidad", "capac"),
    ("construyendo", "constru"),  # 2a y-suffix after u
]


@pytest.mark.parametrize("word,expected", SPANISH_VECTORS)
def test_spanish_vectors(word, expected):
    from retriv_ray.text.spanish import stem as spanish

    assert spanish(word) == expected


def test_spanish_pipeline_end_to_end():
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cfg = SparseConfig(stemmer="spanish", stopwords="spanish")
    out = TextPreprocessor(cfg).tokens("Los gatos corren entre las casas.")
    assert "gat" in out and "cas" in out


ITALIAN_VECTORS = [
    ("abbandonata", "abbandon"),  # -ata verb suffix in RV
    ("pronto", "pront"),  # step-3a residual vowel
    ("nazionale", "nazional"),
    ("felicità", "felic"),  # ità in R2; ic follow-up blocked (< R2)
    ("logicamente", "logic"),  # amente in R1
    ("organizzazione", "organizz"),  # azione in R2
    ("vogliamo", "vogl"),  # iamo verb suffix
    ("mangiandolo", "mang"),  # step-0 gerund pronoun, then ando
    ("mangiarvela", "mang"),  # step-0 infinitive pronoun -> +e, then are
    ("attacchi", "attacc"),  # step-3b ch -> c
    ("città", "citt"),  # final accented vowel in RV
    ("pagamento", "pag"),  # amento in RV
]


@pytest.mark.parametrize("word,expected", ITALIAN_VECTORS)
def test_italian_vectors(word, expected):
    from retriv_ray.text.italian import stem as italian

    assert italian(word) == expected


PORTUGUESE_VECTORS = [
    ("gostou", "gost"),  # -ou verb suffix
    ("bonita", "bonit"),  # step-4 residual vowel
    ("nacionalidade", "nacional"),  # idade in R2
    ("comunicação", "comunic"),  # nasal prelude + aça~o in R2
    ("sabedoria", "sabedor"),  # -ia verb suffix
    ("longe", "long"),  # step-5 final e
    ("segue", "seg"),  # step-5 e then gu contraction
    ("importantes", "import"),  # antes in R2
    ("falamos", "fal"),  # -amos verb suffix
]


@pytest.mark.parametrize("word,expected", PORTUGUESE_VECTORS)
def test_portuguese_vectors(word, expected):
    from retriv_ray.text.portuguese import stem as portuguese

    assert portuguese(word) == expected


FRENCH_VECTORS = [
    ("majestueux", "majestu"),  # eux in R2
    ("joueras", "jou"),  # prelude joUeras; -eras verb suffix (2b)
    ("continuellement", "continuel"),  # ement in RV + undouble ell
    ("adoration", "ador"),  # ation in R2
    ("ennuie", "ennui"),  # prelude I; step-4 final e; postlude
    ("barbarie", "barbar"),  # 2a -ie after non-vowel
    ("voyages", "voyag"),  # prelude Y; step-4 s then e
    ("abondamment", "abond"),  # amment -> ant, then 2b ant
    ("généralités", "général"),  # ités in R2
    ("nationale", "national"),
    ("mouvement", "mouv"),  # ement in RV
    ("conditionnel", "conditionnel"),  # no suffix; ends el not ell
]


@pytest.mark.parametrize("word,expected", FRENCH_VECTORS)
def test_french_vectors(word, expected):
    from retriv_ray.text.french import stem as french

    assert french(word) == expected


RUSSIAN_VECTORS = [
    ("книгами", "книг"),  # noun -ами
    ("красивый", "красив"),  # adjective -ый
    ("читавшая", "чита"),  # adjective -ая + participle вш after а
    ("прочитавшись", "прочита"),  # perfective gerund вшись after а
    ("важность", "важност"),  # noun ь; ост NOT in R2 here
    ("возможность", "возможн"),  # noun ь; derivational ост in R2
    ("делала", "дела"),  # verb -ла after а
    ("технологии", "технолог"),  # noun -ии (longest match over -и)
    ("красивейшая", "красив"),  # adjective -ая + step-4 superlative
    ("данный", "дан"),  # adjective -ый + step-4 нн undouble
    ("попробовать", "попробова"),  # verb -ть after а
]


@pytest.mark.parametrize("word,expected", RUSSIAN_VECTORS)
def test_russian_vectors(word, expected):
    from retriv_ray.text.russian import stem as russian

    assert russian(word) == expected


def test_new_stemmer_langs_pipeline_end_to_end():
    """All embedded-stopword languages now have working stemmers —
    SparseRetriever(stemmer=L, stopwords=L) no longer raises halfway
    for italian/french/portuguese/russian (round-2 verdict Missing #1)."""
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cases = {
        "italian": ("I gatti corrono tra le case vecchie.", "gatt"),
        "french": ("Les chats courent entre les maisons.", "chat"),
        "portuguese": ("Os gatos correm entre as casas.", "gat"),
        "russian": ("Кошки бегают между старыми домами.", "кошк"),
    }
    for lang, (sentence, expect_tok) in cases.items():
        cfg = SparseConfig(stemmer=lang, stopwords=lang)
        out = TextPreprocessor(cfg).tokens(sentence)
        assert expect_tok in out, (lang, out)


DANISH_VECTORS = [
    ("huset", "hus"),  # -et in R1
    ("husene", "hus"),  # -ene in R1
    ("kvindens", "kvind"),  # -ens in R1
    ("venskaberne", "venskab"),  # -erne
    ("bestemmelse", "bestem"),  # -e, then -els, then mm undouble
    ("billigst", "bil"),  # igst -> ig, then -lig, l undouble? no: lig strip
    ("hunds", "hund"),  # s after valid s-ending d
    ("kaos", "kaos"),  # s outside R1 (R1 floor at 3 + short word)
    ("underviser", "undervis"),  # -er
]


@pytest.mark.parametrize("word,expected", DANISH_VECTORS)
def test_danish_vectors(word, expected):
    from retriv_ray.text.danish import stem as danish

    assert danish(word) == expected


NORWEGIAN_VECTORS = [
    ("mulighetene", "mul"),  # -hetene then -ig
    ("huset", "hus"),  # -et
    ("operativt", "operativ"),  # step-2 vt
    ("lovlig", "lov"),  # step-3 lig
    ("folks", "folk"),  # s after k not preceded by vowel
    ("viks", "viks"),  # s after k preceded by vowel: kept
    ("bokens", "bok"),  # -ens
]


@pytest.mark.parametrize("word,expected", NORWEGIAN_VECTORS)
def test_norwegian_vectors(word, expected):
    from retriv_ray.text.norwegian import stem as norwegian

    assert norwegian(word) == expected


SWEDISH_VECTORS = [
    ("möjligheterna", "möj"),  # -heterna then -lig
    ("jakten", "jakt"),  # -en
    ("starkast", "stark"),  # -ast
    ("dagens", "dag"),  # -ens
    ("hemligt", "hem"),  # step-2 gt undouble-letter, then step-3 lig
    ("fullt", "fullt"),  # fullt outside R1: kept
    ("handfullt", "handfull"),  # fullt -> full in R1
    ("stärkas", "stärk"),  # -as
]


@pytest.mark.parametrize("word,expected", SWEDISH_VECTORS)
def test_swedish_vectors(word, expected):
    from retriv_ray.text.swedish import stem as swedish

    assert swedish(word) == expected


DUTCH_VECTORS = [
    ("bomen", "bom"),  # -en after valid en-ending
    ("boom", "bom"),  # step-4 vowel undouble
    ("gekken", "gek"),  # -en then kk undouble
    ("lichamelijk", "licham"),  # lijk in R2, then repeated step 2
    ("mogelijkheden", "mogelijk"),  # heden->heid, heid deleted in R2
    ("koeien", "koei"),  # i-between-vowels marked consonant, -en
    ("volks", "volk"),  # s after valid s-ending
    ("baas", "bas"),  # s outside R1 kept, but step-4 vowel undouble fires
    ("aanhoudig", "aanhoud"),  # ig in R2
    ("uitvoering", "uitvoer"),  # ing in R2
    ("dankbaar", "dankbar"),  # baar outside R2; step-4 undouble fires
]


@pytest.mark.parametrize("word,expected", DUTCH_VECTORS)
def test_dutch_vectors(word, expected):
    from retriv_ray.text.dutch import stem as dutch

    assert dutch(word) == expected


ROMANIAN_VECTORS = [
    ("copilului", "copil"),  # step-0 ului
    ("copiii", "copii"),  # i-between-vowels consonant mark; step-4 i
    ("frumoasă", "frumoas"),  # oasă outside R2 kept; step-4 ă
    ("lucrează", "lucr"),  # step-3(a) ează after consonant
    ("acționat", "acțion"),  # step-2 at in R2
    ("abilitate", "abil"),  # step-2 itate (step-1 gate outside R1)
    ("națiunile", "națiun"),  # step-0 ile->i, step-4 i
    ("informația", "inform"),  # step-0 ația->ați, step-3(b) ați
    ("informaţia", "inform"),  # same with legacy cedilla forms folded
    ("jurnalism", "jurnalist"),  # step-2 ism -> ist unification
]


@pytest.mark.parametrize("word,expected", ROMANIAN_VECTORS)
def test_romanian_vectors(word, expected):
    from retriv_ray.text.romanian import stem as romanian

    assert romanian(word) == expected


FINNISH_VECTORS = [
    ("taloissa", "talo"),  # -ssa, then plural -i
    ("talon", "talo"),  # genitive -n
    ("taloko", "talo"),  # question particle -ko after vowel
    ("talossaan", "talo"),  # possessive -an after ssa, then -ssa
    ("taloihin", "talo"),  # illative hin after i, then plural -i
    ("huoneeseen", "huone"),  # seen after long vowel, LV tidy
    ("mielessäni", "miele"),  # possessive -ni, case -ssä (tidy pair outside R1)
    ("kaupungeissa", "kaupung"),  # -ssa, -i, tidy consonant+e
    ("varsinaisesti", "varsinais"),  # -sti in R2, tidy consonant+e
    ("onnellisimmat", "onnellis"),  # step-5 t, then imma in R2
    ("nopeasti", "nopeast"),  # sti outside R2 kept; tidy consonant+i
    ("suurempi", "suuremp"),  # mpi outside R2 kept; tidy consonant+i
]


@pytest.mark.parametrize("word,expected", FINNISH_VECTORS)
def test_finnish_vectors(word, expected):
    from retriv_ray.text.finnish import stem as finnish

    assert finnish(word) == expected


HUNGARIAN_VECTORS = [
    ("házakban", "ház"),  # -ban case, -ak plural
    ("házakkal", "ház"),  # instrumental -al with kk undouble, -ak plural
    ("házban", "ház"),  # -ban
    ("házát", "ház"),  # -t case + á->a v_ending, owner -a
    ("házaim", "ház"),  # owner -m, plural-owner -ai
    ("babáknak", "baba"),  # -nak case, plural ák -> a
    ("kertben", "kert"),  # -ben
    # instrumental with undouble; then plural: 'ák' straddles the R1
    # boundary so (setlimit semantics) the shorter in-R1 'k' wins
    ("fákkal", "fá"),
    # ADVICE r3 case: 'onként' straddles R1, in-R1 'ként' strips
    ("onként", "on"),
    ("asztal", "asztal"),  # sz digraph pushes R1; nothing strips
]


@pytest.mark.parametrize("word,expected", HUNGARIAN_VECTORS)
def test_hungarian_vectors(word, expected):
    from retriv_ray.text.hungarian import stem as hungarian

    assert hungarian(word) == expected


CISTEM_VECTORS = [
    ("speichern", "speich"),  # ei protected, -n -er stripped
    ("geschickt", "schick"),  # ge- prefix, sch protected, -t
    ("kommen", "komm"),  # mm protected through -en stripping
    ("keine", "kein"),  # ei protected, -e
    ("häufig", "haufig"),  # umlaut fold, no suffix match
    ("Adler", "adler"),  # uppercase noun: len==5 so -er kept
    ("straße", "strass"),  # ß -> ss, -e stripped
]


@pytest.mark.parametrize("word,expected", CISTEM_VECTORS)
def test_cistem_vectors(word, expected):
    from retriv_ray.text.cistem import stem as cistem

    assert cistem(word) == expected


def test_new_stopword_languages():
    checks = {
        "danish": ["og", "ikke", "det", "han"],
        "norwegian": ["og", "ikke", "det", "han"],
        "swedish": ["och", "inte", "det", "han"],
        "dutch": ["de", "niet", "het", "een"],
        "finnish": ["ja", "ei", "on", "että"],
        "hungarian": ["és", "nem", "az", "hogy"],
        "romanian": ["și", "nu", "este", "care"],
    }
    for lang, words in checks.items():
        sw = get_stopwords(lang)
        assert len(sw) > 80, lang
        assert len(set(sw)) == len(sw), f"{lang} has duplicates"
        for w in words:
            assert w in sw, (lang, w)


def test_round3_stemmer_langs_pipeline_end_to_end():
    """Round-3 additions: every language that ships BOTH a stemmer and
    a stopword list runs the full chain without raising (round-2
    verdict Missing #1/#2 follow-through)."""
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cases = {
        "danish": ("Husene ligger ved vandet i byen.", "hus"),
        "norwegian": ("Mulighetene finnes i husene der.", "mul"),
        "swedish": ("Jakten på möjligheterna fortsätter idag.", "jakt"),
        "dutch": ("De bomen staan bij het oude huis.", "bom"),
        "finnish": ("Taloissa asutaan kaupungeissa nykyään.", "talo"),
        "hungarian": ("A házakban laknak az emberek.", "ház"),
        "romanian": ("Copilului îi plac casele vechi.", "copil"),
    }
    for lang, (sentence, expect_tok) in cases.items():
        cfg = SparseConfig(stemmer=lang, stopwords=lang)
        out = TextPreprocessor(cfg).tokens(sentence)
        assert expect_tok in out, (lang, out)


def test_stemmer_registry_round3_count():
    """M9 coverage: 20 named stemmers resolve (reference names 32;
    the rest raise with a clear message)."""
    names = [
        "english", "porter", "lancaster", "german", "spanish",
        "italian", "french", "portuguese", "russian", "danish",
        "norwegian", "swedish", "dutch", "romanian", "finnish",
        "hungarian", "cistem", "turkish", "indonesian", "hindi",
    ]
    for n in names:
        assert callable(get_stemmer(n)), n


TURKISH_VECTORS = [
    ("evler", "ev"),  # plural
    ("evleri", "ev"),  # plural + possessive/acc
    ("kitabı", "kitap"),  # accusative + final devoicing b->p
    ("kitaplardan", "kitap"),  # plural + ablative
    ("arabası", "araba"),  # 3sg possessive with s buffer
    ("arabasındakilerden", "araba"),  # full chain: DAn, lAr, ki+ndA, sU
    ("kapıyı", "kapı"),  # accusative y buffer (not bare-ı overstrip)
    ("doktorsunuz", "doktor"),  # person ending -sUnUz (not -nUz)
    ("geldiniz", "gel"),  # -nUz then -yDU chain
    ("evlerdir", "ev"),  # -DUr then -lAr
    ("hastaydı", "has"),  # -yDU after vowel, then -DA (aggressive, documented)
    ("kredi", "kredi"),  # stripped to kred, d-final vowel append restores
    ("istanbul'da", "istanbul"),  # apostrophe suffix
    ("anne", "anne"),  # harmony blocks -nA
    ("su", "su"),  # single-syllable floor
    ("eski", "esk"),  # bare -U strips (aggressive, documented)
    ("türki", "türki"),  # ki without locative/genitive host survives
]


@pytest.mark.parametrize("word,expected", TURKISH_VECTORS)
def test_turkish_vectors(word, expected):
    from retriv_ray.text.turkish import stem as turkish

    assert turkish(word) == expected


INDONESIAN_VECTORS = [
    ("menulis", "tulis"),  # men+V -> t recoding
    ("menyapu", "sapu"),  # meny+V -> s
    ("memilih", "pilih"),  # mem+V -> p
    ("membeli", "beli"),  # mem+C delete
    ("pembelian", "beli"),  # pem + -an circumfix
    ("kebijaksanaan", "bijaksana"),  # ke-an circumfix
    ("diberikan", "beri"),  # di + -kan
    ("berlari", "lari"),  # ber-, -i blocked after be-
    ("belajar", "ajar"),  # bel before ajar
    ("mempelajari", "ajar"),  # mem + pel-ajar + -i
    ("makanan", "makan"),  # bare -an
    ("bukunya", "buku"),  # possessive -nya
    ("rumahkah", "rumah"),  # particle -kah
    ("menang", "menang"),  # two-syllable floor protects the root
]


@pytest.mark.parametrize("word,expected", INDONESIAN_VECTORS)
def test_indonesian_vectors(word, expected):
    from retriv_ray.text.indonesian import stem as indonesian

    assert indonesian(word) == expected


HINDI_VECTORS = [
    ("लड़के", "लड़क"),  # oblique -e
    ("लड़कियाँ", "लड़क"),  # plural -iyan (4-char suffix)
    ("खाएंगी", "ख"),  # future 3pl fem (4-char)
    ("बोलने", "बोल"),  # infinitive oblique -ne
    ("किताबें", "किताब"),  # plural -en
    ("समझाकर", "समझ"),  # conjunctive -akar
    ("घर", "घर"),  # no suffix
]


@pytest.mark.parametrize("word,expected", HINDI_VECTORS)
def test_hindi_vectors(word, expected):
    from retriv_ray.text.hindi import stem as hindi

    assert hindi(word) == expected


def test_turkish_indonesian_stopwords():
    for lang, n_expect, words in (
        ("turkish", 53, ["ve", "bu", "için", "mı", "değil"]),
        ("indonesian", None, ["yang", "dan", "tidak", "adalah"]),
    ):
        sw = get_stopwords(lang)
        if n_expect is not None:
            assert len(sw) == n_expect, lang
        assert len(set(sw)) == len(sw), lang
        for w in words:
            if w == "değil":  # not in nltk's turkish list
                assert w not in sw
            else:
                assert w in sw, (lang, w)


def test_turkish_indonesian_hindi_pipelines_end_to_end():
    from retriv_ray.config import SparseConfig
    from retriv_ray.text.pipeline import TextPreprocessor

    cases = {
        ("turkish", "turkish"): ("Evlerde kitapları okuyoruz ve", "kitap"),
        ("indonesian", "indonesian"): (
            "Mereka membeli makanan yang enak",
            "beli",
        ),
        ("hindi", None): ("लड़के बोलने", "लड़क"),
    }
    for (stemmer, stop), (sentence, expect_tok) in cases.items():
        cfg = SparseConfig(stemmer=stemmer, stopwords=stop)
        out = TextPreprocessor(cfg).tokens(sentence)
        assert expect_tok in out, (stemmer, out)


def test_stopword_registry_all_29_reference_languages():
    """M10 closed: every language the reference's nltk registry names
    (reference stopwords.py:5-34) resolves to a non-empty embedded
    list; duplicates removed; all lowercase entries."""
    reference_langs = [
        "arabic", "azerbaijani", "basque", "bengali", "catalan",
        "chinese", "danish", "dutch", "english", "finnish", "french",
        "german", "greek", "hebrew", "hinglish", "hungarian",
        "indonesian", "italian", "kazakh", "nepali", "norwegian",
        "portuguese", "romanian", "russian", "slovene", "spanish",
        "swedish", "tajik", "turkish",
    ]
    assert len(reference_langs) == 29
    for lang in reference_langs:
        sw = get_stopwords(lang)
        assert len(sw) > 40, (lang, len(sw))
        assert len(set(sw)) == len(sw), lang
    # spot checks: high-frequency function words per language
    assert "في" in get_stopwords("arabic")
    assert "eta" in get_stopwords("basque")
    assert "এবং" in get_stopwords("bengali")
    assert "amb" in get_stopwords("catalan")
    assert "的" in get_stopwords("chinese")
    assert "και" in get_stopwords("greek")
    assert "של" in get_stopwords("hebrew")
    assert "және" in get_stopwords("kazakh")
    assert "पनि" in get_stopwords("nepali")
    assert "ampak" in get_stopwords("slovene")
    assert "дар" in get_stopwords("tajik")
    assert "üçün" in get_stopwords("azerbaijani")
    # hinglish composes english + romanized hindi
    hing = get_stopwords("hinglish")
    assert "the" in hing and "nahi" in hing and "kyunki" in hing


CATALAN_VECTORS = [
    ("cases", "cas"),        # plural -es
    ("casa", "cas"),         # final -a residual
    ("nacionalitat", "nacional"),  # -itat
    ("cantava", "cant"),     # imperfect
    ("cantarien", "cant"),   # conditional
    ("parlant", "parl"),     # gerund
    ("biologia", "biolog"),  # logia -> log
    ("institució", "institu"),  # ució -> u
    ("portar-los", "port"),  # hyphen clitic + infinitive
    ("dona'm", "don"),       # apostrophe clitic
    ("catalanisme", "catalan"),  # -isme (bare "me" must NOT strip)
    ("treballadores", "treball"),  # -adores
    ("feliçment", "felic"),  # -ment + ç cleaning
]


@pytest.mark.parametrize("word,expected", CATALAN_VECTORS)
def test_catalan_vectors(word, expected):
    from retriv_ray.text.catalan import stem as catalan

    assert catalan(word) == expected


BASQUE_VECTORS = [
    ("etxea", "etxe"),       # absolutive sg article
    ("etxeak", "etxe"),      # absolutive pl
    ("etxetik", "etxe"),     # ablative
    ("etxearen", "etxe"),    # genitive
    ("mendietan", "mendi"),  # inessive pl
    ("lagunarekin", "lagun"),  # comitative
    ("ikasten", "ikas"),     # imperfective verb
    ("ikastea", "ikas"),     # nominalization
    ("handiagoa", "handi"),  # comparative
    ("egin", "egin"),        # -n-final root survives (no bare -n strip)
    ("liburuak", "liburu"),
]


@pytest.mark.parametrize("word,expected", BASQUE_VECTORS)
def test_basque_vectors(word, expected):
    from retriv_ray.text.basque import stem as basque

    assert basque(word) == expected


IRISH_VECTORS = [
    ("n-athair", "athair"),  # prothetic n-
    ("t-uisce", "uisce"),    # prothetic t-
    ("bhfear", "fear"),      # eclipsis bhf -> f
    ("gcarr", "carr"),       # eclipsis gc -> c
    ("scoileanna", "scoil"),  # plural -eanna
    ("ceolann", "ceol"),     # present -ann
    ("ólfaidh", "ól"),       # future -faidh
    ("cuirimid", "cuir"),    # 1pl -imid
    ("déanamh", "déan"),     # verbal noun -amh
    ("teangacha", "teang"),  # plural -acha
]


@pytest.mark.parametrize("word,expected", IRISH_VECTORS)
def test_irish_vectors(word, expected):
    from retriv_ray.text.irish import stem as irish

    assert irish(word) == expected


LITHUANIAN_VECTORS = [
    ("namas", "nam"),      # nom sg
    ("namuose", "nam"),    # loc pl
    ("knygomis", "knyg"),  # instr pl
    ("dirbti", "dirb"),    # infinitive
    ("dirbčiau", "dirb"),  # conditional
    ("gražiausias", "graž"),  # superlative
    ("medžio", "med"),     # gen sg with dž -> d recoding
    ("medis", "med"),      # nom sg
]


@pytest.mark.parametrize("word,expected", LITHUANIAN_VECTORS)
def test_lithuanian_vectors(word, expected):
    from retriv_ray.text.lithuanian import stem as lithuanian

    assert lithuanian(word) == expected


NEPALI_VECTORS = [
    ("घरहरूमा", "घर"),    # plural + locative stack
    ("घरको", "घर"),       # genitive
    ("किताबलाई", "किताब"),  # dative
    ("गरेको", "गर"),      # participle एको (genitive guard)
    ("गर्छन्", "गर्"),     # present 3pl
    ("नेपालमा", "नेपाल"),  # locative
]


@pytest.mark.parametrize("word,expected", NEPALI_VECTORS)
def test_nepali_vectors(word, expected):
    from retriv_ray.text.nepali import stem as nepali

    assert nepali(word) == expected


TAMIL_VECTORS = [
    ("மரங்கள்", "மரம்"),     # plural with ம் sandhi undo
    ("மரத்தை", "மரம்"),      # accusative + oblique fixup
    ("மரமும்", "மரம்"),      # conjunctive உம்
    ("புத்தகத்தில்", "புத்தகம்"),  # locative + oblique fixup
    ("வீட்டில்", "வீடு"),     # locative + ட்ட் fixup
    ("செய்கிறான்", "செய்"),   # present 3sg masc
    ("செய்தான்", "செய்"),     # past 3sg masc (no double virama)
    ("செய்வான்", "செய்"),     # future 3sg masc
]


@pytest.mark.parametrize("word,expected", TAMIL_VECTORS)
def test_tamil_vectors(word, expected):
    from retriv_ray.text.tamil import stem as tamil

    assert tamil(word) == expected


def test_stemmer_registry_round4_count():
    """M9 coverage: 26 named stemmers resolve."""
    for n in ["catalan", "basque", "irish", "lithuanian", "nepali", "tamil"]:
        assert callable(get_stemmer(n)), n


GREEK_VECTORS = [
    ("άνθρωπος", "ανθρωπ"),   # nom sg, deaccent + ος
    ("ανθρώπων", "ανθρωπ"),   # gen pl
    ("καλύτερος", "καλ"),     # comparative
    ("γράφουμε", "γραφ"),     # verb 1pl
    ("μουσική", "μουσ"),      # ΙΚ rule (no double-strip of ουσ)
    ("παιδιά", "παιδ"),       # plural (must NOT match ΙΔΙΑ rule)
    ("οργανισμός", "οργαν"),  # ΙΣΜΟΣ
    ("ελληνικά", "ελλην"),    # ΙΚΑ
    ("θάλασσες", "θαλασσ"),   # plural -ες
]


@pytest.mark.parametrize("word,expected", GREEK_VECTORS)
def test_greek_vectors(word, expected):
    from retriv_ray.text.greek import stem as greek

    assert greek(word) == expected


ARABIC_VECTORS = [
    ("الكتاب", "كتاب"),     # definite article
    ("والكتاب", "كتاب"),    # conjunction + article
    ("بالكتاب", "كتاب"),    # preposition + article
    ("كتابها", "كتاب"),     # possessive
    ("مسلمون", "مسلم"),     # sound masc plural
    ("المعلمات", "معلم"),   # article + fem plural
    ("يكتبون", "كتب"),      # imperfect circumfix
    ("سيكتب", "كتب"),       # future prefix
    ("مدرسة", "مدرس"),      # ta marbuta
]


@pytest.mark.parametrize("word,expected", ARABIC_VECTORS)
def test_arabic_vectors(word, expected):
    from retriv_ray.text.arabic import stem as arabic

    assert arabic(word) == expected


ISRI_VECTORS = [
    ("الكتاب", "كتب"),      # article + root extraction
    ("مكتبة", "كتب"),       # م-pattern + ta marbuta
    ("يستخدمون", "خدم"),    # استفعل-family root
    ("استخدام", "خدم"),     # افتعال/استفعال pattern
    ("مفاتيح", "فتح"),      # مفاعيل broken plural
    ("انفعال", "فعل"),      # انفعال pattern
    ("مكتوب", "كتب"),       # مفعول pattern
]


@pytest.mark.parametrize("word,expected", ISRI_VECTORS)
def test_isri_vectors(word, expected):
    from retriv_ray.text.isri import stem as isri

    assert isri(word) == expected


ARLSTEM_VECTORS = [
    ("الكتاب", "كتب"),      # article removal + broken plural فعال
    ("مسلمون", "مسلم"),     # sound plural (light stem, not root)
    ("معلمات", "معلم"),     # fem plural
    ("أقلام", "قلم"),       # افعال broken plural
    ("يكتبون", "كتب"),      # imperfect circumfix
    ("سيذهبون", "ذهب"),     # future circumfix
    ("مدرسة", "مدرس"),      # ta marbuta
    ("قبائل", "قبيل"),      # فعائل broken plural
]


@pytest.mark.parametrize("word,expected", ARLSTEM_VECTORS)
def test_arlstem_vectors(word, expected):
    from retriv_ray.text.arlstem import stem as arlstem

    assert arlstem(word) == expected


ARLSTEM2_VECTORS = [
    ("والكتاب", "كتب"),     # v2 conjunction+article
    ("لنكتب", "كتب"),       # v2 ل-imperfect
    ("ليكتبوا", "كتب"),     # v2 ل-imperfect + وا
    ("المعلمات", "معلم"),   # fem plural before ta marbuta
    ("سيذهبون", "ذهب"),     # future circumfix
]


@pytest.mark.parametrize("word,expected", ARLSTEM2_VECTORS)
def test_arlstem2_vectors(word, expected):
    from retriv_ray.text.arlstem2 import stem as arlstem2

    assert arlstem2(word) == expected


def test_stemmer_registry_all_32():
    """M9 closed: every name the reference's registry resolves
    (reference stemmer.py:10-43 names 32) resolves here too."""
    resolvable = [
        "english", "porter", "lancaster", "cistem", "krovetz",
        "arabic", "arlstem", "arlstem2", "isri", "basque",
        "catalan", "danish", "dutch", "finnish", "french",
        "german", "greek", "hindi", "hungarian", "indonesian",
        "irish", "italian", "lithuanian", "nepali", "norwegian",
        "portuguese", "romanian", "russian", "spanish", "swedish",
        "tamil", "turkish",
    ]
    assert len(resolvable) == 32
    for n in resolvable:
        fn = get_stemmer(n)
        assert callable(fn), n
        assert isinstance(fn("test"), str), n
    with pytest.raises(NotImplementedError):
        get_stemmer("nosuchstemmer")


KROVETZ_VECTORS = [
    ("cities", "city"),     # ies -> y
    ("churches", "church"),  # ches -> ch
    ("dogs", "dog"),        # plural s
    ("hopped", "hop"),      # -ed with undoubling
    ("hoped", "hope"),      # -ed with e-restore (CVC)
    ("running", "run"),     # -ing with undoubling
    ("hoping", "hope"),     # -ing with e-restore
    ("dying", "die"),       # ying -> ie
    ("studied", "study"),   # ied -> y
    ("children", "child"),  # irregular plural
    ("knives", "knife"),    # -ves irregular
    ("series", "series"),   # protected
    ("during", "during"),   # protected (not a gerund)
    ("feeling", "feeling"),  # protected lexicalized gerund
    ("was", "was"),         # inflectional stemmer leaves be-forms
    ("pressed", "press"),   # ss not undoubled
    ("rolling", "roll"),    # ll not undoubled
]


@pytest.mark.parametrize("word,expected", KROVETZ_VECTORS)
def test_krovetz_vectors(word, expected):
    from retriv_ray.text.krovetz import stem as krovetz

    assert krovetz(word) == expected


# -- round-5: region-discipline property tests (Hungarian-class bug
#    guard for the reconstructed Snowball-family modules) -------------


def _r1_of(mod, word):
    """Adapter over each module's private region helper."""
    if hasattr(mod, "_regions"):
        return mod._regions(word)[0]
    if hasattr(mod, "_r1"):
        return mod._r1(word)
    if hasattr(mod, "_rv"):
        return mod._rv(word)
    raise AttributeError(mod.__name__)


@pytest.mark.parametrize(
    "lang,words",
    [
        # consonant-only / single-VC-cluster words: R1 (or RV) spans
        # to the word end, so every region-conditioned suffix rule is
        # out of bounds and the word must survive verbatim even though
        # it ENDS in an aggressive suffix from the language's table
        ("catalan", ["ments", "ble", "cions"]),
        ("irish", ["acht", "arcachta"[:4]]),
        ("lithuanian", ["mas", "ts"]),
        ("hungarian", ["ban", "nak", "stul"]),
    ],
)
def test_empty_r1_blocks_suffix_removal(lang, words):
    import importlib

    mod = importlib.import_module(f"retriv_ray.text.{lang}")
    for w in words:
        r1 = _r1_of(mod, w)
        if r1 < len(w):
            continue  # region non-empty for this word: not this test
        assert mod.stem(w) == w, (lang, w)


def test_region_helpers_follow_snowball_definition():
    """R1 = after the first vowel-consonant pair; spot-check each
    reconstructed module's helper on a canonical shape."""
    import importlib

    # 'beautiful': first V run ends at 'b'? per-language vowel sets
    # differ, so use a plain CV word: 'batona' -> R1 after 'bat' = 3
    for lang in ("catalan", "irish"):
        mod = importlib.import_module(f"retriv_ray.text.{lang}")
        assert mod._regions("batona")[0] == 3, lang


def test_basque_rv_discipline():
    """Basque deletions are RV-conditioned: a word whose RV is empty
    (consonant cluster head) keeps its ending."""
    from retriv_ray.text import basque

    # len >= 4 so the stemmer engages; rv >= len blocks deletion
    w = "brtzen"
    if basque._rv(w) >= len(w):
        assert basque.stem(w) == w


def test_hungarian_straddling_suffix_regression():
    """The round-4 bug class: matches crossing the R1 boundary must
    not fire. Empty-R1 words (no vowel: _r1 == len) ending in real
    case suffixes survive verbatim; and _longest_in itself must
    prefer a shorter wholly-in-R1 suffix over a longer straddler."""
    from retriv_ray.text import hungarian

    for w in ("bn", "krt", "stl"):
        assert hungarian._r1(w) >= len(w)
        assert hungarian.stem(w) == w
    # direct helper check: 'xon' with r1=2 — 'on' (start 1 < 2)
    # straddles, 'n' (start 2 >= 2) is wholly in R1 and must win
    best = hungarian._longest_in("xon", 2, (("on", ""), ("n", "")))
    assert best == ("n", "")
