"""Analyzer goldens -- freeze tokenizer/stemmer behavior (FIXTURES.md §4
tokens_golden). The engine and oracle share this module, so these goldens
define the normative tokenization."""

from miru_spark.analyzer import (
    ENGLISH_STOPWORDS,
    analyze,
    porter2_stem,
    standard_tokenize,
)

GOLDEN_TOKENS = {
    "": [],
    "   ": [],
    "Hello, World!": ["hello", "world"],
    "The quick-brown FOX jumps.": ["the", "quick", "brown", "fox", "jumps"],
    "foo_bar baz2000 3.14": ["foo_bar", "baz2000", "3", "14"],
    "état Café ÜBER": ["état", "café", "über"],
    "a-b--c": ["a", "b", "c"],
    "w000042* AND (x)": ["w000042", "and", "x"],
    "тест кириллица": ["тест", "кириллица"],
}

GOLDEN_STEMS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "tie",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",  # Porter2 step-5 e-deletion (differs from Porter1)
    "plastered": "plaster",
    "motoring": "motor",
    "hopping": "hop",
    "falling": "fall",
    "hissing": "hiss",
    "filing": "file",
    "dying": "die",
    "lying": "lie",
    "news": "news",
    "running": "run",
    "generate": "generat",
    "generously": "generous",
    "nationality": "nation",
    "rationalization": "ration",  # ization->ize, alize->al, step-4 al-deletion
    "sensational": "sensat",
    "happy": "happi",
    "skies": "sky",
    "w000123": "w000123",
    "a": "a",
    "be": "be",
}


def test_standard_tokenize_goldens():
    for text, want in GOLDEN_TOKENS.items():
        assert standard_tokenize(text) == want, text


def test_porter2_goldens():
    for word, want in GOLDEN_STEMS.items():
        assert porter2_stem(word) == want, word


def test_en_analyzer_stops_and_stems():
    got = analyze("The foxes were running in the gardens", "en")
    assert "the" not in got and "in" not in got
    assert got == ["fox", "were", "run", "garden"]


def test_locale_fallback_is_standard():
    text = "The Running Foxes"
    for loc in ("und", None, "zh"):
        assert analyze(text, loc) == ["the", "running", "foxes"]


# -- German analyzer goldens (normalization FSM + Savoy light stemmer) ----

GOLDEN_DE = {
    # umlaut/eszett folding
    "häuser": "haus",       # ä->a, -er removal (len>4)
    "größe": "gross",       # ö->o, ß->ss, final -e
    "quelle": "quell",      # 'ue' kept after q, final -e
    "baer": "bar",          # digraph ae -> a
    "kindes": "kind",       # genitive -es
    "schönste": "schonst",  # superlative: -e then (len>5) -est stays? no: step1 -e, step2 len>5 'est'->cut
    "lernen": "lern",       # -en
    "w000123": "w000123",   # synthetic terms untouched
}


def test_german_analyzer_goldens():
    from miru_spark.analyzer import german_light_stem

    for word, want in GOLDEN_DE.items():
        assert german_light_stem(word) == want, word


def test_german_analyzer_stops():
    got = analyze("der Hund und die Häuser", "de")
    assert got == ["hund", "haus"]
    assert analyze("die hunde", "de_AT") == analyze("die hunde", "de")


# -- French analyzer goldens (Savoy minimal stemmer + elided articles) ----

GOLDEN_FR = {
    "chevaux": "cheval",    # -aux -> -al
    "manteaux": "manteau",  # -eaux keeps the vowel, drops x
    "maisons": "maison",    # plural -s
    "belles": "bel",        # -s, -e, undouble ll
    "parler": "parl",       # infinitive -er
    "petit": "petit",       # < 6 chars: untouched
    "w000123": "w000123",
}


def test_french_analyzer_goldens():
    from miru_spark.analyzer import french_minimal_stem

    for word, want in GOLDEN_FR.items():
        assert french_minimal_stem(word) == want, word


def test_french_analyzer_stops_and_elision():
    # tokenizer splits l'église -> [l, église]; the elided article token
    # is folded into the stop set (ElisionFilter analog)
    got = analyze("l'église dans les chevaux", "fr")
    assert got == ["églis", "cheval"]


def test_locale_suffix_stripping():
    # unmapped compounds strip to their base (TermAnalyzers.java:117-131);
    # en_ie itself is an EXPLICIT entry (IrishAnalyzer over the English
    # stop set -- Irish mutation stemming, not Porter2), so use en_US/en_GB
    assert analyze("the foxes", "en_US") == analyze("the foxes", "en")
    assert analyze("die häuser", "de_AT") == analyze("die häuser", "de")


def test_stopword_list_is_classic_33():
    assert len(ENGLISH_STOPWORDS) == 33


# -- Spanish analyzer goldens (Savoy CLEF-2001 light stemmer) --------------

GOLDEN_ES = {
    "casas": "cas",        # plural -as
    "casa": "casa",        # < 5 chars: untouched (published guard)
    "voces": "voz",        # -ces -> -z
    "meses": "mes",        # -eses -> -es
    "grandes": "grand",    # -es
    "rápido": "rapid",     # accent fold + final -o
    "librerías": "libreri",
    "w000123": "w000123",
}


def test_spanish_analyzer_goldens():
    from miru_spark.analyzer import spanish_light_stem

    for word, want in GOLDEN_ES.items():
        assert spanish_light_stem(word) == want, word


def test_spanish_analyzer_stops():
    got = analyze("las casas grandes y los niños", "es")
    assert got == ["cas", "grand", "niñ"]
    assert analyze("las casas", "es_MX") == analyze("las casas", "es")


# -- Portuguese analyzer goldens (Savoy SAC-2006 light stemmer) ------------

GOLDEN_PT = {
    "nações": "naca",      # -ões -> -ão, final vowel, fold ç/ã
    "nação": "naca",       # conflates with its plural
    "livros": "livr",
    "livro": "livr",
    "meninas": "menin",    # feminine -a -> -o conflation
    "menino": "menin",
    "finalmente": "final",  # adverb -mente
    "papéis": "papel",     # -éis -> -el
    "animais": "animal",   # -ais -> -al
    "bons": "bom",         # -ns -> -m
    "w000123": "w000123",
}


def test_portuguese_analyzer_goldens():
    from miru_spark.analyzer import portuguese_light_stem

    for word, want in GOLDEN_PT.items():
        assert portuguese_light_stem(word) == want, word


def test_portuguese_analyzer_stops():
    got = analyze("os livros de uma menina", "pt")
    assert got == ["livr", "menin"]
    # pt_BR (BrazilianAnalyzer in the reference) resolves to pt --
    # documented scope reduction via suffix stripping
    assert analyze("os livros", "pt_BR") == analyze("os livros", "pt")


# -- Italian analyzer goldens (Savoy light stemmer) ------------------------

GOLDEN_IT = {
    "amiche": "amic",      # -he digraph: drop 2
    "banche": "banc",
    "banchi": "banc",
    "grande": "grand",
    "grandi": "grand",
    "amico": "amico",      # < 6 chars: untouched (published guard)
    "città": "città",      # < 6 chars: untouched, accents kept
    "w000123": "w000123",
}


def test_italian_analyzer_goldens():
    from miru_spark.analyzer import italian_light_stem

    for word, want in GOLDEN_IT.items():
        assert italian_light_stem(word) == want, word


def test_italian_analyzer_stops():
    got = analyze("gli amici e le amiche della banca", "it")
    assert got == ["amici", "amic", "banca"]


# -- Stemmed-locale spot checks through the analyze() pipeline -------------

def test_stopword_only_locales():
    # nl stems since r4 (full Snowball Dutch)
    assert analyze("de huizen en de katten", "nl") == ["huiz", "kat"]
    # ru/sv/da stem since r4 (Snowball)
    assert analyze("и в не что он на я банки", "ru") == ["банк"]
    assert analyze("och det att banker", "sv") == ["bank"]
    assert analyze("og i jeg bankerne", "da") == ["bank"]
    assert analyze("bankerna", "sv") == ["bank"]


def test_use_stopwords_flag():
    # non-stopword analyzer map analog (TermAnalyzers.java:84-115): same
    # stemmer, empty stop set
    assert analyze("the running dogs", "en", use_stopwords=False) == [
        "the", "run", "dog",
    ]
    assert analyze("las casas", "es", use_stopwords=False) == ["las", "cas"]


# -- Completed 31-locale map (TermAnalyzers.java:43-75; the new 21 are
#    stopword-only, golden-frozen here) ------------------------------------

GOLDEN_NEW_LOCALES = {
    # locale: (input, expected tokens)
    "nb": ("og jeg har en ny bok", ["ny", "bok"]),
    "nn": ("eg har ikkje ei bok", ["ei", "bok"]),
    "sv": ("och det att bankerna", ["bank"]),
    "da": ("og i jeg kvinderne", ["kvind"]),
    "fi": ("olen lukenut tämä kirja ja lehti", ["lukenu", "kirj", "lehti"]),
    "tr": ("ve bir kitap okudum ama", ["kitap", "okud"]),
    "ro": ("și o carte în casa", ["cart", "cas"]),
    "id": ("yang buku ini dan itu", ["buku"]),
    "cs": ("a je to kniha na stole", ["knih", "stol"]),
    "ca": ("el llibre i la taula", ["llibr", "taul"]),
    "gl": ("o libro e a mesa", ["libr", "mes"]),
    "eu": ("liburua eta mahaia da", ["liburu", "mahai"]),
    "lv": ("un grāmata ir uz galda", ["grāmat", "gald"]),
    "bg": ("и книгата е на масата", ["книг", "маса"]),
    "gr": ("ο σκύλος και η γάτα", ["σκυλ", "γατ"]),
    "ar": ("هذا كتاب جديد من المكتبة", ["كتاب", "جديد", "مكتب"]),
    # PersianNormalizer folds keheh->kaf and farsi-yeh->yeh, so the
    # indexed terms are the Arabic presentation forms
    "fa": ("این کتاب جدید است و خوب", ["كتاب", "جديد", "خوب"]),
    # r5: full HindiNormalizer vowel folding -- independent long ii in
    # नई folds to short इ before the stop check (Lucene chain output)
    "hi": ("यह एक नई किताब है", ["नइ", "किताब"]),
    "hy": ("սա գիրք է եւ լավ", ["գիրք", "լավ"]),
    "ku": ("ئەم کتێب و باش", ["کتێب", "باش"]),
    "th": ("หนังสือ และ ดี", ["หนังสือ", "ดี"]),
    # en_ie: IrishAnalyzer over the ENGLISH stop set in the reference
    "en_ie": ("the new book", ["new", "book"]),
    # pt_br: BrazilianAnalyzer analog = pt stop set + pt light stemmer
    "pt_br": ("as casas bonitas", ["casa", "bonit"]),
}


def test_new_locales_golden():
    for loc, (text, want) in GOLDEN_NEW_LOCALES.items():
        assert analyze(text, loc) == want, loc
    assert analyze("kitaplar", "tr") == ["kitap"]  # tr stems since r4
    assert analyze("βιβλία", "gr") == ["βιβλι"]    # gr stems since r4


def test_reference_locale_map_complete():
    # the reference wires exactly these 31 locale codes
    # (TermAnalyzers.java:43-75)
    from miru_spark.analyzer import _LOCALE_ANALYZERS

    ref = {
        "ar", "bg", "ca", "cs", "en", "en_ie", "es", "eu", "da", "de",
        "fa", "fi", "fr", "gl", "gr", "hi", "hy", "id", "it", "ku", "lv",
        "nl", "nb", "nn", "pt", "pt_br", "ro", "ru", "sv", "th", "tr",
    }
    assert set(_LOCALE_ANALYZERS) == ref


def test_compound_locale_resolution_matches_reference():
    # explicit compound entries win before suffix stripping
    # (findAnalyzer: get(code) first, then substring loop)
    assert analyze("the new book", "en_IE") == ["new", "book"]
    assert analyze("as casas", "pt_BR") == ["casa"]
    # unknown compound strips to its base
    assert analyze("ve bir kitap", "tr_CY") == ["kitap"]
    assert analyze("и книгата", "bg_BG") == ["книг"]
