"""Per-language lemma scoring fixture (VERDICT r4 item 3).

Two layers:

- ``REFERENCE_GOLDENS``: the reference's 28-language golden pairs
  (/root/reference/tests/python/unit/test_lemmatization.py:10-41),
  verbatim — scored per language (1 pair each).
- ``MODEL_LANG_FIXTURE``: for the seven languages the reference serves
  with *model-based* lemmatizers (de/en/es/fr/nb/pl/ru —
  language_support.py:72-95), a wider fixture of common REGULAR
  inflections (public morphology facts, chosen word-first rather than
  copied from the generator stem lists) so each language gets a
  pass-rate, not a single golden.

Scored by scripts/score_lemmas.py; per-language floors pinned in
tests/test_lemma_scoring.py.
"""

from __future__ import annotations

# (form, language, gold lemma) — reference test_lemmatization.py:10-41.
# Keyword-level goldens (multi-token) are space-joined token lemmas.
REFERENCE_GOLDENS = [
    ("worked", "en", "work"),
    ("trabajó", "es", "trabajar"),
    ("jobbet", "nb", "jobbet"),
    ("travaillé", "fr", "travailler"),
    ("hat funktioniert", "de", "haben funktionieren"),
    ("работал", "ru", "работать"),
    ("zadziałało", "pl", "zadziałać"),
    ("treballat", "ca", "treballar"),
    ("pracoval", "cs", "pracovat"),
    ("arbejdede", "da", "arbejde"),
    ("radio", "hr", "raditi"),
    ("dolgozott", "hu", "dolgozik"),
    ("bekerja", "id", "kerja"),
    ("lavorato", "it", "lavorare"),
    ("geschafft", "lb", "schaffen"),
    ("dirbo", "lt", "dirbti"),
    ("trabalhado", "pt", "trabalhar"),
    ("a lucrat", "ro", "avea lucra"),
    ("радио", "sr", "радити"),
    ("nagtrabaho", "tl", "nagtrabaho"),
    ("çalıştı", "tr", "çalış"),
    ("کام کیا", "ur", "کام کَیا"),
    ("কাজ করছে", "bn", "কাজ করছে"),
    ("δούλεψε", "el", "δούλεψε"),
    ("کار کرد", "fa", "کار کرد"),
    ("работел", "mk", "работел"),
    ("werkte", "nl", "werkte"),
    ("arbetade", "sv", "arbeta"),
]

# Common regular inflections per model language. Each pair is a public
# morphology fact; stems were picked from high-frequency vocabulary, not
# from lemmadata.py's generator lists, so the score measures real
# coverage of everyday web text.
MODEL_LANG_FIXTURE: dict[str, list[tuple[str, str]]] = {
    "en": [
        ("asked", "ask"), ("asking", "ask"), ("asks", "ask"),
        ("opened", "open"), ("opens", "open"),
        ("tried", "try"), ("tries", "try"),
        ("planned", "plan"), ("planning", "plan"),
        ("countries", "country"), ("churches", "church"),
        ("developers", "developer"), ("messages", "message"),
        ("decided", "decide"), ("deciding", "decide"),
        ("bigger", "big"),
    ],
    "es": [
        ("cantaron", "cantar"), ("cantando", "cantar"),
        ("compraba", "comprar"), ("compraron", "comprar"),
        ("estudian", "estudiar"), ("estudiado", "estudiar"),
        ("llegaron", "llegar"), ("llegamos", "llegar"),
        ("vendido", "vender"), ("vendieron", "vender"),
        ("aprendemos", "aprender"),
        ("recibió", "recibir"), ("recibido", "recibir"),
        ("subieron", "subir"), ("deciden", "decidir"),
        ("escribimos", "escribir"),
    ],
    "fr": [
        ("parlons", "parler"), ("parlaient", "parler"),
        ("donnée", "donner"), ("donnons", "donner"),
        ("mangeons", "manger"), ("mangé", "manger"),
        ("aimé", "aimer"), ("aiment", "aimer"),
        ("trouvé", "trouver"), ("trouvons", "trouver"),
        ("finissons", "finir"), ("finissent", "finir"),
        ("choisi", "choisir"), ("choisissons", "choisir"),
        ("demandé", "demander"), ("restée", "rester"),
    ],
    "de": [
        ("gespielt", "spielen"), ("spielte", "spielen"),
        ("gemacht", "machen"), ("machte", "machen"),
        ("gesagt", "sagen"), ("sagte", "sagen"),
        ("gefragt", "fragen"), ("fragte", "fragen"),
        ("gekauft", "kaufen"), ("kaufte", "kaufen"),
        ("gelernt", "lernen"), ("lernte", "lernen"),
        ("besucht", "besuchen"), ("erklärt", "erklären"),
        ("gearbeitet", "arbeiten"), ("arbeitete", "arbeiten"),
    ],
    "ru": [
        ("работала", "работать"), ("работали", "работать"),
        ("читал", "читать"), ("читала", "читать"),
        ("думал", "думать"), ("думали", "думать"),
        ("сделал", "сделать"), ("сделали", "сделать"),
        ("говорил", "говорить"), ("говорила", "говорить"),
        ("знал", "знать"), ("знали", "знать"),
        ("книги", "книга"), ("книгу", "книга"),
        ("года", "год"), ("городе", "город"),
    ],
    "nb": [
        ("kastet", "kaste"), ("kaster", "kaste"),
        ("spiste", "spise"), ("spiser", "spise"),
        ("lærte", "lære"), ("lærer", "lære"),
        ("sendte", "sende"), ("sender", "sende"),
        ("kjørte", "kjøre"), ("kjører", "kjøre"),
        ("bilen", "bil"), ("bilene", "bil"),
        ("skolene", "skole"), ("skolen", "skole"),
        ("ukene", "uke"), ("guttene", "gutt"),
    ],
    "pl": [
        ("czytał", "czytać"), ("czytali", "czytać"), ("czytała", "czytać"),
        ("mieszkam", "mieszkać"), ("mieszkali", "mieszkać"),
        ("słuchali", "słuchać"), ("słuchała", "słuchać"),
        ("śpiewam", "śpiewać"), ("śpiewali", "śpiewać"),
        ("kobiety", "kobieta"), ("kobietę", "kobieta"),
        ("szkoły", "szkoła"), ("książki", "książka"),
        ("domu", "dom"), ("bankiem", "bank"), ("parki", "park"),
    ],
}
