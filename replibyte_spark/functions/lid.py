"""Deterministic character-n-gram language identification.

The curation fixtures carry a *given* `lang` column, but a real pipeline
COMPUTES it — this is the Cavnar & Trenkle (1994) n-gram-profile idea
("N-Gram-Based Text Categorization") restated as one Catalyst projection:

- Each language has a small weighted profile of characteristic character
  n-grams (word-boundary-padded function words like " der ", suffixes like
  "ción", single distinctive characters like "ñ" or CJK function words).
- A document's score for language L is the weighted occurrence count of
  L's profile grams in the normalized text, divided by the text length
  (so long documents don't dominate), scaled ×1000 for readability.
- The prediction is the argmax with a deterministic alphabetical-first
  tie-break, or 'und' when every score is zero (empty/NULL/no evidence).

Occurrences are counted with the replace-length trick —
``(length(t) - length(replace(t, g, ''))) / length(g)`` — pure string
builtins, identical in Spark SQL and DuckDB, so the whole classifier is
ONE whole-stage-codegen projection over the corpus: no explode, no join,
no shuffle, no UDF.  At 100 TB the cost is the scan itself; the "profile
table" is folded into the expression at plan time (it is a few dozen
grams — the broadcast join a naive implementation would do carries zero
information the expression doesn't).

Arithmetic stays integral until ONE final division + round(6), so the
DuckDB oracle reproduces scores bit-exactly.

Reference analogue: Replibyte has no text analytics at all (SURVEY.md
§2.9); this extends the engine's text layer (functions/text.py) per the
BASELINE.json north star ("text analysis: language-ID (n-gram
heuristic)").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import dialect as D

# Weighted character-n-gram profiles.  Grams with surrounding spaces match
# whole function words (the normalized text is space-padded); weights favor
# grams that are distinctive for the language over merely frequent ones.
# Derived from public letter/word-frequency knowledge (Cavnar & Trenkle-
# style top-profile selection), NOT trained on the fixtures.
NGRAM_PROFILES: dict[str, dict[str, int]] = {
    # r10 non-Latin additions (ar/hi/ja/ko): each rides its own script
    # class (SCRIPT_LANGS below), so their grams are evaluated ONLY on
    # rows whose dominant script matches — adding them costs Latin rows
    # nothing.  ar/hi/ko are alone in their script, so the profile's job
    # is evidence > 0 (vs 'und'), not discrimination; ja shares the CJK
    # class with zh and anchors on hiragana (unique to Japanese), while
    # zh anchors on ideographs rare in Japanese prose (的/们/是).
    "ar": {" في ": 3, " من ": 3, " على ": 3, " إلى ": 2, " عن ": 2,
           " هذا ": 2, " أن ": 2, " و": 1, "ال": 1, " لا ": 2},
    # r11 within-class splits: bg/uk join ru in the Cyrillic class,
    # fa/ur join ar in the Arabic class — profiles discriminate WITHIN
    # the script (the ja/zh precedent).  bg anchors on the ъ-heavy
    # orthography (ът/да/се/ще) Russian lacks; uk on і/ї/є (U+0454-57,
    # absent from Russian and Bulgarian) and its own function words.
    "bg": {" да ": 3, " се ": 3, "ът ": 3, " не ": 1, " на ": 1,
           " за ": 2, " това ": 2, " ще ": 2, " от ": 1, " съм ": 2},
    # late-r10 single-script additions (bn/el/he/th): like ar/hi/ko each
    # is alone in its script class, so the profile's job is evidence > 0
    # (vs 'und'); Thai writes without inter-word spaces, so its grams are
    # bare substrings (no space anchors) — the only profile built so
    "bn": {" এবং ": 3, " না ": 2, " এই ": 2, " করে ": 2, " থেকে ": 2,
           " আমি ": 2, "ের ": 2, " যে ": 1, " হয় ": 2, " তার ": 1},
    "de": {" der ": 3, " die ": 3, " und ": 3, " das ": 2, " ist ": 2,
           " ein": 2, "sch": 2, "ich": 1, " nicht ": 3, "en ": 1},
    # el grams deliberately avoid sigma: Greek final sigma 'ς' does not
    # survive an upper→lower round trip under simple (non-contextual)
    # Unicode case mapping — both engines' lower() would turn 'ΟΣ' into
    # 'οσ', silently breaking the case-invariance contract for any
    # sigma-bearing gram (caught by the invariance property test)
    "el": {" και ": 3, " το ": 2, " που ": 2, " να ": 2, " του ": 2,
           " είναι ": 3, " με ": 1, " την ": 2, " δεν ": 2, " για ": 2},
    "en": {" the ": 3, " and ": 3, " of ": 3, " is ": 2, " to ": 2,
           " in ": 1, "ing ": 2, "th": 1, " that ": 2, " are ": 2},
    "es": {" el ": 3, " la ": 2, " los ": 3, " las ": 2, " es ": 2,
           " y ": 2, "ción": 3, "ñ": 3, " una ": 2, "os ": 1},
    # fa (Persian) anchors: its own function words (که/است/را spelled
    # with Persian ک U+06A9) plus the four Persian-specific letters
    # پ چ ژ گ — Arabic text contains none of them.  No case trap:
    # the Arabic script is caseless.
    "fa": {" که ": 3, " است ": 3, " را ": 3, " این ": 2, " در ": 2,
           " به ": 2, "پ": 2, "چ": 1, "ژ": 2, "گ": 2},
    "fr": {" le ": 3, " les ": 3, " des ": 3, " est ": 2, " une ": 2,
           " et ": 2, "eau": 2, "é": 2, "è": 2, " dans ": 3},
    # r9 additions.  Collision notes (why these weights): " de " is also
    # a high-frequency Spanish/Portuguese/French preposition → weight 1
    # in nl (het/een/van carry the decision); " è " also scores fr via
    # its bare "è" gram → it anchors on " è " at 3 plus per/gli/zione;
    # pt avoids the shared " os "-heavy route and anchors on its unique
    # orthography (ão/ções/não) and do/da contractions es lacks.
    "he": {" של ": 3, " את ": 3, " על ": 2, " לא ": 2, " זה ": 2,
           " הוא ": 2, " עם ": 1, "ים ": 2, " אני ": 2, " גם ": 1},
    "hi": {" है ": 3, " का ": 2, " की ": 2, " के ": 2, " में ": 3,
           " और ": 3, " से ": 2, " को ": 2, " एक ": 2, " यह ": 2},
    # hy (Armenian, r11): alone in its script class.  Grams avoid the
    # և ligature (U+0587): its uppercase is the TWO-char 'ԵՎ', which
    # lowercases to 'եվ' — the Greek-final-sigma case-round-trip trap.
    "hy": {" է ": 3, " որ ": 2, " այս ": 2, " նա ": 2, " մի ": 2,
           " են ": 2, "ում ": 2, " այն ": 2, " չի ": 2, " ես ": 1},
    # id/ms (r11) are CORE Latin — no diacritic to gate on, so they are
    # the first additions that cost Latin rows anything since r9 (+2 of
    # now 9 core profiles).  The pair shares most function words; the
    # split anchors: id on adalah/ini/itu/dari, ms on ialah/boleh/
    # kerana — the standard id-vs-ms markers.  " di " is weight 1 (it
    # is also Italian's weight-3 " di "; Italian's own anchors dominate
    # Italian text, and id text carries yang/dan besides).
    "id": {" yang ": 3, " dan ": 2, " ini ": 2, " itu ": 2,
           " dengan ": 2, " untuk ": 2, " tidak ": 2, " adalah ": 3,
           " dari ": 2, " di ": 1},
    "it": {" il ": 3, " di ": 3, " che ": 2, " è ": 3, " per ": 2,
           "zione": 3, "gli": 2, " non ": 2, " con ": 1, " sono ": 2},
    # hiragana function characters — unique to Japanese, absent from
    # Chinese text, so they cleanly split the shared CJK script class
    "ja": {"の": 3, "を": 3, "に": 2, "は": 2, "が": 2,
           "で": 1, "て": 1, "た": 1, "です": 2, "する": 2},
    # ka (Georgian, r11): Mkhedruli is what lowercased text contains
    # (Mtavruli capitals lowercase back to it under full case mapping —
    # verified by the case-invariance property test)
    "ka": {" და ": 3, " არის ": 3, " არ ": 2, " ეს ": 2, " რომ ": 2,
           " იყო ": 2, "ების": 2, " ის ": 2, " ერთი ": 2, " მე ": 1},
    "ko": {"는 ": 2, "의 ": 2, "을 ": 2, "이 ": 2, "가 ": 2,
           "다 ": 2, "에 ": 2, "고 ": 1, "하": 1, "니": 1},
    # ml (Malayalam, r11): alone in its script class — the profile's job
    # is evidence > 0; the script is caseless (no round-trip traps)
    "ml": {" ഒരു ": 3, " ആണ് ": 3, " എന്ന് ": 2, " ഈ ": 2, " അത് ": 2,
           " ഇല്ല ": 2, "ങ്ങൾ": 2, " ഉണ്ട് ": 2, "ത്തിൽ": 2, " അല്ല ": 1},
    "ms": {" yang ": 2, " dan ": 2, " ialah ": 3, " boleh ": 3,
           " kerana ": 3, " dalam ": 2, " anda ": 2, " tidak ": 1,
           " untuk ": 1, " dengan ": 1},
    "nl": {" het ": 3, " een ": 3, " van ": 3, " niet ": 2, " de ": 1,
           "ij": 2, " en ": 1, " op ": 1, " dat ": 1, "aa": 1},
    # pl/tr/vi (late r10) ride the EXTENDED-LATIN diacritic gate: their
    # profiles are only evaluated on rows carrying a Latin Extended-A/B
    # or Vietnamese-additional char (ł/ż/ğ/ş/đ/ơ/… — é/ñ/ü stay Latin-1
    # and do NOT trigger it), so plain-ASCII and Western-European rows
    # pay one find-first probe and skip all three.  Turkish grams avoid
    # dotless ı entirely: 'ı'.upper() is 'I' under simple case mapping,
    # which lowercases back to 'i' — the same round-trip trap as Greek
    # final sigma (caught by the case-invariance property test).
    "pl": {" nie ": 3, " się ": 3, " jest ": 2, " że ": 2, " to ": 1,
           "ł": 2, "ż": 2, "ą": 2, "ę": 2, " już ": 2},
    "pt": {" não ": 3, "ção": 3, " do ": 2, " da ": 2, " uma ": 2,
           " em ": 2, " para ": 2, "ão ": 2, "õe": 3, " os ": 1},
    # Cyrillic grams collide with nothing Latin — no transliteration
    # involved; the profile is the standard top function words
    "ru": {" и ": 3, " не ": 3, " что ": 3, " на ": 2, " в ": 2,
           "ть ": 2, "ый": 2, "ого": 2, " это ": 2, " он ": 1},
    # ta (Tamil, r11): caseless single-script class
    "ta": {" மற்றும் ": 3, " ஒரு ": 3, " இது ": 2, " என்று ": 2,
           " அது ": 2, " இல்லை ": 2, "ங்கள்": 2, " அந்த ": 2,
           "த்தில்": 2, " உள்ளது ": 2},
    # te (Telugu, r11): caseless single-script class
    "te": {" మరియు ": 3, " ఒక ": 3, " ఇది ": 2, " అని ": 2,
           " కాదు ": 2, " ఈ ": 1, " ఉంది ": 2, "ంది ": 2,
           " లో ": 1, " ఆ ": 1},
    "th": {"ที่": 3, "และ": 3, "การ": 2, "ของ": 2, "ไม่": 2,
           "เป็น": 2, "ได้": 2, "ใน": 1, "มี": 1, "ว่า": 2},
    "tr": {" bir ": 3, " ve ": 2, " bu ": 2, " için ": 3, " değil ": 3,
           "ğ": 2, "ş": 2, " çok ": 2, " gibi ": 2, "yor": 2},
    # uk anchors on і/ї/є + та/що/це/він; і collides with nothing (the
    # Ukrainian-specific U+0456, not Latin i); upper→lower round trips
    # are simple for all three (І Ї Є)
    "uk": {" і ": 3, "ї": 3, "є": 2, " та ": 3, " що ": 1, " це ": 2,
           " як ": 2, "ння": 2, " до ": 1, " він ": 2},
    # ur (Urdu) anchors: ہے with U+06C1, yeh barree ے U+06D2 (ubiquitous
    # in Urdu, absent from Persian/Arabic) and the retroflex ٹ ڈ ڑ;
    # گ also appears in Urdu, so fa's گ gram contributes a small fa
    # score to Urdu text — the Urdu anchors outweigh it
    "ur": {" ہے ": 3, " کے ": 2, " میں ": 2, " اور ": 3, "ے": 2,
           "ٹ": 2, "ڈ": 2, "ڑ": 2, " نہیں ": 3, " یہ ": 2},
    "vi": {" không ": 3, " của ": 3, " là ": 2, " và ": 2, " có ": 2,
           " người ": 2, " một ": 2, " được ": 2, " đã ": 2,
           " cũng ": 2},
    "zh": {"的": 3, "是": 2, "了": 2, "我": 2, "不": 2,
           "在": 2, "人": 1, "有": 1, "他": 1, "们": 2},
}

SCALE = 1000  # score = SCALE * weighted-occurrences / normalized length


def _norm_sql(d: str, text: str) -> str:
    """Space-padded, lowercased, whitespace-collapsed text (NULL → ' ')."""
    collapsed = D.regexp_replace(d, f"lower(coalesce({text}, ''))",
                                 r"\s+", " ")
    return f"concat(' ', trim({collapsed}), ' ')"


def _occurrences(gram: str, t: str) -> str:
    """Non-overlapping occurrence count of `gram` in `t` — exact integer:
    the length difference is always a multiple of the gram length."""
    g = D.q(gram)
    return (f"((length({t}) - length(replace({t}, {g}, ''))) "
            f"/ {len(gram)})")


def lang_ngram_score_sql(d: str, text: str, lang: str,
                         norm: str | None = None) -> str:
    """Score of `text` under one language's n-gram profile (×SCALE,
    length-normalized, rounded 6dp)."""
    t = norm or _norm_sql(d, text)
    weighted = " + ".join(f"{w} * {_occurrences(g, t)}"
                          for g, w in NGRAM_PROFILES[lang].items())
    return (f"round(CAST({SCALE} * ({weighted}) AS DOUBLE) "
            f"/ length({t}), 6)")


LANGS = sorted(NGRAM_PROFILES)

# Script gate (round 10).  Gram counting is linear in TOTAL profile size,
# so the classifier's per-row cost grew with every added language (the
# 5→9 profile jump doubled the sf0.1 gate) — yet real corpora are
# overwhelmingly single-script, and a Cyrillic document can never match a
# Latin gram (and vice versa).  One cheap regexp strip per non-Latin
# script classifies the row first; the scores array is then a CASE over
# script classes, and both engines evaluate ONLY the taken branch — so a
# Latin row pays the Latin profiles, a Cyrillic row pays `ru` alone, and
# adding Latin languages no longer taxes CJK/Cyrillic rows at all.
# Out-of-script languages score an exact 0.0 (they could only ever have
# scored 0 anyway: every ru/zh gram is pure Cyrillic/CJK and every
# Latin-language gram is pure Latin).
SCRIPT_LANGS: "dict[str, tuple[str, ...]]" = {
    # ar/fa/ur share the Arabic script class (r11): fa anchors on
    # Persian-specific letters + function words, ur on its retroflex
    # letters + ہے/ے — the ja/zh within-class discrimination pattern
    "arabic": ("ar", "fa", "ur"),
    "bengali": ("bn",),
    # kana + ideographs: Japanese and Chinese share the class; their
    # profiles discriminate within it (hiragana vs ideograph anchors)
    "cjk": ("ja", "zh"),
    # bg/ru/uk share Cyrillic (r11): bg's ъ-orthography and uk's і/ї/є
    # split the class
    "cyrillic": ("bg", "ru", "uk"),
    "devanagari": ("hi",),
    "armenian": ("hy",),
    "georgian": ("ka",),
    "greek": ("el",),
    "hangul": ("ko",),
    "hebrew": ("he",),
    "malayalam": ("ml",),
    "tamil": ("ta",),
    "telugu": ("te",),
    "thai": ("th",),
}
_SCRIPT_RE = {  # Java + RE2 \x{...} syntax, identical in both engines
    "arabic": r"[\x{0600}-\x{06FF}]+",
    "bengali": r"[\x{0980}-\x{09FF}]+",
    "cjk": r"[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]+",
    "cyrillic": r"[\x{0400}-\x{04FF}]+",
    "devanagari": r"[\x{0900}-\x{097F}]+",
    "armenian": r"[\x{0530}-\x{058F}]+",
    "georgian": r"[\x{10A0}-\x{10FF}]+",
    "greek": r"[\x{0370}-\x{03FF}\x{1F00}-\x{1FFF}]+",
    "hangul": r"[\x{1100}-\x{11FF}\x{AC00}-\x{D7AF}]+",
    "hebrew": r"[\x{0590}-\x{05FF}]+",
    "malayalam": r"[\x{0D00}-\x{0D7F}]+",
    "tamil": r"[\x{0B80}-\x{0BFF}]+",
    "telugu": r"[\x{0C00}-\x{0C7F}]+",
    "thai": r"[\x{0E00}-\x{0E7F}]+",
}
LATIN_LANGS = tuple(L for L in LANGS
                    if all(L not in v for v in SCRIPT_LANGS.values()))

# Second-level gate WITHIN the Latin branch (late r10): pl/tr/vi need a
# Latin Extended-A/B or Vietnamese-additional character to be evaluated
# at all.  Western-European orthography (é ñ ü ç à …) lives in Latin-1
# Supplement (U+00C0–U+00FF) and never triggers it, so en/de/fr/es/it/
# nl/pt rows — and all plain ASCII — pay exactly one find-first probe
# for the three added languages.  The honest limitation, recorded: a
# pl/tr/vi document typed WITHOUT any of its diacritics falls back to
# the core-Latin profiles (same trade as the per-script classes).
EXTENDED_LATIN_LANGS = ("pl", "tr", "vi")
CORE_LATIN_LANGS = tuple(L for L in LATIN_LANGS
                         if L not in EXTENDED_LATIN_LANGS)
_EXT_LATIN_PROBE = r"[\x{0100}-\x{024F}\x{1EA0}-\x{1EF9}]"
# a script class claims the row when > 30% of normalized chars are in it
# (integer cross-multiplication — no float threshold to diverge on)
SCRIPT_FRAC_NUM, SCRIPT_FRAC_DEN = 3, 10


# any char at/past the Greek block: every non-Latin script class above
# starts beyond U+0370, and Latin text (including precomposed accents
# and combining diacritics, U+0300–U+036F) contains none — so one
# find-first-match regex decides "Latin" without counting any script
_NON_LATIN_PROBE = r"[\x{0370}-\x{FFFF}]"


def _script_count_sql(d: str, t: str, script: str) -> str:
    """Characters of `t` belonging to `script` — exact integer via the
    strip-and-diff trick (one regexp scan, vs ~10 gram scans per profile
    the gate lets the row skip)."""
    stripped = D.regexp_replace(d, t, _SCRIPT_RE[script], "")
    return f"(length({t}) - length({stripped}))"


def _ext_latin_probe_sql(d: str, t: str) -> str:
    """TRUE when `t` carries an extended-Latin diacritic char (the
    pl/tr/vi gate) — find-first, one short scan."""
    if d == D.SPARK:
        pat = _EXT_LATIN_PROBE.replace("\\", "\\\\")
        return f"({t} RLIKE '{pat}')"
    return f"regexp_matches({t}, '{_EXT_LATIN_PROBE}')"


def _non_latin_probe_sql(d: str, t: str) -> str:
    """TRUE when `t` contains any non-Latin-script character.  A
    find-first-match regex, so the (overwhelmingly common at web scale)
    pure-Latin row pays one short scan and skips ALL per-script counting
    — per-row script-gate cost stays flat as script classes are added."""
    if d == D.SPARK:
        pat = _NON_LATIN_PROBE.replace("\\", "\\\\")
        return f"({t} RLIKE '{pat}')"
    return f"regexp_matches({t}, '{_NON_LATIN_PROBE}')"


def _let_sql(d: str, val: str, var: str, body: str) -> str:
    """Cross-dialect SQL let-binding (the repetition.py::_let idiom):
    evaluate `val` once, bind it as lambda variable `var` in `body` —
    lambda variables cannot be duplicated by Catalyst's alias
    substitution, and the generated code contains `val` exactly once."""
    if d == D.SPARK:
        return f"element_at(transform(array({val}), {var} -> {body}), 1)"
    return f"list_extract(list_transform([{val}], {var} -> {body}), 1)"


def script_class_sql(d: str, norm: str) -> str:
    """The row's dominant script class as a small string ('latin',
    'cjk', ...): the ASCII fast path first (find-first probe — a pure-
    Latin row pays one short scan and no per-script counting), then one
    strip-scan per script class until the >30% claim fires, ELSE
    'latin' (Vietnamese-additional chars arrive here)."""
    branches = " ".join(
        f"WHEN {SCRIPT_FRAC_DEN} * {_script_count_sql(d, norm, s)} > "
        f"{SCRIPT_FRAC_NUM} * length({norm}) THEN '{s}'"
        for s in sorted(SCRIPT_LANGS))
    return (f"CASE WHEN NOT {_non_latin_probe_sql(d, norm)} THEN 'latin' "
            f"{branches} ELSE 'latin' END")


_LANG_CLASS = {L: s for s, langs in SCRIPT_LANGS.items() for L in langs}


def lang_scores_array_sql(d: str, text: str,
                          norm: str | None = None,
                          script: str | None = None) -> str:
    """All profile scores as ONE array expression (order = sorted langs).
    This is the expensive part — dozens of replace/length calls per row —
    so consumers stage it into a column/subquery and derive pred/score
    from the cheap array, instead of inlining it once per comparison
    branch (7× the work).  Pass `norm` as a MATERIALIZED column holding
    :func:`_norm_sql`'s value when possible: every occurrence count
    references the normalized text twice — codegen's subexpression
    elimination dedups it within one projection, but a staged column
    makes the contract explicit instead of relying on it.

    Structure (late r11): the dominant script class is computed ONCE
    into a let-bound lambda variable, and every slot of the single
    31-language array is gated per-SLOT on it (CASE short-circuits, so
    out-of-class profiles are never evaluated).  The previous shape — a
    CASE over script classes each holding a full per-class array — was
    QUADRATIC in generated code (classes × slots): at 31 languages the
    whole-stage-codegen method crossed the JVM 64 KB limit ('Failed to
    compile', silent interpreted fallback, the exact r10 failure mode
    the sentinel method caught then and the codegen-compile test locks
    now).  Per-slot gating off the let variable is linear — each score
    expression and each strip-scan appears exactly once — and per-row
    cost is unchanged: one probe, the row's own script counts, and only
    the row's own class profiles.

    Pass `script` as a STAGED column holding :func:`script_class_sql`
    on hot paths (identify_language does): like `norm`, CollapseProject
    declines to re-inline a non-cheap alias referenced more than once,
    so the class expression is evaluated once per row as a real column.
    Neither a let-lambda nor textual inlining works on the hot path:
    lambda bodies are evaluated INTERPRETED (wrapping the 31-profile
    array in a transform() let measured ~1.2-2× on the sf0.1 gate), and
    31 inlined copies of the class CASE push the codegen method back
    over the JVM 64 KB limit.  The default (no `script`) — oracles and
    small-row tests — wraps the whole array in the let binding instead:
    the class expression still evaluates once per row (31 inlined
    copies made the DuckDB oracle evaluate ~800 regexp strips per row),
    at interpreted-lambda cost that only tiny row counts ever pay."""
    norm = norm or _norm_sql(d, text)
    zero = "CAST(0.0 AS DOUBLE)"
    sc = script if script is not None else "__sc"
    parts = []
    for L in LANGS:
        s = lang_ngram_score_sql(d, text, L, norm)
        cls = _LANG_CLASS.get(L, "latin")
        cond = f"{sc} = '{cls}'"
        if L in EXTENDED_LATIN_LANGS:
            cond = f"{cond} AND {_ext_latin_probe_sql(d, norm)}"
        parts.append(f"CASE WHEN {cond} THEN {s} ELSE {zero} END")
    scores = ", ".join(parts)
    arr = f"array({scores})" if d == D.SPARK else f"[{scores}]"
    if script is not None:
        return arr
    return _let_sql(d, script_class_sql(d, norm), "__sc", arr)


def pred_from_scores_sql(d: str, ls: str) -> str:
    """Argmax language from a scores-array column: first index achieving
    the max (langs sorted → alphabetical-first tie-break), 'und' when no
    profile gram occurred."""
    lits = ", ".join(D.q(L) for L in LANGS)
    if d == D.SPARK:
        mx, pos, arr = (f"array_max({ls})",
                        f"array_position({ls}, array_max({ls}))",
                        f"array({lits})")
        return (f"CASE WHEN {mx} <= 0 THEN 'und' "
                f"ELSE element_at({arr}, CAST({pos} AS INT)) END")
    mx = f"list_aggregate({ls}, 'max')"
    return (f"CASE WHEN {mx} <= 0 THEN 'und' "
            f"ELSE list_extract([{lits}], list_position({ls}, {mx})) END")


def score_from_scores_sql(d: str, ls: str) -> str:
    mx = (f"array_max({ls})" if d == D.SPARK
          else f"list_aggregate({ls}, 'max')")
    return f"CASE WHEN {mx} <= 0 THEN CAST(0.0 AS DOUBLE) ELSE {mx} END"


def margin_from_scores_sql(d: str, ls: str) -> str:
    """Winner-minus-runner-up margin from a scores-array column — the
    confidence gauge downstream mixers threshold on (r12 verdict #7: a
    near-tie between two Latin profiles is a very different 'pred=es'
    than a clear win, and lang_score alone cannot tell them apart).

    Rendering: ascending comparator-free sort (stays in codegen — a
    lambda comparator would evaluate interpreted, the r11/r12 lesson),
    then the last two elements.  Script gating zeroes out-of-class
    slots, so the runner-up is clamped at 0: a single-candidate script
    class yields margin == score, which reads correctly as 'nothing
    competed'.  'und' rows (no profile gram) get margin 0.0 like their
    score.  Rounded to 6dp — the cross-engine float contract."""
    if d == D.SPARK:
        srt = f"array_sort({ls})"
        mx, m2 = f"element_at({srt}, -1)", f"element_at({srt}, -2)"
    else:
        srt = f"list_sort({ls})"
        mx, m2 = f"list_extract({srt}, -1)", f"list_extract({srt}, -2)"
    return (f"CASE WHEN {mx} <= 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE round({mx} - greatest({m2}, CAST(0.0 AS DOUBLE)), 6) "
            f"END")


def language_id_sql(d: str, text: str) -> tuple[str, str]:
    """(pred_lang_expr, score_expr) as FLAT self-contained expressions —
    argmax with alphabetical-first tie-break, 'und'/0.0 when no profile
    gram occurs.  The scores array is inlined (re-evaluated per use), so
    this form suits oracles/tests over modest row counts; hot paths go
    through :func:`lang_scores_array_sql` staged into a column/subquery
    (see :func:`identify_language`)."""
    arr = lang_scores_array_sql(d, text)
    return pred_from_scores_sql(d, arr), score_from_scores_sql(d, arr)


def identify_language(df: DataFrame, text_col: str = "text",
                      pred_alias: str = "pred_lang",
                      score_alias: str = "lang_score",
                      margin_alias: str = "lang_margin") -> DataFrame:
    """Append (pred_lang, lang_score, lang_margin) columns.

    Two staged layers so nothing expensive is recomputed: the normalized
    text (its whitespace-collapse regexp is referenced by every
    occurrence count) and the scores array (referenced by every argmax
    branch) each land in their own column; pred/score derive from the
    cheap per-language array.  Spark's CollapseProject declines to
    re-inline a non-cheap alias referenced more than once, so the
    staging survives optimization (measured 2.3 s → 1.4 s on the sf0.1
    gate pre-script-gate; with the r10 script gate + ASCII fast path a
    pure-Latin row pays one probe regex plus its own Latin profiles,
    nothing else — the 13-language gate noop-materializes in 1.7-1.9 s
    at sf0.1 where flat-profile scaling would project ~2.7 s, and
    further non-Latin languages are free for Latin rows: late r10 grew
    the set to 17 (el/he/th/bn, each alone in its script class) at
    unchanged Latin-row cost, then to 20 (pl/tr/vi behind the nested
    extended-Latin diacritic gate — ASCII rows pay one probe) — plan
    lock in test_lid)."""
    # the profile scoring is pure compute over text: widen a narrow scan
    # first (no-op when already wide; see repetition_flags' r12 note)
    from ..util import fan_out

    df = fan_out(df)
    norm_col = f"__{pred_alias}_norm"
    sc_col = f"__{pred_alias}_script"
    arr_col = f"__{pred_alias}_scores"
    staged = (df.withColumn(norm_col,
                            F.expr(_norm_sql(D.SPARK, text_col)))
              .withColumn(sc_col,
                          F.expr(script_class_sql(D.SPARK, norm_col)))
              .withColumn(arr_col, F.expr(lang_scores_array_sql(
                  D.SPARK, text_col, norm=norm_col, script=sc_col))))
    return (staged
            .withColumn(pred_alias,
                        F.expr(pred_from_scores_sql(D.SPARK, arr_col)))
            .withColumn(score_alias,
                        F.expr(score_from_scores_sql(D.SPARK, arr_col)))
            .withColumn(margin_alias,
                        F.expr(margin_from_scores_sql(D.SPARK, arr_col)))
            .drop(norm_col, sc_col, arr_col))
