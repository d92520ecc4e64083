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
    "de": {" der ": 3, " die ": 3, " und ": 3, " das ": 2, " ist ": 2,
           " ein": 2, "sch": 2, "ich": 1, " nicht ": 3, "en ": 1},
    "en": {" the ": 3, " and ": 3, " of ": 3, " is ": 2, " to ": 2,
           " in ": 1, "ing ": 2, "th": 1, " that ": 2, " are ": 2},
    "es": {" el ": 3, " la ": 2, " los ": 3, " las ": 2, " es ": 2,
           " y ": 2, "ción": 3, "ñ": 3, " una ": 2, "os ": 1},
    "fr": {" le ": 3, " les ": 3, " des ": 3, " est ": 2, " une ": 2,
           " et ": 2, "eau": 2, "é": 2, "è": 2, " dans ": 3},
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


def language_id_sql(d: str, text: str) -> tuple[str, str]:
    """(pred_lang_expr, score_expr) — argmax over the profiles with an
    alphabetical-first tie-break; 'und' with score 0.0 when no gram of any
    profile occurs.  Reuses one normalized-text subexpression; each score
    appears in both outputs, but Catalyst/DuckDB common-subexpression
    handling keeps this a single projection either way."""
    norm = _norm_sql(d, text)
    langs = sorted(NGRAM_PROFILES)
    scores = {L: lang_ngram_score_sql(d, text, L, norm) for L in langs}
    mx = "greatest(" + ", ".join(scores.values()) + ")"
    pred_branches = " ".join(
        f"WHEN ({scores[L]}) = ({mx}) THEN '{L}'" for L in langs)
    pred = (f"CASE WHEN ({mx}) <= 0 THEN 'und' {pred_branches} "
            f"ELSE 'und' END")
    score = f"CASE WHEN ({mx}) <= 0 THEN CAST(0.0 AS DOUBLE) ELSE {mx} END"
    return pred, score


def identify_language(df: DataFrame, text_col: str = "text",
                      pred_alias: str = "pred_lang",
                      score_alias: str = "lang_score") -> DataFrame:
    """Append (pred_lang, lang_score) columns — one codegen projection."""
    pred, score = language_id_sql(D.SPARK, text_col)
    return df.withColumn(pred_alias, F.expr(pred)) \
             .withColumn(score_alias, F.expr(score))
